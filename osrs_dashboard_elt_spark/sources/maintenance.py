"""Table maintenance: versioned snapshot publish (time travel) and
small-file compaction.

Extends the S12/T5 publish story (``io.publish_blue_green`` keeps
exactly two buffers, like the reference's two SQLite files,
src/3_transform_data.py:771-798):

- ``publish_versioned`` keeps N immutable snapshot dirs plus an
  append-only JSON version log with per-version row counts and an
  order-independent table checksum (``operators.quality
  .table_checksum``'s digest discipline).  New readers resolve the
  log's head; a pinned reader gets version k forever — the micro form
  of a Delta/Iceberg commit log, kept format-agnostic.  The log
  append is write-temp + atomic rename, same as the manifest flip,
  and concurrent publishers are safe: version numbers are claimed
  via O_CREAT|O_EXCL markers and the log read-modify-write runs
  under a short O_EXCL lock (loud bounded-timeout on a stale lock).
- ``vacuum_versions`` deletes expired snapshots but never the head or
  an explicitly-retained version — the retention contract that makes
  time travel safe to run on a cron.
- ``compact_files`` rewrites a parquet dir to ~``target_bytes``
  files.  Streaming/micro-batch appends produce many small files; at
  100 TB the file count — not the byte count — is what breaks
  listing, planning, and scan throughput.  The rewrite is one job:
  read -> repartition(ceil(bytes/target)) -> publish_versioned (so
  compaction is itself atomic and time-travelable).

Scale notes: the version log holds one small JSON object per publish
(metadata only); snapshots are plain parquet dirs so every reader
optimization (pruning, pushdown, vectorized scan) applies unchanged.
The checksum is computed from the DataFrame being published in the
same job — one extra aggregate over data already in memory/cache.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LOG = "_versions.json"
_LOCK = "_versions.lock"


def _claim_version(root: str, start: int) -> int:
    """Atomically claim the next free version number >= ``start``.

    A version is claimed by creating ``.claim-v{n}`` with
    O_CREAT|O_EXCL — a true compare-and-swap on any POSIX filesystem,
    so two concurrent publishers can never claim the same number (the
    second gets EEXIST and moves on).  Claim markers are never deleted
    for live versions (a 0-byte file per publish); ``vacuum_versions``
    removes the markers of vacuumed snapshots.  A publisher that
    crashes between claim and log-append leaves a gap in the version
    sequence — harmless, and far better than the silent snapshot
    clobber an unclaimed read-modify-write allows.
    """
    v = start
    for _ in range(100_000):
        try:
            fd = os.open(
                os.path.join(root, f".claim-v{v}"),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
            os.close(fd)
            return v
        except FileExistsError:
            v += 1
    raise RuntimeError(
        f"could not claim a version under {root} after 100000 probes — "
        "claim markers are not being vacuumed"
    )


class _log_lock:
    """Short-lived mutex around the version-log read-modify-write,
    via O_CREAT|O_EXCL on a lock file.  Bounded spin: a publisher that
    died holding the lock surfaces as a loud timeout naming the stale
    lock file (delete it after confirming no publisher is live) rather
    than a silent lost update."""

    def __init__(self, root: str, timeout: float = 30.0) -> None:
        self.path = os.path.join(root, _LOCK)
        self.timeout = timeout

    def __enter__(self) -> None:
        deadline = time.time() + self.timeout
        while True:
            try:
                fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"version log locked for > {self.timeout}s by "
                        f"{self.path} — a publisher crashed mid-commit; "
                        "remove the lock file once no publisher is live"
                    ) from None
                time.sleep(0.05)

    def __exit__(self, *exc) -> None:
        try:
            os.remove(self.path)
        except FileNotFoundError:
            pass


def _read_log(root: str) -> list[dict]:
    # FileNotFoundError ONLY: any other read failure (permissions, a
    # transient remote-fs error) must raise — treating it as "no log"
    # would reset the version counter and let the next publish
    # overwrite the real v1 snapshot
    try:
        with open(os.path.join(root, _LOG)) as f:
            return json.load(f)
    except FileNotFoundError:
        return []


def _write_log(root: str, entries: list[dict]) -> None:
    fd, tmp = tempfile.mkstemp(dir=root, prefix=".versions-")
    with os.fdopen(fd, "w") as f:
        json.dump(entries, f, indent=1)
    os.replace(tmp, os.path.join(root, _LOG))


def publish_versioned(
    df: DataFrame,
    root: str,
    checksum_cols: list[str] | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1 << 20,
) -> int:
    """Write ``df`` as the next immutable snapshot under ``root`` and
    append it to the version log.  Returns the new version number.

    Concurrency-safe on a POSIX filesystem: the version NUMBER is
    claimed atomically (O_CREAT|O_EXCL marker) before any data is
    written, so two concurrent publishers get distinct numbers and
    distinct snapshot dirs, and the log append runs under a short
    O_EXCL lock with a re-read — neither publisher can clobber the
    other's snapshot or drop its log entry.  The snapshot dir is
    written BEFORE the log append, so a crash between the two leaves
    a dangling claimed dir (harmless, vacuumable) — never a log entry
    pointing at missing data.
    """
    os.makedirs(root, exist_ok=True)
    log = _read_log(root)
    version = _claim_version(root, (log[-1]["version"] + 1) if log else 1)
    path = os.path.join(root, f"v{version}")
    df.write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    if stats_cols:
        # per-file min/max manifest inside the (immutable) snapshot
        # dir: selective readers of this version prune files at
        # planning time (sources/stats_manifest.py); written before
        # the log append, so a logged version always has its stats.
        # immutable=True is the version handshake: the snapshot never
        # changes, so pruned_scan trusts the manifest and skips the
        # per-probe directory listing entirely
        from .stats_manifest import write_stats_manifest

        # bloom_cols serve point lookups on the snapshot (id reads on
        # keys the layout doesn't cluster); min/max serve range probes
        write_stats_manifest(
            spark, path, stats_cols,
            bloom_cols=bloom_cols, bloom_bits=bloom_bits,
            immutable=True,
        )
    written = spark.read.parquet(path)
    entry = {
        "version": version,
        "path": f"v{version}",
        "rows": written.count(),
        "ts": time.time(),
    }
    if checksum_cols:
        from ..operators.quality import table_checksum

        entry["checksum"] = str(
            table_checksum(written, checksum_cols).collect()[0]["checksum"]
        )
    # Re-read under the lock: another publisher may have appended a
    # DIFFERENT version while this snapshot was being written; append
    # ours and keep the log version-sorted.  A duplicate of OUR number
    # here means the claim discipline was bypassed — fail loudly
    # rather than point two log entries at one dir.
    with _log_lock(root):
        log = _read_log(root)
        if any(e["version"] == version for e in log):
            raise RuntimeError(
                f"version {version} already in the log under {root} — "
                "claim marker was removed or the log was hand-edited"
            )
        log.append(entry)
        log.sort(key=lambda e: e["version"])
        _write_log(root, log)
    return version


def read_version(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read the head snapshot, or time-travel to ``version``."""
    log = _read_log(root)
    if not log:
        raise FileNotFoundError(f"no versioned table under {root}")
    if version is None:
        entry = log[-1]
    else:
        matches = [e for e in log if e["version"] == version]
        if not matches:
            known = [e["version"] for e in log]
            raise ValueError(
                f"version {version} not in log (known: {known}) — "
                "it may have been vacuumed"
            )
        entry = matches[0]
    return spark.read.parquet(os.path.join(root, entry["path"]))


def vacuum_versions(
    root: str, keep_last: int = 2, retain: set[int] | None = None
) -> list[int]:
    """Delete snapshots older than the last ``keep_last``, except any
    in ``retain``.  Removes them from the log first (a reader that
    resolved the entry earlier may still be scanning — mirror Delta's
    retention caveat by keeping ``keep_last`` >= the longest reader),
    then deletes the dirs.  Returns the vacuumed version numbers."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1 (the head is never vacuumed)")
    retain = retain or set()
    with _log_lock(root):
        log = _read_log(root)
        keep = {e["version"] for e in log[-keep_last:]} | retain
        dropped = [e for e in log if e["version"] not in keep]
        _write_log(root, [e for e in log if e["version"] in keep])
    out = []
    for e in dropped:
        shutil.rmtree(os.path.join(root, e["path"]), ignore_errors=True)
        # the claim marker of a vacuumed version is dead: new claims
        # start above the log head, which keep_last >= 1 preserves
        try:
            os.remove(os.path.join(root, f".claim-v{e['version']}"))
        except FileNotFoundError:
            pass
        out.append(e["version"])
    return out


def list_versions(root: str) -> list[dict]:
    """The version log (metadata only — no data read)."""
    return _read_log(root)


def compact_files(
    spark: SparkSession,
    src: str,
    dest_root: str,
    target_bytes: int = 128 * 1024 * 1024,
    checksum_cols: list[str] | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
) -> int:
    """Rewrite the parquet dir ``src`` into ~``target_bytes`` files,
    published as a new version under ``dest_root``.  Returns the new
    version.

    File count comes from on-disk bytes (compressed parquet), so the
    output files land near ``target_bytes`` each regardless of row
    width.  ``repartition`` (round-robin) balances rows evenly —
    unlike ``coalesce``, which merges unevenly and can undo the size
    targeting; the shuffle it costs IS the compaction work."""
    total = 0
    for dirpath, _dirs, files in os.walk(src):
        for fn in files:
            if fn.endswith(".parquet"):
                total += os.path.getsize(os.path.join(dirpath, fn))
    n_files = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src).repartition(n_files)
    return publish_versioned(
        df, dest_root, checksum_cols=checksum_cols,
        stats_cols=stats_cols, bloom_cols=bloom_cols,
    )


def targeted_delete(
    spark: SparkSession,
    path: str,
    col: str,
    values: list,
    refresh_stats: bool = True,
) -> dict:
    """Delete all rows where ``col`` is one of ``values`` by rewriting
    ONLY the files that can contain them — the takedown/GDPR path.

    Planning goes through the stats manifest
    (``stats_manifest.files_for_values``): per-file min/max bounds plus
    the per-file BLOOM when the column has one, so an id-list delete
    against a million-file table rewrites ~|values| files instead of
    scanning everything (record blooms on the id column at write time
    for exactly this).  The manifest freshness check is MANDATORY here:
    a stale manifest would MISS files and silently leave target rows
    behind — a compliance failure, not a perf bug.

    Each affected file is handled alone: a bloom false positive is
    skipped untouched, a fully-matching file is removed, a partial
    match is rewritten (replacement part-file written first, original
    removed second).  In-place deletes on a live dir are NOT
    snapshot-isolated — a concurrent reader can transiently see both
    the original and the replacement; takedowns needing isolation
    should re-publish through ``publish_versioned`` instead (immutable
    snapshot manifests refuse this function outright).  Rows with a
    NULL ``col`` never match (values are non-null ids).

    Partition-column deletes are rejected: those are directory drops,
    not row rewrites.  Returns counts: files_affected / rewritten /
    removed, rows_deleted.
    """
    from .stats_manifest import _load_meta, files_for_values
    from .stats_manifest import refresh_stats_manifest as _refresh

    if not values:
        return {
            "files_affected": 0, "files_rewritten": 0,
            "files_removed": 0, "rows_deleted": 0,
        }
    if any(v is None for v in values):
        raise ValueError("delete values must be non-null")
    _, meta = _load_meta(spark, path)
    if meta["immutable"]:
        raise ValueError(
            f"{path} is an immutable published snapshot — publish a "
            "new version without the rows instead of in-place deletion"
        )
    affected = files_for_values(spark, path, col, values)
    rewritten = removed = 0
    rows_deleted = 0
    for uri in affected:
        local = "/" + uri[5:].lstrip("/") if uri.startswith("file:") else uri
        df = spark.read.parquet(uri)
        if col not in df.columns:
            raise ValueError(
                f"{col!r} is a partition column of {path} — "
                "partition deletes are directory drops, not row "
                "rewrites; remove the partition dirs and refresh "
                "the manifest"
            )
        keep_pred = F.col(col).isNull() | ~F.col(col).isin(list(values))
        counts = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(keep_pred, 1).otherwise(0)).alias("k"),
        ).collect()[0]
        n_all, n_keep = int(counts["n"]), int(counts["k"] or 0)
        if n_keep == n_all:  # bloom false positive — leave untouched
            continue
        rows_deleted += n_all - n_keep
        parent = os.path.dirname(local)
        if n_keep == 0:
            os.remove(local)
            removed += 1
            continue
        tmp = tempfile.mkdtemp(dir=parent, prefix=".delete-")
        try:
            df.filter(keep_pred).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = next(
                fn for fn in os.listdir(tmp) if fn.endswith(".parquet")
            )
            import uuid as _uuid

            newname = f"part-del-{_uuid.uuid4().hex}.snappy.parquet"
            os.replace(os.path.join(tmp, part), os.path.join(parent, newname))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)
        os.remove(local)
        rewritten += 1
    if refresh_stats and (rewritten or removed):
        # O(rewritten files), not O(table): only the replacement files
        # get stat'd/bloomed; vanished originals drop out
        _refresh(spark, path, meta["cols"])
    return {
        "files_affected": len(affected),
        "files_rewritten": rewritten,
        "files_removed": removed,
        "rows_deleted": rows_deleted,
    }
