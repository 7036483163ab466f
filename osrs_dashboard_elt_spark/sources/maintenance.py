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

        write_stats_manifest(spark, path, stats_cols, immutable=True)
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
    return publish_versioned(df, dest_root, checksum_cols=checksum_cols)
