"""File-skipping stats manifest: per-file column min/max recorded at
write time so selective readers prune FILES before the scan starts.

Parquet footers already carry row-group min/max, but the engine only
consults them AFTER the file is opened — listing, opening and footer-
reading a million files to discard 99% of them is the dominant cost of
a selective probe on a 100 TB table.  Table formats (Delta, Iceberg)
solve this with write-time file statistics in the commit log; this
module re-expresses that idea for plain parquet dirs: one small
manifest (itself parquet, in an underscore-prefixed subdir the readers
ignore) mapping ``file -> (n_rows, min_c, max_c, ...)`` for the chosen
columns, written right after the data, consulted BEFORE any data file
is touched.

It composes with z-ordering (``operators/zorder.py``): the z-ordered
write makes every participating column's per-file ranges TIGHT, and
the manifest lifts those ranges out of the footers so pruning happens
at planning time.  ``tests/test_stats_manifest.py`` asserts a
selective probe on a z-ordered table reads strictly fewer files
(``DataFrame.inputFiles()``) with oracle-equal results.

Scale shape: the stats pass is ONE distributed column-pruned scan
grouped by ``input_file_name()`` (no wide shuffle — |files| groups);
the manifest is |files| rows of scalars, read back as a normal
(partition-prunable) parquet.  The matching-file list does collect to
the driver — the same driver-side planning cost every table format
pays (Delta log replay, Iceberg manifest scan), bounded by file count,
not data size.

Safety: pruning is only sound if the manifest matches the directory's
CURRENT file set, so reads verify the listing against the manifest and
fail loudly on drift (a file appended without refreshing stats would
otherwise be silently skipped).  NULL semantics: min/max ignore NULLs,
and range predicates never match NULLs, so skipping a file whose
stats-column is all-NULL (NULL min/max) is exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MANIFEST_DIR = "_stats_manifest"


def _manifest_path(path: str) -> str:
    return path.rstrip("/") + "/" + _MANIFEST_DIR


def _norm(uri: str) -> str:
    """Normalize a file URI for set comparison: ``input_file_name()``
    and ``DataFrame.inputFiles()`` render the same local file as
    ``file:///x`` vs ``file:/x``."""
    if uri.startswith("file:"):
        return "file:///" + uri[5:].lstrip("/")
    return uri


def write_stats_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> int:
    """Record per-file (n_rows, min/max per stats column) for every
    parquet file under ``path``.  Returns the file count.  Call right
    after the data write (``write_zordered`` and ``publish_versioned``
    do this when given ``stats_cols``); re-call after any append or
    compaction — readers verify freshness."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    stats = (
        df.select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )
    stats.coalesce(1).write.mode("overwrite").parquet(_manifest_path(path))
    return spark.read.parquet(_manifest_path(path)).count()


def refresh_stats_manifest(
    spark: SparkSession, path: str, cols: list[str]
) -> tuple[int, int]:
    """INCREMENTAL manifest refresh: stat only the files the manifest
    doesn't know yet, drop rows for files that vanished (compaction,
    vacuum), keep everything else untouched — O(appended data), not
    O(table), which is the difference between a manifest you refresh
    every micro-batch and one you can only afford nightly at 100 TB.
    Returns (files_added, files_removed).  Falls back to a full
    :func:`write_stats_manifest` when no manifest exists yet.

    The stats columns must match the existing manifest's (they're its
    schema); a mismatch raises rather than silently producing rows
    other readers can't prune on."""
    full = spark.read.parquet(path)
    current = {_norm(f) for f in full.inputFiles()}
    mpath = _manifest_path(path)
    try:
        old = spark.read.parquet(mpath)
    except Exception:
        n = write_stats_manifest(spark, path, cols)
        return n, 0
    want_cols = {"file", "n_rows"} | {
        f"{m}_{c}" for c in cols for m in ("min", "max")
    }
    if set(old.columns) != want_cols:
        raise ValueError(
            f"stats manifest at {mpath} covers columns "
            f"{sorted(set(old.columns) - {'file', 'n_rows'})}; "
            f"refresh asked for {cols}. Rebuild with "
            "write_stats_manifest to change the stats column set."
        )
    old_rows = old.collect()
    recorded = {_norm(r["file"]) for r in old_rows}
    new_files = sorted(current - recorded)
    removed = recorded - current
    if not new_files and not removed:
        return 0, 0
    keep = [r for r in old_rows if _norm(r["file"]) in current]
    parts = []
    if keep:
        parts.append(spark.createDataFrame(keep, old.schema))
    if new_files:
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        fresh = (
            spark.read.schema(full.schema)
            .parquet(*new_files)
            .select(F.input_file_name().alias("file"), *cols)
            .groupBy("file")
            .agg(*aggs)
        )
        parts.append(fresh.select(*old.columns))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # rewrite via a sibling swap dir: "overwrite" into the live path
    # would delete-then-write, leaving a reader-visible gap
    import uuid as _uuid

    tmp = mpath + f"__swap-{_uuid.uuid4().hex[:8]}"
    out.coalesce(1).write.mode("overwrite").parquet(tmp)
    jvm = spark._jvm  # noqa: SLF001
    jfs = jvm.org.apache.hadoop.fs.Path(mpath).getFileSystem(
        spark._jsc.hadoopConfiguration()  # noqa: SLF001
    )
    jfs.delete(jvm.org.apache.hadoop.fs.Path(mpath), True)
    jfs.rename(
        jvm.org.apache.hadoop.fs.Path(tmp),
        jvm.org.apache.hadoop.fs.Path(mpath),
    )
    return len(new_files), len(removed)


def _check_fresh(manifest_files: set[str], current: set[str], path: str):
    if manifest_files != current:
        missing = sorted(current - manifest_files)[:3]
        extra = sorted(manifest_files - current)[:3]
        raise ValueError(
            f"stats manifest for {path} is stale: "
            f"{len(current - manifest_files)} data files have no stats "
            f"(e.g. {missing}), {len(manifest_files - current)} stats "
            f"rows point at absent files (e.g. {extra}). Re-run "
            "write_stats_manifest after appends/compactions — pruning "
            "against stale stats would silently drop rows."
        )


def pruned_scan(
    spark: SparkSession,
    path: str,
    bounds: dict[str, tuple],
) -> DataFrame:
    """Scan ``path`` reading ONLY files whose recorded [min, max]
    intervals overlap every bound — then apply the same bounds as row
    filters, so the result equals the full scan + filter exactly.

    ``bounds`` maps column -> (lo, hi) inclusive; either end may be
    None (half-open), but not both — an unbounded bound adds no row
    predicate yet would still skip all-NULL-stats files, silently
    dropping their rows.  Files with NULL stats for a bounded column
    are skipped (all-NULL column: no row can match a range predicate).
    """
    for c, (lo, hi) in bounds.items():
        if lo is None and hi is None:
            raise ValueError(
                f"bound for {c!r} is (None, None): an unbounded bound "
                "prunes nothing but would drop all-NULL-stats files — "
                "omit the column instead"
            )
    man = spark.read.parquet(_manifest_path(path)).collect()
    full = spark.read.parquet(path)
    current = {_norm(f) for f in full.inputFiles()}
    _check_fresh({_norm(r["file"]) for r in man}, current, path)

    def overlaps(r) -> bool:
        for c, (lo, hi) in bounds.items():
            mn, mx = r[f"min_{c}"], r[f"max_{c}"]
            if mn is None or mx is None:
                return False
            if lo is not None and mx < lo:
                return False
            if hi is not None and mn > hi:
                return False
        return True

    files = [r["file"] for r in man if overlaps(r)]
    if files:
        # pin the schema so an empty/partial file subset cannot
        # re-infer a narrower one
        df = spark.read.schema(full.schema).parquet(*files)
    else:
        df = spark.createDataFrame([], full.schema)
    for c, (lo, hi) in bounds.items():
        if lo is not None:
            df = df.filter(F.col(c) >= F.lit(lo))
        if hi is not None:
            df = df.filter(F.col(c) <= F.lit(hi))
    return df


def manifest_file_count(
    spark: SparkSession, path: str, bounds: dict[str, tuple] | None = None
) -> int:
    """How many files a ``bounds`` probe would read (None = all files
    with stats) — the planning-time metric the pruning test asserts
    on, without touching any data file."""
    man = spark.read.parquet(_manifest_path(path))
    if not bounds:
        return man.count()
    for c, (lo, hi) in bounds.items():
        if lo is None and hi is None:
            raise ValueError(
                f"bound for {c!r} is (None, None) — omit the column"
            )
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & F.col(f"min_{c}").isNotNull()
        if lo is not None:
            cond = cond & (F.col(f"max_{c}") >= F.lit(lo))
        if hi is not None:
            cond = cond & (F.col(f"min_{c}") <= F.lit(hi))
    return man.filter(cond).count()
