"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a fact-to-fact equi-join is the shuffle
of BOTH sides.  Hive-style bucketing removes it at write time: each
side is hash-partitioned into ``n`` buckets on the join keys when the
table is WRITTEN, so a later join/groupBy on those keys reads
bucket-aligned splits and Catalyst plans a SortMergeJoin with NO
Exchange on the bucketed side(s) (``test_bucketed.py`` asserts the
plan).  The price is paid once, at ingest — the natural place, since
the bronze append already scans every row.

Reference analog: none (SQLite has a single file), but this is the
at-scale answer to the reference's hottest access pattern — everything
keyed by ``Username``/``item_id`` (src/3_transform_data.py group-bys,
src/4_fetch_item_prices.py per-item watermarks).

Rules of engagement (enforced/documented here):

- Bucket count is part of the TABLE CONTRACT: two tables co-locate
  only with the same n_buckets and keys.  Pick n so one bucket of the
  biggest table fits an executor (~n = table_bytes / 256 MB), round
  to a power of two, and keep it stable across writes.
- ``sortBy`` the same keys: buckets arrive pre-sorted, so the
  SortMergeJoin also skips its per-task Sort.
- Spark's bucketed scan is enabled by default
  (``spark.sql.sources.bucketing.enabled``); one-sided bucketing
  still halves the shuffle (only the unbucketed side moves —
  autoBucketedScan may re-shuffle if partition counts diverge).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (and bucket-sorted) parquet table.

    ``path`` makes it an external table (data survives DROP TABLE);
    bucketing metadata lives in the session catalog either way —
    bucketed reads require the catalog, which is why this API takes a
    table name, not a bare path."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def is_bucketed_on(
    spark: SparkSession,
    table: str,
    keys: list[str],
    n_buckets: int | None = None,
) -> bool:
    """True if ``table``'s bucket spec covers exactly ``keys`` — and,
    when ``n_buckets`` is given, that bucket count.  The count is part
    of the co-location contract (see module docstring): two tables
    bucketed on the same keys but different counts still shuffle on
    join, so callers verifying a shuffle-free join should pass it."""
    rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
    info = {r.col_name: (r.data_type or "") for r in rows}
    cols = info.get("Bucket Columns", "")
    got = [c.strip(" `") for c in cols.strip("[]").split(",") if c.strip(" `")]
    if got != list(keys):
        return False
    if n_buckets is not None:
        try:
            declared = int(str(info.get("Num Buckets", "")).strip())
        except ValueError:
            return False
        if declared != n_buckets:
            return False
    return True
