"""Parquet-backed source/sink primitives (SURVEY.md §2.1).

The reference's storage layer is SQLite files with hand-rolled
idempotency and publish tricks; each maps to a declarative parquet
pattern here:

- S4/S11 ``INSERT OR IGNORE`` row loops  -> ``dedup_append``
  (left-anti join on the natural key, then append) — the idempotent
  ingest primitive.  At scale the anti-join shuffles only the key
  columns of the existing side; with date-partitioned targets the scan
  prunes to the overlap window first.
- S2/S9 watermark scans                  -> ``max_watermark`` /
  ``per_key_watermark`` + ``read_new_since``.
- S10/S12 replace-mode + blue/green      -> ``publish_overwrite``
  (parquet dir overwrite is already atomic-enough for a single
  writer; a Delta/Iceberg table commit is the real-cluster answer and
  slots in here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _target_exists(spark: SparkSession, path: str) -> bool:
    try:
        spark.read.parquet(path).schema
        return True
    except Exception:
        return False


def dedup_append(
    spark: SparkSession,
    batch: DataFrame,
    target_path: str,
    keys: list[str],
) -> int:
    """Idempotently append ``batch`` to ``target_path``: rows whose
    ``keys`` already exist are dropped (reference S4: per-row INSERT OR
    IGNORE against a UNIQUE constraint).  Returns rows appended.

    Re-running with an overlapping batch is a no-op — the property the
    reference's overlap-window re-fetch relies on (T2).
    """
    batch = batch.dropDuplicates(keys)
    if _target_exists(spark, target_path):
        existing = spark.read.parquet(target_path).select(*keys)
        batch = batch.join(existing, keys, "left_anti")
    # Materialize the anti-join BEFORE opening the writer: the write
    # must not re-scan the target while appending to it.
    rows = batch.cache().count()
    if rows:
        batch.write.mode("append").parquet(target_path)
    batch.unpersist()
    return rows


def max_watermark(spark: SparkSession, path: str, ts_col: str):
    """MAX(ts) of an existing table, or None (reference S2:
    incremental scan start = stored max minus overlap)."""
    if not _target_exists(spark, path):
        return None
    row = spark.read.parquet(path).agg(F.max(ts_col).alias("wm")).collect()[0]
    return row["wm"]


def per_key_watermark(df: DataFrame, key_cols: list[str], ts_col: str) -> DataFrame:
    """Per-key MAX(ts) (reference S9: only insert price rows newer than
    the per-item max) — one hash aggregate, joined back by the caller."""
    return df.groupBy(*key_cols).agg(F.max(ts_col).alias("__wm"))


def read_new_since(
    spark: SparkSession, path: str, ts_col: str, watermark
) -> DataFrame:
    """Scan rows strictly newer than the watermark; the predicate is
    pushed into the parquet scan (partition pruning if partitioned on
    a ts-derived column)."""
    df = spark.read.parquet(path)
    if watermark is None:
        return df
    return df.filter(F.col(ts_col) > F.lit(watermark))


def publish_overwrite(df: DataFrame, target_path: str) -> None:
    """Replace-mode publish of a gold table (reference S10's
    ``if_exists='replace'`` + S12's blue/green double buffer; Spark's
    overwrite gives the atomic swap for free on a real table format)."""
    df.write.mode("overwrite").parquet(target_path)
