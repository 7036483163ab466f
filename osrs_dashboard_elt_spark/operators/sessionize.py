"""Gap-based sessionization and near-best banding.

Two session-flavored operators from the reference:

- Gap sessions (generalization of the reference's ingest cadence and
  the W6 grouping window): rows of a partition belong to one session
  while consecutive gaps stay <= ``gap``.  Implemented as the classic
  lag -> boundary-flag -> running-sum window chain: one shuffle on the
  partition keys, linear per-partition scan, no state beyond the window
  frame — the batch analog of Structured Streaming's session_window.

- Near-best band (reference src/3_transform_data.py:662-710): per Task
  keep records within ``threshold`` of the group min, then the first
  record's timestamp + ``grouping_window`` defines the co-holder
  session; used by the personal-bests report.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    ts: str,
    partition_cols: list[str],
    gap_seconds: float,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign 1-based session ids per partition; a new session starts
    when the gap since the previous row exceeds ``gap_seconds``."""
    w = Window.partitionBy(*partition_cols).orderBy(F.col(ts).asc())
    prev = F.lag(F.col(ts)).over(w)
    # cast through TIMESTAMP first: direct TIMESTAMP_NTZ -> DOUBLE is
    # illegal, and the tz interpretation cancels in the difference
    gap = F.col(ts).cast("timestamp").cast("double") - prev.cast("timestamp").cast(
        "double"
    )
    is_new = F.when(prev.isNull() | (gap > gap_seconds), 1).otherwise(0)
    run = Window.partitionBy(*partition_cols).orderBy(F.col(ts).asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(session_col, F.sum(is_new).over(run))


def near_best_band(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    threshold: float,
    best_col: str = "best_value",
) -> DataFrame:
    """Keep rows with ``abs(value - group_min) <= threshold``; the group
    min is kept as ``best_col``.  Nulls are dropped (the reference uses
    an inf sentinel for invalid durations; we use null + explicit
    filtering)."""
    w = Window.partitionBy(*group_cols)
    out = df.filter(F.col(value_col).isNotNull()).withColumn(
        best_col, F.min(value_col).over(w)
    )
    return out.filter(
        F.abs(F.col(value_col) - F.col(best_col)) <= F.lit(threshold)
    )
