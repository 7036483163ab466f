"""Time-based rolling-window aggregates (RANGE frames).

The reference computes its "recent window" statistics by filtering a
pandas frame per anchor date (one scan per window).  The Spark-native
form is a single RANGE-frame window over event time: every row gets
the aggregate of its trailing N seconds in one shuffle + one sort —
no per-anchor rescans, no self-join.

Scale notes (100 TB):
- One Exchange on the partition key, one sort per partition; the frame
  is evaluated with a sliding two-pointer over the sorted run, so cost
  is O(rows) per partition regardless of window length.
- RANGE frames treat equal-timestamp rows as peers (they all see the
  same frame), which makes the result deterministic under ties — no
  ROWS-frame order ambiguity.
- For exact cross-engine sums the value is cast to DECIMAL before the
  window sum (fold order inside a frame is engine-defined; decimal
  addition is associative so order stops mattering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rolling_range_agg(
    df: DataFrame,
    key: str | list[str],
    ts_col: str,
    value_col: str,
    window_seconds: int,
    decimal_type: str = "decimal(28,6)",
    sum_col: str = "rolling_sum",
    cnt_col: str = "rolling_cnt",
) -> DataFrame:
    """Append trailing-window SUM and COUNT columns per row.

    The frame is ``[ts - window_seconds, ts]`` (inclusive both ends,
    RANGE semantics on epoch seconds).  The sum is exact decimal
    arithmetic cast back to double.
    """
    keys = [key] if isinstance(key, str) else list(key)
    epoch = F.unix_timestamp(F.col(ts_col))
    w = (
        Window.partitionBy(*keys)
        .orderBy(epoch)
        .rangeBetween(-window_seconds, 0)
    )
    dec = F.col(value_col).cast(decimal_type)
    # one select, not chained withColumns: both window functions then
    # land in a SINGLE Window node (chaining planned two Window+Sort
    # passes over the same partitioning)
    return df.select(
        "*",
        F.sum(dec).over(w).cast("double").alias(sum_col),
        F.count(F.lit(1)).over(w).cast("long").alias(cnt_col),
    )
