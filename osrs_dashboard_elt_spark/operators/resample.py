"""Tumbling-window resample with empty-bucket gap fill.

Reference (src/3_transform_data.py:367-384): pandas
``.resample(freq).agg(...)`` per frequency in ['6h','D','W'], unioned
with a Frequency tag.  pandas emits EMPTY buckets (zero rows for gaps);
Spark's ``window()`` does not, and downstream cumulative sums depend on
the gap rows — so parity requires an explicit calendar spine
(``sequence`` + explode + left join), per SURVEY.md T1.

Scale notes: the spine is generated from a 1-row global min/max
aggregate (cheap), exploded executor-side (``sequence`` is a JVM
expression, not a driver loop), and the spine side of the join is tiny
(buckets x groups) -> broadcast.  The bucketed aggregation itself is a
single hash aggregate with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# freq -> (duration for window(), truncation unit if calendar-aligned)
_CALENDAR = {"1 day": "day", "1 week": "week", "1 month": "month"}


def bucket_col(ts: str, freq: str) -> Column:
    """Floor a timestamp to its tumbling bucket start.

    Calendar frequencies use date_trunc (week = ISO Monday start);
    sub-day frequencies use window() semantics (epoch-aligned floor).
    """
    if freq in _CALENDAR:
        return F.date_trunc(_CALENDAR[freq], F.col(ts))
    return F.window(F.col(ts), freq).start


def resample(
    df: DataFrame,
    ts: str,
    freq: str,
    aggs: dict[str, Column],
    group_cols: list[str] | None = None,
    gap_fill: bool = True,
    fill_value: int = 0,
    bucket_name: str = "bucket",
) -> DataFrame:
    """Aggregate into tumbling ``freq`` buckets of ``ts``.

    ``aggs``: output-name -> aggregate Column.  With ``gap_fill`` every
    bucket between the global min and max bucket exists for every group
    (cross join of the bucket spine with distinct groups), missing
    aggregates coalesced to ``fill_value`` — exact pandas ``resample``
    parity.
    """
    group_cols = group_cols or []
    b = bucket_col(ts, freq)
    agged = (
        df.withColumn(bucket_name, b)
        .groupBy(bucket_name, *group_cols)
        .agg(*[c.alias(name) for name, c in aggs.items()])
    )
    if not gap_fill:
        return agged

    step = F.expr(f"interval {freq}")
    spine = (
        df.select(b.alias(bucket_name))
        .agg(F.min(bucket_name).alias("lo"), F.max(bucket_name).alias("hi"))
        .select(F.explode(F.sequence("lo", "hi", step)).alias(bucket_name))
    )
    if group_cols:
        spine = spine.crossJoin(df.select(*group_cols).distinct())

    # Left join preserving the spine; the aggregated side (buckets x
    # groups, post-aggregation) is the small side and is broadcastable
    # in a left-outer join.
    joined = spine.join(F.broadcast(agged), [bucket_name, *group_cols], "left")
    filled = [
        F.coalesce(F.col(name), F.lit(fill_value)).alias(name) for name in aggs
    ]
    return joined.select(bucket_name, *group_cols, *filled)
