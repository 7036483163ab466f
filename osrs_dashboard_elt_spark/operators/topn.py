"""Top-N per group (reference src/3_transform_data.py:758-760: sort desc
by timestamp then ``groupby(type).head(limit)``).

Spark-first: one window ``row_number`` — a single shuffle on the group
key, no global sort.  At 100 TB the global-sort variant would be a full
range-partitioned sort; the window variant only sorts within each
group's partition, and AQE handles group-count skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the first ``n`` rows of each group under ``order_cols``.

    ``order_cols`` should form a total order (add a tiebreaker column)
    for deterministic output.  If ``rank_col`` is given, the 1-based
    rank is kept as a column.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    rn = F.row_number().over(w)
    name = rank_col or "__rn"
    out = df.withColumn(name, rn).filter(F.col(name) <= n)
    return out if rank_col else out.drop(name)
