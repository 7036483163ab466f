"""Top-N per group (reference src/3_transform_data.py:758-760: sort desc
by timestamp then ``groupby(type).head(limit)``).

Spark-first: one window ``row_number`` — a single shuffle on the group
key, no global sort.  At 100 TB the global-sort variant would be a full
range-partitioned sort; the window variant only sorts within each
group's partition, and AQE handles group-count skew.

``top_n_per_group_pruned`` is the huge-group scale path: the window
form's Exchange carries EVERY row of every group, but only n per group
can survive — so when groups are large (top-3 of millions of rows per
key), first prune each INPUT partition to n rows per (partition,
group) with a sortWithinPartitions + one streaming Arrow pass (no
shuffle, no state beyond the current group's counter), then run the
exact window over the survivors.  The shuffle then carries at most
``n x input_partitions`` rows per group instead of the group's full
cardinality — the same partial/final split Spark applies to ordinary
aggregates, hand-built because Catalyst has no bounded partial
top-N.  Equality with the window form is pinned in
tests/test_topn_pruned.py.
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


def _local_prune(df: DataFrame, group_cols: list[str], n: int) -> DataFrame:
    """Keep the first ``n`` rows of each group WITHIN each input
    partition — rows must already be locally sorted (group columns
    first).  One streaming Arrow pass: groups are contiguous after the
    local sort, so the only state is the current group key and its
    running count, carried across Arrow batches of the partition."""
    cols = [f.name for f in df.schema.fields]

    def prune(batches):
        cur: tuple | None = None
        count = 0
        for pdf in batches:
            if pdf.empty:
                continue
            keys = list(zip(*(pdf[c] for c in group_cols)))
            keep = []
            for i, k in enumerate(keys):
                if k != cur:
                    cur, count = k, 0
                count += 1
                if count <= n:
                    keep.append(i)
            yield pdf.iloc[keep][cols]

    return df.mapInPandas(prune, schema=df.schema)


def top_n_per_group_pruned(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact top-N per group for HUGE groups: local
    sortWithinPartitions + per-partition prune to n rows per
    (partition, group), then the exact window over the survivors.
    Identical results to :func:`top_n_per_group` (same total-order
    requirement on ``order_cols``); the Exchange moves at most
    ``n x input_partitions`` rows per group."""
    local = df.sortWithinPartitions(*group_cols, *order_cols)
    pruned = _local_prune(local, group_cols, n)
    return top_n_per_group(pruned, group_cols, order_cols, n, rank_col)
