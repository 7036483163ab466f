"""Top-N per group (reference src/3_transform_data.py:758-760: sort desc
by timestamp then ``groupby(type).head(limit)``).

Spark-first: one window ``row_number`` — a single shuffle on the group
key, no global sort.  At 100 TB the global-sort variant would be a full
range-partitioned sort; the window variant only sorts within each
group's partition, and AQE handles group-count skew.

Huge-group scale path: the naive window plan's Exchange would carry
EVERY row of every group even though only n per group can survive.
Spark >= 3.5 solves this inside the engine: a literal filter on a
rank-like window function triggers the ``WindowGroupLimit`` rule
(SPARK-37099), which inserts a *Partial* group-limit operator BEFORE
the Exchange — each input partition forwards at most n rows per group,
all in codegen.  ``tests/test_topn_pruned.py`` pins that plan shape.

``top_n_per_group_pruned`` therefore DELEGATES to the window form on
this engine, and keeps a hand-built equivalent (``manual=True``:
sortWithinPartitions + one vectorized Arrow prune pass + exact window
over survivors) for engines without the rule.  Measured at 4 groups x
10M rows (SCALE.md round 7): the engine's codegen partial prune beats
even the fully vectorized Arrow prune ~2x — the Python round trip of
the full input is pure overhead when the JVM already bounds the
shuffle — which is why delegation, not the manual pass, is the
default.
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
    rank is kept as a column.  The literal ``<= n`` filter on
    ``row_number`` is what lets Spark >= 3.5 plan a Partial
    ``WindowGroupLimit`` before the Exchange (bounded shuffle for huge
    groups) — keep that shape.
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    rn = F.row_number().over(w)
    name = rank_col or "__rn"
    out = df.withColumn(name, rn).filter(F.col(name) <= n)
    return out if rank_col else out.drop(name)


def _key_eq(a: tuple, b: tuple) -> bool:
    """NaN-aware tuple equality for the cross-batch boundary key (a
    group of NaN keys split across Arrow batches must not reset the
    count — plain ``!=`` treats NaN as unequal to itself)."""
    import pandas as pd

    return len(a) == len(b) and all(
        x == y or (pd.isna(x) is True and pd.isna(y) is True)
        for x, y in zip(a, b)
    )


def _local_prune(df: DataFrame, group_cols: list[str], n: int) -> DataFrame:
    """Keep the first ``n`` rows of each group WITHIN each input
    partition — rows must already be locally sorted (group columns
    first).  One streaming Arrow pass, fully vectorized: per batch a
    ``groupby(sort=False).cumcount()`` mask (C-speed, no per-row Python
    — this pass touches EVERY input row, so interpreter-per-row would
    dominate exactly the huge-group case the operator exists for); the
    only cross-batch state is the boundary group's key and running
    count, applied as a rank offset to the batch's first group."""
    cols = [f.name for f in df.schema.fields]

    def prune(batches):
        cur: tuple | None = None
        count = 0
        for pdf in batches:
            if pdf.empty:
                continue
            gb = pdf.groupby(group_cols, sort=False, dropna=False)
            rank = gb.cumcount()
            first_key = tuple(pdf[c].iloc[0] for c in group_cols)
            if cur is not None and _key_eq(first_key, cur):
                # the batch's first-appearing group (ngroup 0) continues
                # the previous batch's boundary group: offset its ranks
                rank = rank + (gb.ngroup() == 0) * count
            count = int(rank.iloc[-1]) + 1
            cur = tuple(pdf[c].iloc[-1] for c in group_cols)
            yield pdf.loc[(rank < n).to_numpy(), cols]

    return df.mapInPandas(prune, schema=df.schema)


def _engine_has_window_group_limit(df: DataFrame, n: int) -> bool:
    """Spark >= 3.5 plans a Partial WindowGroupLimit before the
    Exchange for literal rank filters (SPARK-37099) — but the rule is
    governed by ``spark.sql.optimizer.windowGroupLimitThreshold``
    (disabled at -1, skipped when the limit exceeds it), so a session
    with that conf changed must fall back to the manual prune or the
    bounded-shuffle property this module promises silently
    evaporates while results stay correct."""
    spark = df.sparkSession
    ver = spark.version.split(".")[:2]
    try:
        if (int(ver[0]), int(ver[1])) < (3, 5):
            return False
    except (ValueError, IndexError):
        return False
    try:
        thresh = int(
            spark.conf.get(
                "spark.sql.optimizer.windowGroupLimitThreshold",
                str(2**31 - 1),
            )
        )
    except ValueError:
        return False
    return 0 <= n <= thresh


def top_n_per_group_pruned(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    n: int,
    rank_col: str | None = None,
    manual: bool = False,
) -> DataFrame:
    """Exact top-N per group for HUGE groups, bounded-shuffle.

    On Spark >= 3.5 this is the plain window form: the engine's
    ``WindowGroupLimit`` rule already prunes each input partition to n
    rows per group BEFORE the Exchange, in codegen — measured ~2x
    faster than the hand-built Arrow prune it replaces (SCALE.md
    round 7).  ``manual=True`` (or an older engine) uses the
    hand-built equivalent: local sortWithinPartitions + per-partition
    vectorized prune to n rows per (partition, group), then the exact
    window over the survivors.  Identical results either way (same
    total-order requirement on ``order_cols``)."""
    if not manual and _engine_has_window_group_limit(df, n):
        return top_n_per_group(df, group_cols, order_cols, n, rank_col)
    local = df.sortWithinPartitions(*group_cols, *order_cols)
    pruned = _local_prune(local, group_cols, n)
    return top_n_per_group(pruned, group_cols, order_cols, n, rank_col)
