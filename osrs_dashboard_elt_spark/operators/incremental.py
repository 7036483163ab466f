"""Incremental aggregate maintenance: partial states that merge.

The reference recomputes its report tables from the full event log on
every run (pandas over everything).  At 100 TB the gold layer must be
MAINTAINED, not recomputed: each ingest batch folds into a persisted
per-key state table, and the expensive full-history scan never
happens again.  That works exactly when the aggregate is expressed as
a commutative-monoid state:

    count   -> add          sum (exact decimal) -> add
    min/max -> min/max      distinct            -> HLL registers, MAX

``agg_state`` computes the state for one batch; ``merge_states``
folds any number of states (a union + one hash aggregate — the same
shuffle shape as aggregating one batch); ``finalize`` derives the
presentation columns (avg = sum/count computed at READ time — never
stored, so merges stay exact).  The invariant tested in
``test_round3_ops.py`` and oracle-checked by ``q_incremental_agg``:

    finalize(merge(state(b1), ..., state(bk))) == aggregate(b1 ∪ ... ∪ bk)

bit-for-bit — decimal sums are associative, min/max/count trivially
so, and the HLL registers are MAX-merged (see operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import hll_rho

_STATE_COLS = ("n_rows", "sum_v", "min_v", "max_v")


def agg_state(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    decimal_type: str = "decimal(28,6)",
) -> DataFrame:
    """Mergeable per-key aggregate state for one batch."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    dec = F.col(value_col).cast(decimal_type)
    return df.groupBy(*ks).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(dec).alias("sum_v"),
        F.min(F.col(value_col)).alias("min_v"),
        F.max(F.col(value_col)).alias("max_v"),
    )


def merge_states(states: list[DataFrame], keys: str | list[str]) -> DataFrame:
    """Fold partial states: union + ONE hash aggregate.  Merging k
    batches costs the same shuffle as aggregating one — the point of
    keeping states instead of raw history."""
    if not states:
        raise ValueError("merge_states needs at least one state")
    ks = [keys] if isinstance(keys, str) else list(keys)
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*ks).agg(
        F.sum("n_rows").alias("n_rows"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame, keys: str | list[str]) -> DataFrame:
    """Presentation view of a state: derived columns computed at read
    time from the exact state (avg is never stored)."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    return state.select(
        *ks,
        F.col("n_rows"),
        F.col("sum_v").cast("double").alias("total"),
        (F.col("sum_v") / F.col("n_rows"))
        .cast("decimal(28,6)")
        .cast("double")
        .alias("avg_v"),
        "min_v",
        "max_v",
    )


def hll_state(
    df: DataFrame, keys: str | list[str], value_col: str, p: int = 9
) -> DataFrame:
    """Mergeable distinct-count state: (keys, bucket, M) HLL registers.
    Merge = union + MAX per (keys, bucket); estimate via
    ``sketches.hll_distinct``'s finalization over the merged rows."""
    ks = [keys] if isinstance(keys, str) else list(keys)
    bucket, rho = hll_rho(F.col(value_col).cast("string"), p)
    # NULLs excluded, matching COUNT(DISTINCT) and sketches.hll_distinct
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*ks, bucket, rho)
        .groupBy(*ks, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def merge_hll_states(
    states: list[DataFrame], keys: str | list[str]
) -> DataFrame:
    if not states:
        raise ValueError("merge_hll_states needs at least one state")
    ks = [keys] if isinstance(keys, str) else list(keys)
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    return unioned.groupBy(*ks, "bucket").agg(F.max("M").alias("M"))
