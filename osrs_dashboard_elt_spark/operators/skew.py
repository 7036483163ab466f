"""Skew mitigation: salted joins and two-phase salted aggregation.

The reference never shuffles (single-process pandas), but at 100 TB a
hot key — one username generating half the broadcasts, one stop-shingle
in a posting list — lands an entire join/agg partition on one executor.
AQE's skew-join splitting (on in ``session.py``) handles moderate skew
at runtime; these operators are the explicit fallback for EXTREME skew
or for when the skewed side feeds an aggregation AQE can't split.

- ``salted_join``: the big side appends a deterministic salt derived
  from a caller-chosen spread column (NOT random — results must be
  reproducible); the small side is replicated once per salt via
  ``explode``.  The join key becomes (keys..., salt), so a hot key's
  rows spread across ``n_salts`` reducers.  Output rows are identical
  to the unsalted join.
- ``salted_agg``: two-phase aggregation — partial aggregate on
  (keys..., salt), final aggregate on keys.  Caller supplies the
  partial and final aggregate pairs (sum/sum, count/sum, min/min, ...).

Cost model: salting multiplies the small side by ``n_salts`` (keep it
broadcast-sized) and adds one extra partial-agg stage; only reach for
it when one key's share of rows >> 1/parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def ensure_min_partitions(df: DataFrame, target: int | None = None) -> DataFrame:
    """Parallelism floor for CPU-bound stages.

    A small-at-rest input (one parquet file, a broadcast table) arrives
    as 1-2 scan splits, so a regex parse / shingle explode / embedding
    fold downstream runs on ONE core regardless of cluster size —
    partition count is set by input BYTES, but these stages are bounded
    by per-row CPU.  Round-robin repartition to ``target`` (default
    ``sparkContext.defaultParallelism``) when the input has fewer
    partitions; no-op when the scan is already split (the 100-TB case —
    a real corpus arrives as thousands of splits) or the input is a
    streaming DataFrame (foreachBatch batches are already distributed;
    ``.rdd`` is not available on unbounded plans).

    Cost when it fires: one shuffle of the input rows — by design only
    taken when the input is small.
    """
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    t = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < t:
        return df.repartition(t)
    return df


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    spread_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where the big side's hot keys are spread across
    ``n_salts`` sub-partitions.  ``spread_col`` must be a column on the
    big side with high cardinality within a key group (an event id, a
    timestamp) — its hash picks the salt deterministically.

    Only ``inner`` and ``left`` are supported: with ``right``/``full``
    an unmatched small-side row would surface once per salt replica,
    and ``left_semi``/``left_anti`` would probe only one replica —
    all would silently diverge from the unsalted join.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r}: other "
            "join types are not equivalent to the unsalted join under "
            "small-side replication"
        )
    salted_big = big.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts)).cast("int")
    )
    salted_small = small.withColumn(
        _SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [*keys, _SALT], how).drop(_SALT)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    spread_col: str,
    partial_aggs: dict[str, Column],
    final_aggs: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``partial_aggs``: name -> aggregate over the raw rows, computed per
    (keys..., salt).  ``final_aggs``: name -> aggregate over the
    partial columns (referenced BY NAME), computed per keys.  E.g.
    count: partial ``count(1) as c`` then final ``sum(c) as c``.
    """
    salted = df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salts)).cast("int")
    )
    partial = salted.groupBy(*keys, _SALT).agg(
        *[c.alias(name) for name, c in partial_aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[c.alias(name) for name, c in final_aggs.items()]
    )
