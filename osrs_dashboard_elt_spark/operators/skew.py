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


def ensure_min_partitions(
    df: DataFrame, target: int | None = None, max_bytes: int | None = None
) -> DataFrame:
    """Parallelism floor for CPU-bound stages.

    A small-at-rest input (one parquet file with one row group, a tiny
    dimension) arrives as a single scan split, so a regex parse /
    shingle explode / embedding fold downstream runs on ONE core
    regardless of cluster size — partition count is set by input
    BYTES, but these stages are bounded by per-row CPU.  When the
    OPTIMIZER's size estimate says the input is below one scan split
    (``spark.sql.files.maxPartitionBytes``, or ``max_bytes``),
    round-robin repartition to ``target`` (default
    ``defaultParallelism``); otherwise no-op — a big input already
    arrives as many splits, and reshuffling it to chase parallelism
    would be a full-data shuffle (the 100-TB anti-pattern).

    The decision reads ``optimizedPlan().stats().sizeInBytes`` — pure
    planner metadata.  It deliberately does NOT consult
    ``df.rdd.getNumPartitions()``: converting to an RDD under AQE
    materializes every upstream query stage eagerly, so a floor on a
    post-join input would silently EXECUTE THE QUERY TWICE (measured:
    2-3x wall on affected suite queries).

    OPT-IN ONLY.  Even the cheap probe + repartition is a net loss for
    stages whose per-row cost is small (JVM regex, array folds, header
    decodes): the shuffle of the raw rows costs more than the single-
    core compute it parallelizes (measured at sf0.1: q_parse_engine
    1.46s -> 6.24s, media features 0.55s -> 2.9s with the floor
    applied).  It pays only for genuinely heavy per-row Python — a
    real image/audio codec at 10ms+/row — which is why no built-in
    operator applies it by default; ``extract_media_features`` /
    ``resize_images`` expose it as ``min_parallelism``.

    Cost when it fires: one shuffle of <= one split's worth of rows.
    Streaming inputs pass through (foreachBatch batches are already
    distributed).
    """
    if df.isStreaming:
        return df
    sess = df.sparkSession
    t = target or sess.sparkContext.defaultParallelism
    if max_bytes is None:
        max_bytes = int(
            sess._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
        )
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        size = int(raw if isinstance(raw, int) else raw.toString())
    except Exception:
        return df
    if size <= max_bytes:
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
