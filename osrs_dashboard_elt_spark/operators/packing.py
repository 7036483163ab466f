"""Sequence packing for training-data pipelines.

After :mod:`chunking` produces bounded token windows, pretraining
concatenates them in a deterministic order and cuts the stream into
fixed-length training sequences.  This operator assigns each chunk to
its sequence: ``seq_id = floor(tokens_before / seq_len)`` under a
per-shard running token count — "streaming concat" packing, where a
chunk belongs to the sequence in which its FIRST token lands.  Chunks
are never split; a sequence may therefore overflow ``seq_len`` by at
most one chunk, the standard cheap approximation of bin packing.

Scale shape: the running sum is a window ORDERED within a SHARD
(``shard_col`` — language, source, or a hash bucket).  Global total
order would funnel everything through one reducer; per-shard order is
exactly how a real corpus is packed (shards are the unit of training
shuffle anyway, cf. ``operators.sampling.global_shuffle_order``).
One shuffle on the shard key; integer arithmetic end to end, so an
external SQL oracle reproduces the assignment bit-for-bit.

No reference analog (SURVEY §6 LLM-pipeline extension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_chunks(
    df: DataFrame,
    shard_col: str,
    order_cols: list[str],
    token_col: str,
    seq_len: int,
) -> DataFrame:
    """Assign each chunk to its training sequence within its shard.

    Returns the input columns plus ``seq_id`` (0-based per shard) and
    ``seq_offset`` (the chunk's first-token offset within the packed
    shard stream).  Deterministic given ``order_cols`` totally order
    each shard's chunks.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(*[F.col(c).asc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(F.col(token_col)).over(w), F.lit(0))
    return df.select(
        "*",
        before.alias("seq_offset"),
        F.floor(before / seq_len).cast("long").alias("seq_id"),
    )


def pack_summary(
    packed: DataFrame, shard_col: str, token_col: str
) -> DataFrame:
    """Per-(shard, sequence) rollup: chunk count, token count, and the
    overflow beyond the nominal boundary (0 for all but the last chunk
    spill) — the packing-efficiency report."""
    return packed.groupBy(shard_col, "seq_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(F.col(token_col)).cast("long").alias("n_tokens"),
    )
