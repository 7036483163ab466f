"""Document chunking for training-data pipelines.

Long documents must be split into bounded token windows before
sequence packing/tokenization — the standard pretraining shape:
fixed-size windows with overlap (the overlap preserves cross-boundary
context).  No reference analog (SURVEY §6 LLM-pipeline extension).

Scale shape: chunking is a per-row generate — tokenize once per
document (one ``split``), derive the window start offsets with
``sequence`` (stride = chunk - overlap), explode the offsets, and
slice the token array per window.  No shuffle at all: output
parallelism is input parallelism, and the explode multiplies rows by
``ceil(n_tokens / stride)`` locally.  Window arithmetic is integer ->
engine-exact, and chunk text is a deterministic join of the original
whitespace tokens, so an external SQL oracle reproduces results
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between
    consecutive windows.

    Emission rule: window starts are ``0, stride, 2*stride, ...``
    (stride = chunk_tokens - overlap) while ``start < n_tokens``,
    except a trailing window that contains NO tokens beyond the
    previous window's end (``n_tokens <= start + overlap``) — such a
    window is a strict suffix of its predecessor and is dropped.
    ``overlap`` is capped at ``chunk_tokens // 2`` so only the final
    window can ever be degenerate, keeping chunk indexes contiguous.
    Empty/whitespace documents emit nothing.

    Returns (id, chunk_idx, chunk_text, n_tokens) with 0-based
    ``chunk_idx`` in document order; chunk text re-joins the original
    tokens with single spaces.
    """
    if overlap * 2 > chunk_tokens:
        raise ValueError("overlap must be at most chunk_tokens // 2")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.regexp_replace(F.trim(F.col(text_col)), r"\s+", " "), " "),
        lambda t: t != F.lit(""),
    )
    base = (
        df.select(F.col(id_col).alias("id"), toks.alias("__toks"))
        .withColumn("__n", F.size("__toks"))
        .filter(F.col("__n") > 0)
    )
    starts = F.sequence(
        F.lit(0),
        # sequence bounds are inclusive: largest multiple of stride < n
        ((F.col("__n") - 1) / stride).cast("int") * stride,
        F.lit(stride),
    )
    exploded = base.select(
        "id", "__toks", "__n", F.posexplode(starts).alias("chunk_idx", "__start")
    ).filter(
        # drop a trailing window that is a strict suffix of its
        # predecessor (adds no token past prev_start + chunk)
        (F.col("chunk_idx") == 0) | (F.col("__n") > F.col("__start") + overlap)
    )
    piece = F.slice(F.col("__toks"), F.col("__start") + 1, chunk_tokens)
    return exploded.select(
        "id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(piece, " ").alias("chunk_text"),
        F.size(piece).cast("long").alias("n_tokens"),
    )
