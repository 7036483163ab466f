"""Eval-set decontamination for training corpora.

The standard LLM-pipeline hygiene step (the GPT-3/PaLM recipe):
remove any training document that shares at least ``min_hits``
distinct word n-grams with an evaluation/benchmark set, so reported
eval numbers aren't inflated by memorized test data.

Scale shape — the eval side is SMALL (benchmarks are thousands of
docs, the train side is the 100 TB one), so the plan must be:

1. eval -> distinct shingle HASHES (one tiny aggregate; 32-bit ints,
   not strings, so the broadcast ships ~4 bytes per shingle);
2. train -> staged shingle explode (``with_shingles`` — scan-side,
   no shuffle) -> **broadcast** join against (1): only contaminated
   (id, shingle) rows survive the probe;
3. count distinct hits per train doc — the only shuffle, and it
   carries just the matches (normally a vanishing fraction of train);
4. callers either drop flagged ids (``decontaminate``: left_anti,
   which broadcasts the flagged-id list when small) or keep the
   report for auditing (``contamination_report``).

The train side is never shuffled in bulk and never leaves the JVM.
Hash collisions (32-bit) can only OVER-flag at a rate of
|eval shingles| / 2^32 per train shingle — the conservative
direction for decontamination.

No reference analog (the reference corpus is chat logs); part of the
SURVEY §6 LLM-pipeline extension alongside ``operators/dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import token_hash32, with_shingles


def eval_shingle_hashes(
    eval_df: DataFrame,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Distinct 32-bit hashes of the eval set's word n-grams:
    one column ``shingle_hash``.  Small by construction — cache or
    broadcast it."""
    sh = with_shingles(eval_df, eval_df.columns[0], text_col, n, out="toks")
    return (
        sh.select(F.explode("toks").alias("s"))
        .select(token_hash32(F.col("s")).alias("shingle_hash"))
        .distinct()
    )


def contamination_report(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """(id, n_hits) for every train doc sharing >= ``min_hits``
    distinct n-grams with the eval set."""
    ev = eval_shingle_hashes(eval_df, text_col, n)
    tr = (
        with_shingles(train_df, id_col, text_col, n, out="toks")
        .select("id", F.explode("toks").alias("s"))
        .select("id", token_hash32(F.col("s")).alias("shingle_hash"))
    )
    hits = tr.join(F.broadcast(ev), "shingle_hash")
    return (
        hits.groupBy("id")
        .agg(F.count_distinct("shingle_hash").alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Train set minus contaminated docs (schema unchanged)."""
    flagged = contamination_report(
        train_df, eval_df, id_col, text_col, n, min_hits
    ).select(F.col("id").alias(id_col))
    return train_df.join(flagged, id_col, "left_anti")
