"""Count-based n-gram language-model scoring: the CCNet-style
perplexity quality filter as two corpus aggregates and one join —
no external LM, no Python in the hot path.

Perplexity filtering (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2020) ranks documents by
how surprising they are under a language model trained on trusted
text; boilerplate, gibberish, and SEO spam score high.  The
count-based form is Spark-native: a bigram model IS two count tables
(context-word counts and context totals), Laplace smoothing is
integer arithmetic, and a document's score is one join of its grams
to the tables plus a per-doc reduction.

Determinism across engines (the oracle gate) needs care with SUM of
doubles — IEEE addition is order-dependent, and a shuffle reorders
terms.  The discipline here is the repo's exact-sum trick: each
per-gram log-probability is a double BOTH engines compute
bit-identically (integer-operand division, then ``ln`` — the same
libm trust the HLL small-range correction already relies on),
immediately cast to DECIMAL(28,12); decimal addition is exact and
order-independent, so the per-doc sum is reproducible under any
partitioning, and the single double division at the end is the only
further rounding (then the standard 6-decimal cast).

Scale shape:

- training = TWO hash aggregates over the exploded grams (map-side
  combined); the model tables are gram-vocabulary-bounded (Heaps
  law), never corpus-bounded;
- scoring = two equi-joins keyed on the gram (shuffle the grams,
  co-partition the counts — at 100 TB bucket the count tables by
  ``ctx`` once and reuse), then a decimal-sum groupBy per doc;
- the vocabulary size is ONE scalar (sanctioned broadcast).

Unseen grams (scoring a NEW document against a trained model) get
the Laplace floor ``alpha / (tot + alpha*V)`` with ``tot=0`` for an
unseen context — the left joins coalesce to zero counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# token array + adjacent-pair extraction shared with the BPE trainer's
# conventions: whitespace split, empties dropped, optional lowercase
_PAIRS = (
    "transform(slice(tk, 1, greatest(size(tk) - 1, 0)), (x, i) -> "
    "struct(x AS ctx, element_at(tk, i + 2) AS w))"
)


def _with_tokens(df: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    text = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return df.withColumn(
        "tk", F.filter(F.split(text, r"\s+"), lambda t: t != "")
    )


def _grams(df: DataFrame, id_col: str, text_col: str, lowercase: bool):
    return (
        _with_tokens(df, text_col, lowercase)
        .select(F.col(id_col), F.explode(F.expr(_PAIRS)).alias("g"))
        .select(id_col, F.col("g.ctx").alias("ctx"), F.col("g.w").alias("w"))
    )


def bigram_model(
    df: DataFrame, text_col: str, lowercase: bool = True
) -> tuple[DataFrame, DataFrame, int]:
    """Train the count model: returns (cw, ct, vocab_size) with
    ``cw = (ctx, w, c)``, ``ct = (ctx, tot)`` — two aggregates over
    one gram explosion; ``vocab_size`` is the distinct-token count
    (the Laplace denominator's V)."""
    toks = _with_tokens(df, text_col, lowercase)
    grams = toks.select(F.explode(F.expr(_PAIRS)).alias("g")).select(
        F.col("g.ctx").alias("ctx"), F.col("g.w").alias("w")
    )
    cw = grams.groupBy("ctx", "w").agg(F.count(F.lit(1)).alias("c"))
    ct = grams.groupBy("ctx").agg(F.count(F.lit(1)).alias("tot"))
    vocab_size = (
        toks.select(F.explode("tk").alias("t")).select("t").distinct().count()
    )
    return cw, ct, int(vocab_size)


def lm_avg_nll(
    df: DataFrame,
    id_col: str,
    text_col: str,
    cw: DataFrame,
    ct: DataFrame,
    vocab_size: int,
    lowercase: bool = True,
) -> DataFrame:
    """(id, n_bigrams, avg_nll): average negative log-probability per
    bigram under the Laplace-1-smoothed count model — the perplexity
    proxy (ppl = e^avg_nll; the monotone form avoids a second libm
    call).  Documents with fewer than 2 tokens have no bigrams and no
    row.  Exact-decimal summation: reproducible under any partitioning
    and identical in the SQL oracle."""
    grams = _grams(df, id_col, text_col, lowercase)
    joined = (
        grams.join(cw, ["ctx", "w"], "left")
        .join(ct, "ctx", "left")
        .select(
            id_col,
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
            F.coalesce(F.col("tot"), F.lit(0)).alias("tot"),
        )
    )
    # p = (c+1) / (tot+V): integer-operand IEEE division, then ln —
    # bit-identical in DuckDB; the immediate DECIMAL(28,12) cast makes
    # the per-doc sum exact and order-independent
    term = F.expr(
        f"CAST(ln(CAST(c + 1 AS DOUBLE) / CAST(tot + {int(vocab_size)} AS DOUBLE)) "
        "AS DECIMAL(28,12))"
    )
    return (
        joined.withColumn("__t", term)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("__t").alias("__s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.expr(
                "CAST(CAST(-CAST(__s AS DOUBLE) / CAST(n_bigrams AS DOUBLE) "
                "AS DECIMAL(28,6)) AS DOUBLE)"
            ).alias("avg_nll"),
        )
    )


def unigram_kl_by_group(
    df: DataFrame,
    group_col: str,
    text_col: str,
    lowercase: bool = True,
) -> DataFrame:
    """(group, n_tokens, kl): KL(P_group || P_corpus) between the
    add-one-smoothed unigram distributions — the mixture-drift
    monitor for a training corpus (a domain whose token distribution
    runs away from the blend scores high; a near-duplicate of the
    blend scores ~0).

    The sum runs over the FULL corpus vocabulary for every group
    (absent tokens contribute their smoothed floor), via a
    (vocabulary x groups) cross product — EXPLICITLY bounded: the
    vocabulary is Heaps-law in the corpus and the group side is a
    broadcast of one row per group.  Terms use the same
    exact-decimal discipline as :func:`lm_avg_nll`: integer-operand
    divisions and one ln/multiply per term are bit-identical across
    engines, the DECIMAL(28,12) cast makes the per-group sum
    order-independent.  V (vocab size) and N (corpus tokens) are
    collected once as exact integers and inlined."""
    toks = _with_tokens(df, text_col, lowercase).select(
        F.col(group_col), F.explode("tk").alias("t")
    )
    gc = toks.groupBy(group_col, "t").agg(F.count(F.lit(1)).alias("c"))
    gt = toks.groupBy(group_col).agg(F.count(F.lit(1)).alias("tot"))
    vc = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c_all"))
    vn = vc.agg(
        F.count(F.lit(1)).alias("v"), F.sum("c_all").alias("n")
    ).collect()[0]
    V, N = int(vn["v"]), int(vn["n"])
    support = vc.crossJoin(F.broadcast(gt))
    joined = support.join(gc, [group_col, "t"], "left").select(
        group_col,
        "tot",
        F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        "c_all",
    )
    p = f"(CAST(c + 1 AS DOUBLE) / CAST(tot + {V} AS DOUBLE))"
    q = f"(CAST(c_all + 1 AS DOUBLE) / CAST({N + V} AS DOUBLE))"
    term = F.expr(f"CAST({p} * ln({p} / {q}) AS DECIMAL(28,12))")
    return (
        joined.withColumn("__t", term)
        .groupBy(group_col, "tot")
        .agg(F.sum("__t").alias("__s"))
        .select(
            group_col,
            F.col("tot").alias("n_tokens"),
            F.expr(
                "CAST(CAST(CAST(__s AS DOUBLE) AS DECIMAL(28,6)) AS DOUBLE)"
            ).alias("kl"),
        )
    )


def lm_score_corpus(
    df: DataFrame, id_col: str, text_col: str, lowercase: bool = True
) -> DataFrame:
    """Self-scored corpus: train the bigram model on ``df`` and score
    every document with it — the one-shot quality-ranking pass (a
    production filter trains on a TRUSTED corpus and scores the
    incoming one; pass that model via :func:`lm_avg_nll`)."""
    cw, ct, v = bigram_model(df, text_col, lowercase)
    return lm_avg_nll(df, id_col, text_col, cw, ct, v, lowercase)
