"""Inverted text index AT REST: shard-partitioned posting lists with
a partition-pruned BM25 probe.

``suite.q_bm25_search`` is the flat form — it tokenizes the whole
corpus per query.  The at-rest contract (the same one the ANN indexes
follow, ``similarity.write_lsh_index``/``write_ivf_index``) is: pay
the tokenize ONCE at write time, lay the postings out so a probe's
predicate becomes a PARTITION filter, and read only the query terms'
shards at search time.

Layout under ``path``:

- ``postings/shard=<s>/``: (token, doc_id, tf) — shard is the 60-bit
  md5 of the token mod ``n_shards`` (the repo-wide hash discipline),
  so a term's postings live in exactly one partition dir.
- ``doclen/``: (doc_id, dl) — per-document token counts.
- ``stats/``: one row (n_docs, avgdl) — corpus constants.

Probe plan shape: pruned postings scan (a few shards) -> tiny
per-term df aggregate -> BROADCAST the postings subset onto doclen
(the fact-sized side never shuffles) -> decimal-summed per-doc BM25 ->
TakeOrdered top-k.  The scoring arithmetic is written identically to
the flat form, so the two agree bit-for-bit (asserted in
``tests/test_text_index.py``).

At 100 TB: postings ~ total token occurrences, but a probe touches
``len(terms)/n_shards`` of the files; df/stats are metadata-sized.
Hot terms (stopwords) make hot shards — the write-side answer is the
same stop-token guard the n-gram family uses (drop df > x% terms at
index build; they contribute ~zero idf anyway).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .sketches import _HASH_HEX  # 60-bit md5 prefix, the repo-wide rule


def _shard(token: F.Column, n_shards: int) -> F.Column:
    h = F.conv(F.substring(F.md5(token), 1, _HASH_HEX), 16, 10).cast("long")
    return (h % F.lit(n_shards)).alias("shard")


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        id_col,
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("token"),
    )


def write_inverted_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 16,
) -> None:
    """Tokenize ONCE (the token stream is persisted across the three
    writes — postings, doclen, stats — instead of re-exploding the
    corpus per artifact) and materialize the shard-partitioned
    postings plus an index-meta file carrying the write-time
    parameters, so a probe cannot silently hash into the wrong shard
    layout."""
    toks = _tokens(df, id_col, text_col).persist()
    try:
        postings = (
            toks.groupBy("token", id_col)
            .agg(F.count(F.lit(1)).alias("tf"))
            .withColumn("shard", _shard(F.col("token"), n_shards))
        )
        (
            postings.repartition("shard")
            .write.mode("overwrite")
            .partitionBy("shard")
            .parquet(os.path.join(path, "postings"))
        )
        doclen = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
        doclen.write.mode("overwrite").parquet(os.path.join(path, "doclen"))
        # stats from the just-written doclen files: tiny read, and the
        # persisted token stream can be dropped before this job
        stats = (
            df.sparkSession.read.parquet(os.path.join(path, "doclen"))
            .agg(
                (F.sum("dl").cast("double") / F.count(F.lit(1))).alias(
                    "avgdl"
                ),
                F.count(F.lit(1)).alias("n_docs"),
            )
        )
        stats.write.mode("overwrite").parquet(os.path.join(path, "stats"))
    finally:
        toks.unpersist()
    with open(os.path.join(path, "index_meta.json"), "w") as f:
        json.dump({"n_shards": n_shards, "lowercase": True}, f)


def _contrib(tf, df, dl, avgdl, n_docs):
    """One term's BM25 contribution (k1=1.2, b=0.75), arithmetic
    written EXACTLY as the flat ``q_bm25_search`` form so results
    agree bit-for-bit; rounded through DECIMAL(28,6) so the per-doc
    sum is order-independent."""
    tfd = tf.cast("double")
    idf = ((n_docs - df).cast("double") + F.lit(0.5)) / (
        df.cast("double") + F.lit(0.5)
    )
    den = tfd + F.lit(1.2) * (
        F.lit(0.25) + F.lit(0.75) * (dl.cast("double") / avgdl)
    )
    raw = idf * ((tfd * F.lit(2.2)) / den)
    return raw.cast("decimal(28,6)")


def bm25_search_at_rest(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k: int = 20,
    id_col: str = "doc_id",
    n_shards: int = 16,
) -> DataFrame:
    """Top-k BM25 over a :func:`write_inverted_index` table, reading
    only the query terms' posting shards."""
    if not terms:
        raise ValueError("bm25_search_at_rest requires at least one term")
    try:
        with open(os.path.join(path, "index_meta.json")) as f:
            meta = json.load(f)
        if meta.get("n_shards") != n_shards:
            raise ValueError(
                f"index was written with n_shards={meta.get('n_shards')}, "
                f"probe called with {n_shards} — the probe would hash "
                "into the wrong partition dirs and silently miss postings"
            )
    except FileNotFoundError:
        pass  # pre-meta index: caller owns parameter agreement
    # the writer lowercases tokens; match that contract here so
    # 'Join' finds the 'join' postings instead of nothing
    terms = [t.lower() for t in terms]
    import hashlib

    shards = sorted(
        {
            int(hashlib.md5(t.encode()).hexdigest()[:_HASH_HEX], 16)
            % n_shards
            for t in terms
        }
    )
    posts = (
        spark.read.parquet(os.path.join(path, "postings"))
        .filter(F.col("shard").isin(shards))  # partition filter
        .filter(F.col("token").isin(list(terms)))
    )
    dfreq = posts.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    stats = spark.read.parquet(os.path.join(path, "stats"))
    doclen = spark.read.parquet(os.path.join(path, "doclen"))
    hits = (
        doclen.join(F.broadcast(posts), id_col)
        .join(F.broadcast(dfreq), "token")
        .crossJoin(F.broadcast(stats))
    )
    scored = hits.withColumn(
        "c",
        _contrib(
            F.col("tf"),
            F.col("df"),
            F.col("dl"),
            F.col("avgdl"),
            F.col("n_docs"),
        ),
    )
    per_doc = scored.groupBy(id_col).agg(
        F.sum("c").cast("double").alias("bm25")
    )
    return per_doc.orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    ).limit(k)
