"""Streaming corpus ingest with incremental near-dup rejection.

The end-to-end form of the at-rest dedup index
(``operators/dedup_index.py``): documents arrive as a stream, and per
micro-batch the pipeline

1. **dedups WITHIN the batch** — MinHash pairs over the batch, closed
   into clusters (``dedup_clusters``), keeping each cluster's
   canonical (lowest-id) member; two near-dups arriving together must
   not both pass just because neither is indexed yet;
2. **probes the at-rest index** — canonical survivors are checked
   against the corpus posting table (bucketed join, index side never
   shuffles, corpus never re-signatured);
3. **routes** — accepted docs land in
   ``{out_root}/accepted/batch_id=N``, rejects in
   ``{out_root}/quarantine/batch_id=N`` with a ``reason``
   (``in_batch_dup`` / ``corpus_dup``) for audit instead of being
   silently dropped.  Each batch DYNAMICALLY OVERWRITES its own
   partition, so a replayed batch rewrites exactly its prior output —
   idempotency in O(batch), with no anti-join against the
   ever-growing accepted corpus (an earlier ``dedup_append`` form
   re-scanned the full accepted table per batch: O(corpus) ingest);
4. **extends the index** — accepted docs' band postings append into
   the bucketed table, so the NEXT batch probes against them.

Replay semantics: document sinks are per-batch-partition overwrites —
exactly-once per batch id.  A replay CAN append duplicate posting
rows to the index — harmless for correctness (the probe's
``dropDuplicates`` collapses them; a candidate appearing twice is
still one candidate) at the cost of index bloat.

Maintenance: run ``operators.dedup_index.compact_index`` periodically
(with ``max_bucket_size``) — it removes replay-duplicated postings,
merges append small-files, AND applies the hot-band-key cap across
the whole accumulated index, which no per-append cap can do (each
append only sees its own batch's postings, so a boilerplate
signature could otherwise grow a degenerate bucket over many
batches).

At 100 TB: every per-batch step is O(batch) except the index join,
which reads only the bucket-aligned splits the batch's band keys
touch.  The corpus itself is read by NOTHING in this loop.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.components import dedup_clusters
from ..operators.dedup import minhash_lsh_pairs
from ..operators.dedup_index import probe_minhash_index, write_minhash_index


def start_dedup_ingest(
    doc_stream: DataFrame,
    index_table: str,
    out_root: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 42,
    shingle_n: int | None = 3,
    n_buckets: int = 32,
    available_now: bool = False,
    on_batch: Callable[[int, dict], None] | None = None,
) -> StreamingQuery:
    """Start the dedup-ingest stream.  ``index_table`` must already
    exist (``write_minhash_index`` over the current corpus — an empty
    corpus works: write the index from an empty frame), and
    ``n_buckets`` (plus the MinHash params) must MATCH the values the
    index was written with — the bucket layout and band-key space are
    the table's contract.  ``on_batch`` receives ``(batch_id,
    counts)`` with keys ``n_in``, ``n_in_batch_dup``,
    ``n_corpus_dup``, ``n_accepted``."""
    params = dict(
        num_perm=num_perm, bands=bands, seed=seed, shingle_n=shingle_n
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch = batch_df.persist()
        persisted = [batch]
        try:
            n_in = batch.count()
            if n_in == 0:
                if on_batch is not None:
                    on_batch(batch_id, {
                        "n_in": 0, "n_in_batch_dup": 0,
                        "n_corpus_dup": 0, "n_accepted": 0,
                    })
                return
            # 1. within-batch clusters -> canonical survivors
            pairs = minhash_lsh_pairs(batch, id_col, text_col, **params)
            clusters = dedup_clusters(batch, pairs, id_col)
            canon = batch.join(
                clusters.filter("is_canonical").select(id_col), id_col
            ).persist()
            persisted.append(canon)
            # 2. probe the at-rest corpus index
            dup_ids = (
                probe_minhash_index(
                    spark, canon, index_table, id_col, text_col, **params
                )
                .groupBy("new_id")
                .agg(F.min("corpus_id").alias("matched_corpus_id"))
                .persist()
            )
            persisted.append(dup_ids)
            accepted = canon.join(
                dup_ids.select(F.col("new_id").alias(id_col)),
                id_col,
                "left_anti",
            ).persist()
            persisted.append(accepted)
            # 3. route.  Each batch owns its batch_id partition and a
            # replay dynamically overwrites ONLY that partition —
            # idempotency without anti-joining the full accepted
            # corpus per batch (O(batch), not O(corpus)).
            def route(df_, sub):
                (
                    df_.withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("batch_id")
                    .parquet(f"{out_root}/{sub}")
                )

            n_accepted = accepted.count()
            route(accepted, "accepted")
            # the audit column carries whatever type the id column has
            id_type = dict(batch.dtypes)[id_col]
            in_batch_dup = batch.join(
                clusters.filter("NOT is_canonical").select(id_col), id_col
            ).select(
                id_col,
                F.lit("in_batch_dup").alias("reason"),
                F.lit(None).cast(id_type).alias("matched_corpus_id"),
            )
            corpus_dup = dup_ids.select(
                F.col("new_id").alias(id_col),
                F.lit("corpus_dup").alias("reason"),
                F.col("matched_corpus_id").cast(id_type),
            )
            quarantined = in_batch_dup.unionByName(corpus_dup)
            route(quarantined, "quarantine")
            # 4. extend the index with the accepted docs' postings
            # (accepted carries the full batch columns — no join back)
            write_minhash_index(
                accepted, index_table, id_col, text_col,
                n_buckets=n_buckets, mode="append", **params,
            )
            if on_batch is not None:
                n_ib = in_batch_dup.count()
                n_cd = corpus_dup.count()
                on_batch(batch_id, {
                    "n_in": n_in,
                    "n_in_batch_dup": n_ib,
                    "n_corpus_dup": n_cd,
                    "n_accepted": n_accepted,
                })
        finally:
            for df in persisted:
                df.unpersist()

    writer = (
        doc_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
