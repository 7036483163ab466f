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
   shuffles, corpus never re-signatured).  SELF-matches (the exact id
   already posted to the index) are split out as ``already_ingested``
   — the O(batch) membership test that makes cross-batch at-least-
   once redelivery idempotent without ever anti-joining the full
   accepted corpus;
3. **routes** — accepted docs land in
   ``{out_root}/accepted/run_id=R/batch_id=N``, rejects in
   ``{out_root}/quarantine/...`` with a ``reason``
   (``in_batch_dup`` / ``corpus_dup`` / ``already_ingested`` /
   ``taken_down``) for audit instead of being silently dropped.  Each micro-batch
   DYNAMICALLY OVERWRITES its own (run, batch) partition: a replay
   under the same checkpoint rewrites exactly its prior output, and a
   restart with a FRESH checkpoint (new run id) cannot clobber
   history — its re-deliveries are shunted to ``already_ingested`` by
   the index probe instead of re-accepted;
4. **extends the index** — accepted docs' band postings append into
   the bucketed table, so the NEXT batch probes against them.

Crash-consistency window (documented, not hidden): the accepted write
commits BEFORE the index append, so a crash exactly between the two,
followed by a fresh-checkpoint restart, re-accepts that one batch's
docs under the new run id (the index never learned them).  Repair =
drop the dead run's partitions or re-run ``compact``-style dedup over
``accepted``; the window is one batch wide and only opens when the
checkpoint is ALSO lost.  (Appending postings first would instead
LOSE the batch on the same crash — strictly worse.)

The DUAL-index window (ANN armed): a crash after the PQ append (4a)
but before the MinHash append (4b) leaves the batch uncommitted, so a
same-checkpoint restart replays it — PQ's ``skip_existing`` anti-join
absorbs the re-append (no duplicate codes) and the MinHash side lands
its postings (none missing).  Convergence is proven by
``tests/test_dedup_ingest.py::
test_crash_between_pq_and_minhash_appends_converges``.

Known limitation: a document with fewer than ``shingle_n`` words has
no shingles, therefore no postings — the index cannot witness it, so
its exact-id redelivery re-accepts.  Pre-filter sub-shingle docs (the
corpus pipeline's quality gate already drops them).

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

import uuid
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
    run_id: str | None = None,
    lm_model: tuple[DataFrame, DataFrame, int] | None = None,
    max_avg_nll: float | None = None,
    probe_model: tuple[list[float], float] | None = None,
    ann_index: tuple[list[list[list[float]]], str] | None = None,
    stats_manifest: tuple | None = None,
    suppress: DataFrame | list | None = None,
) -> StreamingQuery:
    """Start the dedup-ingest stream.  ``index_table`` must already
    exist (``write_minhash_index`` over the current corpus — an empty
    corpus works: write the index from an empty frame), and
    ``n_buckets`` (plus the MinHash params) must MATCH the values the
    index was written with — the bucket layout and band-key space are
    the table's contract.

    ``run_id`` names this stream activation's output partitions
    (default: a fresh uuid per start).  Pass the SAME run_id when
    resuming from the SAME checkpoint so a replayed micro-batch
    overwrites its own partition; a fresh checkpoint should keep the
    default fresh run id.  ``on_batch`` receives ``(batch_id,
    counts)`` with keys ``n_in``, ``n_same_id_collapsed``,
    ``n_suppressed``, ``n_high_ppl``, ``n_in_batch_dup``,
    ``n_corpus_dup``, ``n_already_ingested``, ``n_accepted``.

    ``lm_model`` + ``max_avg_nll`` arm the QUALITY gate at ingest:
    pass ``(cw, ct, vocab_size)`` from ``operators.lm.bigram_model``
    (trained on a TRUSTED corpus) and docs scoring above the
    ``avg_nll`` cutoff route to quarantine with reason
    ``high_perplexity`` BEFORE any dedup work — the cheapest
    rejection runs first, and gibberish never reaches the pair
    generators or the index.  The model tables are static
    (Heaps-bounded); the per-batch cost is one gram join, O(batch).

    ``probe_model`` arms the DISTILLED quality gate: pass
    ``(weights, min_score)`` where ``weights`` is a linear probe over
    :func:`~..operators.classifier.text_probe_features` (typically
    the ``quality_probe`` entry the corpus pipeline saved to the
    model registry) — docs scoring below the cutoff quarantine with
    reason ``low_quality_score``.  Serving cost is ONE scan-side
    projection per batch, no joins: the registry model trained
    against these exact feature expressions.

    ``ann_index`` keeps a PQ ANN index FRESH as docs land: pass
    ``(codebooks, path)`` (a trained model, typically from the
    registry, and an existing ``write_pq_index`` output) and every
    accepted doc is embedded (Arrow-batched) and its codes appended —
    a just-ingested doc is immediately searchable.  O(batch) encode;
    replay-safe via an id anti-join.

    ``stats_manifest`` keeps the ACCEPTED corpus takedown-ready: pass
    ``(stats_cols, bloom_cols)`` or ``(stats_cols, bloom_cols,
    bloom_bits)`` and every batch refreshes a file-skipping manifest
    over ``{out_root}/accepted`` (``sources/stats_manifest.py``).
    With a bloom on the id column, ``maintenance.targeted_delete``
    can later serve an id-list takedown by rewriting only the files
    that contain the ids, and selective readers prune files at
    planning time.  Per-batch cost is O(batch) in BOTH compute and
    write: each refresh appends one manifest SEGMENT with the new
    files' rows, and the manifest folds itself every few refreshes
    (the Delta checkpoint analog).  Still SIZE bloom_bits for your
    per-file row counts (streaming batches make small files; the
    write-path default 2^20 bits is built for ~100k distinct/file)
    and compact the accepted dir periodically to bound the file count
    itself.  Takedown vs replay: a
    checkpoint replay re-materializes its own (run, batch) partition,
    so a ``targeted_delete`` raced against an in-flight stream can be
    resurrected by a crash-replay of the batch that carried the doc —
    run takedowns against a quiesced stream, or re-run them after a
    restart (the manifest makes re-deletes cheap and idempotent).
    Bootstrap happens on the first batch that ACCEPTS rows; a changed
    bloom column set later raises loudly rather than silently
    refreshing without the blooms the takedown path needs.

    ``suppress`` is the takedown SUPPRESSION LIST — ids (a list or a
    one-column DataFrame) quarantined with reason ``taken_down``
    before any other processing.  It closes the resurrection loop a
    complete takedown opens: ``maintenance.targeted_delete`` removes
    the data, ``dedup_index.delete_from_index`` tombstones the
    derived postings — but tombstoned postings no longer match
    probes, so an at-least-once REDELIVERY of the taken-down doc
    would sail through the index check and be re-accepted.  The
    suppression list is the authoritative "never again" set; only ID
    + reason are persisted for the audit trail, never the content.
    Cost is one broadcast anti-join per batch — keep the list to ids
    under active suppression and fold old entries into periodic
    corpus audits if it ever outgrows a broadcast."""
    params = dict(
        num_perm=num_perm, bands=bands, seed=seed, shingle_n=shingle_n
    )
    # "r" prefix: a run id that LOOKS numeric (0.4% of bare hex ids)
    # would make partition-type inference pin run_id as int in the
    # first manifest epoch and corrupt later string run ids
    run = run_id or ("r" + uuid.uuid4().hex[:11])

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        raw = batch_df.persist()
        # Exact SAME-ID rows arriving in one micro-batch (source-side
        # redelivery within a batch) must collapse BEFORE clustering:
        # a pair generator with ``id_a < id_b`` cannot pair a doc with
        # itself, so without this the canon join fans out (2 copies of
        # one id -> 4 accepted rows) and ``accepted`` carries dup ids.
        batch = raw.dropDuplicates([id_col]).persist()
        persisted = [raw, batch]
        try:
            n_raw = raw.count()
            n_in = batch.count()
            n_same_id = n_raw - n_in
            if n_in == 0:
                if on_batch is not None:
                    on_batch(batch_id, {
                        "n_in": 0, "n_same_id_collapsed": n_same_id,
                        "n_suppressed": 0,
                        "n_high_ppl": 0, "n_low_quality": 0,
                        "n_in_batch_dup": 0, "n_corpus_dup": 0,
                        "n_already_ingested": 0, "n_accepted": 0,
                    })
                return
            # -1. suppression list (takedown "never again" set): the
            # authoritative gate runs FIRST — a taken-down id must not
            # reach the pair generators, the index probe, or any
            # output that stores content
            suppressed_out = None
            n_suppressed = 0
            if suppress is not None:
                if isinstance(suppress, DataFrame):
                    sup = suppress.select(
                        F.col(suppress.columns[0]).alias(id_col)
                    ).distinct()
                else:
                    from ..literals import local_frame

                    # JVM VALUES frame: a python-RDD list would spin
                    # Python workers for the anti-join EVERY batch
                    id_type = dict(batch.dtypes)[id_col]
                    sup = local_frame(
                        spark, [(v,) for v in suppress],
                        f"{id_col} {id_type}",
                    ).distinct()
                suppressed_out = (
                    batch.select(id_col)
                    .join(F.broadcast(sup), id_col)
                    .persist()
                )
                persisted.append(suppressed_out)
                n_suppressed = suppressed_out.count()
                if n_suppressed:
                    batch = batch.join(
                        F.broadcast(sup), id_col, "left_anti"
                    ).persist()
                    persisted.append(batch)
            # 0. quality gates (optional), routed through the
            # expectations engine (operators/quality.py): model scores
            # land as COLUMNS first (one O(batch) join each), then
            # split_by_rules does the routing — a gate change is a
            # rules-list edit, not new routing code.  Rules state
            # VALIDITY and run in cheapest-rejection-first order; a
            # doc failing several gates is attributed to the FIRST
            # (failed_rules[0]), preserving the original one-reason
            # quarantine shape.  Sub-bigram docs have no LM score and
            # a gate cannot judge them, so NULL scores pass (the
            # explicit IS NULL disjunct — split_by_rules itself treats
            # NULL predicates as violations).
            from ..operators.quality import split_by_rules

            gate_rules: list[tuple[str, str]] = []
            score_cols: list[str] = []
            scored = batch
            if lm_model is not None and max_avg_nll is not None:
                from ..operators.lm import lm_avg_nll

                cw, ct, vsz = lm_model
                nll = lm_avg_nll(
                    batch, id_col, text_col, cw, ct, vsz
                ).select(
                    id_col, F.col("avg_nll").alias("__gate_nll")
                )
                scored = scored.join(nll, id_col, "left")
                score_cols.append("__gate_nll")
                # reserved __-prefix: a batch that already carries an
                # avg_nll/score column must not collide; float() guards
                # against numpy-scalar reprs that don't parse as SQL
                gate_rules.append((
                    "high_perplexity",
                    "__gate_nll IS NULL OR __gate_nll <= "
                    f"{float(max_avg_nll)!r}",
                ))
            if probe_model is not None:
                from ..operators.classifier import (
                    linear_probe_scores,
                    text_probe_features,
                )

                pw, min_score = probe_model
                pscores = linear_probe_scores(
                    batch.withColumn(
                        "__feat", text_probe_features(text_col)
                    ),
                    "__feat", None, pw, id_col=id_col,
                ).select(id_col, F.col("score").alias("__gate_score"))
                scored = scored.join(pscores, id_col, "left")
                score_cols.append("__gate_score")
                gate_rules.append((
                    "low_quality_score",
                    "__gate_score IS NULL OR __gate_score >= "
                    f"{float(min_score)!r}",
                ))
            gated_out = None
            if gate_rules:
                good, bad = split_by_rules(
                    scored, gate_rules, reasons_col="__gate_failed"
                )
                gated_out = bad.select(
                    id_col, F.col("__gate_failed")[0].alias("reason")
                ).persist()
                persisted.append(gated_out)
                batch = good.drop(*score_cols).persist()
                persisted.append(batch)
            # 1. within-batch clusters -> canonical survivors
            pairs = minhash_lsh_pairs(batch, id_col, text_col, **params)
            clusters = dedup_clusters(batch, pairs, id_col)
            canon = batch.join(
                clusters.filter("is_canonical").select(id_col), id_col
            ).persist()
            persisted.append(canon)
            # 2. probe the at-rest corpus index, keeping self-matches:
            # new_id == corpus_id means this exact id's postings are
            # already committed — a redelivered doc, not a near-dup
            hits = probe_minhash_index(
                spark, canon, index_table, id_col, text_col,
                exclude_self=False, **params,
            ).persist()
            persisted.append(hits)
            already = (
                hits.filter(F.col("new_id") == F.col("corpus_id"))
                .select("new_id")
                .distinct()
            )
            dup_ids = (
                hits.filter(F.col("new_id") != F.col("corpus_id"))
                .join(already, "new_id", "left_anti")
                .groupBy("new_id")
                .agg(F.min("corpus_id").alias("matched_corpus_id"))
                .persist()
            )
            persisted.append(dup_ids)
            rejected_ids = dup_ids.select("new_id").unionByName(
                already
            ).select(F.col("new_id").alias(id_col))
            accepted = canon.join(rejected_ids, id_col, "left_anti").persist()
            persisted.append(accepted)

            # 3. route.  Each micro-batch owns its (run, batch)
            # partition; replays under the same checkpoint overwrite
            # exactly that partition — no anti-join against the
            # ever-growing accepted corpus (O(batch), not O(corpus)).
            def route(df_, sub):
                (
                    df_.withColumn("run_id", F.lit(run))
                    .withColumn("batch_id", F.lit(batch_id))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("run_id", "batch_id")
                    .parquet(f"{out_root}/{sub}")
                )

            n_accepted = accepted.count()
            if n_accepted == 0:
                # dynamic partition overwrite writes ZERO partitions
                # for an empty frame, so a replay whose accepted set
                # shrank to nothing (e.g. the doc was taken down and
                # suppressed between attempts) would leave the prior
                # attempt's CONTENT on disk — delete the partition
                # explicitly; the manifest refresh below records the
                # removals
                import shutil as _shutil

                _shutil.rmtree(
                    f"{out_root}/accepted/run_id={run}"
                    f"/batch_id={batch_id}",
                    ignore_errors=True,
                )
            route(accepted, "accepted")
            if stats_manifest is not None:
                from ..sources.stats_manifest import (
                    has_stats_manifest,
                    refresh_stats_manifest,
                )

                acc_path = f"{out_root}/accepted"
                scols, bcols, *rest = stats_manifest
                bbits = rest[0] if rest else None
                # guard the bootstrap: an all-quarantined first batch
                # writes an EMPTY accepted dir (zero parquet files),
                # and a manifest build over it would die on schema
                # inference — wait for the first batch that accepts
                if n_accepted or has_stats_manifest(acc_path):
                    # stats+blooms computed for the NEW files only;
                    # vanished (replayed-overwrite) files drop out; a
                    # missing manifest bootstraps WITH the blooms, a
                    # bloom-column mismatch raises (never silently
                    # downgrades the takedown path)
                    refresh_stats_manifest(
                        spark, acc_path, list(scols),
                        bloom_cols=list(bcols), bloom_bits=bbits,
                    )
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
            already_q = already.select(
                F.col("new_id").alias(id_col),
                F.lit("already_ingested").alias("reason"),
                F.col("new_id").cast(id_type).alias("matched_corpus_id"),
            )
            quarantined = in_batch_dup.unionByName(corpus_dup).unionByName(
                already_q
            )
            if gated_out is not None:
                quarantined = quarantined.unionByName(
                    gated_out.select(
                        id_col,
                        "reason",
                        F.lit(None).cast(id_type).alias("matched_corpus_id"),
                    )
                )
            if suppressed_out is not None and n_suppressed:
                quarantined = quarantined.unionByName(
                    suppressed_out.select(
                        id_col,
                        F.lit("taken_down").alias("reason"),
                        F.lit(None).cast(id_type).alias("matched_corpus_id"),
                    )
                )
            route(quarantined, "quarantine")
            # Counts MUST freeze before the index append: writing the
            # table invalidates every cached plan that references it,
            # so a count taken afterwards re-executes the probe
            # against the freshly-extended index and miscounts this
            # batch's own docs as already_ingested.
            gate_counts = (
                {
                    r["reason"]: int(r["n"])
                    for r in gated_out.groupBy("reason")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
                if gated_out is not None
                else {}
            )
            metrics = {
                "n_in": n_in,
                "n_same_id_collapsed": n_same_id,
                "n_suppressed": n_suppressed,
                **{
                    k: gate_counts.get(r, 0)
                    for k, r in (
                        ("n_high_ppl", "high_perplexity"),
                        ("n_low_quality", "low_quality_score"),
                    )
                },
                "n_in_batch_dup": in_batch_dup.count(),
                "n_corpus_dup": dup_ids.count(),
                "n_already_ingested": already.count(),
                "n_accepted": n_accepted,
            }
            n_quarantined = (
                metrics["n_in_batch_dup"]
                + metrics["n_corpus_dup"]
                + metrics["n_already_ingested"]
                + n_suppressed
                + sum(gate_counts.values())
            )
            if n_quarantined == 0:
                # same stale-partition hazard as accepted above (the
                # quarantine stores only id + reason, but a stale
                # partition would misreport docs as rejected)
                import shutil as _shutil

                _shutil.rmtree(
                    f"{out_root}/quarantine/run_id={run}"
                    f"/batch_id={batch_id}",
                    ignore_errors=True,
                )
            # 4a. optional ANN freshness: embed the accepted docs and
            # append their PQ codes, so a just-ingested doc is
            # immediately searchable (O(batch) — the codebooks are a
            # fixed trained model, typically loaded from the
            # registry).  MUST run BEFORE the minhash append below:
            # writing the catalog table invalidates accepted's cached
            # plan, and a re-execution would re-probe the
            # freshly-extended index, flag this batch's own docs as
            # already_ingested, and evaluate accepted as EMPTY (the
            # same table-write gotcha the metrics freeze guards).
            if ann_index is not None and n_accepted:
                from ..multimodal.embedder import embed_documents
                from ..operators.pq import pq_append_index

                books, ann_path = ann_index
                # the embedder must produce the codebooks' dimension
                # or pq_encode's validity filter silently drops every
                # row — derive dim from the model, never a default
                ann_dim = len(books) * len(books[0][0])
                # embed_documents hard-codes its output column to
                # doc_id (the Arrow schema) — alias through and back
                # so any id_col works
                emb = embed_documents(
                    accepted.select(F.col(id_col).alias("doc_id")),
                    "doc_id", dim=ann_dim,
                ).withColumnRenamed("doc_id", id_col)
                # skip_existing: a crash between this append and the
                # batch's replay reprocesses the same docs — the
                # anti-join keeps the code table duplicate-free (ids
                # only, column-pruned; swap for upstream dedup if the
                # id scan ever hurts)
                pq_append_index(
                    emb, "embedding", books, ann_path, id_col=id_col,
                    skip_existing=True,
                )
            # 4b. extend the index with the accepted docs' postings
            # (accepted carries the full batch columns — no join back)
            write_minhash_index(
                accepted, index_table, id_col, text_col,
                n_buckets=n_buckets, mode="append", **params,
            )
            if on_batch is not None:
                on_batch(batch_id, metrics)
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
