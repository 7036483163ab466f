"""Incremental corpus ingest, end to end: build (or reuse) the at-rest
MinHash index, then stream document batches through the dedup-ingest
sink — each batch is deduped within itself, probed against the index,
routed to accepted/quarantine, and folded into the index for the next
batch.

Demonstrates the O(batch) ingest loop on synthetic batches derived
from the documents table:

  batch 0: first ~60% of docs (the bootstrap corpus)
  batch 1: next ~20% plus verbatim re-submissions of earlier docs
           under new ids (guaranteed near-dups)
  batch 2: the rest plus re-submissions from batch 1

Usage: python scripts/run_dedup_ingest.py <sf_dir> <out_dir>
Prints the per-batch funnel and writes a run summary via the
observability sink.  Re-running against the same out_dir replays the
batches; document outputs are per-batch-partition overwrites, so the
counts are unchanged (idempotent), and `compact_index` then removes
the replay-duplicated postings.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> int:
    if len(sys.argv) < 3:
        print("usage: python scripts/run_dedup_ingest.py <sf_dir> <out_dir>")
        return 2
    sf_dir, out_dir = sys.argv[1], sys.argv[2]

    from osrs_dashboard_elt_spark import suite
    from osrs_dashboard_elt_spark.observability import (
        render_run_summary,
        write_summary_file,
    )
    from osrs_dashboard_elt_spark.operators.dedup_index import (
        compact_index,
        write_minhash_index,
    )
    from osrs_dashboard_elt_spark.session import get_spark
    from osrs_dashboard_elt_spark.streaming.dedup_ingest import (
        start_dedup_ingest,
    )

    spark = get_spark(app_name="dedup-ingest")
    spark.sparkContext.setLogLevel("ERROR")
    suite._pin(spark)
    docs = suite._t(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    c1, c2 = int(n * 0.6), int(n * 0.8)

    def resubmit(src, lo, hi, shift):
        return src.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).withColumn("doc_id", F.col("doc_id") + shift)

    batches = [
        docs.filter(F.col("doc_id") < c1),
        docs.filter((F.col("doc_id") >= c1) & (F.col("doc_id") < c2)).unionByName(
            resubmit(docs, 0, 40, 1_000_000)  # near-dups of batch 0
        ),
        docs.filter(F.col("doc_id") >= c2).unionByName(
            resubmit(docs, c1, c1 + 40, 2_000_000)  # near-dups of batch 1
        ),
    ]

    table = "ingest_mh_idx"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_minhash_index(
        empty, table, "doc_id", "text", path=f"{out_dir}/mh_index"
    )

    src = f"{out_dir}/incoming"
    counts: list[dict] = []
    for i, b in enumerate(batches):
        b.write.mode("overwrite").json(f"{src}/b{i}")
        stream = spark.readStream.schema("doc_id long, text string").json(
            f"{src}/b{i}"
        )
        q = start_dedup_ingest(
            stream,
            table,
            out_dir,
            f"{out_dir}/ckpt/b{i}",
            available_now=True,
            on_batch=lambda bid, c: counts.append(c),
        )
        q.awaitTermination(300)
        print(f"[batch {i}] {counts[-1]}", flush=True)

    n_postings_before = spark.table(table).count()
    n_rows = compact_index(spark, table)
    accepted = spark.read.parquet(f"{out_dir}/accepted")
    quarantined = spark.read.parquet(f"{out_dir}/quarantine")
    lines = {
        "batches": len(batches),
        "docs_in": sum(c["n_in"] for c in counts),
        "accepted": accepted.count(),
        "quarantined_in_batch": sum(c["n_in_batch_dup"] for c in counts),
        "quarantined_corpus": sum(c["n_corpus_dup"] for c in counts),
        "index_postings": f"{n_postings_before} -> {n_rows} (compacted)",
    }
    summary = render_run_summary("corpus-pipeline", "run_dedup_ingest", lines)
    write_summary_file("run_dedup_ingest", summary, out_dir, run_ts="latest")
    print(f"[done] {lines}", flush=True)
    # invariant: routed docs partition the input
    assert lines["docs_in"] == (
        lines["accepted"]
        + lines["quarantined_in_batch"]
        + lines["quarantined_corpus"]
    ), lines
    assert quarantined.filter("reason = 'corpus_dup'").count() > 0
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
