"""Composed training-corpus pipeline: invariants + determinism."""

from __future__ import annotations

import pathlib
import sys

from pyspark.sql import functions as F

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "scripts"))

SF_DIR = "/root/testdata/sf0.001"


def _run(spark, out_dir: str) -> dict:
    from run_corpus_pipeline import run
    from osrs_dashboard_elt_spark import suite

    docs = suite._t(spark, SF_DIR, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    return run(spark, tr, ev, out_dir)


def test_corpus_pipeline_invariants_and_determinism(spark, tmp_path):
    m1 = _run(spark, str(tmp_path / "a"))
    # observed metrics are self-consistent (the Observation rides a
    # non-sampling action; a repartitionByRange-first write would
    # double them)
    assert m1["rows"] == m1["train"] + m1["val"] + m1["test"]
    assert m1["rows"] > 0 and m1["tokens"] > 0

    out = spark.read.parquet(str(tmp_path / "a" / "train"))
    val = spark.read.parquet(str(tmp_path / "a" / "val"))
    test = spark.read.parquet(str(tmp_path / "a" / "test"))
    assert out.count() == m1["train"]
    assert val.count() == m1["val"]
    assert test.count() == m1["test"]
    # splits partition the survivors (no doc in two splits)
    ids = out.select("doc_id").union(val.select("doc_id")).union(test.select("doc_id"))
    assert ids.count() == ids.distinct().count() == m1["rows"]
    # train order key is materialized, strictly increasing across the
    # range-partitioned files when read back sorted
    ords = [r["__ord"] for r in out.orderBy("__ord").select("__ord").collect()]
    assert ords == sorted(ords) and len(set(ords)) == len(ords)
    # summary file exists with the reference format
    summary = (tmp_path / "a" / "run_corpus_pipeline_summary_latest.txt").read_text()
    assert summary.startswith("**✅") and "after_neardup" in summary
    assert "after_probe_gate" in summary
    # the funnel only narrows: every gate/dedup stage is a filter
    f = m1["funnel"]
    chain = ["input", "gates", "ppl_gate", "probe_gate", "exact_dedup",
             "neardup", "corpus"]
    vals = [f[s] for s in chain]
    assert vals == sorted(vals, reverse=True), vals
    # the distilled probe gate actually gates (drop quantile 0.1 on a
    # nonempty stage must remove at least one doc here)
    assert f["probe_gate"] < f["ppl_gate"]
    # byte-determinism of the surviving corpus: second run, same rows
    m2 = _run(spark, str(tmp_path / "b"))
    assert m2 == m1
    # the trained gate landed in the registry, loadable and
    # content-identical across the two deterministic runs
    from osrs_dashboard_elt_spark.operators.registry import load_model

    pa, va = load_model(spark, str(tmp_path / "a" / "models"), "quality_probe")
    pb, vb = load_model(spark, str(tmp_path / "b" / "models"), "quality_probe")
    assert va == vb and pa == pb and len(pa["weights"]) == 4
    a = spark.read.parquet(str(tmp_path / "a" / "train")).orderBy("doc_id").collect()
    b = spark.read.parquet(str(tmp_path / "b" / "train")).orderBy("doc_id").collect()
    assert a == b


def test_embed_and_index_stage(spark, tmp_path):
    """Stage 8: Arrow-batched embedding + at-rest IVF index over the
    train split; a centroid doc probes back as its own top-1 through
    the partition-pruned path, and re-embedding is deterministic."""
    import run_corpus_pipeline as pipe
    from osrs_dashboard_elt_spark.multimodal.embedder import embed_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    evals = docs.limit(5)
    out = str(tmp_path / "corpus")
    pipe.run(spark, docs, evals, out)
    res = pipe.embed_and_index(spark, out, dim=16, n_centroids=4)
    assert res["probe_top1"] == res["expected_top1"]
    # determinism: same ids -> identical vectors on re-run
    train = spark.read.parquet(f"{out}/train").limit(3)
    a = {r.doc_id: list(r.embedding) for r in embed_documents(train, dim=16).collect()}
    b = {r.doc_id: list(r.embedding) for r in embed_documents(train, dim=16).collect()}
    assert a == b


def test_index_publish_enables_incremental_ingest(spark, tmp_path):
    """Stage 8: the published MinHash index lets the NEXT batch be
    dedup-checked by PROBE instead of a full-corpus re-run — a
    survivor's text re-submitted under a new id must surface as a
    corpus near-dup."""
    from run_corpus_pipeline import run
    from osrs_dashboard_elt_spark import suite
    from osrs_dashboard_elt_spark.operators.dedup_index import (
        probe_minhash_index,
    )

    docs = suite._t(spark, SF_DIR, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    tr = docs.filter(F.col("doc_id") % 10 != 0)
    out = str(tmp_path / "c")
    try:
        m = run(spark, tr, ev, out, index_table="corpus_mh_idx")
        # index holds exactly the survivors
        idx_ids = {
            r.corpus_id
            for r in spark.table("corpus_mh_idx")
            .select("corpus_id")
            .distinct()
            .collect()
        }
        assert len(idx_ids) == m["rows"]
        # re-submit one survivor's text under a new id -> probe hit
        survivor = (
            spark.read.parquet(f"{out}/train").select("doc_id", "text").first()
        )
        new = spark.createDataFrame(
            [(9_999_999, survivor.text)], "doc_id long, text string"
        )
        got = probe_minhash_index(
            spark, new, "corpus_mh_idx", "doc_id", "text", shingle_n=3
        ).collect()
        assert any(r.corpus_id == survivor.doc_id for r in got), got
    finally:
        spark.sql("DROP TABLE IF EXISTS corpus_mh_idx")


def test_shard_export_deterministic_and_epoch_ordered(spark, tmp_path):
    """Stage 9: tokenizer trained on the cleaned corpus, chunks
    tokenized + packed + epoch-ordered.  Re-running the whole
    pipeline produces BYTE-identical shard files (content digests,
    ignoring the job-uuid part names) and identical tokenizer
    artifacts; the exported positions are a contiguous epoch order
    with each sequence's chunks contiguous and in document order."""
    import hashlib

    import run_corpus_pipeline as pipe

    _run(spark, str(tmp_path / "a"))
    _run(spark, str(tmp_path / "b"))
    m1 = pipe.export_training_shards(spark, str(tmp_path / "a"))
    m2 = pipe.export_training_shards(spark, str(tmp_path / "b"))
    assert m1 == m2
    assert m1["n_chunks"] > 0 and m1["vocab_size"] > m1["n_merges"]

    def digests(d):
        return sorted(
            hashlib.md5(p.read_bytes()).hexdigest()
            for p in pathlib.Path(d).glob("*.parquet")
        )

    da = digests(tmp_path / "a" / "shards")
    db = digests(tmp_path / "b" / "shards")
    assert da and da == db
    assert (tmp_path / "a" / "vocab.json").read_bytes() == (
        tmp_path / "b" / "vocab.json"
    ).read_bytes()
    # the tokenizer landed in the registry with the same content
    # version on both runs, and its vocab matches the json artifact
    from osrs_dashboard_elt_spark.operators.registry import load_model

    ta, va = load_model(spark, str(tmp_path / "a" / "models"), "shard_tokenizer")
    tb, vb = load_model(spark, str(tmp_path / "b" / "models"), "shard_tokenizer")
    assert va == vb and len(ta["merges"]) == m1["n_merges"]
    import json as _json

    assert ta["vocab"] == _json.loads(
        (tmp_path / "a" / "vocab.json").read_text()
    )
    assert tb["vocab"] == ta["vocab"]

    sh = spark.read.parquet(str(tmp_path / "a" / "shards"))
    rows = sh.orderBy("pos").collect()
    assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
    # sequences are contiguous runs in epoch order, chunks in
    # (doc, chunk) order inside each run
    seen_done = set()
    prev_key, prev_chunk = None, None
    for r in rows:
        key = (r.lang, r.seq_id)
        if key != prev_key:
            assert key not in seen_done, f"sequence {key} split in epoch order"
            if prev_key is not None:
                seen_done.add(prev_key)
            prev_key = key
        else:
            assert (r.id, r.chunk_idx) > prev_chunk, "chunk order broken"
        prev_chunk = (r.id, r.chunk_idx)
    # token counts: every chunk's ids are non-empty and sum matches
    agg = sh.agg(
        F.sum(F.size("token_ids")).alias("s"),
        F.min(F.size("token_ids")).alias("m"),
    ).collect()[0]
    assert agg["s"] == m1["n_tokens_packed"] and agg["m"] > 0


def test_curriculum_shard_export_orders_by_difficulty(spark, tmp_path):
    """curriculum=True streams sequences easy-first: along the epoch
    order, each sequence's difficulty (max member-doc avg_nll under
    the corpus LM) is non-decreasing, sequences stay contiguous, and
    the row set equals the shuffled export's."""
    import run_corpus_pipeline as pipe
    from osrs_dashboard_elt_spark.operators.lm import lm_score_corpus

    _run(spark, str(tmp_path / "c"))
    m = pipe.export_training_shards(
        spark, str(tmp_path / "c"), curriculum=True
    )
    assert m["curriculum"] is True and m["n_chunks"] > 0

    sh = spark.read.parquet(str(tmp_path / "c" / "shards"))
    train = spark.read.parquet(str(tmp_path / "c" / "train"))
    scores = {
        r.doc_id: r.avg_nll
        for r in lm_score_corpus(train, "doc_id", "text").collect()
    }
    rows = sh.orderBy("pos").collect()
    assert [r.pos for r in rows] == list(range(1, len(rows) + 1))
    # per-sequence difficulty non-decreasing along the epoch order
    seq_rows: dict = {}
    order = []
    for r in rows:
        key = (r.lang, r.seq_id)
        if key not in seq_rows:
            seq_rows[key] = []
            order.append(key)
        seq_rows[key].append(r)
    diffs = [
        max(scores.get(r.id, 0.0) for r in seq_rows[k]) for k in order
    ]
    assert diffs == sorted(diffs), "curriculum order broken"
    # sequences contiguous (no interleaving)
    flat = [k for k in order for _ in seq_rows[k]]
    assert flat == [(r.lang, r.seq_id) for r in rows]
