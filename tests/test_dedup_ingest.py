"""Streaming dedup-ingest: two micro-batches through the at-rest
MinHash index — in-batch dups quarantined, cross-batch dups caught by
the index extended in batch 1, redelivered ids shunted to
already_ingested, accepted set clean."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.dedup_index import write_minhash_index
from osrs_dashboard_elt_spark.streaming.dedup_ingest import start_dedup_ingest

PARAMS = dict(num_perm=16, bands=4, seed=42, shingle_n=3)

TEXT_A = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows past the old stone bridge in the quiet morning light"
)
# one word changed at the end -> high shingle overlap with TEXT_A
TEXT_A_NEAR = (
    "the quick brown fox jumps over the lazy dog while the calm river "
    "flows past the old stone bridge in the quiet evening light"
)
TEXT_B = (
    "distributed query engines partition shuffle and aggregate columnar "
    "batches across executors with vectorized readers and code generation"
)
TEXT_C = (
    "training corpora require deduplication contamination checks and "
    "deterministic sampling before any tokenization or packing stage"
)


def _write_batch(src, name, rows):
    lines = "".join(
        json.dumps({"doc_id": i, "text": t}) + "\n" for i, t in rows
    )
    (src / name).write_text(lines)


@pytest.fixture()
def ingest_env(spark, tmp_path):
    # empty-corpus index: the stream builds the corpus from scratch
    empty = spark.createDataFrame([], "doc_id long, text string")
    write_minhash_index(
        empty, "mh_ingest", "doc_id", "text",
        n_buckets=4, path=str(tmp_path / "idx"), **PARAMS,
    )
    yield tmp_path
    spark.sql("DROP TABLE IF EXISTS mh_ingest")


def _run_once(spark, src, out, ckpt, counts, run_id=None):
    stream = spark.readStream.schema("doc_id long, text string").json(str(src))
    q = start_dedup_ingest(
        stream, "mh_ingest", str(out), str(ckpt),
        n_buckets=4, available_now=True, run_id=run_id,
        on_batch=lambda bid, c: counts.append(c), **PARAMS,
    )
    q.awaitTermination(120)


def test_two_batch_ingest_routes_and_extends_index(spark, ingest_env):
    tmp = ingest_env
    src = tmp / "src"
    src.mkdir()
    out, ckpt = tmp / "out", tmp / "ckpt"
    counts: list[dict] = []

    # batch 1: A, B unique; id 3 an exact dup of B within the batch
    _write_batch(src, "b1.json", [(1, TEXT_A), (2, TEXT_B), (3, TEXT_B)])
    _run_once(spark, src, out, ckpt, counts, run_id="r1")

    # batch 2: C unique; id 5 a NEAR dup of the ACCEPTED doc 1; id 2
    # REDELIVERED verbatim (already accepted in batch 1)
    _write_batch(
        src, "b2.json", [(4, TEXT_C), (5, TEXT_A_NEAR), (2, TEXT_B)]
    )
    _run_once(spark, src, out, ckpt, counts, run_id="r1")

    accepted = spark.read.parquet(str(out / "accepted"))
    assert {r.doc_id for r in accepted.collect()} == {1, 2, 4}
    assert accepted.count() == 3  # the redelivered id 2 was NOT re-accepted
    quar = {
        r.doc_id: (r.reason, r.matched_corpus_id)
        for r in spark.read.parquet(str(out / "quarantine")).collect()
    }
    assert quar[3][0] == "in_batch_dup"
    assert quar[5] == ("corpus_dup", 1)
    assert quar[2] == ("already_ingested", 2)
    assert set(quar) == {2, 3, 5}

    # per-batch funnel counts
    assert counts[0] == {
        "n_in": 3, "n_same_id_collapsed": 0, "n_suppressed": 0,
        "n_high_ppl": 0,
        "n_low_quality": 0, "n_in_batch_dup": 1,
        "n_corpus_dup": 0, "n_already_ingested": 0, "n_accepted": 2,
    }
    assert counts[1] == {
        "n_in": 3, "n_same_id_collapsed": 0, "n_suppressed": 0,
        "n_high_ppl": 0,
        "n_low_quality": 0, "n_in_batch_dup": 0,
        "n_corpus_dup": 1, "n_already_ingested": 1, "n_accepted": 1,
    }

    # the index carries postings for exactly the accepted docs
    idx_ids = {
        r.corpus_id
        for r in spark.table("mh_ingest").select("corpus_id").collect()
    }
    assert idx_ids == {1, 2, 4}


def test_fresh_checkpoint_replay_cannot_duplicate_documents(spark, ingest_env):
    """Worst-case full replay: same batch re-run from a FRESH
    checkpoint (new run id).  Previously-accepted ids are shunted to
    already_ingested by the index probe — the accepted corpus gains
    nothing, and the new run's partitions never clobber the old
    run's (run_id keys the output layout)."""
    tmp = ingest_env
    src = tmp / "src"
    src.mkdir()
    out = tmp / "out"
    counts: list[dict] = []
    _write_batch(src, "b1.json", [(1, TEXT_A), (2, TEXT_B), (3, TEXT_B)])
    _run_once(spark, src, out, tmp / "ckpt1", counts, run_id="run-a")
    _run_once(spark, src, out, tmp / "ckpt2", counts, run_id="run-b")

    acc = spark.read.parquet(str(out / "accepted"))
    assert acc.count() == acc.select("doc_id").distinct().count() == 2
    assert {r.run_id for r in acc.select("run_id").distinct().collect()} == {
        "run-a"
    }
    quar = spark.read.parquet(str(out / "quarantine"))
    by_reason = {
        (r.doc_id, r.reason) for r in quar.collect()
    }
    # doc 3: in-batch dup in BOTH runs (two partitions); docs 1, 2:
    # already_ingested in the replay run only
    assert by_reason == {
        (3, "in_batch_dup"),
        (1, "already_ingested"),
        (2, "already_ingested"),
    }
    assert quar.filter("reason = 'in_batch_dup'").count() == 2
    # replay accepted nothing -> appended nothing: postings unchanged
    assert spark.table("mh_ingest").count() == 2 * PARAMS["bands"]
    # a fresh near-dup probe still sees ONE candidate per pair
    from osrs_dashboard_elt_spark.operators.dedup_index import (
        probe_minhash_index,
    )

    new = spark.createDataFrame([(9, TEXT_A_NEAR)], "doc_id long, text string")
    got = probe_minhash_index(
        spark, new, "mh_ingest", "doc_id", "text", **PARAMS
    ).collect()
    assert [(r.new_id, r.corpus_id) for r in got] == [(9, 1)]


def test_same_id_rows_within_one_batch_collapse(spark, ingest_env):
    """Source-side redelivery INSIDE one micro-batch: two rows with
    the same doc_id.  Pair generators (id_a < id_b) cannot pair a doc
    with itself, so without the up-front collapse the canon join fans
    out (2 copies -> 4 accepted rows) and ``accepted`` violates its
    unique-id invariant."""
    tmp = ingest_env
    src = tmp / "src"
    src.mkdir()
    out = tmp / "out"
    counts: list[dict] = []
    _write_batch(
        src, "b1.json",
        [(1, TEXT_A), (1, TEXT_A), (1, TEXT_A), (2, TEXT_B)],
    )
    _run_once(spark, src, out, tmp / "ckpt", counts, run_id="r1")

    acc = spark.read.parquet(str(out / "accepted"))
    assert acc.count() == 2  # exactly one row per id survives
    assert {r.doc_id for r in acc.collect()} == {1, 2}
    assert counts[0] == {
        "n_in": 2, "n_same_id_collapsed": 2, "n_suppressed": 0,
        "n_high_ppl": 0,
        "n_low_quality": 0,
        "n_in_batch_dup": 0,
        "n_corpus_dup": 0, "n_already_ingested": 0, "n_accepted": 2,
    }
    # the index learned each id once
    posts = spark.table("mh_ingest")
    assert posts.count() == 2 * PARAMS["bands"]


def test_lm_quality_gate_quarantines_gibberish(spark, ingest_env):
    """With a trusted-corpus LM armed, a gibberish doc routes to
    quarantine (reason=high_perplexity) BEFORE dedup; fluent docs of
    the same batch are accepted and indexed as usual."""
    from osrs_dashboard_elt_spark.operators.lm import bigram_model

    trusted = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate([TEXT_A, TEXT_B, TEXT_C] * 3)],
        "doc_id long, text string",
    )
    cw, ct, v = bigram_model(trusted, "text")
    src = ingest_env / "in"
    src.mkdir()
    gibberish = "zq xv qk jw vz kx wj zzq vvx qqk jjw zvz"
    _write_batch(src, "b0.json", [(1, TEXT_A), (2, gibberish)])
    counts: list = []
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(src)
    )
    q = start_dedup_ingest(
        stream, "mh_ingest", str(ingest_env / "out"),
        str(ingest_env / "ckpt"),
        n_buckets=4, available_now=True,
        on_batch=lambda bid, c: counts.append(c),
        lm_model=(cw, ct, v), max_avg_nll=3.5, **PARAMS,
    )
    q.awaitTermination(120)
    assert counts[0]["n_high_ppl"] == 1
    assert counts[0]["n_accepted"] == 1
    quar = spark.read.parquet(str(ingest_env / "out" / "quarantine"))
    rows = {(r.doc_id, r.reason) for r in quar.collect()}
    assert (2, "high_perplexity") in rows
    acc = spark.read.parquet(str(ingest_env / "out" / "accepted"))
    assert {r.doc_id for r in acc.collect()} == {1}


def test_probe_quality_gate_quarantines_low_scores(spark, ingest_env):
    """With a registry-style linear probe armed, a doc scoring below
    the cutoff routes to quarantine (reason=low_quality_score) before
    dedup; the serve cost is one scan-side projection.  Weights pick
    out the stopword-ratio feature, so stopword-free gibberish scores
    0.0 and natural text scores above the cutoff."""
    src = ingest_env / "in"
    src.mkdir()
    gibberish = "zq xv qk jw vz kx wj zzq vvx qqk jjw zvz"
    _write_batch(src, "b0.json", [(1, TEXT_A), (2, gibberish)])
    counts: list = []
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(src)
    )
    q = start_dedup_ingest(
        stream, "mh_ingest", str(ingest_env / "out"),
        str(ingest_env / "ckpt"),
        n_buckets=4, available_now=True,
        on_batch=lambda bid, c: counts.append(c),
        probe_model=([0.0, 1.0, 0.0, 0.0], 0.05), **PARAMS,
    )
    q.awaitTermination(120)
    assert counts[0]["n_low_quality"] == 1
    assert counts[0]["n_accepted"] == 1
    quar = spark.read.parquet(str(ingest_env / "out" / "quarantine"))
    rows = {(r.doc_id, r.reason) for r in quar.collect()}
    assert (2, "low_quality_score") in rows
    acc = spark.read.parquet(str(ingest_env / "out" / "accepted"))
    assert {r.doc_id for r in acc.collect()} == {1}


def test_ann_index_freshness(spark, ingest_env):
    """With ann_index armed, every ACCEPTED doc's PQ codes land in
    the at-rest ANN index within its own micro-batch — a
    just-ingested doc is immediately searchable; quarantined docs
    never enter the index; a fresh-checkpoint replay cannot
    duplicate codes (id anti-join)."""
    from osrs_dashboard_elt_spark.multimodal.embedder import embed_documents
    from osrs_dashboard_elt_spark.operators.pq import pq_train, write_pq_index

    # codebooks: a fixed model trained on a seed corpus's embeddings
    seed_docs = spark.createDataFrame(
        [(100 + i,) for i in range(20)], "doc_id long"
    )
    books = pq_train(
        embed_documents(seed_docs, "doc_id"), "embedding",
        m=4, k=4, n_iter=1, id_col="doc_id", seed=3,
    )
    ann_path = str(ingest_env / "ann")
    write_pq_index(
        spark.createDataFrame([], "doc_id long, embedding array<double>"),
        "embedding", books, ann_path, id_col="doc_id",
    )

    src = ingest_env / "in"
    src.mkdir()
    _write_batch(src, "b0.json", [(1, TEXT_A), (2, TEXT_A_NEAR), (3, TEXT_B)])
    counts: list = []

    def go(ckpt):
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        q = start_dedup_ingest(
            stream, "mh_ingest", str(ingest_env / "out"), str(ckpt),
            n_buckets=4, available_now=True,
            on_batch=lambda bid, c: counts.append(c),
            ann_index=(books, ann_path), **PARAMS,
        )
        q.awaitTermination(120)

    go(ingest_env / "ckpt")
    acc = {
        r.doc_id
        for r in spark.read.parquet(
            str(ingest_env / "out" / "accepted")
        ).collect()
    }
    idx = spark.read.parquet(ann_path)
    assert {r.doc_id for r in idx.collect()} == acc  # exactly the accepted
    assert 2 not in acc  # the near-dup quarantined, so not indexed
    # fresh-checkpoint replay of the same files: no duplicate codes
    go(ingest_env / "ckpt2")
    after = spark.read.parquet(ann_path)
    assert after.count() == after.select("doc_id").distinct().count() == len(acc)


def test_crash_between_pq_and_minhash_appends_converges(
    spark, ingest_env, monkeypatch
):
    """The documented dual-index crash window: the PQ freshness
    append (4a) committed, the process dies BEFORE the MinHash
    catalog append (4b).  The micro-batch never committed to the
    checkpoint, so a SAME-checkpoint restart replays it — the PQ
    side's skip_existing anti-join absorbs the re-append (no
    duplicate codes) and the MinHash side finally lands its postings
    (none missing): both indexes converge to exactly the accepted
    set, like the fresh-checkpoint test proves for the accept path."""
    from osrs_dashboard_elt_spark.multimodal.embedder import embed_documents
    from osrs_dashboard_elt_spark.operators.pq import pq_train, write_pq_index
    from osrs_dashboard_elt_spark.streaming import dedup_ingest as di

    seed_docs = spark.createDataFrame(
        [(100 + i,) for i in range(20)], "doc_id long"
    )
    books = pq_train(
        embed_documents(seed_docs, "doc_id"), "embedding",
        m=4, k=4, n_iter=1, id_col="doc_id", seed=3,
    )
    ann_path = str(ingest_env / "ann")
    write_pq_index(
        spark.createDataFrame([], "doc_id long, embedding array<double>"),
        "embedding", books, ann_path, id_col="doc_id",
    )

    src = ingest_env / "in"
    src.mkdir()
    _write_batch(src, "b0.json", [(1, TEXT_A), (2, TEXT_A_NEAR), (3, TEXT_B)])

    real_write = di.write_minhash_index
    calls = {"n": 0}

    def dying_write(*args, **kwargs):
        calls["n"] += 1
        raise RuntimeError("simulated crash after PQ append, before 4b")

    def go(fail):
        monkeypatch.setattr(
            di, "write_minhash_index", dying_write if fail else real_write
        )
        stream = spark.readStream.schema("doc_id long, text string").json(
            str(src)
        )
        q = di.start_dedup_ingest(
            stream, "mh_ingest", str(ingest_env / "out"),
            str(ingest_env / "ckpt"),  # SAME checkpoint both runs
            n_buckets=4, available_now=True,
            ann_index=(books, ann_path), **PARAMS,
        )
        q.awaitTermination(120)

    # run 1 dies inside the window: PQ append landed, postings did not
    with pytest.raises(Exception):
        go(fail=True)
    assert calls["n"] == 1
    pq_mid = spark.read.parquet(ann_path)
    assert {r.doc_id for r in pq_mid.collect()} == {1, 3}  # 4a committed
    assert spark.table("mh_ingest").count() == 0  # 4b never ran

    # run 2: same checkpoint -> the engine replays the batch
    go(fail=False)
    acc = {
        r.doc_id
        for r in spark.read.parquet(
            str(ingest_env / "out" / "accepted")
        ).collect()
    }
    assert acc == {1, 3}
    # PQ side converged with NO duplicate codes
    pq_after = spark.read.parquet(ann_path)
    assert (
        pq_after.count()
        == pq_after.select("doc_id").distinct().count()
        == len(acc)
    )
    assert {r.doc_id for r in pq_after.collect()} == acc
    # MinHash side converged with NO missing postings.  (foreachBatch
    # appends through a CLONED session whose relation cache it
    # invalidates; this outer session cached the table's file listing
    # at the mid-crash read above, so refresh before observing —
    # in-pipeline probes run inside the clone and never see staleness.)
    spark.catalog.refreshTable("mh_ingest")
    posts = spark.table("mh_ingest")
    assert {
        r.corpus_id for r in posts.select("corpus_id").collect()
    } == acc
    assert posts.count() == len(acc) * PARAMS["bands"]


def test_ingest_maintains_takedown_ready_manifest(spark, ingest_env):
    """stats_manifest=(...) keeps a file-skipping manifest (with an
    id bloom) over the accepted dir, refreshed O(batch) per
    micro-batch — so a later id takedown rewrites only matching files
    and point reads prune at planning time."""
    from osrs_dashboard_elt_spark.sources.maintenance import (
        targeted_delete,
    )
    from osrs_dashboard_elt_spark.sources.stats_manifest import (
        pruned_scan,
    )

    tmp = ingest_env
    src = tmp / "src"
    src.mkdir()
    out, ckpt = tmp / "out", tmp / "ckpt"
    counts: list[dict] = []
    _write_batch(src, "b1.json", [(1, TEXT_A), (2, TEXT_B)])
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(src)
    )
    q = start_dedup_ingest(
        stream, "mh_ingest", str(out), str(ckpt),
        n_buckets=4, available_now=True, run_id="r1",
        on_batch=lambda bid, c: counts.append(c),
        stats_manifest=(["doc_id"], ["doc_id"]),
        **PARAMS,
    )
    q.awaitTermination(120)
    _write_batch(src, "b2.json", [(5, TEXT_C)])
    stream = spark.readStream.schema("doc_id long, text string").json(
        str(src)
    )
    q = start_dedup_ingest(
        stream, "mh_ingest", str(out), str(ckpt),
        n_buckets=4, available_now=True, run_id="r1",
        on_batch=lambda bid, c: counts.append(c),
        stats_manifest=(["doc_id"], ["doc_id"]),
        **PARAMS,
    )
    q.awaitTermination(120)
    acc = f"{out}/accepted"
    # the manifest is FRESH across both activations: point reads work
    got = pruned_scan(spark, acc, points={"doc_id": 5})
    assert got.count() == 1
    # takedown: rewrite only the files containing doc 1
    res = targeted_delete(spark, acc, "doc_id", [1])
    assert res["rows_deleted"] == 1
    remaining = spark.read.parquet(acc)
    assert sorted(r["doc_id"] for r in remaining.collect()) == [2, 5]
    # manifest still consistent post-delete
    assert pruned_scan(spark, acc, points={"doc_id": 1}).count() == 0


def test_manifest_bootstrap_survives_all_rejected_first_batch(
    spark, ingest_env
):
    """An all-quarantined first batch writes an EMPTY accepted dir; the
    manifest bootstrap must wait for the first ACCEPTING batch instead
    of dying on schema inference over zero files."""
    from osrs_dashboard_elt_spark.sources.stats_manifest import (
        has_stats_manifest,
        pruned_scan,
    )

    tmp = ingest_env
    # pre-index doc 1 so redelivering it accepts NOTHING
    write_minhash_index(
        spark.createDataFrame([(1, TEXT_A)], "doc_id long, text string"),
        "mh_pre", "doc_id", "text",
        n_buckets=4, path=str(tmp / "idx2"), **PARAMS,
    )
    try:
        src = tmp / "src"
        src.mkdir()
        out, ckpt = tmp / "out", tmp / "ckpt"
        counts: list[dict] = []
        _write_batch(src, "b1.json", [(1, TEXT_A)])  # already ingested
        for batch in ("first", "second"):
            stream = spark.readStream.schema(
                "doc_id long, text string"
            ).json(str(src))
            q = start_dedup_ingest(
                stream, "mh_pre", str(out), str(ckpt),
                n_buckets=4, available_now=True, run_id="r1",
                on_batch=lambda bid, c: counts.append(c),
                stats_manifest=(["doc_id"], ["doc_id"], 1 << 15),
                **PARAMS,
            )
            q.awaitTermination(120)
            if batch == "first":
                assert counts[-1]["n_accepted"] == 0
                assert not has_stats_manifest(f"{out}/accepted")
                _write_batch(src, "b2.json", [(7, TEXT_B)])
        assert counts[-1]["n_accepted"] == 1
        got = pruned_scan(spark, f"{out}/accepted", points={"doc_id": 7})
        assert got.count() == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS mh_pre")


def test_takedown_end_to_end_no_resurrection(spark, ingest_env):
    """The full takedown loop (round-8 verdict ask #8): docs ingested
    across several micro-batches are taken down — data via
    targeted_delete, derived postings via delete_from_index, future
    deliveries via the suppression list — and a redelivered batch
    CANNOT resurrect them: the taken-down id routes to quarantine
    (id + reason only, never content) while fresh docs keep
    flowing."""
    from osrs_dashboard_elt_spark.operators.dedup_index import (
        delete_from_index,
    )
    from osrs_dashboard_elt_spark.sources.maintenance import (
        targeted_delete,
    )
    from osrs_dashboard_elt_spark.sources.stats_manifest import (
        pruned_scan,
    )

    tmp = ingest_env
    src = tmp / "src"
    src.mkdir()
    out, ckpt = tmp / "out", tmp / "ckpt"
    counts: list[dict] = []
    sm_arg = (["doc_id"], ["doc_id"])

    def run(run_id, ckpt_dir, suppress=None):
        stream = spark.readStream.schema(
            "doc_id long, text string"
        ).json(str(src))
        q = start_dedup_ingest(
            stream, "mh_ingest", str(out), str(ckpt_dir),
            n_buckets=4, available_now=True, run_id=run_id,
            on_batch=lambda bid, c: counts.append(c),
            stats_manifest=sm_arg, suppress=suppress,
            **PARAMS,
        )
        q.awaitTermination(120)

    # two micro-batches build the corpus: docs 1, 2 then 5
    _write_batch(src, "b1.json", [(1, TEXT_A), (2, TEXT_B)])
    run("r1", ckpt)
    _write_batch(src, "b2.json", [(5, TEXT_C)])
    run("r1", ckpt)
    acc = f"{out}/accepted"
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(acc).collect()
    ) == [1, 2, 5]

    # ---- takedown of doc 2: data + derived postings + suppression
    takedown = [2]
    res = targeted_delete(spark, acc, "doc_id", takedown)
    assert res["rows_deleted"] == 1
    assert delete_from_index(spark, "mh_ingest", takedown) == 1
    assert sorted(
        r["doc_id"] for r in spark.read.parquet(acc).collect()
    ) == [1, 5]

    # ---- an at-least-once source redelivers doc 2 (fresh checkpoint,
    # new run id — the worst case: the index tombstone means the probe
    # no longer recognizes it, so WITHOUT the suppression list it
    # would be re-accepted) alongside a genuinely new doc 7
    text_d = (
        "seventeen lanterns swung from the harbor masts as the tide "
        "carried crates of salted fish toward the waiting merchants"
    )
    _write_batch(src, "b3.json", [(2, TEXT_B), (7, text_d)])
    run("r2", tmp / "ckpt2", suppress=takedown)
    last = counts[-1]
    assert last["n_suppressed"] == 1
    assert last["n_accepted"] == 1  # the fresh doc keeps flowing
    accepted_ids = sorted(
        r["doc_id"] for r in spark.read.parquet(acc).collect()
    )
    assert accepted_ids == [1, 5, 7]
    assert 2 not in accepted_ids  # NEVER resurrected
    quar = spark.read.parquet(f"{out}/quarantine")
    taken = quar.filter("reason = 'taken_down'").collect()
    assert [r["doc_id"] for r in taken] == [2]
    assert "text" not in quar.columns  # audit trail stores no content
    # manifest stays fresh through the whole loop: point reads work
    # and the taken-down id reads empty
    assert pruned_scan(spark, acc, points={"doc_id": 2}).count() == 0
    assert pruned_scan(spark, acc, points={"doc_id": 5}).count() == 1
    # replayed takedown is cheap and idempotent
    res2 = targeted_delete(spark, acc, "doc_id", takedown)
    assert res2["rows_deleted"] == 0
