"""Decontamination (operators/decontaminate.py): hit counting,
threshold semantics, schema preservation, and the broadcast-probe
plan shape that keeps the train side shuffle-free until the match
aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
    eval_shingle_hashes,
)


def _corpus(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated text about spark physical plans here"),
            (3, "the quick brown fox jumps over a sleeping cat instead"),
            (4, "another unrelated document with its own private words only"),
        ],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        "doc_id long, text string",
    )
    return train, evald


def test_contamination_hits_and_threshold(spark):
    train, ev = _corpus(spark)
    rep = {
        r.id: r.n_hits
        for r in contamination_report(train, ev, "doc_id", "text", n=4).collect()
    }
    # doc 1 shares many 4-grams ("the quick brown fox", ...); doc 3
    # shares the leading ones only; docs 2/4 share none
    assert set(rep) == {1, 3}
    assert rep[1] > rep[3] >= 1
    strict = contamination_report(train, ev, "doc_id", "text", n=4, min_hits=rep[1])
    assert [r.id for r in strict.collect()] == [1]


def test_decontaminate_drops_and_preserves_schema(spark):
    train, ev = _corpus(spark)
    clean = decontaminate(train, ev, "doc_id", "text", n=4, min_hits=1)
    assert clean.columns == train.columns
    assert sorted(r.doc_id for r in clean.collect()) == [2, 4]
    # no contamination -> identity
    none = decontaminate(train, ev.filter(F.lit(False)), "doc_id", "text", n=4)
    assert none.count() == 4


def test_eval_hashes_distinct_and_small(spark):
    _, ev = _corpus(spark)
    hashes = eval_shingle_hashes(ev, "text", n=4)
    vals = [r.shingle_hash for r in hashes.collect()]
    assert len(vals) == len(set(vals)) == 7  # 10 words -> 7 distinct 4-grams
    assert all(0 <= v < 2**32 for v in vals)


def test_probe_is_broadcast(spark):
    train, ev = _corpus(spark)
    rep = contamination_report(train, ev, "doc_id", "text", n=4)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # eval probe never shuffles train
