"""Count-based bigram LM scoring (operators/lm.py): hand-computed
probabilities, unseen-gram Laplace floor, partition invariance of the
exact-decimal sum."""

from __future__ import annotations

import math

import pytest

from osrs_dashboard_elt_spark.operators.lm import (
    bigram_model,
    lm_avg_nll,
    lm_score_corpus,
)


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(
        [(1, "a b a b"), (2, "b a")], "doc_id long, text string"
    )


def test_hand_computed_model_and_scores(spark, tiny):
    cw, ct, v = bigram_model(tiny, "text")
    assert v == 2
    assert {(r.ctx, r.w): r.c for r in cw.collect()} == {
        ("a", "b"): 2, ("b", "a"): 2,
    }
    assert {r.ctx: r.tot for r in ct.collect()} == {"a": 2, "b": 2}
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in lm_score_corpus(tiny, "doc_id", "text").collect()
    }
    # every bigram has p = (2+1)/(2+2) = 0.75 -> avg_nll = -ln(0.75)
    want = round(-math.log(0.75), 6)
    assert got == {1: (3, want), 2: (1, want)}


def test_unseen_grams_get_laplace_floor(spark, tiny):
    cw, ct, v = bigram_model(tiny, "text")
    new = spark.createDataFrame(
        [(10, "a c"), (11, "z z")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.avg_nll
        for r in lm_avg_nll(new, "doc_id", "text", cw, ct, v).collect()
    }
    # (a, c): seen ctx, unseen word -> (0+1)/(2+2); (z, z): unseen ctx
    # -> (0+1)/(0+2)
    assert got == {
        10: round(-math.log(1 / 4), 6),
        11: round(-math.log(1 / 2), 6),
    }


def test_sub_bigram_docs_emit_no_row_and_sum_is_partition_invariant(
    spark, tiny
):
    short = tiny.unionByName(
        spark.createDataFrame([(9, "solo"), (8, "")],
                              "doc_id long, text string")
    )
    out = lm_score_corpus(short, "doc_id", "text")
    assert {r.doc_id for r in out.collect()} == {1, 2}
    a = sorted((r.doc_id, r.avg_nll) for r in out.collect())
    b = sorted(
        (r.doc_id, r.avg_nll)
        for r in lm_score_corpus(
            short.repartition(13), "doc_id", "text"
        ).collect()
    )
    assert a == b


def test_unigram_kl_hand_computed_and_nonnegative(spark):
    from osrs_dashboard_elt_spark.operators.lm import unigram_kl_by_group

    df = spark.createDataFrame(
        [("g1", "a a b"), ("g2", "a b b")], "src string, text string"
    )
    got = {
        r.src: (r.n_tokens, r.kl)
        for r in unigram_kl_by_group(df, "src", "text").collect()
    }
    # V=2, N=6; g1: p=(.6,.4) vs q=(.5,.5) -> .6*ln1.2 + .4*ln0.8
    want = round(0.6 * math.log(1.2) + 0.4 * math.log(0.8), 6)
    assert got == {"g1": (3, want), "g2": (3, want)}  # symmetric
    assert all(kl >= 0 for _, kl in got.values())
    # partition invariance of the decimal sum
    again = {
        r.src: (r.n_tokens, r.kl)
        for r in unigram_kl_by_group(
            df.repartition(7), "src", "text"
        ).collect()
    }
    assert again == got
