"""Linear quality probe: GD training determinism, validity
filtering, and separation on a known-separable corpus
(operators/classifier.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.classifier import (
    linear_probe_fit,
    linear_probe_scores,
)

DIM = 4


def _row(i: int):
    # class 1 concentrates on the first two dims, class 0 on the last
    # two; exact binary fractions keep every product float-exact
    y = i % 2
    base = [0.75, 0.5, 0.0625, 0.125] if y else [0.125, 0.0625, 0.5, 0.75]
    jitter = 0.03125 * (i % 5)
    return (i, [x + jitter for x in base], y)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [_row(i) for i in range(40)],
        "vec_id bigint, embedding array<double>, y int",
    ).cache()


def test_fit_separates(corpus):
    w = linear_probe_fit(corpus, "embedding", "y", dim=DIM, n_iter=8, lr=0.5)
    scored = linear_probe_scores(
        corpus, "embedding", "y", w, id_col="vec_id"
    ).collect()
    acc = sum(1 for r in scored if r["pred"] == r["y"]) / len(scored)
    assert acc >= 0.9, acc
    # class means must be ordered even where individual rows miss
    m1 = sum(r["score"] for r in scored if r["y"] == 1) / 20
    m0 = sum(r["score"] for r in scored if r["y"] == 0) / 20
    assert m1 > m0


def test_fit_deterministic_across_partitionings(corpus):
    w1 = linear_probe_fit(corpus, "embedding", "y", dim=DIM, n_iter=3)
    w2 = linear_probe_fit(
        corpus.repartition(7), "embedding", "y", dim=DIM, n_iter=3
    )
    assert w1 == w2  # bit-for-bit: decimal gradient sums


def test_invalid_rows_excluded(spark, corpus):
    bad = spark.createDataFrame(
        [
            (100, None, 1),
            (101, [0.5] * (DIM - 1), 0),
            (102, [0.5, None, 0.5, 0.5], 1),
            (103, [0.5] * DIM, None),
        ],
        "vec_id bigint, embedding array<double>, y int",
    )
    w_clean = linear_probe_fit(corpus, "embedding", "y", dim=DIM, n_iter=2)
    w_dirty = linear_probe_fit(
        corpus.unionByName(bad), "embedding", "y", dim=DIM, n_iter=2
    )
    assert w_clean == w_dirty  # invalid rows take no part in training
    ids = {
        r["vec_id"]
        for r in linear_probe_scores(
            corpus.unionByName(bad), "embedding", "y", w_clean,
            id_col="vec_id",
        ).collect()
    }
    assert ids == set(range(40))


def test_scores_unlabeled_corpus(spark, corpus):
    """The production case: score a corpus that has NO labels — every
    valid-vector row must come back, with no y column."""
    w = linear_probe_fit(corpus, "embedding", "y", dim=DIM, n_iter=2)
    unlabeled = corpus.drop("y")
    scored = linear_probe_scores(
        unlabeled, "embedding", None, w, id_col="vec_id"
    )
    assert scored.columns == ["vec_id", "score", "pred"]
    assert scored.count() == 40
    labeled = {
        r["vec_id"]: (r["score"], r["pred"])
        for r in linear_probe_scores(
            corpus, "embedding", "y", w, id_col="vec_id"
        ).collect()
    }
    for r in scored.collect():
        assert (r["score"], r["pred"]) == labeled[r["vec_id"]]


def test_init_validation(corpus):
    with pytest.raises(ValueError, match="init must have"):
        linear_probe_fit(
            corpus, "embedding", "y", dim=DIM, n_iter=1, init=[0.0] * DIM
        )


def test_no_valid_rows_raises(spark):
    empty = spark.createDataFrame(
        [(1, None, 1)], "vec_id bigint, embedding array<double>, y int"
    )
    with pytest.raises(ValueError, match="no valid training rows"):
        linear_probe_fit(empty, "embedding", "y", dim=DIM, n_iter=1)
