"""Johnson-Lindenstrauss projection: shape, validity contract, and
the distance-preservation property (similarity.py::jl_project)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.similarity import (
    hyperplanes,
    jl_project,
)

DIM, OUT = 32, 16


def _vec(i: int) -> list[float]:
    # exact binary fractions, varied directions
    return [
        (0.25 if (i >> (d % 5)) & 1 else -0.5) + 0.0625 * ((i * 7 + d) % 3)
        for d in range(DIM)
    ]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [(i, _vec(i)) for i in range(60)],
        "vec_id bigint, embedding array<double>",
    ).cache()


def test_shape_and_exact_values(corpus):
    red = jl_project(
        corpus, "embedding", dim=DIM, out_dim=OUT, seed=5, id_col="vec_id"
    )
    rows = {r["vec_id"]: r["reduced"] for r in red.collect()}
    assert len(rows) == 60 and all(len(v) == OUT for v in rows.values())
    # exact replay: plane sign-fold * 1/sqrt(OUT), same left fold
    planes = hyperplanes(OUT, DIM, 5)
    inv = 1.0 / math.sqrt(OUT)
    for vid in (0, 7, 59):
        x = _vec(vid)
        for j, plane in enumerate(planes):
            acc = 0.0
            for p, xi in zip(plane, x):
                acc = acc + xi if p > 0 else acc - xi
            assert rows[vid][j] == acc * inv, (vid, j)


def test_invalid_vectors_dropped(spark, corpus):
    bad = spark.createDataFrame(
        [(100, None), (101, [0.5] * (DIM - 1)), (102, [0.5] * (DIM - 1) + [None])],
        "vec_id bigint, embedding array<double>",
    )
    red = jl_project(
        corpus.unionByName(bad), "embedding", dim=DIM, out_dim=OUT,
        seed=5, id_col="vec_id",
    )
    assert {r["vec_id"] for r in red.collect()} == set(range(60))


def test_distance_preservation(corpus):
    """The JL property, loosely: over sample pairs, squared distances
    in the projected space track the originals (correlation, not a
    per-pair epsilon — OUT=16 is noisy)."""
    red = jl_project(
        corpus, "embedding", dim=DIM, out_dim=OUT, seed=5, id_col="vec_id"
    )
    orig = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    proj = {r["vec_id"]: r["reduced"] for r in red.collect()}

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    pairs = [(i, (i * 13 + 7) % 60) for i in range(60) if i != (i * 13 + 7) % 60]
    do = [d2(orig[a], orig[b]) for a, b in pairs]
    dp = [d2(proj[a], proj[b]) for a, b in pairs]
    mo, mp = sum(do) / len(do), sum(dp) / len(dp)
    cov = sum((a - mo) * (b - mp) for a, b in zip(do, dp))
    var_o = sum((a - mo) ** 2 for a in do)
    var_p = sum((b - mp) ** 2 for b in dp)
    corr = cov / math.sqrt(var_o * var_p)
    assert corr > 0.5, corr
    # the mean ratio sits near 1: the estimator is unbiased over the
    # plane distribution, but ONE fixed 16-plane draw over pairs with
    # correlated difference directions (this synthetic corpus) keeps
    # a shared offset — hence the loose band, not +/-10%
    ratios = [p / o for o, p in zip(do, dp) if o > 0]
    assert 0.5 < sum(ratios) / len(ratios) < 1.6
