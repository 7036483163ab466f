"""RRF fusion (operators/retrieval.py): rank math, truncated-list
handling, ranker order independence of membership."""

from __future__ import annotations

import pytest

from osrs_dashboard_elt_spark.operators.retrieval import rrf_fuse


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_rrf_math_and_absent_docs(spark):
    a = _df(spark, [(1, 9.0), (2, 5.0), (3, 1.0)])
    b = _df(spark, [(2, 0.9), (4, 0.8)])
    out = {r.doc_id: r for r in rrf_fuse(
        [("a", a), ("b", b)], k=60, top=10).collect()}
    # doc 2: rank 2 in a, rank 1 in b
    assert out[2].rrf_score == pytest.approx(1 / 62 + 1 / 61, abs=0)
    assert (out[2].a_rank, out[2].b_rank) == (2, 1)
    # doc 4 only in b -> a_rank NULL, single contribution
    assert out[4].a_rank is None
    assert out[4].rrf_score == pytest.approx(1 / 62, abs=0)
    # fused ordering: 2 first (two strong ranks)
    ordered = rrf_fuse([("a", a), ("b", b)], top=10).collect()
    assert ordered[0].doc_id == 2


def test_rrf_score_ties_break_by_id(spark):
    a = _df(spark, [(5, 1.0), (7, 0.5)])
    b = _df(spark, [(7, 1.0), (5, 0.5)])
    # both docs: ranks {1,2} -> identical rrf; smaller id first
    got = [r.doc_id for r in rrf_fuse([("a", a), ("b", b)]).collect()]
    assert got == [5, 7]


def test_rrf_requires_rankings(spark):
    with pytest.raises(ValueError):
        rrf_fuse([])
