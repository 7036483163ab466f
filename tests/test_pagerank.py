"""Integer-mass PageRank (operators/pagerank.py): hand-computed tiny
graph, partition invariance, mass conservation bounds."""

from __future__ import annotations

import pytest

from osrs_dashboard_elt_spark.operators.pagerank import pagerank


@pytest.fixture(scope="module")
def tiny(spark):
    # 1->2, 2->1: a symmetric pair plus a sink 3 fed by 1
    return spark.createDataFrame(
        [(1, 2), (2, 1), (1, 3)], "src long, dst long"
    )


def test_one_round_by_hand(spark, tiny):
    """mass0 = 1e9 each; deg(1)=2, deg(2)=1, deg(3)=0.
    node1 recv = mass2 DIV 1 = 1e9 -> 15e7 + (1e9*85) DIV 100 = 1e9
    node2 recv = 1e9 DIV 2       -> 15e7 + (5e8*85) DIV 100 = 575e6
    node3 recv = 1e9 DIV 2       -> same as node2"""
    got = {r.node: r.mass for r in pagerank(tiny, n_iter=1).collect()}
    assert got == {1: 1_000_000_000, 2: 575_000_000, 3: 575_000_000}


def test_partition_invariance(spark, tiny):
    a = sorted(
        (r.node, r.mass) for r in pagerank(tiny, n_iter=4).collect()
    )
    b = sorted(
        (r.node, r.mass)
        for r in pagerank(tiny.repartition(13), n_iter=4).collect()
    )
    assert a == b


def test_mass_bounds_and_rank_column(spark, tiny):
    out = pagerank(tiny, n_iter=3).collect()
    total = sum(r.mass for r in out)
    n = len(out)
    # mass only leaks (dangling node 3, DIV remainders): never grows
    assert total <= n * 1_000_000_000
    assert total >= n * 150_000_000  # the re-minted base is a floor
    for r in out:
        assert abs(r.rank - r.mass / (n * 1_000_000_000)) < 1e-15


def test_edges_distinct_skips_dedup_but_matches(spark, tiny):
    """``edges_distinct=True`` on an already-unique edge list must be
    result-identical to the defensive default — it only removes the
    pre-loop dedup shuffle — and the routing table must carry degree
    via a window on the edge rows (one Exchange), not a groupBy+join
    glue-back."""
    from pyspark.sql.classic.dataframe import DataFrame

    a = sorted(
        (r.node, r.mass) for r in pagerank(tiny, n_iter=2).collect()
    )
    b = sorted(
        (r.node, r.mass)
        for r in pagerank(tiny, n_iter=2, edges_distinct=True).collect()
    )
    assert a == b

    def plan_of(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    # localCheckpoint hides the edge-preparation lineage from every
    # downstream plan (even unmaterialized) — neutralize it so the
    # shapes are visible
    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        slow_plan = plan_of(pagerank(tiny, n_iter=1))
        fast_plan = plan_of(pagerank(tiny, n_iter=1, edges_distinct=True))
    finally:
        DataFrame.localCheckpoint = orig
    # the defensive (src, dst) dedup aggregate is gone; degree rides
    # a window on the edge rows instead of a groupBy+join glue-back
    assert fast_plan.count("HashAggregate") < slow_plan.count(
        "HashAggregate"
    )
    assert "Window" in fast_plan


def test_hub_mass_damping_does_not_overflow(spark):
    """The damping multiply runs in DECIMAL(38,0): a hub receiving
    nearly the TOTAL mass at a huge scale would wrap int64 under a
    bare `recv * 85` (regression: silent negative masses past
    ~1.1e8 nodes at the default scale)."""
    scale = 2**61  # total mass 2^62; recv*85 ~ 3.9e20 >> int64 max
    edges = spark.createDataFrame(
        [(1, 2), (2, 2)], "src long, dst long"
    )
    got = {
        r.node: r.mass
        for r in pagerank(edges, n_iter=1, scale=scale).collect()
    }
    base = (scale * 15) // 100
    recv2 = scale + scale  # node 2 gets both nodes' full mass
    assert got == {1: base, 2: base + (recv2 * 85) // 100}
    assert all(m > 0 for m in got.values())
