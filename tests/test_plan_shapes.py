"""Physical-plan hygiene gates: catch scale regressions (cartesian
products, nested-loop joins, lost filter pushdown) before they cost
anything on a real cluster.  Plans are built at sf0.001 — planning
only, no execution."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

_FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# Sanctioned exceptions: the resample gap-fill crosses the bucket
# spine with the distinct group set — BOTH sides are post-aggregation
# outputs bounded by (bucket count x group count), independent of the
# data size, so the nested-loop join is scale-safe by construction.
_ALLOWED = {"q_resample_daily_gapfill": {"BroadcastNestedLoopJoin"}}


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def all_queries(spark):
    import __spark_entry__ as e

    return e.queries()


def test_no_cartesian_or_nested_loop_joins(spark, all_queries):
    """Every suite query must plan without cartesian or nested-loop
    joins — the two shapes that melt down at 100x data."""
    offenders = {}
    for name, fn in all_queries.items():
        plan = _executed_plan(fn(spark, SF_DIR))
        bad = [
            op
            for op in _FORBIDDEN
            if op in plan and op not in _ALLOWED.get(name, ())
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"scale-hostile join shapes: {offenders}"


def test_filters_push_to_parquet_scan(spark, all_queries):
    """Queries with scan-level predicates must show them as
    PushedFilters on the parquet relation, not post-scan Filters."""
    plan = _executed_plan(all_queries["q_filter_events"](spark, SF_DIR))
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate (not just the empty list)
    assert any(
        tok in plan for tok in ("EqualTo", "GreaterThan", "In(", "IsNotNull")
    ), plan


def test_dimension_joins_broadcast(spark, all_queries):
    """Star-schema dimension joins must be broadcast, not shuffled."""
    plan = _executed_plan(all_queries["q05_region_revenue"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_leaderboard_is_single_aggregation_pass(spark, all_queries):
    """The multi-period leaderboard must be ONE conditional-agg pass:
    a single pair of HashAggregate stages (partial + final), no join
    back per period."""
    plan = _executed_plan(all_queries["q_leaderboard_periods"](spark, SF_DIR))
    assert "Join" not in plan, plan
    # one shuffle only (partial->final aggregate)
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_parse_dispatch_keeps_prefilter_gates(spark, all_queries):
    """The variant dispatch must keep its contains() prefilter gates
    in the physical plan — losing them (a refactor emitting plain
    RLIKEs) silently doubles regex work per row."""
    plan = _executed_plan(all_queries["q_parse_engine"](spark, SF_DIR))
    assert "Contains(" in plan or "contains(" in plan, plan[:2000]
