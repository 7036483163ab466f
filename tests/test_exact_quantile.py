"""Exact distributed order statistics: agreement with a local sort,
skew/duplicate handling, and the narrowing loop's bounds
(operators/exact_quantile.py)."""

from __future__ import annotations

import pytest

from osrs_dashboard_elt_spark.operators.exact_quantile import (
    exact_kth,
    exact_quantile,
)


@pytest.fixture(scope="module")
def values(spark):
    # mixed magnitudes + heavy duplicates + negatives
    vals = (
        [i * 37 for i in range(500)]
        + [42] * 300
        + [-(i * 13) for i in range(200)]
        + [7_000_000_000 + i for i in range(50)]  # beyond int32
    )
    return (
        spark.createDataFrame([(v,) for v in vals], "v bigint").cache(),
        sorted(vals),
    )


def test_kth_matches_local_sort(values):
    df, ordered = values
    n = len(ordered)
    for k in (1, 2, 137, n // 2, n - 1, n):
        assert exact_kth(df, "v", k, n_bins=16) == ordered[k - 1], k


def test_quantiles_match_rank_rule(values):
    """The rank rule uses q at its EXACT IEEE value (Fraction):
    float 0.9 is 0.9000...0222, so at n=1050 the rank is 946, not
    the decimal-0.9 answer 945 — self-consistent and engine-
    independent, which is the point (the suite oracle replays the
    same integer rank, never an engine's percentile rounding)."""
    from fractions import Fraction

    df, ordered = values
    n = len(ordered)
    for q in (0.25, 0.5, 0.75, 0.9):
        fr = Fraction(q) * n
        k = max(1, -(-fr.numerator // fr.denominator))
        assert exact_quantile(df, "v", q, n_bins=16) == ordered[k - 1], q


def test_multi_quantiles_share_rounds(values, monkeypatch):
    """Several quantiles resolve with ONE bounded aggregate per
    narrowing round (plus the shared stats scan) — each collect is a
    full column pass at scale, so 3 quantiles must not cost 3 loops.
    Counted via DataFrame.collect; the bound is the single-quantile
    round count, not 3x it."""
    from fractions import Fraction

    import pyspark.sql.dataframe as D

    from osrs_dashboard_elt_spark.operators.exact_quantile import (
        exact_quantiles,
    )

    df, ordered = values
    n = len(ordered)
    calls = {"n": 0}
    orig = D.DataFrame.collect

    def counted(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(D.DataFrame, "collect", counted)
    qs = (0.25, 0.5, 0.75)
    got = exact_quantiles(df, "v", qs, n_bins=16, collect_limit=10)
    for q in qs:
        fr = Fraction(q) * n
        k = max(1, -(-fr.numerator // fr.denominator))
        assert got[q] == ordered[k - 1], q
    # stats + <= ceil(log_16(span ~ 7e9)) + exact-finish rounds; the
    # un-shared form costs ~3x this.  Generous headroom, still far
    # below the per-quantile loop count.
    assert calls["n"] <= 12, calls["n"]


def test_degenerate_all_equal(spark):
    df = spark.createDataFrame([(5,)] * 100, "v bigint")
    assert exact_kth(df, "v", 50) == 5


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1,), (None,), (3,), (None,), (2,)], "v bigint"
    )
    assert exact_kth(df, "v", 2) == 2


def test_k_out_of_range(values):
    df, ordered = values
    with pytest.raises(ValueError, match="out of range"):
        exact_kth(df, "v", len(ordered) + 1)


def test_small_bins_force_many_rounds(values):
    """n_bins=2 forces the loop to narrow one bit per round — the
    answer must not depend on the binning schedule."""
    df, ordered = values
    n = len(ordered)
    assert (
        exact_kth(df, "v", n // 2, n_bins=2, collect_limit=1, max_rounds=64)
        == ordered[n // 2 - 1]
    )


def test_huge_domain_integral_binning(spark):
    """Values past 2^53: double division would round the bin offset
    (4001*2^50 - 1 rounds UP to a multiple of 2^10 as a double,
    landing in bin 4001 instead of 4000) — the integral DIV path must
    place it exactly."""
    vals = [0, 4001 * 2**50 - 1, 2**62 - 1]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    assert exact_kth(df, "v", 2) == 4001 * 2**50 - 1
    assert exact_kth(df, "v", 3) == 2**62 - 1


def test_full_long_domain_bisect_guard(spark):
    """A range spanning more than 2^63 (Long.MIN..Long.MAX-ish) would
    overflow ``__v - lo`` Spark-side; the one-shot bisection at 0
    keeps every later span under 2^63."""
    vals = [-(2**62), -5, 0, 7, 2**62]
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    for k, exp in enumerate(sorted(vals), start=1):
        assert exact_kth(df, "v", k) == exp, k
