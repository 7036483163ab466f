"""Temperature-scaled mix targets (operators/sampling.py)."""

from __future__ import annotations

from osrs_dashboard_elt_spark.operators.sampling import (
    temperature_mix_targets,
)


def _df(spark, counts):
    rows = [(d, i) for d, n in counts.items() for i in range(n)]
    return spark.createDataFrame(rows, "domain string, k long")


def test_targets_sum_exactly_to_scale(spark):
    t = temperature_mix_targets(
        _df(spark, {"a": 97, "b": 13, "c": 1}), "domain", 0.5
    )
    assert sum(t.values()) == 1_000_000


def test_t1_is_proportional_and_t0_uniform(spark):
    df = _df(spark, {"a": 60, "b": 30, "c": 10})
    t1 = temperature_mix_targets(df, "domain", 1.0)
    assert t1["a"] == 600_000 and t1["b"] == 300_000 and t1["c"] == 100_000
    t0 = temperature_mix_targets(df, "domain", 0.0)
    # 1e6/3 rounds by largest remainder: one domain gets the extra ppm
    assert sorted(t0.values()) == [333_333, 333_333, 333_334]


def test_fractional_t_upweights_rare(spark):
    df = _df(spark, {"common": 900, "rare": 100})
    t = temperature_mix_targets(df, "domain", 0.5)
    # raw share 10% -> sqrt weighting lifts rare to 25%
    assert t["rare"] == 250_000 and t["common"] == 750_000


def test_empty_frame(spark):
    assert temperature_mix_targets(_df(spark, {}), "domain", 0.5) == {}
