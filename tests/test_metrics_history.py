"""Metrics history + drift (operators/quality.py): per-run profiles
persist day-partitioned with replay-safe replacement, and a run whose
metric jumps outside its trailing min/max band is flagged — the deequ
metrics-repository half."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.quality import (
    assert_no_drift,
    metric_drift,
    metrics_history_append,
    quality_metrics,
)


def _history(spark, rows):
    return spark.createDataFrame(
        rows, "metric string, day string, value double"
    )


def test_drift_flags_deliberate_jump(spark):
    # stable 100±2 for four days, then a 3x jump on day 5
    rows = [
        ("n", "d1", 100.0),
        ("n", "d2", 102.0),
        ("n", "d3", 98.0),
        ("n", "d4", 101.0),
        ("n", "d5", 300.0),
    ]
    d = metric_drift(_history(spark, rows), ["metric"], "day", "value")
    got = {r["day"]: r["drifted"] for r in d.collect()}
    assert got["d5"] is True
    assert got["d4"] is False  # inside [98-tol, 102+tol]
    # fewer than `window` predecessors: not judged
    assert got["d1"] is None and got["d3"] is None


def test_drift_band_tolerance(spark):
    # band over d1-d3 = [90, 110], tol 20% of 20 = 4 -> [86, 114]
    rows = [
        ("n", "d1", 90.0),
        ("n", "d2", 110.0),
        ("n", "d3", 100.0),
        ("n", "d4", 113.0),  # inside padded band
        ("n", "d5", 86.0),   # band d2-d4 = [100,113], tol 2.6 -> low
    ]
    d = metric_drift(_history(spark, rows), ["metric"], "day", "value")
    got = {r["day"]: r["drifted"] for r in d.collect()}
    assert got["d4"] is False
    assert got["d5"] is True


def test_keys_are_independent(spark):
    rows = [
        ("a", f"d{i}", 10.0) for i in range(1, 5)
    ] + [
        ("b", f"d{i}", v)
        for i, v in enumerate([5.0, 5.0, 5.0, 50.0], start=1)
    ]
    d = metric_drift(_history(spark, rows), ["metric"], "day", "value")
    got = {(r["metric"], r["day"]): r["drifted"] for r in d.collect()}
    assert got[("a", "d4")] is False
    assert got[("b", "d4")] is True


def test_assert_no_drift_raises_on_latest_only(spark):
    # the drift is in HISTORY (d4) but the latest run (d5) recovered:
    # the gate passes — it guards deploys, not the archive
    rows = [
        ("n", "d1", 10.0),
        ("n", "d2", 10.0),
        ("n", "d3", 10.0),
        ("n", "d4", 99.0),
        ("n", "d5", 10.0),
    ]
    assert_no_drift(_history(spark, rows), ["metric"], "day", "value")
    with pytest.raises(RuntimeError, match="drift"):
        assert_no_drift(
            _history(spark, rows[:4]), ["metric"], "day", "value"
        )


def test_history_append_replays_replace_not_double(spark, tmp_path):
    path = str(tmp_path / "hist")
    df = spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    )
    m = quality_metrics(df, ["k", "v"])
    metrics_history_append(m, path, "2024-01-01", run_id="r1")
    metrics_history_append(m, path, "2024-01-02", run_id="r2")
    # replay day 2: same day, new run id — REPLACES, never doubles
    metrics_history_append(m, path, "2024-01-02", run_id="r2b")
    hist = spark.read.parquet(path)
    per_day = {
        str(r["day"]): (r["n"], r["runs"])  # partition col infers DATE
        for r in hist.groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.collect_set("run_id").alias("runs"),
        )
        .collect()
    }
    assert per_day["2024-01-01"] == (2, ["r1"])
    n2, runs2 = per_day["2024-01-02"]
    assert n2 == 2 and runs2 == ["r2b"]
    # the history frame feeds drift directly
    d = metric_drift(
        hist.filter("column = 'v'"),
        ["column"], "day", "n_distinct", window=1, tol_pct=0,
    )
    assert d.filter("day = DATE'2024-01-02'").collect()[0]["drifted"] is False


def test_run_id_column_uniform_across_days(spark, tmp_path):
    """run_id is ALWAYS written (NULL when not provided): day
    partitions appended with and without a run id must share one
    parquet schema, so a whole-history read keeps the column without
    mergeSchema."""
    path = str(tmp_path / "hist")
    df = spark.range(10).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    m = quality_metrics(df, ["k"])
    metrics_history_append(m, path, "2024-02-01")  # no run_id
    metrics_history_append(m, path, "2024-02-02", run_id="r2")
    hist = spark.read.parquet(path)
    assert "run_id" in hist.columns
    got = {
        str(r["day"]): r["ids"]
        for r in hist.groupBy("day")
        .agg(F.collect_set("run_id").alias("ids"))
        .collect()
    }
    assert got["2024-02-01"] == [] and got["2024-02-02"] == ["r2"]
