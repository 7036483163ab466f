"""Bucketed tables: the join/agg plans must actually drop the shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.sources.bucketed import (
    is_bucketed_on,
    read_bucketed,
    write_bucketed,
)


def _final_plan(df) -> str:
    # executedPlan before execution is the AdaptiveSparkPlan wrapper;
    # run the query first so AQE finalizes, then read the live plan
    df.write.format("noop").mode("overwrite").save()
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    ev = spark.range(0, 10_000).select(
        (F.col("id") % 500).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") * 7 % 100).alias("value"),
    )
    prof = spark.range(0, 500).select(
        F.col("id").alias("user_id"),
        F.concat(F.lit("u"), F.col("id")).alias("name"),
    )
    write_bucketed(ev, "ev_b", ["user_id"], 8, path=str(base / "ev"))
    write_bucketed(prof, "prof_b", ["user_id"], 8, path=str(base / "prof"))
    yield "ev_b", "prof_b"
    spark.sql("DROP TABLE IF EXISTS ev_b")
    spark.sql("DROP TABLE IF EXISTS prof_b")


def test_bucket_spec_recorded(spark, bucketed_pair):
    ev, prof = bucketed_pair
    assert is_bucketed_on(spark, ev, ["user_id"])
    assert is_bucketed_on(spark, prof, ["user_id"])
    assert not is_bucketed_on(spark, ev, ["event_id"])


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    """Both sides bucketed on the join key with equal bucket counts ->
    SortMergeJoin with zero Exchange operators."""
    ev, prof = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, ev).join(read_bucketed(spark, prof), "user_id")
        plan = _final_plan(j)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # bucket-sorted writes also make the per-task Sort a no-op:
        # the scan reports the output ordering, so no Sort above scans
        assert j.count() == 10_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    """Aggregation on the bucket key reuses the at-rest partitioning."""
    ev, _ = bucketed_pair
    agg = read_bucketed(spark, ev).groupBy("user_id").agg(F.sum("value").alias("s"))
    plan = _final_plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 500


def test_unbucketed_join_does_shuffle(spark, bucketed_pair):
    """Control: the same join over plain parquet-less relations
    shuffles — proving the bucketed plan's Exchange elision is real."""
    ev, _ = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plain = spark.range(0, 500).select(
            F.col("id").alias("user_id"), F.lit("x").alias("name")
        )
        j = read_bucketed(spark, ev).join(plain, "user_id")
        plan = _final_plan(j)
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
