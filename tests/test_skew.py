"""Salted join / salted aggregation: result equivalence with the
unsalted forms, and the salt actually spreads hot keys."""

from __future__ import annotations

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.skew import salted_agg, salted_join


def _skewed(spark):
    # key "hot" has 900 rows, others 10 each
    rows = [(i, "hot" if i < 900 else f"k{i % 10}", i * 3) for i in range(1000)]
    return spark.createDataFrame(rows, "event_id long, k string, v long")


def test_salted_join_equals_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H"), ("k0", "Z"), ("k5", "F")], "k string, label string"
    )
    plain = {
        (r["event_id"], r["label"])
        for r in big.join(small, "k").select("event_id", "label").collect()
    }
    salted = {
        (r["event_id"], r["label"])
        for r in salted_join(big, small, ["k"], "event_id", n_salts=4)
        .select("event_id", "label")
        .collect()
    }
    assert salted == plain and len(plain) > 0


def test_salted_join_spreads_hot_key(spark):
    big = _skewed(spark)
    salts = (
        big.withColumn("s", F.pmod(F.xxhash64("event_id"), F.lit(4)))
        .filter("k = 'hot'")
        .select("s")
        .distinct()
        .count()
    )
    assert salts == 4  # the hot key occupies every salt bucket


def test_salted_join_rejects_nonequivalent_how(spark):
    import pytest

    big = _skewed(spark)
    small = spark.createDataFrame([("hot", "H")], "k string, label string")
    for how in ("right", "full", "left_semi", "left_anti"):
        with pytest.raises(ValueError):
            salted_join(big, small, ["k"], "event_id", how=how)


def test_salted_join_left_keeps_unmatched_big_rows(spark):
    big = _skewed(spark)
    small = spark.createDataFrame([("hot", "H")], "k string, label string")
    out = salted_join(big, small, ["k"], "event_id", n_salts=4, how="left")
    assert out.count() == 1000  # every big row survives exactly once


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r["k"], r["n"], r["total"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"))
        .collect()
    }
    salted = {
        (r["k"], r["n"], r["total"])
        for r in salted_agg(
            df,
            ["k"],
            "event_id",
            partial_aggs={"n": F.count(F.lit(1)), "total": F.sum("v")},
            final_aggs={"n": F.sum("n"), "total": F.sum("total")},
            n_salts=4,
        ).collect()
    }
    assert salted == plain


def test_ensure_min_partitions_floors_small_input(spark, tmp_path):
    from osrs_dashboard_elt_spark.operators.skew import ensure_min_partitions

    # must be a FILE scan: the floor keys on planner size stats, which
    # are exact for file sources (RDD-backed frames report unknown
    # size and pass through untouched)
    p = str(tmp_path / "floor_in")
    spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(
        1
    ).write.parquet(p)
    df = spark.read.parquet(p)
    target = spark.sparkContext.defaultParallelism
    out = ensure_min_partitions(df)
    assert out.rdd.getNumPartitions() == target
    # rows unchanged
    assert sorted(r["x"] for r in out.collect()) == list(range(100))


def test_ensure_min_partitions_unknown_stats_passthrough(spark):
    from osrs_dashboard_elt_spark.operators.skew import ensure_min_partitions

    # RDD-backed input: size unknown (Long.MaxValue) -> no reshuffle
    df = spark.createDataFrame([(i,) for i in range(100)], "x long").coalesce(1)
    assert ensure_min_partitions(df) is df


def test_ensure_min_partitions_noop_when_large(spark):
    from osrs_dashboard_elt_spark.operators.skew import ensure_min_partitions

    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    # force the "estimated size exceeds one scan split" branch: a big
    # input already arrives as many splits, so the floor must not add
    # a full-data shuffle
    out = ensure_min_partitions(df, max_bytes=1)
    assert out is df


def test_ensure_min_partitions_never_converts_to_rdd(spark):
    # the decision must come from planner stats: df.rdd under AQE
    # executes every upstream stage eagerly (the query would run twice)
    from unittest import mock

    from osrs_dashboard_elt_spark.operators.skew import ensure_min_partitions

    df = spark.createDataFrame([(i,) for i in range(100)], "x long")
    with mock.patch.object(
        type(df), "rdd", property(lambda self: (_ for _ in ()).throw(AssertionError("df.rdd touched")))
    ):
        ensure_min_partitions(df)
        ensure_min_partitions(df, max_bytes=1)
