"""Huge-group top-N scale path (operators/topn.py::
top_n_per_group_pruned): exact equality with the window form, and the
pre-shuffle prune actually bounds what the Exchange carries."""

from __future__ import annotations

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.topn import (
    _local_prune,
    top_n_per_group,
    top_n_per_group_pruned,
)

N = 3


def _df(spark):
    # 4 groups x 5000 rows, deliberately spread over 8 partitions,
    # with duplicate order values (total order via the id tiebreak)
    return (
        spark.range(20_000)
        .repartition(8)
        .select(
            (F.col("id") % 4).alias("g"),
            (F.col("id") % 97).cast("double").alias("score"),
            F.col("id").alias("id"),
        )
    )


def _rows(df):
    return sorted(map(tuple, df.select("g", "score", "id").collect()))


def test_pruned_equals_window_form(spark):
    df = _df(spark)
    order = [F.col("score").asc(), F.col("id").asc()]
    want = _rows(top_n_per_group(df, ["g"], order, N))
    got = _rows(top_n_per_group_pruned(df, ["g"], order, N, manual=True))
    assert got == want and len(want) == 4 * N


def test_pruned_with_rank_and_desc(spark):
    df = _df(spark)
    order = [F.col("score").desc(), F.col("id").desc()]
    want = _rows(
        top_n_per_group(df, ["g"], order, N, rank_col="r").drop("r")
    )
    got = _rows(
        top_n_per_group_pruned(df, ["g"], order, N, rank_col="r", manual=True).drop("r")
    )
    assert got == want


def test_local_prune_bounds_shuffle_input(spark):
    """The phase-1 survivors — what the Exchange would carry — number
    at most n x partitions x groups, far below the input."""
    df = _df(spark)
    order = [F.col("score").asc(), F.col("id").asc()]
    local = df.sortWithinPartitions("g", *order)
    survivors = _local_prune(local, ["g"], N).count()
    assert survivors <= N * 8 * 4
    assert survivors < df.count() / 100


def test_prune_handles_group_spanning_batches(spark):
    """One giant group in one partition, forced through multiple Arrow
    batches: the cross-batch (group, count) state must not re-admit
    rows after the cap."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.range(1000).coalesce(1).select(
            F.lit(1).alias("g"), F.col("id").alias("id")
        )
        local = df.sortWithinPartitions("g", "id")
        got = _local_prune(local, ["g"], 5).collect()
        assert [r.id for r in got] == [0, 1, 2, 3, 4]
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )


def test_prune_nan_group_spanning_batches(spark):
    """NaN group keys split across Arrow batches must carry the count
    (plain tuple != treats NaN as a fresh group every row)."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        df = spark.range(300).coalesce(1).select(
            F.lit(None).cast("double").alias("g"), F.col("id").alias("id")
        )
        local = df.sortWithinPartitions("g", "id")
        got = _local_prune(local, ["g"], 4).collect()
        assert [r.id for r in got] == [0, 1, 2, 3]
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev
        )


def test_window_form_plans_partial_group_limit(spark):
    """Spark >= 3.5 bounds the huge-group shuffle inside the engine: a
    Partial WindowGroupLimit must sit below the Exchange, so each input
    partition forwards at most n rows per group (SPARK-37099).  This is
    why top_n_per_group_pruned delegates to the window form here."""
    df = _df(spark)
    order = [F.col("score").asc(), F.col("id").asc()]
    out = top_n_per_group_pruned(df, ["g"], order, N)
    plan = out._jdf.queryExecution().executedPlan().toString()
    partial = plan.find("WindowGroupLimit")
    assert "Partial" in plan and "Final" in plan, plan
    # the Partial group limit appears below (after, in tree print) the
    # Exchange; the Final one above it
    ex = plan.find("Exchange")
    final_pos = plan.find("Final")
    partial_pos = plan.find("Partial")
    assert final_pos < ex < partial_pos, plan


def test_conf_disabled_falls_back_to_manual_prune(spark):
    """The engine rule is governed by
    spark.sql.optimizer.windowGroupLimitThreshold (-1 disables it;
    limits above it are skipped): delegation must follow the conf, or
    a tuned session silently loses the bounded-shuffle property while
    results stay correct."""
    from osrs_dashboard_elt_spark.operators.topn import (
        _engine_has_window_group_limit,
    )

    df = _df(spark)
    key = "spark.sql.optimizer.windowGroupLimitThreshold"
    assert _engine_has_window_group_limit(df, N)
    try:
        spark.conf.set(key, "-1")
        assert not _engine_has_window_group_limit(df, N)
        # limit above the threshold: rule skipped -> manual path
        spark.conf.set(key, str(N - 1))
        assert not _engine_has_window_group_limit(df, N)
        spark.conf.set(key, str(N))  # boundary is inclusive (<=)
        assert _engine_has_window_group_limit(df, N)
        # the full operator stays CORRECT on the fallback path
        order = [F.col("score").asc(), F.col("id").asc()]
        spark.conf.set(key, "-1")
        got = _rows(top_n_per_group_pruned(df, ["g"], order, N))
        want = _rows(top_n_per_group(df, ["g"], order, N))
        assert got == want
    finally:
        spark.conf.unset(key)
