"""Streaming incremental-view maintenance: fold micro-batches into a
persisted mergeable state with blue/green swaps and replay safety."""

from __future__ import annotations

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.incremental import agg_state, finalize
from osrs_dashboard_elt_spark.streaming.incremental_sink import (
    incremental_state_sink,
    read_state,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "g string, v double")


def _final_rows(spark, state_dir):
    state = read_state(spark, str(state_dir))
    return sorted(map(tuple, finalize(state, "g").collect()))


def test_fold_accumulates_batches(spark, tmp_path):
    sink = incremental_state_sink(str(tmp_path), "g", "v")
    sink(_batch(spark, [("a", 1.0), ("a", 2.0), ("b", 5.0)]), 0)
    sink(_batch(spark, [("a", 3.0), ("c", 7.0)]), 1)
    # equivalent single-shot aggregate over all rows
    full = _batch(
        spark, [("a", 1.0), ("a", 2.0), ("b", 5.0), ("a", 3.0), ("c", 7.0)]
    )
    expected = sorted(map(tuple, finalize(agg_state(full, "g", "v"), "g").collect()))
    assert _final_rows(spark, tmp_path) == expected


def test_replayed_batch_is_skipped(spark, tmp_path):
    sink = incremental_state_sink(str(tmp_path), "g", "v")
    b0 = _batch(spark, [("a", 1.0)])
    sink(b0, 0)
    once = _final_rows(spark, tmp_path)
    sink(b0, 0)  # crash-replay of the same micro-batch
    assert _final_rows(spark, tmp_path) == once


def test_blue_green_alternates_and_readers_see_whole_states(spark, tmp_path):
    sink = incremental_state_sink(str(tmp_path), "g", "v")
    sink(_batch(spark, [("a", 1.0)]), 0)
    sink(_batch(spark, [("a", 1.0)]), 1)
    assert (tmp_path / "blue").exists() and (tmp_path / "green").exists()
    state = read_state(spark, str(tmp_path))
    assert state.filter(F.col("g") == "a").collect()[0].n_rows == 2


def test_drives_from_a_real_stream(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text('{"g": "a", "v": 1.5}\n{"g": "b", "v": 2.5}\n')
    stream = (
        spark.readStream.schema("g string, v double")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            incremental_state_sink(str(tmp_path / "state"), "g", "v")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _final_rows(spark, tmp_path / "state")
    assert [(g, n) for g, n, *_ in got] == [("a", 1), ("b", 1)]


def test_drives_from_rest_stream(spark, tmp_path):
    """Composition: the rate-limited REST micro-batch stream feeds the
    incremental state sink — live API samples fold into a maintained
    gold aggregate without ever rescanning history."""
    from osrs_dashboard_elt_spark.sources.rest import register

    register(spark)
    stream = (
        spark.readStream.format("rest_timeseries")
        .option("items", "4151,4153")
        .option("points_per_batch", "3")
        .option("max_points", "6")
        .load()
    )
    state_dir = tmp_path / "state"
    q = (
        stream.selectExpr(
            "CAST(item_id AS STRING) AS g",
            "CAST(avg_high_price AS DOUBLE) AS v",
        )
        .writeStream.foreachBatch(
            incremental_state_sink(str(state_dir), "g", "v")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = read_state(spark, str(state_dir))
    rows = {r.g: r.n_rows for r in state.collect()}
    assert set(rows) == {"4151", "4153"}
    assert all(n >= 1 for n in rows.values())


def test_fresh_checkpoint_against_existing_state_raises(spark, tmp_path):
    """A restarted batch-id counter (fresh checkpoint, old state_dir)
    must fail loudly instead of silently dropping every batch until
    the counter catches up."""
    import pytest as _pytest

    from osrs_dashboard_elt_spark.streaming.incremental_sink import (
        incremental_state_sink,
    )

    state = str(tmp_path / "state")
    fold = incremental_state_sink(state, "k", "v")
    df = spark.createDataFrame([(1, 2.0)], "k BIGINT, v DOUBLE")
    fold(df, 5)
    fold(df, 5)  # exact replay: no-op
    with _pytest.raises(RuntimeError, match="fresh checkpoint"):
        fold(df, 0)
