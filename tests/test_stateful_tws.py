"""transformWithState running-best: plan-level checks everywhere;
runtime equivalence where the environment supports it.

The transformWithState runtime speaks a protobuf protocol between the
JVM and a Python state server (`pyspark/sql/streaming/proto/`), so it
needs ``google.protobuf`` — not shipped in this container.  Plan
construction and schema are verified unconditionally; execution tests
probe for the dependency and skip with a reason when absent (they run
on a standard cluster image, where protobuf ships with pyspark's
connect/protobuf extras)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.streaming.stateful import (
    OUT_SCHEMA,
    running_best_changelog_tws,
)


def _tws_runtime_available() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _events(spark):
    rows = [
        ("cox", 120.0, "a", datetime(2024, 1, 1, 10)),
        ("cox", 110.0, "b", datetime(2024, 1, 1, 11)),
        ("cox", 115.0, "c", datetime(2024, 1, 1, 12)),  # not a record
        ("cox", 100.0, "d", datetime(2024, 1, 2, 9)),
        ("tob", 300.0, "a", datetime(2024, 1, 1, 10)),
        ("tob", None, "x", datetime(2024, 1, 1, 10, 30)),  # null skipped
        ("tob", 290.0, "b", datetime(2024, 1, 3, 10)),
    ]
    return spark.createDataFrame(
        rows, "Task string, seconds double, Username string, ts timestamp"
    )


def test_tws_plan_compiles_batch_and_stream(spark, tmp_path):
    """The operator must produce an analyzable plan with the change-log
    schema in both execution modes — catches API drift even where the
    runtime can't execute (require_runtime=False skips the protobuf
    probe; plan construction is environment-independent)."""
    batch_out = running_best_changelog_tws(_events(spark), require_runtime=False)
    assert batch_out.schema == OUT_SCHEMA
    assert not batch_out.isStreaming

    src = tmp_path / "in"
    src.mkdir()
    stream = spark.readStream.schema(
        "Task string, seconds double, Username string, ts timestamp"
    ).json(str(src))
    stream_out = running_best_changelog_tws(stream, require_runtime=False)
    assert stream_out.isStreaming
    assert stream_out.schema == OUT_SCHEMA


def test_tws_default_requires_runtime_loudly(spark):
    """Without protobuf the DEFAULT call must fail at call time with an
    actionable message naming the dependency and the drop-in
    alternative — not as an opaque worker crash mid-query."""
    if _tws_runtime_available():
        pytest.skip("protobuf present: the loud-failure path can't fire")
    with pytest.raises(ImportError, match="google.protobuf.*running_best_changelog"):
        running_best_changelog_tws(_events(spark))


@pytest.mark.skipif(
    not _tws_runtime_available(),
    reason=(
        "transformWithState runtime needs google.protobuf — install "
        "with: pip install 'protobuf>=4.25.1'  (or the pyspark extra "
        "that ships it: pip install 'pyspark[connect]'); this "
        "container has neither the package nor network access, so "
        "the protocol runtime cannot execute here"
    ),
)
def test_tws_streaming_carries_state_across_batches(spark, tmp_path):
    """Two micro-batches via file source: batch 2's improvement must
    compare against batch 1's best held in the state store."""
    src = tmp_path / "in"
    src.mkdir()
    schema = "Task string, seconds double, Username string, ts timestamp"
    (src / "b1.json").write_text(
        '{"Task":"cox","seconds":120.0,"Username":"a","ts":"2024-01-01T10:00:00Z"}\n'
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(schema).json(str(src))
        out = running_best_changelog_tws(stream)
        q = (
            out.writeStream.format("memory")
            .queryName("tws_best")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        (src / "b2.json").write_text(
            '{"Task":"cox","seconds":130.0,"Username":"w","ts":"2024-01-02T10:00:00Z"}\n'
            '{"Task":"cox","seconds":90.0,"Username":"b","ts":"2024-01-02T11:00:00Z"}\n'
        )
        q2 = (
            out.writeStream.format("memory")
            .queryName("tws_best2")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination(120)
        got = {
            (r.key, r.best_seconds, r.holder, r.prev_best)
            for r in spark.sql("SELECT * FROM tws_best2").collect()
        }
        # only the genuine improvement, measured against batch-1 state
        assert got == {("cox", 90.0, "b", 120.0)}
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
