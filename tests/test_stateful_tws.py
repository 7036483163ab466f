"""transformWithState running-best: plan-level checks everywhere;
runtime equivalence where the environment supports it.

The transformWithState runtime speaks a protobuf protocol between the
JVM and a Python state server (`pyspark/sql/streaming/proto/`), so it
needs ``google.protobuf`` — no wheel in this container, but
``compat.ensure_protobuf`` finds the google-cloud-sdk's vendored
pure-Python copy and exports it to the workers, so the runtime tests
execute HERE too.  Plan construction and schema are verified
unconditionally; execution tests still probe and skip with a reason
on containers with neither a wheel nor a vendored copy."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.streaming.stateful import (
    OUT_SCHEMA,
    running_best_changelog_tws,
)


def _tws_runtime_available() -> bool:
    # collection time == before the JVM gateway launches, so the shim
    # can still export PYTHONPATH to the future workers
    from osrs_dashboard_elt_spark.compat import ensure_protobuf

    if not ensure_protobuf():
        return False
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
        "that ships it: pip install 'pyspark[connect]'); no wheel and "
        "no vendored copy found on this container"
    ),
)
def test_tws_streaming_carries_state_across_restarts(spark, tmp_path):
    """Two availableNow RUNS sharing one checkpoint (a real stop +
    restart, not just two micro-batches): run 2's improvement must
    compare against run 1's best, recovered from the RocksDB state
    store.  Parquet sink — the memory sink can't recover from a
    checkpoint, a file sink must."""
    src = tmp_path / "in"
    out_dir = tmp_path / "out"
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

        def run_once():
            q = (
                out.writeStream.format("parquet")
                .option("path", str(out_dir))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120), "stream did not finish"

        run_once()
        (src / "b2.json").write_text(
            '{"Task":"cox","seconds":130.0,"Username":"w","ts":"2024-01-02T10:00:00Z"}\n'
            '{"Task":"cox","seconds":90.0,"Username":"b","ts":"2024-01-02T11:00:00Z"}\n'
        )
        run_once()
        got = {
            (r.key, r.best_seconds, r.holder, r.prev_best)
            for r in spark.read.parquet(str(out_dir)).collect()
        }
        # run 1: first sighting is a record; run 2: only the genuine
        # improvement, measured against run-1 state (130 > 120 ignored)
        assert got == {
            ("cox", 120.0, "a", None),
            ("cox", 90.0, "b", 120.0),
        }
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


@pytest.mark.skipif(
    not _tws_runtime_available(),
    reason="transformWithState runtime needs google.protobuf (wheel or "
    "vendored copy) — neither found",
)
def test_tws_and_apply_engines_agree(spark):
    """The two stateful engines are interchangeable: identical
    change-logs from changelog_via_stream(engine='apply') and
    engine='tws' over the same input — the contract that lets
    q_running_best_changelog_tws fall back where the protobuf
    state server can't run."""
    from osrs_dashboard_elt_spark.compat import tws_runtime_executable
    from osrs_dashboard_elt_spark.streaming import changelog_via_stream

    if not tws_runtime_executable(spark):
        pytest.skip("JVM env lacks the vendored protobuf PYTHONPATH")
    ev = _events(spark)
    runs = {}
    for engine in ("apply", "tws"):
        out = changelog_via_stream(ev, engine=engine)
        runs[engine] = {
            (r.key, r.best_seconds, r.holder, r.record_ts, r.prev_best)
            for r in out.collect()
        }
    assert runs["apply"] == runs["tws"]
    assert runs["tws"] == {
        ("cox", 120.0, "a", datetime(2024, 1, 1, 10), None),
        ("cox", 110.0, "b", datetime(2024, 1, 1, 11), 120.0),
        ("cox", 100.0, "d", datetime(2024, 1, 2, 9), 110.0),
        ("tob", 300.0, "a", datetime(2024, 1, 1, 10), None),
        ("tob", 290.0, "b", datetime(2024, 1, 3, 10), 300.0),
    }
