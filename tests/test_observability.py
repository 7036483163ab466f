"""S14/S15 observability: one-scan Observation metrics, reference-
format summary rendering, atomic summary files, notify truncation,
and the streaming SummaryListener end-to-end."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.observability import (
    ObservedMetrics,
    SummaryListener,
    notify,
    render_run_summary,
    webhook_transport,
    write_summary_file,
)


def test_observed_metrics_single_action(spark):
    obs = ObservedMetrics()
    df = spark.range(100).withColumn("ok", F.col("id") % 4 == 0)
    df = obs.observe(
        df,
        "parse",
        rows=F.count(F.lit(1)),
        parsed=F.sum(F.when(F.col("ok"), 1).otherwise(0)),
    )
    assert df.count() == 100  # the one action
    m = obs.get()
    assert m == {"parse": {"rows": 100, "parsed": 25}}


def test_observed_metrics_multi_stage_and_dup_guard(spark):
    obs = ObservedMetrics()
    a = obs.observe(spark.range(10), "a", rows=F.count(F.lit(1)))
    b = obs.observe(spark.range(7), "b", rows=F.count(F.lit(1)))
    a.collect()
    b.collect()
    assert obs.get() == {"a": {"rows": 10}, "b": {"rows": 7}}
    try:
        obs.observe(spark.range(1), "a", rows=F.count(F.lit(1)))
        raise AssertionError("expected duplicate-stage ValueError")
    except ValueError:
        pass


def test_render_run_summary_reference_format():
    ok = render_run_summary(
        "OSRS Dashboard", "parse_engine", {"Messages Processed": 42}
    )
    assert ok.startswith("**✅ OSRS Dashboard: parse_engine Complete**")
    assert "- Messages Processed: `42`" in ok
    bad = render_run_summary("P", "s", {}, ok=False, error="boom")
    assert bad.startswith("**❌ P: s FAILED**")
    assert "```boom```" in bad


def test_write_summary_file_atomic(tmp_path):
    d = str(tmp_path / "summaries")
    p = write_summary_file("parse_engine", "hello", d, "2025-01-01_00-00-00")
    assert os.path.basename(p) == "parse_engine_summary_2025-01-01_00-00-00.txt"
    with open(p, encoding="utf-8") as f:
        assert f.read() == "hello"
    # no stray temp files left behind
    assert [f for f in os.listdir(d) if f.endswith(".tmp")] == []


def test_notify_truncates_and_skips():
    sent: list[str] = []
    assert notify("hi", sent.append) is True
    assert sent == ["hi"]
    long = "x" * 2500
    notify(long, sent.append)
    assert len(sent[-1]) == 1993 and sent[-1].endswith("...")
    assert notify("dropped", None) is False  # unconfigured -> skip


def test_webhook_transport_unconfigured_is_none():
    assert webhook_transport(None) is None
    assert webhook_transport("") is None
    assert webhook_transport("https://x/YOUR_WEBHOOK_URL_HERE") is None


def test_summary_listener_end_to_end(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps({"id": i}) for i in range(5)) + "\n"
    )

    got: dict[str, str] = {}
    lis = SummaryListener("TestProj", sink=lambda name, text: got.update({name: text}))
    spark.streams.addListener(lis)
    try:
        q = (
            spark.readStream.schema("id long")
            .json(str(src))
            .writeStream.format("noop")
            .queryName("obs_test")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # listener events are delivered asynchronously post-termination
        for _ in range(100):
            if "obs_test" in got:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(lis)

    assert "obs_test" in got
    text = got["obs_test"]
    assert text.startswith("**✅ TestProj: obs_test Complete**")
    assert "- Input Rows: `5`" in text


def test_stage_logger_rotates_and_separates_stages(tmp_path):
    """Reference-parity run logs (src/loguru_setup.py:1-48): one
    rotating file per stage; re-creating the logger replaces handlers
    (no duplicate lines) and appends across runs, rotating by size."""
    import os

    from osrs_dashboard_elt_spark.observability import stage_logger

    for run in range(2):
        for stage in ("ingest", "parse"):
            lg = stage_logger(
                stage, str(tmp_path), max_bytes=500, backup_count=3
            )
            for i in range(20):
                lg.info("run %d message %d with enough padding......", run, i)
    files = sorted(os.listdir(tmp_path))
    assert "ingest.log" in files and "parse.log" in files
    assert any(f.startswith("ingest.log.") for f in files), files
    assert any(f.startswith("parse.log.") for f in files), files
    # handler replaced, not stacked: exactly one line per .info call
    stage_logger("dedup", str(tmp_path))
    lg = stage_logger("dedup", str(tmp_path))
    lg.info("solo-line")
    assert (tmp_path / "dedup.log").read_text().count("solo-line") == 1


def test_listener_reports_state_and_watermark(spark, tmp_path):
    """A STATEFUL watermarked stream's summary must carry the peak
    state-row count and the last watermark — the two numbers that
    tell an operator whether eviction works and event time advances."""
    import json
    import time

    from pyspark.sql import functions as F

    src = tmp_path / "in_state"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(
            json.dumps({"k": i % 3, "ts": f"2024-01-01T10:{i:02d}:00Z"})
            for i in range(20)
        )
        + "\n"
    )
    got: dict[str, str] = {}
    lis = SummaryListener(
        "TestProj", sink=lambda name, text: got.update({name: text})
    )
    spark.streams.addListener(lis)
    try:
        stream = (
            spark.readStream.schema("k long, ts timestamp")
            .json(str(src))
            .withWatermark("ts", "5 minutes")
            .groupBy(F.window("ts", "10 minutes"), "k")
            .count()
        )
        q = (
            stream.writeStream.format("noop")
            .outputMode("append")
            .queryName("obs_state_test")
            .option("checkpointLocation", str(tmp_path / "ckpt_state"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        for _ in range(100):
            if "obs_state_test" in got:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(lis)
    text = got["obs_state_test"]
    assert "Peak State Rows" in text
    assert "Last Watermark" in text
    assert "2024-01-01" in text  # the watermark actually advanced
