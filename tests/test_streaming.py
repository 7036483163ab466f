"""Structured Streaming ingest+parse (SURVEY.md §2.9 T1-T4): file
source -> watermark dedup -> foreachBatch parse -> idempotent routed
appends."""

from __future__ import annotations

import json

import pytest

from osrs_dashboard_elt_spark.config import default_config
from osrs_dashboard_elt_spark.streaming import (
    read_raw_stream,
    start_parse_pipeline,
    streaming_windowed_rollup,
    with_late_data_dedup,
)


def _write_batch(src_dir, name: str, rows: list[tuple[int, str, str]]) -> None:
    lines = [
        json.dumps({"id": i, "timestamp": ts, "raw_content": c})
        for i, ts, c in rows
    ]
    (src_dir / name).write_text("\n".join(lines) + "\n")


ROWS_1 = [
    (1, "2025-01-01T10:00:00.000Z", "user_1 received a drop: Item 5 (1,200 coins) from Mob 3."),
    (2, "2025-01-01T10:01:00.000Z", "user_2 has reached Attack level 70."),
    (3, "2025-01-01T10:02:00.000Z", "totally unparseable nonsense"),
    (4, "2025-01-01T10:03:00.000Z", "<:Rank:1>**user_3**: hello clan"),
]
# overlaps row 2 (same ts+content => dup) and adds one new row
ROWS_2 = [
    (2, "2025-01-01T10:01:00.000Z", "user_2 has reached Attack level 70."),
    (5, "2025-01-01T10:09:00.000Z", "user_9 has reached Defence level 80."),
]


def _run_available_now(spark, src, out, ckpt) -> None:
    raw = with_late_data_dedup(read_raw_stream(spark, str(src)))
    q = start_parse_pipeline(
        raw, default_config(), str(out), str(ckpt), available_now=True
    )
    q.awaitTermination(120)
    assert not q.isActive


def test_stream_parse_routes_and_is_idempotent(spark, tmp_path):
    src = tmp_path / "incoming"
    out = tmp_path / "silver"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    _write_batch(src, "b1.json", ROWS_1)
    _run_available_now(spark, src, out, ckpt)

    bc = spark.read.parquet(str(out / "clan_broadcasts"))
    chat = spark.read.parquet(str(out / "chat"))
    dead = spark.read.parquet(str(out / "unparsed_logs"))
    assert bc.count() == 2  # drop + level-up
    assert chat.count() == 1
    assert dead.count() == 1
    got = {r["Broadcast_Type"] for r in bc.select("Broadcast_Type").collect()}
    assert got == {"Valuable Drop", "Level Up"}

    # Second run: overlapping file redelivers row 2, adds row 5.  The
    # checkpoint skips the processed file; the new file's dup row is
    # dropped by dedup_append (same raw_log_id key).
    _write_batch(src, "b2.json", ROWS_2)
    _run_available_now(spark, src, out, ckpt)

    bc2 = spark.read.parquet(str(out / "clan_broadcasts"))
    assert bc2.count() == 3  # +1 new level-up, no dup of row 2
    assert bc2.filter("raw_log_id = 2").count() == 1
    assert spark.read.parquet(str(out / "unparsed_logs")).count() == 1


def test_streaming_windowed_rollup_plan(spark, tmp_path):
    """The windowed rollup compiles against a streaming source (plan
    check) and computes correct buckets in batch mode (semantics
    check — same expression works on both)."""
    src = tmp_path / "incoming"
    src.mkdir()
    _write_batch(src, "b1.json", ROWS_1)

    stream = read_raw_stream(spark, str(src))
    rolled = streaming_windowed_rollup(stream, freq="5 minutes")
    assert rolled.isStreaming  # compiles as a streaming plan

    import osrs_dashboard_elt_spark.streaming.ingest as ing

    batch = spark.read.schema(ing.RAW_LOG_SCHEMA).json(str(src))
    got = {
        (str(r["bucket_start"]), r["n_events"])
        for r in streaming_windowed_rollup(batch, freq="5 minutes").collect()
    }
    assert got == {
        ("2025-01-01 10:00:00", 4),
    }


def test_streaming_session_rollup_batch_and_stream(spark, tmp_path):
    """session_window groups events separated by <= gap; compiles as a
    streaming plan and computes correct sessions in batch."""
    from osrs_dashboard_elt_spark.streaming import streaming_session_rollup

    src = tmp_path / "incoming"
    src.mkdir()
    # user A: two bursts separated by > 5 min; user B: one burst
    rows = [
        (1, "2025-01-01T10:00:00.000Z", "A"),
        (2, "2025-01-01T10:02:00.000Z", "A"),
        (3, "2025-01-01T10:20:00.000Z", "A"),
        (4, "2025-01-01T10:21:00.000Z", "B"),
    ]
    _write_batch(src, "b1.json", [(i, ts, c) for i, ts, c in rows])

    import osrs_dashboard_elt_spark.streaming.ingest as ing

    stream = read_raw_stream(spark, str(src))
    assert streaming_session_rollup(
        stream, gap="5 minutes", key_cols=["raw_content"]
    ).isStreaming

    batch = spark.read.schema(ing.RAW_LOG_SCHEMA).json(str(src))
    got = {
        (r["raw_content"], str(r["session_start"]), r["n_events"])
        for r in streaming_session_rollup(
            batch, gap="5 minutes", key_cols=["raw_content"]
        ).collect()
    }
    assert got == {
        ("A", "2025-01-01 10:00:00", 2),
        ("A", "2025-01-01 10:20:00", 1),
        ("B", "2025-01-01 10:21:00", 1),
    }


def test_retry_unparsed_drains_dead_letter(spark, tmp_path):
    """T3 re-drive (reference 2_parse_engine.py:355-395): a corpus
    parsed under a crippled config dead-letters; retried under the
    full config, the recoverable rows drain into their routed tables
    and only genuine garbage stays."""
    from dataclasses import replace

    from osrs_dashboard_elt_spark.streaming import retry_unparsed

    src = tmp_path / "incoming"
    out = tmp_path / "silver"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    rows = [
        (1, "2025-01-01T10:00:00.000Z", "user_1 received a drop: Item 5 (1,200 coins) from Mob 3."),
        (2, "2025-01-01T10:01:00.000Z", "user_2 has reached Attack level 70."),
        (3, "2025-01-01T10:02:00.000Z", "totally unparseable nonsense"),
    ]
    _write_batch(src, "b1.json", rows)

    full_cfg = default_config()
    # crippled config: only the Valuable Drop group survives -> the
    # level-up message dead-letters alongside the real garbage
    crippled = replace(full_cfg, groups=full_cfg.groups[:1])
    raw = with_late_data_dedup(read_raw_stream(spark, str(src)))
    q = start_parse_pipeline(raw, crippled, str(out), str(ckpt), available_now=True)
    q.awaitTermination(120)

    assert spark.read.parquet(str(out / "clan_broadcasts")).count() == 1
    dead = spark.read.parquet(str(out / "unparsed_logs"))
    assert dead.count() == 2

    stats = retry_unparsed(spark, str(out), full_cfg)
    assert stats == {"retried": 2, "recovered": 1, "still_dead": 1}
    bc = spark.read.parquet(str(out / "clan_broadcasts"))
    assert bc.count() == 2
    assert bc.filter("Broadcast_Type = 'Level Up'").count() == 1
    dead2 = spark.read.parquet(str(out / "unparsed_logs")).collect()
    assert len(dead2) == 1
    assert dead2[0]["raw_content"] == "totally unparseable nonsense"

    # re-driving again is a no-op (idempotent appends, stable dead set)
    stats2 = retry_unparsed(spark, str(out), full_cfg)
    assert stats2 == {"retried": 1, "recovered": 0, "still_dead": 1}
    assert spark.read.parquet(str(out / "clan_broadcasts")).count() == 2


def test_corrupt_lines_are_captured_not_dropped(spark, tmp_path):
    """A malformed JSON line must surface through split_corrupt, and
    well-formed rows must flow through unchanged — no silent all-null
    rows from PERMISSIVE mode."""
    from osrs_dashboard_elt_spark.streaming import read_raw_stream, split_corrupt

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text(
        '{"id": 1, "timestamp": "2025-01-01T10:00:00.000Z", "raw_content": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "timestamp": "2025-01-01T10:01:00.000Z", "raw_content": "also ok"}\n'
    )
    raw = read_raw_stream(spark, str(src))
    good, bad = split_corrupt(raw)
    gq = (
        good.writeStream.format("memory").queryName("corrupt_good")
        .option("checkpointLocation", str(tmp_path / "c1"))
        .trigger(availableNow=True).start()
    )
    bq = (
        bad.writeStream.format("memory").queryName("corrupt_bad")
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True).start()
    )
    gq.awaitTermination(60)
    bq.awaitTermination(60)
    good_rows = spark.sql("SELECT * FROM corrupt_good").collect()
    bad_rows = spark.sql("SELECT * FROM corrupt_bad").collect()
    assert sorted(r.id for r in good_rows) == [1, 2]
    assert "_corrupt_line" not in spark.sql("SELECT * FROM corrupt_good").columns
    assert len(bad_rows) == 1 and "not json" in bad_rows[0].line


def test_streaming_session_rollup_executes_with_availablenow(spark, tmp_path):
    """session_window must EXECUTE as a stream (state store engaged),
    not just compile: drive the file stream with availableNow and
    compare the emitted sessions to the batch drive."""
    from osrs_dashboard_elt_spark.streaming import streaming_session_rollup
    import osrs_dashboard_elt_spark.streaming.ingest as ing

    src = tmp_path / "sess_in"
    src.mkdir()
    rows = [
        (1, "2025-01-01T10:00:00.000Z", "A"),
        (2, "2025-01-01T10:02:00.000Z", "A"),
        (3, "2025-01-01T10:20:00.000Z", "A"),
        (4, "2025-01-01T10:21:00.000Z", "B"),
    ]
    _write_batch(src, "b1.json", rows)

    stream = read_raw_stream(spark, str(src))
    out = streaming_session_rollup(
        stream, gap="5 minutes", key_cols=["raw_content"]
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_rollup")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.raw_content, str(r.session_start), r.n_events)
        for r in spark.sql("SELECT * FROM sess_rollup").collect()
    }
    batch = spark.read.schema(ing.RAW_LOG_SCHEMA).json(str(src))
    want = {
        (r.raw_content, str(r.session_start), r.n_events)
        for r in streaming_session_rollup(
            batch, gap="5 minutes", key_cols=["raw_content"]
        ).collect()
    }
    assert got == want == {
        ("A", "2025-01-01 10:00:00", 2),
        ("A", "2025-01-01 10:20:00", 1),
        ("B", "2025-01-01 10:21:00", 1),
    }
