"""Orchestration policy (reference run_all_etl.py:117-133,145-155):
stage elision by state-file age; price-stage failure tolerated while
any other stage aborts.  Pure driver-side policy — no SparkSession."""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

import pytest

from osrs_dashboard_elt_spark.orchestration import (
    StageResult,
    record_success,
    run_stages,
    should_skip_by_age,
)


def test_skip_when_fresh(tmp_path):
    state = tmp_path / "ETL_state.json"
    now = datetime(2026, 1, 2, 12, 0, tzinfo=timezone.utc)
    record_success(state, "enrich", now - timedelta(hours=2))
    assert should_skip_by_age(state, "enrich", 24, now)
    assert not should_skip_by_age(state, "enrich", 1, now)  # 2h > 1h window


def test_missing_or_corrupt_state_runs_everything(tmp_path):
    state = tmp_path / "ETL_state.json"
    assert not should_skip_by_age(state, "enrich", 24)  # missing
    state.write_text("{not json")
    assert not should_skip_by_age(state, "enrich", 24)  # corrupt -> run


def test_elided_stage_skipped_and_success_recorded(tmp_path):
    state = tmp_path / "ETL_state.json"
    ran: list[str] = []
    now = datetime(2026, 1, 2, 12, 0, tzinfo=timezone.utc)
    stages = [
        ("fetch", lambda: ran.append("fetch")),
        ("transform", lambda: ran.append("transform")),
    ]
    first = run_stages(stages, state, elide_after_hours={"fetch": 24}, now=now)
    assert [r.status for r in first] == ["ok", "ok"]
    assert json.loads(state.read_text())["fetch"]["last_successful_run_utc"]

    ran.clear()
    second = run_stages(stages, state, elide_after_hours={"fetch": 24}, now=now)
    assert [r.status for r in second] == ["skipped", "ok"]
    assert ran == ["transform"]  # fetch elided, downstream still runs


def test_tolerated_failure_continues_others_abort(tmp_path):
    state = tmp_path / "ETL_state.json"
    ran: list[str] = []

    def boom():
        raise RuntimeError("price API down")

    results = run_stages(
        [
            ("fetch", boom),
            ("transform", lambda: ran.append("transform")),
        ],
        state,
        tolerate_failure={"fetch"},
    )
    assert [r.status for r in results] == ["failed", "ok"]
    assert "price API down" in results[0].detail
    assert ran == ["transform"]
    # a tolerated FAILURE must not refresh the stage's state
    assert not state.exists() or "fetch" not in json.loads(state.read_text())

    with pytest.raises(RuntimeError):
        run_stages(
            [("transform", boom), ("publish", lambda: None)],
            state,
            tolerate_failure={"fetch"},
        )


def test_failed_elidable_stage_retries_next_run(tmp_path):
    """A failure leaves no success timestamp, so the next run must NOT
    elide the stage."""
    state = tmp_path / "ETL_state.json"

    def boom():
        raise RuntimeError("x")

    run_stages(
        [("fetch", boom)], state,
        elide_after_hours={"fetch": 24}, tolerate_failure={"fetch"},
    )
    attempts: list[int] = []
    out = run_stages(
        [("fetch", lambda: attempts.append(1))], state,
        elide_after_hours={"fetch": 24}, tolerate_failure={"fetch"},
    )
    assert out == [StageResult("fetch", "ok", out[0].seconds)]
    assert attempts == [1]


class TestBackfill:
    def test_plan_finds_gaps(self):
        from osrs_dashboard_elt_spark.orchestration import plan_backfill

        got = plan_backfill(
            ["2024-01-01", "2024-01-03"], "2024-01-01", "2024-01-04"
        )
        assert got == ["2024-01-02", "2024-01-04"]

    def test_plan_empty_when_complete(self):
        from osrs_dashboard_elt_spark.orchestration import plan_backfill

        assert plan_backfill(["2024-01-01"], "2024-01-01", "2024-01-01") == []

    def test_plan_rejects_inverted_range(self):
        import pytest
        from osrs_dashboard_elt_spark.orchestration import plan_backfill

        with pytest.raises(ValueError):
            plan_backfill([], "2024-01-02", "2024-01-01")

    def test_existing_partitions_listing(self, tmp_path):
        from osrs_dashboard_elt_spark.orchestration import (
            existing_day_partitions,
            plan_backfill,
        )

        for d in ["2024-01-01", "2024-01-03"]:
            (tmp_path / f"event_date={d}").mkdir()
        (tmp_path / "not_a_partition").mkdir()
        have = existing_day_partitions(tmp_path)
        assert have == ["2024-01-01", "2024-01-03"]
        assert plan_backfill(have, "2024-01-01", "2024-01-03") == ["2024-01-02"]


def test_run_stages_writes_per_stage_rotating_logs(tmp_path):
    """Two pipeline runs -> per-stage log files carrying both runs'
    start/ok narrative, plus the tolerated-failure line."""
    from osrs_dashboard_elt_spark.orchestration import run_stages

    logs = tmp_path / "logs"
    state = tmp_path / "state.json"

    def boom():
        raise RuntimeError("injected")

    for _ in range(2):
        run_stages(
            [("ingest", lambda: None), ("enrich", boom)],
            state,
            tolerate_failure=("enrich",),
            log_dir=logs,
        )
    ingest = (logs / "ingest.log").read_text()
    assert ingest.count("| start") == 2 and ingest.count("ok in") == 2
    enrich = (logs / "enrich.log").read_text()
    assert enrich.count("failed (tolerated)") == 2
    assert "injected" in enrich
