"""End-to-end pipeline driver (scripts/run_pipeline.py): the three
stages chain, gold tables publish, and re-running is a no-op."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/scripts")

from run_pipeline import run_pipeline  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def test_pipeline_end_to_end_and_idempotent(spark, tmp_path):
    out = str(tmp_path / "lake")
    run_pipeline(spark, SF_DIR, out)

    bronze = spark.read.parquet(f"{out}/bronze/raw_logs")
    bc = spark.read.parquet(f"{out}/silver/clan_broadcasts")
    assert bronze.count() == 1000
    assert bc.count() > 0
    types = {r["Broadcast_Type"] for r in bc.select("Broadcast_Type").distinct().collect()}
    assert {"Valuable Drop", "Personal Best", "Level Up"} <= types

    from osrs_dashboard_elt_spark.sources import read_published

    lb = read_published(spark, f"{out}/gold/leaderboard_drops")
    assert "Count_All_Time" in lb.columns and lb.count() > 0
    pb = read_published(spark, f"{out}/gold/personal_bests")
    assert pb.filter("best_seconds IS NOT NULL").count() > 0

    # re-run: every stage must be a no-op on bronze/silver and republish
    # gold onto the other color
    counts_before = {
        t: spark.read.parquet(f"{out}/{t}").count()
        for t in ("bronze/raw_logs", "silver/chat", "silver/clan_broadcasts",
                  "silver/unparsed_logs")
    }
    run_pipeline(spark, SF_DIR, out)
    for t, n in counts_before.items():
        assert spark.read.parquet(f"{out}/{t}").count() == n, t
    assert read_published(spark, f"{out}/gold/leaderboard_drops").count() == lb.count()


def test_pipeline_survives_price_stage_failure(spark, tmp_path):
    """Reference policy: the price stage may fail without aborting —
    gold still publishes (from the un-enriched silver fallback), and
    no success timestamp is recorded so the next run retries enrich."""
    import json

    out = str(tmp_path / "lake")
    run_pipeline(spark, SF_DIR, out, fail_enrich_for_test=True)

    from osrs_dashboard_elt_spark.sources import read_published

    lb = read_published(spark, f"{out}/gold/leaderboard_drops")
    assert lb.count() > 0  # transform ran despite the enrich failure
    state_path = f"{out}/ETL_state.json"
    import os

    state = (
        json.load(open(state_path)) if os.path.exists(state_path) else {}
    )
    assert "enrich" not in state  # failure must not register success
