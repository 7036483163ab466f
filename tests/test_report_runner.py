"""Config-driven report fan-out (reports/runner.py): a reference-format
dashboard_settings config must produce the reference's full table
inventory — N leaderboards, detailed x periods, N timeseries — with
the reference's filter/aggregation semantics."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.config_loader import load_config_dict
from osrs_dashboard_elt_spark.reports.runner import (
    config_periods,
    generate_all_reports,
)

NOW = datetime(2024, 2, 15)

CONFIG = {
    "patterns": {
        "Chat": {
            "regex": r"^(?P<Username>\S+): (?P<Content>.*)$",
            "columns": ["Username", "Content"],
        }
    },
    "dashboard_settings": {
        "week_start_day": "Monday",
        "custom_lookback_days": 30,
        "leaderboard_reports": [
            {
                "report_name": "leaderboard_drops",
                "source_table": "clan_broadcasts",
                "broadcast_type": ["Valuable Drop"],
                "group_by_column": "Username",
                "aggregations": {"Count": "Username", "Value": "Item_Value"},
            },
            {
                "report_name": "leaderboard_mentions",
                "source_table": "chat",
                "search_phrases": ["gz", "congrats"],
                "group_by_column": "Username",
                "aggregations": {"Count": "Username"},
            },
        ],
        "detailed_reports": [
            {
                "report_name_prefix": "detailed_drops",
                "broadcast_types": ["Valuable Drop"],
            }
        ],
        "timeseries_reports": [
            {
                "report_name": "timeseries_drops",
                "broadcast_type": ["Valuable Drop"],
                "frequencies": ["1 day"],
            }
        ],
    }
}


@pytest.fixture(scope="module")
def gold(spark):
    cfg = load_config_dict(CONFIG)
    bc = spark.createDataFrame(
        [
            (1, datetime(2024, 2, 14, 10), "u1", "Valuable Drop", "Whip", 100),
            (2, datetime(2024, 2, 14, 11), "u1", "Valuable Drop", "Shield", 50),
            (3, datetime(2024, 1, 5, 9), "u2", "Valuable Drop", "Whip", 70),
            (4, datetime(2024, 2, 13, 8), "u2", "Personal Best", None, None),
        ],
        "raw_log_id BIGINT, Timestamp TIMESTAMP, Username STRING, "
        "Broadcast_Type STRING, Item_Name STRING, Item_Value BIGINT",
    )
    chat = spark.createDataFrame(
        [
            (10, datetime(2024, 2, 14, 12), "u3", "gz on the drop!"),
            (11, datetime(2024, 2, 14, 13), "u3", "Congrats u1"),
            (12, datetime(2024, 2, 14, 14), "u4", "unrelated"),
        ],
        "raw_log_id BIGINT, Timestamp TIMESTAMP, Username STRING, Content STRING",
    )
    return generate_all_reports(spark, cfg, chat, bc, NOW), cfg


def test_table_inventory(gold):
    reports, cfg = gold
    periods = config_periods(cfg, NOW)
    want = {"leaderboard_drops", "leaderboard_mentions", "timeseries_drops"}
    want |= {f"detailed_drops_{p.name.lower()}" for p in periods}
    assert set(reports) == want
    assert len(reports) == 3 + len(periods)


def test_leaderboard_semantics(gold):
    reports, _ = gold
    rows = {
        r.Username: r.asDict() for r in reports["leaderboard_drops"].collect()
    }
    # u1: two drops in Feb (MTD), value 150; u2: one drop in Jan
    assert rows["u1"]["Count_All_Time"] == 2
    assert rows["u1"]["Value_All_Time"] == 150
    assert rows["u1"]["Count_MTD"] == 2
    assert rows["u2"]["Count_All_Time"] == 1
    assert rows["u2"]["Count_MTD"] == 0
    assert rows["u2"]["Value_Prev_Month"] == 70
    # Personal Best row excluded by the type filter
    assert set(rows) == {"u1", "u2"}


def test_search_phrase_leaderboard_is_case_insensitive(gold):
    reports, _ = gold
    rows = {
        r.Username: r.Count_All_Time
        for r in reports["leaderboard_mentions"].collect()
    }
    assert rows == {"u3": 2}  # 'gz' + 'Congrats' match; u4 filtered


def test_detailed_period_slicing(gold):
    reports, _ = gold
    assert reports["detailed_drops_all_time"].count() == 3
    assert reports["detailed_drops_mtd"].count() == 2
    assert reports["detailed_drops_prev_month"].count() == 1
    # newest first within a slice
    ts = [r.Timestamp for r in reports["detailed_drops_all_time"].collect()]
    assert ts == sorted(ts, reverse=True)


def test_timeseries_has_frequency_and_cumulative(gold):
    reports, _ = gold
    df = reports["timeseries_drops"]
    assert {"Frequency", "Date", "Count", "Total_Value",
            "Cumulative_Count", "Cumulative_Value"} <= set(df.columns)
    last = df.orderBy(F.col("Date").desc()).first()
    assert last["Cumulative_Count"] == 3
