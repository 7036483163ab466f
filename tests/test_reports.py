"""Unit tests for the report generators (edge cases the sf0.01 oracle
queries don't isolate: empty groups, back-fill, quantity defaults,
grouping-window cutoffs, derived-category unions)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.functions.temporal import Period
from osrs_dashboard_elt_spark.reports import (
    collection_log_report,
    detailed_report,
    leaderboard_report,
    personal_bests_report,
    recent_achievements_report,
    timeseries_report,
)


def ts(day: int, hour: int = 0, minute: int = 0):
    return datetime(2024, 1, day, hour, minute)


def test_leaderboard_report_periods(spark):
    df = spark.createDataFrame(
        [("a", ts(1), 10.0), ("a", ts(20), 5.0), ("b", ts(20), 7.0)],
        ["user", "t", "v"],
    )
    periods = [
        Period("All_Time", None, None),
        Period("Late", ts(15), None),
    ]
    rows = {
        r["user"]: r
        for r in leaderboard_report(df, "user", "t", periods, value_col="v").collect()
    }
    assert rows["a"]["Count_All_Time"] == 2
    assert rows["a"]["Count_Late"] == 1
    assert rows["a"]["Value_Late"] == 5.0
    assert rows["b"]["Value_All_Time"] == 7.0


def test_detailed_report_filter_and_order(spark):
    df = spark.createDataFrame(
        [("x", ts(1)), ("y", ts(2)), ("x", ts(3))], ["typ", "t"]
    )
    out = detailed_report(df, "typ", ["x"], "t").collect()
    assert [r["t"] for r in out] == [ts(3), ts(1)]


def test_timeseries_report_gapfill_and_cumulative(spark):
    # Two events 3 days apart -> daily series must contain the empty
    # middle days and the cumulative must carry through them.
    df = spark.createDataFrame([(ts(1), 1.0), (ts(4), 2.0)], ["t", "v"])
    out = timeseries_report(df, "t", ["1 day"], "v").orderBy("Date").collect()
    assert len(out) == 4
    assert [r["Count"] for r in out] == [1, 0, 0, 1]
    assert [r["Cumulative_Count"] for r in out] == [1, 1, 1, 2]
    assert float(out[3]["Cumulative_Value"]) == 3.0


def test_collection_log_report_skeleton_and_other(spark):
    df = spark.createDataFrame(
        [
            ("u1", "3 x Coins", ts(1), 1),
            ("u1", "3 x Coins", ts(2), 2),  # dup (u1, Coins): dropped
            ("u2", "Coins", ts(1), 3),  # qty defaults to 1
            ("u1", "Mystery box", ts(1), 4),  # ungrouped -> Other
        ],
        ["u", "raw", "t", "i"],
    )
    out = collection_log_report(
        spark,
        df,
        user_col="u",
        item_raw_col="raw",
        ts_col="t",
        order_cols=["i"],
        groups={"Money": ["Coins"], "Rares": ["Partyhat"]},
        historical_counts={"Coins": 10},
    )
    rows = {r["Item_Name"]: r for r in out.collect()}
    assert rows["Coins"]["Item_Group"] == "Money"
    assert rows["Coins"]["n_holders"] == 2
    assert rows["Coins"]["total_quantity"] == 4  # 3 (first dup) + 1
    assert rows["Coins"]["total_with_historical"] == 14
    # Configured but never observed: present with zeros.
    assert rows["Partyhat"]["n_holders"] == 0
    # Observed but unconfigured: routed to Other.
    assert rows["Mystery box"]["Item_Group"] == "Other"


def test_personal_bests_grouping_window_and_backfill(spark):
    df = spark.createDataFrame(
        [
            ("boss", "u1", 60.0, ts(1, 0)),
            ("boss", "u2", 60.5, ts(1, 0, 30)),  # within band+window: co-holder
            ("boss", "u3", 60.5, ts(5)),  # within band, OUTSIDE window
            ("boss", "u4", 99.0, ts(1)),  # outside band
        ],
        ["task", "u", "s", "t"],
    )
    out = personal_bests_report(
        spark,
        df,
        task_col="task",
        user_col="u",
        seconds_col="s",
        ts_col="t",
        threshold=1.0,
        grouping_window_seconds=3600.0,
        historical_tasks=["boss", "old_boss"],
    ).collect()
    rows = {r["Task"]: r for r in out}
    assert rows["boss"]["All_Holders"] == "u1,u2"
    assert rows["boss"]["best_seconds"] == 60.0
    assert rows["boss"]["record_ts"] == ts(1, 0)
    assert rows["old_boss"]["n_holders"] == 0
    assert rows["old_boss"]["best_seconds"] is None


def test_recent_achievements_derived_and_topn(spark):
    df = spark.createDataFrame(
        [("lvl", i, ts(1, i), float(i)) for i in range(5)],
        ["typ", "id", "t", "v"],
    )
    out = recent_achievements_report(
        df,
        "typ",
        "t",
        2,
        derived=[(F.col("v") >= 4.0, "maxed")],
        tiebreak_cols=["id"],
    ).collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r["typ"], []).append(r["id"])
    assert by_type["lvl"] == [4, 3]  # newest 2
    assert by_type["maxed"] == [4]
