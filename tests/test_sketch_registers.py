"""At-rest HLL register tables: the sketch analog of the dedup index.
Stored daily registers must serve rolling-window and overlap queries
with EXACTLY the estimates the rescan forms produce, absorb replayed
appends, and plan as register-table-only scans (no event reads)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.sketches import (
    hll_daily_registers,
    hll_overlap_from_daily,
    hll_rolling_distinct,
    hll_rolling_from_daily,
    hll_set_overlap_pred,
    read_hll_registers,
    write_hll_registers,
)

SF_DIR = "/root/testdata/sf0.001"
P = 9


def _events(spark):
    from osrs_dashboard_elt_spark import suite

    return suite._t(spark, SF_DIR, "events")


def _rows(df):
    return sorted(
        (str(r["day"]), r["approx_distinct"]) for r in df.collect()
    )


def test_at_rest_rolling_matches_rescan_exactly(spark, tmp_path):
    ev = _events(spark)
    want = _rows(hll_rolling_distinct(ev, "ts", "user_id", 7, P))
    path = str(tmp_path / "regs")
    daily = hll_daily_registers(ev, "ts", "user_id", P)
    write_hll_registers(daily, path)
    got = _rows(
        hll_rolling_from_daily(read_hll_registers(spark, path), 7, P)
    )
    assert got == want


def test_replayed_append_is_absorbed(spark, tmp_path):
    """Register MAX-merge is idempotent: double-appending a day (and
    appending a PARTIAL slice of a day) cannot change any estimate."""
    ev = _events(spark)
    daily = hll_daily_registers(ev, "ts", "user_id", P)
    path = str(tmp_path / "regs")
    write_hll_registers(daily, path)
    base = _rows(
        hll_rolling_from_daily(read_hll_registers(spark, path), 7, P)
    )
    some_day = daily.select("day").first()["day"]
    # full-day replay + a partial slice (subset of users) of that day
    write_hll_registers(
        daily.filter(F.col("day") == F.lit(some_day)), path, mode="append"
    )
    partial = hll_daily_registers(
        ev.filter(F.col("user_id") % 3 == 0), "ts", "user_id", P
    ).filter(F.col("day") == F.lit(some_day))
    write_hll_registers(partial, path, mode="append")
    got = _rows(
        hll_rolling_from_daily(read_hll_registers(spark, path), 7, P)
    )
    assert got == base


def test_rolling_plan_reads_only_register_table(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "regs")
    write_hll_registers(hll_daily_registers(ev, "ts", "user_id", P), path)
    plan = (
        hll_rolling_from_daily(read_hll_registers(spark, path), 7, P)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "regs" in plan
    assert "events" not in plan  # the corpus is read by NOTHING here


def test_overlap_from_registers_matches_event_scan(spark, tmp_path):
    """Day-aligned period overlap served from stored registers equals
    the one-scan predicate form over events (same registers, same
    algebra — only the byte source differs)."""
    ev = _events(spark)
    split = datetime(2024, 1, 16)
    want = hll_set_overlap_pred(
        ev, "user_id", F.col("ts") < F.lit(split), F.col("ts") >= F.lit(split), P
    ).collect()[0]
    path = str(tmp_path / "regs")
    write_hll_registers(hll_daily_registers(ev, "ts", "user_id", P), path)
    d = F.lit(split.date())
    got = hll_overlap_from_daily(
        read_hll_registers(spark, path), F.col("day") < d, F.col("day") >= d, P
    ).collect()[0]
    assert got.asDict() == want.asDict()


# ---------------------------------------------------------------------------
# CMS daily registers (additive sketch: replay safety = day REPLACEMENT)
# ---------------------------------------------------------------------------


def test_cms_day_replay_replaces_not_doubles(spark, tmp_path):
    from osrs_dashboard_elt_spark.operators.sketches import (
        cms_daily_registers,
        read_cms_registers,
        write_cms_registers,
    )

    ev = _events(spark)
    daily = cms_daily_registers(ev, "ts", "user_id")
    path = str(tmp_path / "cms")
    write_cms_registers(daily, path)
    before = {
        (r.day, r.j, r.bucket): r.c
        for r in read_cms_registers(spark, path).collect()
    }
    day = sorted({d for d, _, _ in before})[0]
    # replay one day: its partition is REPLACED, counters unchanged
    write_cms_registers(daily.filter(F.col("day") == F.lit(day)), path)
    after = {
        (r.day, r.j, r.bucket): r.c
        for r in read_cms_registers(spark, path).collect()
    }
    assert after == before
    # contrast: a blind append WOULD double that day (the failure the
    # replacement contract exists to prevent)
    daily.filter(F.col("day") == F.lit(day)).write.mode("append").partitionBy(
        "day"
    ).parquet(path)
    doubled = {
        (r.day, r.j, r.bucket): r.c
        for r in read_cms_registers(spark, path).collect()
    }
    assert all(
        doubled[k] == 2 * v for k, v in before.items() if k[0] == day
    )


def test_cms_window_estimate_is_one_sided_and_register_only(spark, tmp_path):
    from osrs_dashboard_elt_spark.operators.sketches import (
        cms_daily_registers,
        cms_window_heavy_hitters,
        read_cms_registers,
        write_cms_registers,
    )

    ev = _events(spark)
    path = str(tmp_path / "cms")
    write_cms_registers(cms_daily_registers(ev, "ts", "user_id"), path)
    at_rest = read_cms_registers(spark, path)
    cands = ev.select(
        F.col("user_id").cast("string").alias("val")
    ).distinct()
    out = cms_window_heavy_hitters(
        at_rest, cands, "2024-01-01", "2024-01-31", threshold=1
    )
    # the probe plan reads registers + the candidate frame, never the
    # window's events for counting
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cms" in plan
    est = {r.val: r.est for r in out.collect()}
    exact = {
        str(r.user_id): r.cnt
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    # one-sided: estimate never undercounts
    assert est.keys() == exact.keys()  # threshold=1 admits everyone
    assert all(est[k] >= exact[k] for k in exact)


def test_histogram_window_matches_from_events_and_replay_safe(
    spark, tmp_path
):
    """The third register family: at-rest histogram bins serve the
    window quantiles the from-events sketch produces bit-for-bit;
    day replay REPLACES (bin counts ADD, same contract as CMS)."""
    from osrs_dashboard_elt_spark.operators.sketches import (
        histogram_daily_registers,
        histogram_quantile,
        histogram_window_quantiles,
        read_histogram_registers,
        write_histogram_registers,
    )

    ev = _events(spark)
    params = dict(quantiles=[0.5, 0.95], lo=0.0, hi=200.0, n_bins=250)
    daily = histogram_daily_registers(
        ev, "ts", "value", lo=0.0, hi=200.0, n_bins=250
    )
    path = str(tmp_path / "hist")
    write_histogram_registers(daily, path)
    lo_day, hi_day = "2024-01-03", "2024-01-16"
    # replay a window day: partition replaced, counters unchanged
    before = {
        (r.day, r.bin): r.cnt
        for r in read_histogram_registers(spark, path).collect()
    }
    write_histogram_registers(
        daily.filter(F.col("day") == F.lit(lo_day).cast("date")), path
    )
    after = {
        (r.day, r.bin): r.cnt
        for r in read_histogram_registers(spark, path).collect()
    }
    assert after == before

    got = histogram_window_quantiles(
        read_histogram_registers(spark, path), lo_day, hi_day, **params
    ).collect()[0]
    want = histogram_quantile(
        ev.filter(
            (F.date_trunc("day", F.col("ts")).cast("date") >= F.lit(lo_day))
            & (F.date_trunc("day", F.col("ts")).cast("date") <= F.lit(hi_day))
        ).withColumn("k", F.lit(1)),
        "k", "value", **params,
    ).collect()[0]
    assert (got.hq_0_5, got.hq_0_95) == (want.hq_0_5, want.hq_0_95)
    assert got.hq_0_5 is not None and got.hq_0_95 is not None


def test_vacuum_and_retention_floor_all_three_kinds(spark, tmp_path):
    """One vacuum contract across the register families: old day
    partitions are physically dropped, surviving days answer
    unchanged, and a window reaching past the floor RAISES instead of
    silently under-counting (SUM/MAX over missing days)."""
    import pytest as _pytest

    from osrs_dashboard_elt_spark.operators.sketches import (
        check_window_retention,
        cms_daily_registers,
        histogram_daily_registers,
        read_cms_registers,
        read_histogram_registers,
        retention_floor,
        vacuum_registers,
        write_cms_registers,
        write_histogram_registers,
    )

    ev = _events(spark)
    builders = {
        "hll": (
            lambda: hll_daily_registers(ev, "ts", "user_id", P),
            write_hll_registers,
            read_hll_registers,
        ),
        "cms": (
            lambda: cms_daily_registers(ev, "ts", "event_type"),
            write_cms_registers,
            read_cms_registers,
        ),
        "hist": (
            lambda: histogram_daily_registers(
                ev, "ts", "value", 0.0, 200.0, n_bins=250
            ),
            write_histogram_registers,
            read_histogram_registers,
        ),
    }
    for kind, (build, write, read) in builders.items():
        path = str(tmp_path / kind)
        daily = build()
        write(daily, path)
        days = sorted(str(r["day"]) for r in daily.select("day").distinct().collect())
        assert len(days) >= 3, f"{kind}: test data too narrow"
        # never vacuumed: no floor, any window is servable
        assert retention_floor(spark, path) is None
        read(spark, path, day_from=days[0]).count()

        keep = 2
        dropped = vacuum_registers(spark, path, keep_days=keep)
        floor = retention_floor(spark, path)
        assert str(floor) == days[-keep]
        assert dropped == [f"day={d}" for d in days[:-keep]]
        # survivors answer unchanged relative to a fresh filter
        kept = read(spark, path).select("day").distinct().collect()
        assert sorted(str(r["day"]) for r in kept) == days[-keep:]
        # a window inside retention is fine...
        check_window_retention(spark, path, days[-keep])
        read(spark, path, day_from=days[-keep]).count()
        # ...one reaching past the floor fails LOUDLY, for every kind
        with _pytest.raises(ValueError, match="retention floor"):
            read(spark, path, day_from=days[0]).count()
        # idempotent re-vacuum: nothing else to drop
        assert vacuum_registers(spark, path, keep_days=keep) == []


def test_vacuum_floor_is_monotone(spark, tmp_path):
    """A re-vacuum with a LARGER keep_days must not move the recorded
    floor backwards past already-deleted days — that would wave
    through windows whose early days are gone."""
    from osrs_dashboard_elt_spark.operators.sketches import (
        check_window_retention,
        retention_floor,
        vacuum_registers,
        write_hll_registers,
    )

    ev = _events(spark)
    path = str(tmp_path / "mono")
    daily = hll_daily_registers(ev, "ts", "user_id", P)
    write_hll_registers(daily, path)
    days = sorted(str(r["day"]) for r in daily.select("day").distinct().collect())
    vacuum_registers(spark, path, keep_days=2)
    floor1 = retention_floor(spark, path)
    assert str(floor1) == days[-2]
    # looser retention later: drops nothing AND keeps the old floor
    assert vacuum_registers(spark, path, keep_days=30) == []
    assert retention_floor(spark, path) == floor1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="retention floor"):
        check_window_retention(spark, path, days[0])
