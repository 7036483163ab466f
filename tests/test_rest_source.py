"""S7: REST time-series custom data source."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.sources.rest import (
    FAKE_EPOCH0,
    FAKE_STEP,
    RestTimeSeriesReader,
    TokenBucket,
    fake_point,
    register,
)


@pytest.fixture(scope="module")
def priced(spark):
    register(spark)
    return (
        spark.read.format("rest_timeseries")
        .option("items", "2,4357,13652")
        .option("n_points", 5)
        .option("items_per_partition", 2)
        .load()
    )


def test_row_count_and_schema(priced):
    assert priced.count() == 3 * 5
    assert [f.name for f in priced.schema.fields] == [
        "item_id",
        "timestamp",
        "avg_high_price",
        "avg_low_price",
        "high_price_volume",
        "low_price_volume",
    ]


def test_partition_planning(spark):
    reader = RestTimeSeriesReader(
        {"items": ",".join(str(i) for i in range(7)), "items_per_partition": "3"}
    )
    parts = reader.partitions()
    assert [list(p.item_ids) for p in parts] == [[0, 1, 2], [3, 4, 5], [6]]


def test_values_match_reference_hash(priced):
    row = (
        priced.filter((F.col("item_id") == 4357) & (F.col("timestamp") == FAKE_EPOCH0 + 2 * FAKE_STEP))
        .collect()[0]
    )
    hi, lo, hv, lv = fake_point(4357, FAKE_EPOCH0 + 2 * FAKE_STEP)
    assert (row.avg_high_price, row.avg_low_price, row.high_price_volume, row.low_price_volume) == (hi, lo, hv, lv)
    # and the md5 derivation is what the docstring promises
    h = int(hashlib.md5(f"4357:{FAKE_EPOCH0 + 2 * FAKE_STEP}".encode()).hexdigest()[:8], 16)
    assert hi == h % 100000


def test_missing_items_option_rejected():
    with pytest.raises(Exception, match="items"):
        RestTimeSeriesReader({})


def test_real_transport_requires_user_agent():
    with pytest.raises(Exception, match="user_agent"):
        RestTimeSeriesReader(
            {
                "items": "1",
                "transport": "osrs_dashboard_elt_spark.sources.rest:requests_transport",
            }
        )


def test_token_bucket_paces_requests():
    clock = [0.0]
    slept = []

    def fake_clock():
        return clock[0]

    def fake_sleep(s):
        slept.append(s)
        clock[0] += s

    b = TokenBucket(rate=2.0, clock=fake_clock, sleep=fake_sleep)
    waits = [b.acquire() for _ in range(4)]
    # first request free, then 0.5s pacing between each
    assert waits[0] == 0.0
    assert all(abs(w - 0.5) < 1e-9 for w in waits[1:])
    assert abs(sum(slept) - 1.5) < 1e-9


def test_feeds_relational_pipeline(spark, priced):
    """The source output joins/aggregates like any table — the S9
    per-item watermark pattern on top of it."""
    wm = priced.groupBy("item_id").agg(F.max("timestamp").alias("wm"))
    joined = priced.join(wm, "item_id").filter(F.col("timestamp") == F.col("wm"))
    assert joined.count() == 3


def test_stream_reader_polls_in_batches(spark, tmp_path):
    """readStream form: offsets advance by points_per_batch, replay
    between offsets is deterministic, stream drains at max_points."""
    register(spark)
    import time as _time

    q = (
        spark.readStream.format("rest_timeseries")
        .option("items", "2,4357")
        .option("points_per_batch", "4")
        .option("max_points", "10")
        .load()
        .writeStream.format("memory")
        .queryName("rest_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    out = spark.sql("SELECT * FROM rest_stream_t")
    try:
        # 2 items x 10 points arrive across micro-batches of 4+4+2
        deadline = _time.monotonic() + 120
        while out.count() < 20 and _time.monotonic() < deadline:
            _time.sleep(0.5)
    finally:
        q.stop()
    assert out.count() == 20
    assert out.select("timestamp").distinct().count() == 10
    row = out.filter(
        (F.col("item_id") == 2) & (F.col("timestamp") == FAKE_EPOCH0 + 9 * FAKE_STEP)
    ).collect()[0]
    assert (row.avg_high_price, row.avg_low_price) == fake_point(2, FAKE_EPOCH0 + 9 * FAKE_STEP)[:2]


def test_cached_item_mapping_cache_discipline(spark, tmp_path):
    """S8: serve the parquet cache; fetch+rewrite on missing cache,
    force_refresh, or a required id absent from the cache."""
    import os

    from osrs_dashboard_elt_spark.sources.rest import cached_item_mapping

    cache = str(tmp_path / "item_mapping")
    calls = {"n": 0}

    # counting transport via a module-level hook
    import osrs_dashboard_elt_spark.sources.rest as rest_mod

    def counting(url, headers):
        calls["n"] += 1
        return rest_mod.fake_mapping_transport(url, headers)

    rest_mod._counting_mapping_transport = counting
    spec = "osrs_dashboard_elt_spark.sources.rest:_counting_mapping_transport"
    try:
        m1 = cached_item_mapping(spark, cache, transport=spec)
        assert m1.count() == 100 and calls["n"] == 1
        # cache hit: no new fetch
        m2 = cached_item_mapping(spark, cache, transport=spec)
        assert m2.count() == 100 and calls["n"] == 1
        # required ids present: still no fetch
        cached_item_mapping(spark, cache, transport=spec, required_ids=[1, 2, 3])
        assert calls["n"] == 1
        # a configured id missing from the cache forces the update
        cached_item_mapping(spark, cache, transport=spec, required_ids=[1, 999])
        assert calls["n"] == 2
        # explicit force
        cached_item_mapping(spark, cache, transport=spec, force_refresh=True)
        assert calls["n"] == 3
        assert os.path.isdir(cache)
    finally:
        del rest_mod._counting_mapping_transport
