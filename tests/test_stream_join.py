"""Stream-stream interval join: the streaming drive (two watermarked
file streams, availableNow) must emit exactly the batch row set, and
the guards that keep state bounded must hold."""

from __future__ import annotations

from datetime import datetime

import pytest

from osrs_dashboard_elt_spark.streaming import stream_interval_join

VIEW_SCHEMA = "user_id BIGINT, view_id BIGINT, view_ts TIMESTAMP"
CLICK_SCHEMA = "user_id BIGINT, click_id BIGINT, click_ts TIMESTAMP"


def _ts(m, s=0):
    return datetime(2025, 1, 1, 10, m, s)


VIEWS = [
    (1, 100, _ts(0)),
    (1, 101, _ts(40)),  # second view, own window
    (2, 200, _ts(5)),
    (3, 300, _ts(0)),  # user with no clicks
]
CLICKS = [
    (1, 900, _ts(10)),  # within 30m of view 100 only
    (1, 901, _ts(45)),  # within 30m of view 101 only
    (2, 910, _ts(50)),  # outside every view window
    (4, 920, _ts(1)),  # user with no views
]


@pytest.fixture(scope="module")
def sources(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("sj")
    vdir, cdir = str(d / "views"), str(d / "clicks")
    spark.createDataFrame(VIEWS, VIEW_SCHEMA).write.parquet(vdir)
    spark.createDataFrame(CLICKS, CLICK_SCHEMA).write.parquet(cdir)
    return d, vdir, cdir


def _join(views, clicks, how="inner"):
    return stream_interval_join(
        views,
        clicks,
        keys=["user_id"],
        left_ts="view_ts",
        right_ts="click_ts",
        within="30 minutes",
        lateness="10 minutes",
        how=how,
    )


def test_streaming_matches_batch(spark, sources):
    d, vdir, cdir = sources
    batch = _join(
        spark.read.parquet(vdir), spark.read.parquet(cdir)
    )
    expect = {(r.user_id, r.view_id, r.click_id) for r in batch.collect()}
    assert expect == {(1, 100, 900), (1, 101, 901)}

    sv = spark.readStream.schema(VIEW_SCHEMA).parquet(vdir)
    sc = spark.readStream.schema(CLICK_SCHEMA).parquet(cdir)
    out = _join(sv, sc)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sj_inner")
        .option("checkpointLocation", str(d / "ckpt_inner"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM sj_inner").collect()
    }
    assert got == expect


def test_outer_join_compiles_streaming_and_pads_in_batch(spark, sources):
    _, vdir, cdir = sources
    # batch: left_outer keeps the clickless views null-padded
    rows = _join(
        spark.read.parquet(vdir), spark.read.parquet(cdir), how="left_outer"
    ).collect()
    unmatched = {r.view_id for r in rows if r.click_id is None}
    assert unmatched == {200, 300}
    # streaming: the watermarked outer plan must compile; the actual
    # watermark-driven null emission is driven for real in
    # test_left_outer_stream_emits_null_pad_after_watermark (a
    # watermark-pusher batch flushes the trailing unmatched rows)
    sv = spark.readStream.schema(VIEW_SCHEMA).parquet(vdir)
    sc = spark.readStream.schema(CLICK_SCHEMA).parquet(cdir)
    assert _join(sv, sc, how="left_outer").isStreaming


def test_guards(spark, sources):
    _, vdir, cdir = sources
    v, c = spark.read.parquet(vdir), spark.read.parquet(cdir)
    with pytest.raises(ValueError, match="equi-key"):
        stream_interval_join(
            v, c, keys=[], left_ts="view_ts", right_ts="click_ts"
        )
    with pytest.raises(ValueError, match="how"):
        _join(v, c, how="cross")


def test_right_outer_keeps_key_for_unmatched_right_rows(spark, sources):
    """Under right_outer the only copy of an unmatched click's key is
    the right-side one — the merged key column must carry it."""
    _, vdir, cdir = sources
    rows = _join(
        spark.read.parquet(vdir), spark.read.parquet(cdir), how="right_outer"
    ).collect()
    unmatched = {(r.user_id, r.click_id) for r in rows if r.view_id is None}
    assert unmatched == {(2, 910), (4, 920)}
    assert all(r.user_id is not None for r in rows)


def test_left_outer_stream_emits_null_pad_after_watermark(spark, tmp_path):
    """The REAL null-emission path: a clickless view's padded row must
    come out of a driven stream once both watermarks prove no match
    can arrive — the compile-only check above can't see this."""
    from datetime import datetime

    vdir, cdir = str(tmp_path / "v"), str(tmp_path / "c")
    t = lambda h, m=0: datetime(2025, 1, 1, h, m)
    # batch 1: one matched pair + one clickless view
    spark.createDataFrame(
        [(1, 100, t(10)), (2, 200, t(10, 1))], VIEW_SCHEMA
    ).coalesce(1).write.parquet(f"{vdir}/d=0")
    spark.createDataFrame(
        [(1, 900, t(10, 2))], CLICK_SCHEMA
    ).coalesce(1).write.parquet(f"{cdir}/d=0")
    # batch 2: far-future rows on BOTH sides push both watermarks past
    # view 200's interval end + lateness
    spark.createDataFrame([(9, 999, t(15))], VIEW_SCHEMA).coalesce(
        1
    ).write.parquet(f"{vdir}/d=1")
    spark.createDataFrame([(9, 998, t(15))], CLICK_SCHEMA).coalesce(
        1
    ).write.parquet(f"{cdir}/d=1")

    sv = (
        spark.readStream.schema(VIEW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{vdir}/d=*")
    )
    sc = (
        spark.readStream.schema(CLICK_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{cdir}/d=*")
    )
    out = _join(sv, sc, how="left_outer")
    q = (
        out.writeStream.format("memory")
        .queryName("sj_louter")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    got = {
        (r.user_id, r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM sj_louter").collect()
    }
    assert (1, 100, 900) in got            # matched, emitted eagerly
    assert (2, 200, None) in got           # NULL-PADDED after watermark
    # the far-future pusher view matched its same-timestamp click
    assert (9, 999, 998) in got
