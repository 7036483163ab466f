"""S13 engine-half sink: stateful external-id upsert with a commit
log (reference 5_post_pbs_to_discord.py:171-290) — replay-idempotent
create/edit/repost against a local transport."""

from __future__ import annotations

import json
import os

import pytest

from osrs_dashboard_elt_spark.streaming import (
    ExternalUpsertSink,
    LocalJsonTransport,
)


def _report(spark, rows):
    return spark.createDataFrame(rows, "group_title string, body string")


def _docs(root):
    out = {}
    for fn in sorted(os.listdir(root)):
        with open(os.path.join(root, fn), encoding="utf-8") as f:
            d = json.load(f)
        out[d["key"]] = (fn.removesuffix(".json"), d["body"])
    return out


@pytest.fixture
def sink(tmp_path):
    transport = LocalJsonTransport(str(tmp_path / "ext"))
    return ExternalUpsertSink(
        transport,
        state_path=str(tmp_path / "state.json"),
        key_col="group_title",
        render=lambda row: {"body": row["body"]},
    )


def test_upsert_creates_then_edits(spark, sink, tmp_path):
    b1 = _report(spark, [("CoX", "v1"), ("ToB", "v1")])
    stats = sink.process_batch(b1, 0)
    assert stats == {"created": 2, "updated": 0, "reposted": 0}
    docs1 = _docs(sink.transport.root)
    assert {k: b for k, (_, b) in docs1.items()} == {"CoX": "v1", "ToB": "v1"}

    # new content edits IN PLACE: same external ids, no new docs
    b2 = _report(spark, [("CoX", "v2"), ("ToB", "v1"), ("ToA", "v1")])
    stats = sink.process_batch(b2, 1)
    assert stats == {"created": 1, "updated": 2, "reposted": 0}
    docs2 = _docs(sink.transport.root)
    assert docs2["CoX"][0] == docs1["CoX"][0]  # id stable across edits
    assert docs2["CoX"][1] == "v2"
    assert len(docs2) == 3


def test_upsert_replay_is_idempotent(spark, sink):
    """foreachBatch is at-least-once: the SAME batch replayed must not
    duplicate documents."""
    b = _report(spark, [("CoX", "v1"), ("ToB", "v1")])
    sink.process_batch(b, 0)
    stats = sink.process_batch(b, 0)  # replay, same batch id
    assert stats == {"created": 0, "updated": 2, "reposted": 0}
    assert len(_docs(sink.transport.root)) == 2


def test_upsert_reposts_on_external_loss(spark, sink):
    """Externally-deleted doc (reference discord.NotFound) -> repost
    under a fresh id, commit log updated."""
    sink.process_batch(_report(spark, [("CoX", "v1")]), 0)
    (old_id, _) = _docs(sink.transport.root)["CoX"]
    os.unlink(os.path.join(sink.transport.root, old_id + ".json"))

    stats = sink.process_batch(_report(spark, [("CoX", "v2")]), 1)
    assert stats == {"created": 0, "updated": 0, "reposted": 1}
    new_id, body = _docs(sink.transport.root)["CoX"]
    assert new_id != old_id
    assert body == "v2"
    # the committed map points at the new id
    with open(sink.state_path, encoding="utf-8") as f:
        assert json.load(f)["ids"]["CoX"] == new_id


def test_upsert_state_survives_corruption(spark, sink):
    """Unreadable state file -> start fresh (reference behavior),
    reposting rather than crashing."""
    sink.process_batch(_report(spark, [("CoX", "v1")]), 0)
    with open(sink.state_path, "w", encoding="utf-8") as f:
        f.write("{not json")
    stats = sink.process_batch(_report(spark, [("CoX", "v2")]), 1)
    assert stats["created"] == 1  # fresh map -> creates anew


def test_upsert_rejects_data_sized_input(spark, sink):
    sink.max_rows = 5
    big = _report(spark, [(f"g{i}", "x") for i in range(10)])
    with pytest.raises(ValueError, match="report"):
        sink.process_batch(big, 0)


def test_upsert_as_streaming_sink(spark, sink, tmp_path):
    """End-to-end through writeStream.foreachBatch: two incremental
    file batches upsert the same keys in place."""
    src = tmp_path / "in"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")

    def run_batch(name, rows):
        (src / name).write_text(
            "\n".join(json.dumps({"group_title": g, "body": b}) for g, b in rows)
            + "\n"
        )
        stream = (
            spark.readStream.schema("group_title string, body string")
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(sink.foreach_batch())
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive

    run_batch("b1.json", [("CoX", "v1"), ("ToB", "v1")])
    run_batch("b2.json", [("CoX", "v2")])
    docs = _docs(sink.transport.root)
    assert len(docs) == 2
    assert docs["CoX"][1] == "v2"
    assert docs["ToB"][1] == "v1"
