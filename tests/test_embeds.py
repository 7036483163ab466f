"""Embed-render step (S13 render half): golden-fixture pages matching
the reference's create_embed_for_group / update_pbs rules exactly,
driven through the ExternalUpsertSink commit log."""

from __future__ import annotations

import json

from osrs_dashboard_elt_spark.literals import literal_frame
from osrs_dashboard_elt_spark.reports.embeds import (
    GroupDef,
    RecordDef,
    render_pb_pages,
)
from osrs_dashboard_elt_spark.streaming.upsert_sink import (
    ExternalUpsertSink,
    LocalJsonTransport,
)

GROUPS = [
    GroupDef(
        "Raids",
        image="img/raids.png",
        records=(
            RecordDef("Chambers of Xeric", ":cox:"),
            RecordDef("Theatre of Blood"),
        ),
    ),
    GroupDef("Bosses", records=(RecordDef("Zulrah"),)),
]


def _pb(spark, rows):
    return literal_frame(
        spark, rows,
        "Task string, Time string, Holder string, Date string, Group string",
    )


def test_render_golden_pages(spark):
    pb = _pb(spark, [
        ("Chambers of Xeric", "18:30", "alice,bob", "2024-01-05", "Raids"),
        ("Theatre of Blood", "14:02.40", "carol", None, "Raids"),
        ("Night at the Museum", "1:00", "dave", "2024-01-07", "Miscellaneous PBs"),
        ("Alchemy Run", "2:00", "erin", "2024-01-06", "Miscellaneous PBs"),
    ])
    pages = render_pb_pages(spark, pb, GROUPS, recent_count=2)
    got = {r["group_title"]: r for r in pages.collect()}
    assert [r["group_title"] for r in pages.collect()] == [
        "Raids", "Bosses", "Miscellaneous PBs",
    ]

    assert got["Raids"]["description"] == (
        "# **Raids**\n\n"
        ":cox: **Chambers of Xeric**\n"
        "* **Time:** 18:30\n"
        "* **Holder(s):** alice, bob\n"
        "* *2024-01-05*\n\n"
        "⚔️ **Theatre of Blood**\n"
        "* **Time:** 14:02.40\n"
        "* **Holder(s):** carol"
    )
    assert got["Raids"]["image"] == "img/raids.png"
    assert got["Raids"]["has_records"]

    # configured task with no DB record -> placeholder -> grey page
    assert got["Bosses"]["description"] == (
        "# **Bosses**\nNo records to display in this category."
    )
    assert not got["Bosses"]["has_records"]

    sep = "\n\n" + "─" * 20 + "\n\n"
    assert got["Miscellaneous PBs"]["description"] == (
        "# **Miscellaneous PBs**\n\n"
        "⚔️ **Alchemy Run**\n"
        "* **Time:** 2:00\n"
        "* **Holder(s):** erin\n"
        "* *2024-01-06*\n\n"
        "⚔️ **Night at the Museum**\n"
        "* **Time:** 1:00\n"
        "* **Holder(s):** dave\n"
        "* *2024-01-07*"
        + sep
        + "## **\U0001f3c6 Newest Clan Records**\n"
        "* **dave**\n  * *Night at the Museum - 1:00*\n"
        "* **erin**\n  * *Alchemy Run - 2:00*"
    )


def test_render_empty_misc_with_recent_placeholder(spark):
    """Reference :245-248: when the misc group is empty but a Newest
    section exists, the 'No records' body is replaced by the
    italicized placeholder before appending."""
    pb = _pb(spark, [
        ("Chambers of Xeric", "18:30", "alice", "2024-01-05", "Raids"),
    ])
    pages = render_pb_pages(spark, pb, GROUPS[:1], recent_count=1)
    got = {r["group_title"]: r for r in pages.collect()}
    sep = "\n\n" + "─" * 20 + "\n\n"
    assert got["Miscellaneous PBs"]["description"] == (
        "## **Miscellaneous PBs**\n*No miscellaneous records to display.*"
        + sep
        + "## **\U0001f3c6 Newest Clan Records**\n"
        "* **alice**\n  * *Chambers of Xeric - 18:30*"
    )


def test_pages_drive_upsert_sink_commit_log(spark, tmp_path):
    """The page set IS the sink's input: first batch creates one
    external doc per group and records ids; a re-render EDITS the same
    ids (replay-idempotent)."""
    pb = _pb(spark, [
        ("Chambers of Xeric", "18:30", "alice,bob", "2024-01-05", "Raids"),
    ])
    pages = render_pb_pages(spark, pb, GROUPS)
    sink = ExternalUpsertSink(
        LocalJsonTransport(str(tmp_path / "docs")),
        str(tmp_path / "state.json"),
        key_col="group_title",
    )
    stats = sink.process_batch(pages, 0)
    assert stats == {"created": 3, "updated": 0, "reposted": 0}
    ids_before = json.load(open(tmp_path / "state.json"))["ids"]

    pb2 = _pb(spark, [
        ("Chambers of Xeric", "17:55", "zed", "2024-02-01", "Raids"),
    ])
    stats2 = sink.process_batch(render_pb_pages(spark, pb2, GROUPS), 1)
    assert stats2 == {"created": 0, "updated": 3, "reposted": 0}
    ids_after = json.load(open(tmp_path / "state.json"))["ids"]
    assert ids_after == ids_before  # same external docs, edited in place
    doc = json.load(open(tmp_path / "docs" / f"{ids_after['Raids']}.json"))
    assert "17:55" in doc["description"] and "zed" in doc["description"]
