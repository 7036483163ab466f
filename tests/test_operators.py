"""Unit tests for the operator library's order-sensitive semantics
(SURVEY.md §5 property list): as-of tier order, later-rule-wins remap,
idempotent dedup-append, gap-filled resample, near-best banding,
duration parsing, exclusion arities."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.functions.durations import duration_seconds
from osrs_dashboard_elt_spark.operators import (
    BlacklistEntry,
    ExclusionWindow,
    MappingRule,
    apply_exclusions,
    apply_mapping,
    asof_join,
    blacklist_predicate,
    find_conflicts,
    interval_join,
    near_best_band,
    resample,
    sessionize,
    top_n_per_group,
)


def ts(day, hour=0, minute=0, second=0):
    return datetime(2024, 1, day, hour, minute, second)


# --------------------------------------------------------------------------
# As-of join: exact -> latest-before -> earliest-after (J1 tier order)
# --------------------------------------------------------------------------


def test_asof_tier_order(spark):
    probes = spark.createDataFrame(
        [(1, "a", ts(10)), (2, "b", ts(10)), (3, "c", ts(10))],
        "id long, k string, t timestamp",
    )
    quotes = spark.createDataFrame(
        [
            ("a", ts(10), 100),  # exact -> wins over the earlier quote
            ("a", ts(5), 50),
            ("b", ts(4), 40),    # latest before
            ("b", ts(2), 20),
            ("b", ts(12), 120),  # after (must lose to before)
            ("c", ts(15), 150),  # only after -> forward fallback
            ("c", ts(20), 200),
        ],
        "k string, qt timestamp, v long",
    )
    out = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="qt",
        values=["v"], direction="nearest",
    )
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: 100, 2: 40, 3: 150}


def test_asof_no_match_is_null(spark):
    probes = spark.createDataFrame([(1, "z", ts(10))], "id long, k string, t timestamp")
    quotes = spark.createDataFrame([("a", ts(5), 1)], "k string, qt timestamp, v long")
    out = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="qt",
        values=["v"], direction="nearest",
    ).collect()
    assert out[0]["v"] is None


def test_asof_backward_only(spark):
    probes = spark.createDataFrame([(1, "c", ts(10))], "id long, k string, t timestamp")
    quotes = spark.createDataFrame([("c", ts(15), 150)], "k string, qt timestamp, v long")
    out = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="qt",
        values=["v"], direction="backward",
    ).collect()
    assert out[0]["v"] is None  # no forward fallback


def test_asof_forward_includes_exact_timestamp_quote(spark):
    """direction='forward' contract: right_ts >= left_ts is INCLUSIVE —
    an exact-timestamp quote must win over a later one (round-1 ADVICE:
    the mark sort order excluded it)."""
    probes = spark.createDataFrame([(1, "a", ts(10))], "id long, k string, t timestamp")
    quotes = spark.createDataFrame(
        [("a", ts(10), 100), ("a", ts(15), 150)],
        "k string, qt timestamp, v long",
    )
    out = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="qt",
        values=["v"], direction="forward",
    ).collect()
    assert out[0]["v"] == 100


def test_asof_forward_tiebreak_picks_first(spark):
    probes = spark.createDataFrame([(1, "a", ts(10))], "id long, k string, t timestamp")
    quotes = spark.createDataFrame(
        [("a", ts(12), 300), ("a", ts(12), 100), ("a", ts(12), 200)],
        "k string, qt timestamp, v long",
    )
    out = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="qt",
        values=["v"], direction="forward", tiebreak=["v"],
    ).collect()
    assert out[0]["v"] == 100  # forward picks FIRST by tiebreak


def test_asof_stable_under_nondeterministic_upstream(spark):
    """Single-pass shape must not depend on row ids: a repartitioned /
    shuffled probe side yields the same result (round-1 shape re-joined
    on monotonically_increasing_id, which could silently mis-join)."""
    probes = spark.createDataFrame(
        [(i, "k" + str(i % 7), ts(1 + i % 25)) for i in range(200)],
        "id long, k string, t timestamp",
    ).repartition(13, "t")  # nondeterministic row order per partition
    quotes = spark.createDataFrame(
        [("k" + str(j), ts(5 * (1 + j % 5)), 10 * j) for j in range(7)],
        "k string, qt timestamp, v long",
    )
    out = asof_join(
        probes, quotes, on="k", left_ts="t", right_ts="qt",
        values=["v"], direction="nearest",
    )
    rows = out.collect()
    assert len(rows) == 200  # no dropped/duplicated probe rows
    assert {r["id"] for r in rows} == set(range(200))
    # every probe keyed to an existing quote key resolves non-null
    assert all(r["v"] is not None for r in rows)


# --------------------------------------------------------------------------
# Temporal remap: later-rule-wins (W4) + conflict detection (W5)
# --------------------------------------------------------------------------


def test_remap_later_rule_wins(spark):
    rules = [
        MappingRule("First", ("OldName",)),
        MappingRule("Second", ("OldName",)),  # later -> wins
    ]
    df = spark.createDataFrame([("OldName", ts(5))], "Username string, T timestamp")
    out = apply_mapping(df, "T", ["Username"], rules).collect()
    assert out[0]["Username"] == "Second"


def test_remap_validity_window(spark):
    rules = [
        MappingRule("New", ("Old",), start=ts(10), end=ts(20)),
    ]
    df = spark.createDataFrame(
        [(1, "Old", ts(5)), (2, "Old", ts(10)), (3, "Old", ts(19, 23)), (4, "Old", ts(20))],
        "id long, Username string, T timestamp",
    )
    got = {r["id"]: r["Username"] for r in apply_mapping(df, "T", ["Username"], rules).collect()}
    assert got == {1: "Old", 2: "New", 3: "New", 4: "Old"}  # [start, end)


def test_remap_multiple_columns(spark):
    rules = [MappingRule("N", ("O",))]
    df = spark.createDataFrame(
        [("O", "O", "X", ts(5))], "Username string, Action_By string, Opponent string, T timestamp"
    )
    row = apply_mapping(df, "T", ["Username", "Action_By", "Opponent"], rules).collect()[0]
    assert (row["Username"], row["Action_By"], row["Opponent"]) == ("N", "N", "X")


def test_conflict_detection():
    rules = [
        MappingRule("A", ("x",), start=ts(1), end=ts(10)),
        MappingRule("B", ("x",), start=ts(5), end=ts(15)),  # overlaps
        MappingRule("C", ("y",), start=ts(1), end=ts(10)),  # different source
        MappingRule("D", ("x",), start=ts(10), end=ts(20)),  # adjacent, no overlap
    ]
    conflicts = find_conflicts(rules)
    assert [(i, j) for i, j, _ in conflicts] == [(0, 1), (1, 3)]


# --------------------------------------------------------------------------
# Dedup-append idempotency (S4): re-running ingest on an overlapping
# window is a no-op
# --------------------------------------------------------------------------


def test_dedup_append_idempotent(spark, tmp_path):
    from osrs_dashboard_elt_spark.sources.parquet import dedup_append

    target = str(tmp_path / "raw_logs")
    batch1 = spark.createDataFrame(
        [(ts(1), "m1"), (ts(2), "m2")], "timestamp timestamp, raw_content string"
    )
    dedup_append(spark, batch1, target, keys=["timestamp", "raw_content"])
    # overlapping re-fetch: m2 again + new m3
    batch2 = spark.createDataFrame(
        [(ts(2), "m2"), (ts(3), "m3")], "timestamp timestamp, raw_content string"
    )
    dedup_append(spark, batch2, target, keys=["timestamp", "raw_content"])
    dedup_append(spark, batch2, target, keys=["timestamp", "raw_content"])  # no-op
    got = sorted(r["raw_content"] for r in spark.read.parquet(target).collect())
    assert got == ["m1", "m2", "m3"]


# --------------------------------------------------------------------------
# Resample gap fill (T1) + near-best band (W6) + sessionize
# --------------------------------------------------------------------------


def test_resample_emits_empty_buckets(spark):
    df = spark.createDataFrame(
        [(ts(1), 1.0), (ts(4), 2.0)], "t timestamp, v double"
    )
    out = resample(
        df, "t", "1 day", {"n": F.count(F.lit(1))}, gap_fill=True
    ).orderBy("bucket").collect()
    assert len(out) == 4  # days 1,2,3,4 — gaps 2,3 emitted
    assert [r["n"] for r in out] == [1, 0, 0, 1]


def test_near_best_band_nulls_dropped(spark):
    df = spark.createDataFrame(
        [("t", 10.0), ("t", 10.4), ("t", 11.0), ("t", None)],
        "task string, sec double",
    )
    out = near_best_band(df, ["task"], "sec", 0.5).collect()
    assert sorted(r["sec"] for r in out) == [10.0, 10.4]


def test_sessionize_gap(spark):
    df = spark.createDataFrame(
        [(1, ts(1, 10, 0)), (1, ts(1, 10, 10)), (1, ts(1, 11, 0)), (2, ts(1, 10))],
        "u long, t timestamp",
    )
    out = sessionize(df, "t", ["u"], gap_seconds=600.0).collect()
    sessions = {(r["u"], r["t"]): r["session_id"] for r in out}
    assert sessions[(1, ts(1, 10, 0))] == 1
    assert sessions[(1, ts(1, 10, 10))] == 1
    assert sessions[(1, ts(1, 11, 0))] == 2
    assert sessions[(2, ts(1, 10))] == 1


# --------------------------------------------------------------------------
# Durations (R8): H:M:S / M:S.f / S, invalid -> null, 0:00 sentinel
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "s,expected",
    [
        ("0:54.6", 54.6),
        ("1:15:45", 4545.0),
        ("90", 90.0),
        ("2:00", 120.0),
        ("garbage", None),
        ("", None),
        ("1:2:3:4", None),
    ],
)
def test_duration_seconds(spark, s, expected):
    df = spark.createDataFrame([(s,)], "d string")
    got = df.select(duration_seconds(F.col("d")).alias("s")).collect()[0]["s"]
    if expected is None:
        assert got is None
    else:
        assert got == pytest.approx(expected)


def test_duration_zero_sentinel(spark):
    df = spark.createDataFrame([("0:00",)], "d string")
    got = df.select(
        duration_seconds(F.col("d"), treat_zero_as_null=True).alias("s")
    ).collect()[0]["s"]
    assert got is None


@pytest.mark.parametrize(
    "secs,expected",
    [
        (59.96, "1:00"),       # tenths round to 600 -> carry into minutes
        (59.94, "0:59.9"),
        (3599.96, "1:00:00"),  # carry into hours
        (54.6, "0:54.6"),
        (4545.0, "1:15:45"),
        (120.0, "2:00"),
        (0.0, "0:00"),
    ],
)
def test_seconds_to_duration_carry(spark, secs, expected):
    from osrs_dashboard_elt_spark.functions.durations import seconds_to_duration

    df = spark.createDataFrame([(secs,)], "s double")
    got = df.select(seconds_to_duration(F.col("s")).alias("d")).collect()[0]["d"]
    assert got == expected


# --------------------------------------------------------------------------
# Exclusions (P6-P8)
# --------------------------------------------------------------------------


def test_exclusion_windows(spark):
    df = spark.createDataFrame(
        [(1, ts(5), "Pet"), (2, ts(5), "Level Up"), (3, ts(25), "Pet")],
        "id long, T timestamp, Broadcast_Type string",
    )
    wins = [ExclusionWindow(ts(1), ts(10), ("Pet",))]
    got = {r["id"] for r in apply_exclusions(df, "T", "Broadcast_Type", wins).collect()}
    assert got == {2, 3}


def test_exclusion_all_broadcasts(spark):
    df = spark.createDataFrame(
        [(1, ts(5), "Pet"), (2, ts(5), "Level Up"), (3, ts(25), "Pet")],
        "id long, T timestamp, Broadcast_Type string",
    )
    wins = [ExclusionWindow(ts(1), ts(10), ("All Broadcasts",))]
    got = {r["id"] for r in apply_exclusions(df, "T", "Broadcast_Type", wins).collect()}
    assert got == {3}


def test_blacklist_arities(spark):
    df = spark.createDataFrame(
        [
            (1, "cheat", "Zulrah", 50.0),
            (2, "cheat2", "Zulrah", 50.0),
            (3, "cheat2", "Jad", 50.0),
            (4, "fast", "Zulrah", 10.0),
            (5, "fast", "Zulrah", 100.0),
        ],
        "id long, u string, task string, sec double",
    )
    entries = [
        BlacklistEntry("cheat"),                      # user-wide
        BlacklistEntry("cheat2", "Zulrah"),           # user+task
        BlacklistEntry("fast", "Zulrah", 20.0),       # faster-than cutoff
    ]
    pred = blacklist_predicate(F.col("u"), F.col("task"), F.col("sec"), entries)
    kept = {r["id"] for r in df.filter(~pred).collect()}
    assert kept == {3, 5}


def test_top_n_per_group(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 1), ("a", 2), ("b", 9)], "g string, v long"
    )
    out = top_n_per_group(df, ["g"], [F.col("v").desc()], 2).collect()
    got = sorted((r["g"], r["v"]) for r in out)
    assert got == [("a", 2), ("a", 3), ("b", 9)]


def test_interval_join_half_open(spark):
    left = spark.createDataFrame([(1, ts(5)), (2, ts(10))], "id long, t timestamp")
    right = spark.createDataFrame(
        [("w1", ts(1), ts(10))], "name string, s timestamp, e timestamp"
    )
    out = interval_join(left, right, "t", "s", "e").collect()
    assert [r["id"] for r in out] == [1]  # end exclusive


def test_binned_interval_join_matches_broadcast_form(spark):
    """The scale path must agree row-for-row with the broadcast range
    join, including intervals spanning multiple bins and ts exactly on
    bin/interval boundaries."""
    from datetime import datetime
    from osrs_dashboard_elt_spark.operators.interval_join import (
        binned_interval_join,
        interval_join,
    )

    left = spark.createDataFrame(
        [(i, datetime(2024, 1, 1, h, m)) for i, (h, m) in enumerate(
            [(0, 0), (0, 30), (1, 0), (2, 15), (5, 0), (23, 59)]
        )],
        "id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("a", datetime(2024, 1, 1, 0, 0), datetime(2024, 1, 1, 1, 0)),
            ("b", datetime(2024, 1, 1, 0, 30), datetime(2024, 1, 1, 5, 0)),
            ("c", datetime(2024, 1, 1, 22, 0), datetime(2024, 1, 2, 2, 0)),
        ],
        "iv string, start_ts timestamp, end_ts timestamp",
    )
    broad = interval_join(left, right, "ts", "start_ts", "end_ts")
    binned = binned_interval_join(
        left, right, "ts", "start_ts", "end_ts", bin_width="1 hour"
    )
    key = lambda df: sorted((r.id, r.iv) for r in df.collect())
    assert key(binned) == key(broad)
    # [start, end): ts == end excluded, ts == start included
    assert (0, "a") in key(binned) and (2, "a") not in key(binned)


def test_binned_interval_join_rejects_bad_width(spark):
    from osrs_dashboard_elt_spark.operators.interval_join import _width_seconds

    import pytest as _pytest

    assert _width_seconds("2 hours") == 7200
    with _pytest.raises(ValueError, match="bin_width"):
        _width_seconds("fortnight")


def test_redact_pii_categories_and_order(spark):
    from osrs_dashboard_elt_spark.functions.text import pii_flags, redact_pii
    from pyspark.sql import functions as F

    rows = [
        (1, "mail me at a.b+c@test.org today"),
        (2, "server 192.168.0.1 down"),
        (3, "card 4111 1111 1111 1111 ok"),
        (4, "call +1 (555) 123-4567 now"),
        (5, "clean text, nothing here"),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {
        r.id: r.red
        for r in df.select("id", redact_pii(F.col("t")).alias("red")).collect()
    }
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "server <IP> down"
    assert got[3] == "card <NUMBER> ok"
    assert got[4] == "call <PHONE> now"
    assert got[5] == "clean text, nothing here"
    flags = df.select(
        "id", *[c.alias(n) for n, c in pii_flags(F.col("t")).items()]
    ).collect()
    by_id = {r.id: (r.has_email, r.has_ip, r.has_number, r.has_phone) for r in flags}
    assert by_id[1][0] and by_id[2][1] and by_id[3][2] and by_id[4][3]
    assert by_id[5] == (False, False, False, False)


# ---------------------------------------------------------------------------
# Document chunking (operators/chunking.py)
# ---------------------------------------------------------------------------


def test_chunk_documents_edges(spark):
    """Window arithmetic edge cases: empty doc -> nothing; doc shorter
    than a chunk -> one whole-doc window; exact stride boundary; a
    trailing window that is a strict suffix of its predecessor is
    dropped; overlap tokens shared between consecutive windows."""
    import pytest as _pytest

    from osrs_dashboard_elt_spark.literals import literal_frame
    from osrs_dashboard_elt_spark.operators.chunking import chunk_documents

    def words(n, p="w"):
        return " ".join(f"{p}{i}" for i in range(n))

    docs = literal_frame(
        spark,
        [
            (1, ""),                 # empty -> no chunks
            (2, "   \t  "),          # whitespace only -> no chunks
            (3, words(5)),           # < chunk -> single window of 5
            (4, words(8)),           # == chunk -> single window
            (5, words(9)),           # 9 = stride(6)+3 > overlap(2) -> 2 windows
            (6, words(7)),           # trailing start=6, 7 <= 6+2 -> suffix, dropped
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, "doc_id", "text", chunk_tokens=8, overlap=2)
    rows = {(r.id, r.chunk_idx): (r.chunk_text, r.n_tokens) for r in out.collect()}
    ids = {k[0] for k in rows}
    assert 1 not in ids and 2 not in ids
    assert rows[(3, 0)] == (words(5), 5)
    assert rows[(4, 0)] == (words(8), 8)
    # doc 5: window 0 = tokens 0..7, window 1 = tokens 6..8 (overlap w6,w7)
    assert rows[(5, 0)][1] == 8
    assert rows[(5, 1)] == ("w6 w7 w8", 3)
    assert (5, 2) not in rows
    # doc 6: start=6 window would be (w6,) — entirely inside window 0 -> dropped
    assert rows[(6, 0)][1] == 7 and (6, 1) not in rows

    with _pytest.raises(ValueError):
        chunk_documents(docs, "doc_id", "text", chunk_tokens=8, overlap=5)


def test_pack_chunks_streaming_concat(spark):
    """Packing: per-shard running token count, seq_id = floor(before /
    seq_len); chunks never split, sequences may overflow by < one
    chunk; shards pack independently."""
    from osrs_dashboard_elt_spark.literals import literal_frame
    from osrs_dashboard_elt_spark.operators.packing import pack_chunks, pack_summary

    chunks = literal_frame(
        spark,
        [
            ("en", 1, 0, 60), ("en", 1, 1, 60), ("en", 2, 0, 60),
            ("de", 9, 0, 100), ("de", 9, 1, 30),
        ],
        "lang string, id long, chunk_idx long, n_tokens long",
    )
    packed = pack_chunks(chunks, "lang", ["id", "chunk_idx"], "n_tokens", 128)
    got = {
        (r.lang, r.id, r.chunk_idx): (r.seq_offset, r.seq_id)
        for r in packed.collect()
    }
    assert got[("en", 1, 0)] == (0, 0)
    assert got[("en", 1, 1)] == (60, 0)
    assert got[("en", 2, 0)] == (120, 0)   # first token lands in seq 0 (overflow)
    assert got[("de", 9, 0)] == (0, 0)
    assert got[("de", 9, 1)] == (100, 0)
    summary = {
        (r.lang, r.seq_id): (r.n_chunks, r.n_tokens)
        for r in pack_summary(packed, "lang", "n_tokens").collect()
    }
    assert summary[("en", 0)] == (3, 180)
    assert summary[("de", 0)] == (2, 130)


def test_connected_components_chain_and_isolates(spark):
    """A 5-node chain needs multiple propagation rounds (label 1 must
    travel 4 hops); isolated vertices stay singleton; two separate
    components keep distinct ids."""
    from osrs_dashboard_elt_spark.literals import literal_frame
    from osrs_dashboard_elt_spark.operators.components import dedup_clusters

    docs = literal_frame(spark, [(i,) for i in [1, 2, 3, 4, 5, 7, 10, 11, 20]], ["id"])
    pairs = literal_frame(
        spark,
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)],
        "id_a long, id_b long",
    )
    out = dedup_clusters(docs, pairs, "id")
    got = {r.id: (r.cluster_id, r.is_canonical) for r in out.collect()}
    assert {got[i][0] for i in (1, 2, 3, 4, 5)} == {1}
    assert got[10][0] == 10 and got[11][0] == 10
    assert got[7] == (7, True) and got[20] == (20, True)
    assert [i for i, (c, canon) in got.items() if canon] == sorted(
        [1, 7, 10, 20]
    ) or {i for i, (c, canon) in got.items() if canon} == {1, 7, 10, 20}


def test_literal_frame_roundtrips_backslashes_and_quotes(spark):
    """sql_lit must escape backslashes (Spark parses \\n etc. inside
    literals; a trailing backslash would swallow the closing quote)."""
    from osrs_dashboard_elt_spark.literals import literal_frame

    vals = [("a\\nb",), ("end\\",), ("it's\\'mixed",), ("tab\there",)]
    got = [r.c for r in literal_frame(spark, vals, "c string").collect()]
    assert got == [v[0] for v in vals]
