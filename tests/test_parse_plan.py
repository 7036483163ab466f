"""Golden-corpus tests for the config-driven parse engine.

Mirrors the reference's operational semantics (src/2_parse_engine.py):
first-match-wins dispatch, chat-first routing, required-column
validation -> dead letter, game-mode prefixing, multi-user explode,
numeric comma-strip, Total Level skill patch.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.config import default_config
from osrs_dashboard_elt_spark.plans import build_parse_plan

TS = datetime(2024, 1, 15, 12, 0, 0)

CORPUS = [
    # (id, content, expected_route, checks)
    (1, "Alice received a drop: Twisted bow (1,486,480,000 coins) from Chambers of Xeric.",
     "broadcast", {"Broadcast_Type": "Valuable Drop", "Username": "Alice",
                   "Item_Name": "Twisted bow", "Item_Value": 1486480000,
                   "Source_Mob": "Chambers of Xeric"}),
    (2, "Bob received a drop: Dragon dagger (17,394 coins)",
     "broadcast", {"Broadcast_Type": "Valuable Drop", "Username": "Bob",
                   "Item_Value": 17394, "Source_Mob": None}),
    (3, "Carol received a new collection log item: Zamorakian spear (123/1568)",
     "broadcast", {"Broadcast_Type": "Collection Log",
                   "Collection_Log_Progress": "123/1568", "Item_Name": "Zamorakian spear"}),
    (4, "Dave has achieved a new Zulrah personal best: 0:54.6",
     "broadcast", {"Broadcast_Type": "Personal Best", "Task_Name": "Zulrah",
                   "PB_Time": "0:54.6"}),
    (5, "Erin has reached a total level of 2277.",
     "broadcast", {"Broadcast_Type": "Total Level", "New_Level": 2277,
                   "Skill": "Total"}),
    (6, "Frank has reached Attack level 99.",
     "broadcast", {"Broadcast_Type": "Level Up", "Skill": "Attack",
                   "New_Level": 99}),
    (7, "<:Rank:123>**Grace**: gz on the drop!",
     "chat", {"Username": "Grace", "Content": "gz on the drop!", "Rank": "Rank"}),
    (8, "utter nonsense that matches nothing",
     "unparsed", {"failure_reason": "no_pattern_match"}),
    (9, "<:gim:555>Heidi received a drop: Abyssal whip (2,500,000 coins)",
     "broadcast", {"Broadcast_Type": "(GIM) Valuable Drop", "Username": "Heidi",
                   "Item_Value": 2500000}),
    (10, "Ivan, Judy and Mallory has been invited into the clan by Oscar.",
     "broadcast_multi", {"Broadcast_Type": "Clan Invite", "Action_By": "Oscar"}),
    (11, "Peggy has a funny feeling like she's being followed: Pet snakeling at 1,219 kills.",
     "broadcast", {"Broadcast_Type": "Pet", "Pet_Name": "Pet snakeling",
                   "Pet_KC": 1219, "Pet_KC_Type": "kills"}),
    (12, "Quentin has completed the Elite Lumbridge & Draynor diary.",
     "broadcast", {"Broadcast_Type": "Diary", "Tier": "Elite",
                   "Task_Name": "Lumbridge & Draynor"}),
    (13, "Rupert has been defeated by Sybil and lost an extraordinary amount of loot.",
     "broadcast", {"Broadcast_Type": "PvP Death", "Opponent": "Sybil",
                   "Item_Name": "an extraordinary amount of loot",
                   "Item_Value": None}),
    (14, "Trent has deposited 1,000,000 coins into the coffer.",
     "broadcast", {"Broadcast_Type": "Clan Coffer Deposit", "Item_Value": 1000000}),
]


@pytest.fixture(scope="module")
def parsed(spark):
    cfg = default_config()
    raw = spark.createDataFrame(
        [(i, TS, c) for i, c, _, _ in CORPUS],
        "id long, timestamp timestamp, raw_content string",
    )
    streams = build_parse_plan(raw, cfg)
    return {
        "chat": {r["raw_log_id"]: r.asDict() for r in streams.chat.collect()},
        "broadcasts": streams.broadcasts.collect(),
        "unparsed": {r["raw_log_id"]: r.asDict() for r in streams.unparsed.collect()},
    }


def _bc_by_id(parsed, rid):
    return [r.asDict() for r in parsed["broadcasts"] if r["raw_log_id"] == rid]


def test_routing_is_a_partition(parsed):
    ids = set(range(1, len(CORPUS) + 1))
    chat_ids = set(parsed["chat"])
    bc_ids = {r["raw_log_id"] for r in parsed["broadcasts"]}
    un_ids = set(parsed["unparsed"])
    assert chat_ids | bc_ids | un_ids == ids
    assert chat_ids & bc_ids == set()
    assert chat_ids & un_ids == set()
    assert bc_ids & un_ids == set()


@pytest.mark.parametrize("rid,content,route,checks", CORPUS,
                         ids=[str(c[0]) for c in CORPUS])
def test_corpus_row(parsed, rid, content, route, checks):
    if route == "chat":
        row = parsed["chat"][rid]
    elif route == "unparsed":
        row = parsed["unparsed"][rid]
    elif route == "broadcast":
        rows = _bc_by_id(parsed, rid)
        assert len(rows) == 1, rows
        row = rows[0]
    else:  # broadcast_multi
        rows = _bc_by_id(parsed, rid)
        assert len(rows) > 1
        row = rows[0]
    for k, v in checks.items():
        assert row[k] == v, f"{k}: {row[k]!r} != {v!r}"


def test_multi_user_explode_users(parsed):
    users = {r["Username"] for r in _bc_by_id(parsed, 10)}
    assert users == {"Ivan", "Judy", "Mallory"}


def test_glued_username_repair(spark):
    cfg = default_config()
    raw = spark.createDataFrame(
        [(1, TS, "Aliceand Bob has been invited into the clan by Carol.")],
        "id long, timestamp timestamp, raw_content string",
    )
    out = build_parse_plan(raw, cfg).broadcasts.collect()
    assert {r["Username"] for r in out} == {"Alice", "Bob"}


def test_trailing_and_word_repair_parity(spark):
    """Reference parity for the per-word 'and' repair at END of the
    username string (src/2_parse_engine.py:213-246, a round-3 ADVICE
    finding): 'PlayerA and Roland' is repaired to 'PlayerA and Rol
    and', which the ' and ' split leaves as ['PlayerA', 'Rol and'] —
    the reference's (false-positive-inclusive) behavior.  But a LONE
    trailing-'and' word must NOT split: the repaired 'Rol and' has no
    ' and ' separator, so the reference keeps the ORIGINAL 'Roland'."""
    cfg = default_config()
    raw = spark.createDataFrame(
        [
            (1, TS, "PlayerA and Roland has been invited into the clan by Carol."),
            (2, TS, "Roland has been invited into the clan by Carol."),
        ],
        "id long, timestamp timestamp, raw_content string",
    )
    out = build_parse_plan(raw, cfg).broadcasts.collect()
    by_id: dict[int, set] = {}
    for r in out:
        by_id.setdefault(r["raw_log_id"], set()).add(r["Username"])
    assert by_id[1] == {"PlayerA", "Rol and"}
    assert by_id[2] == {"Roland"}


def test_first_match_wins_order(spark):
    """A message matching both a specific and a generic variant must
    take the earlier (more specific) one — config order is load-bearing."""
    cfg = default_config()
    raw = spark.createDataFrame(
        [(1, TS, "Zed received a drop: Rare thing (5,000 coins) from Vorkath.")],
        "id long, timestamp timestamp, raw_content string",
    )
    row = build_parse_plan(raw, cfg).broadcasts.collect()[0]
    # the 3-arg variant (with Source_Mob) wins over the 2-arg variant
    assert row["Source_Mob"] == "Vorkath"
    assert row["Item_Value"] == 5000


def test_escape_cleanup(spark):
    cfg = default_config()
    raw = spark.createDataFrame(
        [(1, TS, r"Alice received a drop: Dragon \(full\) helm (100,000 coins)")],
        "id long, timestamp timestamp, raw_content string",
    )
    row = build_parse_plan(raw, cfg).broadcasts.collect()[0]
    assert row["Item_Name"] == "Dragon (full) helm"


def test_missing_required_dead_letter(spark):
    """A pattern hit whose required column is blank goes to unparsed
    with the right reason."""
    cfg = default_config()
    raw = spark.createDataFrame(
        [(1, TS, "<:Rank:1>**  **: hi")],  # blank username chat
        "id long, timestamp timestamp, raw_content string",
    )
    streams = build_parse_plan(raw, cfg)
    assert streams.chat.count() == 0
    un = streams.unparsed.collect()
    assert len(un) == 1
    assert un[0]["failure_reason"] == "chat_missing_required"


def test_gate_literal_skips_scoped_ignorecase_groups():
    """(?i:...) sets add_flags on the SUBPATTERN, not the global tree
    flags — literals inside it are not case-required and must not
    become contains() gates (they would veto rows the regex matches)."""
    from osrs_dashboard_elt_spark.plans.parse_plan import _gate_literal

    # scoped-ignorecase literal must not gate; the outer literal may
    assert _gate_literal(r"(?i:Collection Log) slotted") == " slotted"
    assert _gate_literal(r"(?i:Collection Log)") is None
    # global inline flag -> no gates at all
    assert _gate_literal(r"(?i)Collection Log slot") is None
    # plain literals still gate
    assert _gate_literal(r"^(.+?) received a drop: (.+)$") == " received a drop: "


def test_gated_dispatch_equals_ungated_on_adversarial_corpus(spark):
    """The prefilter contract, tested directly: for every message —
    real templates, case-flips, truncations, literal fragments,
    random unicode — the gated variant index equals the ungated one."""
    import random

    from osrs_dashboard_elt_spark.config import default_config
    from osrs_dashboard_elt_spark.plans.parse_plan import (
        _gate_literal,
        _variant_index,
    )

    cfg = default_config()
    rng = random.Random(42)
    base = [
        "player one received a drop: Dragon claws (18,000,000 coins) from Corp.",
        "<:Iron:1>player two has reached Attack level 99.",
        "p3 has achieved a new Chambers of Xeric personal best: 16:32.40",
        "someone has been defeated by X in The Wilderness and lost (5 coins) worth of loot.",
        "a has deposited one coin into the coffer.",
        "<:A:1><:B:2>**chatter**: hello world",
        "<@728615641245941770>",
        "unstructured noise 42",
        "",
    ]
    # every gate literal itself, embedded in junk — the adversarial
    # case: gate passes, regex must still arbitrate
    gates = [
        _gate_literal(v.regex)
        for g in cfg.groups
        for v in g.variants
        if _gate_literal(v.regex)
    ]
    msgs = list(base)
    for lit in gates:
        msgs.append(f"junk{lit}junk")
        msgs.append(lit)
    for m in list(base):
        if m:
            msgs.append(m.upper())
            msgs.append(m.lower())
            msgs.append(m[: len(m) // 2])
            msgs.append(m + " trailing")
    msgs += [
        "".join(rng.choice(" abcdefgh:()<>*.,0123456789é中") for _ in range(rng.randrange(0, 80)))
        for _ in range(200)
    ]
    df = spark.createDataFrame([(m,) for m in msgs], "content string")
    out = df.select(
        _variant_index("content", cfg, gated=True).alias("g"),
        _variant_index("content", cfg, gated=False).alias("u"),
        "content",
    )
    diff = out.filter(F.col("g") != F.col("u")).collect()
    assert not diff, [(r.content, r.g, r.u) for r in diff[:5]]
