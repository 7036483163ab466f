"""Config-as-data tests: reference-format TOML -> engine model.

Covers the SURVEY §1.1 pillar: load_config parses the reference's
config.toml grammar (patterns, game modes, mapping/exclusion rules,
item overrides, schemas, report specs), dump_config round-trips it,
and the loaded pattern library drives build_parse_plan end-to-end.
The reference's own example files (read-only) are used as golden
inputs when present; the round-trip test keeps the format covered in
a standalone checkout.
"""

from __future__ import annotations

import os
import tomllib
from datetime import datetime

import pytest

from osrs_dashboard_elt_spark.config import GameModeRule, default_config
from osrs_dashboard_elt_spark.config_loader import (
    DashboardSettings,
    DetailedSpec,
    EngineConfig,
    ItemOverride,
    LeaderboardSpec,
    TimeSettings,
    TimeseriesSpec,
    check_pattern_compat,
    dump_config,
    duration_str_to_seconds,
    load_config,
    load_config_dict,
    load_historical_clog,
    load_historical_pbs,
)
from osrs_dashboard_elt_spark.operators.exclusions import ExclusionWindow
from osrs_dashboard_elt_spark.operators.remap import MappingRule

REF_CONFIG = "/root/reference/src/config.example.toml"
REF_PBS = "/root/reference/src/historical_personal_bests.example.toml"
REF_CLOG = "/root/reference/src/historical_collection_logs.example.toml"

ref_only = pytest.mark.skipif(
    not os.path.exists(REF_CONFIG), reason="reference tree not available"
)


# ---------------------------------------------------------------------------
# Helpers
# ---------------------------------------------------------------------------


def _norm_parse(parse):
    """Behavior-relevant normal form of a ParseConfig: per-variant
    (type, regex, columns, effective-required) in order."""
    return [
        (
            g.broadcast_type,
            v.regex,
            v.columns,
            tuple(g.variant_required(v)),
        )
        for g in parse.groups
        for v in g.variants
    ]


def _sample_engine_config() -> EngineConfig:
    parse = default_config()
    # dump emits only literal-prefix game-mode rules (the reference's
    # format); swap the name-based defaults for prefix-style ones.
    object.__setattr__  # noqa: B018 — just documenting frozen workaround below
    from dataclasses import replace

    parse = replace(
        parse,
        game_modes=(
            GameModeRule("Leagues", prefixes=("<:Leagues_V_badge:101>",)),
            GameModeRule(
                "Gridmaster",
                prefixes=("<:Quest_badge:456><:Speedrunner_badge:789>",),
            ),
            GameModeRule(
                "Ironman",
                prefixes=("<:Ironman_badge:111>", "<:HCIM_badge:222>"),
            ),
        ),
    )
    return EngineConfig(
        parse=parse,
        mapping_rules=(
            MappingRule(target="Mace", sources=("bee", "mark")),
            MappingRule(
                target="PlayerA",
                sources=("OldNameA",),
                end=datetime(2025, 3, 1),
            ),
        ),
        exclusions=(
            ExclusionWindow(
                start=datetime(2024, 7, 19, 17, 0),
                end=datetime(2024, 8, 3, 17, 0),
                types=("All Broadcasts",),
            ),
        ),
        item_overrides={
            "Twisted bow": ItemOverride(1_486_480_000, "20997"),
            "an extraordinary amount of loot": ItemOverride(2_147_483_647),
        },
        schemas={
            "clan_broadcasts": {"raw_log_id": "BIGINT", "Timestamp": "TEXT"},
        },
        dashboard=DashboardSettings(
            leaderboard_reports=(
                LeaderboardSpec(
                    report_name="valuable_drops_summary",
                    source_table="clan_broadcasts",
                    group_by_column="Username",
                    aggregations=(("Count", "Username"), ("Value", "Item_Value")),
                    broadcast_types=("Valuable Drop", "Raid Loot"),
                ),
                LeaderboardSpec(
                    report_name="big_gzers_summary",
                    source_table="chat",
                    group_by_column="Username",
                    aggregations=(("Count", "Content"),),
                    search_phrases=("gz", "grats"),
                ),
            ),
            detailed_reports=(
                DetailedSpec("pvp_kills_detail", ("PvP Kill",)),
            ),
            timeseries_reports=(
                TimeseriesSpec(
                    "valuable_drops_timeseries",
                    ("Valuable Drop",),
                    ("6h", "D", "W"),
                ),
            ),
        ),
        time=TimeSettings(
            mode="custom",
            custom_start=datetime(2023, 1, 1, 0, 0),
            custom_end=datetime(2023, 1, 31, 23, 59),
        ),
        historical_pb_file="historical_personal_bests.toml",
        historical_clog_file="historical_collection_logs.toml",
    )


# ---------------------------------------------------------------------------
# Round trip (standalone — no reference tree needed)
# ---------------------------------------------------------------------------


def test_dump_load_round_trip():
    cfg = _sample_engine_config()
    text = dump_config(cfg)
    loaded = load_config_dict(tomllib.loads(text))

    assert _norm_parse(loaded.parse) == _norm_parse(cfg.parse)
    assert loaded.parse.chat.regex == cfg.parse.chat.regex
    assert loaded.parse.chat.columns == cfg.parse.chat.columns
    assert loaded.parse.game_modes == cfg.parse.game_modes
    assert loaded.mapping_rules == cfg.mapping_rules
    assert loaded.exclusions == cfg.exclusions
    assert loaded.item_overrides == cfg.item_overrides
    assert loaded.schemas == cfg.schemas
    assert loaded.dashboard == cfg.dashboard
    assert loaded.time == cfg.time
    assert loaded.historical_pb_file == cfg.historical_pb_file

    # dump is a fixed point after one load
    assert dump_config(loaded) == text


def test_default_config_counts():
    """The shipped library mirrors the reference inventory: 22
    broadcast types + chat, 42 regexes total."""
    cfg = default_config()
    assert len(cfg.groups) == 22
    assert cfg.n_variants() == 41  # + chat regex = 42
    assert check_pattern_compat(cfg) == []


def test_check_pattern_compat_catches_dialect_issues():
    from dataclasses import replace

    from osrs_dashboard_elt_spark.config import (
        BroadcastGroup,
        PatternVariant,
    )

    cfg = default_config()
    bad = BroadcastGroup(
        "Bad",
        (
            PatternVariant(r"(?P<name>\w+) hi", ("Username",)),
            PatternVariant(r"\p{Alpha}+", ()),
            PatternVariant(r"a*+b", ()),
            PatternVariant(r"^(\w+) (\w+)$", ("Username",)),  # group/col mismatch
        ),
    )
    problems = check_pattern_compat(replace(cfg, groups=cfg.groups + (bad,)))
    assert len(problems) == 4
    assert any("named group" in p for p in problems)
    # \p doesn't even compile under Python re — either report is fine
    assert any("\\p{" in p or "does not compile" in p for p in problems)
    assert any("possessive" in p for p in problems)
    assert any("capture groups" in p for p in problems)


@pytest.mark.parametrize(
    "s,expected",
    [
        ("0:00", 0.0),
        ("1:00", 60.0),
        ("16:22.60", 982.6),
        ("1:15:45", 4545.0),
        ("54.6", 54.6),
        (None, 0.0),
    ],
)
def test_duration_str_to_seconds(s, expected):
    assert duration_str_to_seconds(s) == pytest.approx(expected)


def test_duration_str_rejects_garbage():
    with pytest.raises(ValueError):
        duration_str_to_seconds("not a time")


# ---------------------------------------------------------------------------
# Reference example files as golden inputs (skipped when absent)
# ---------------------------------------------------------------------------


@ref_only
def test_load_reference_config_inventory():
    cfg = load_config(REF_CONFIG)
    types = [g.broadcast_type for g in cfg.parse.groups]
    assert len(types) == 22
    assert cfg.parse.n_variants() == 41
    assert "Combat Achievement Tier" in types
    assert "Bin" in types
    assert types[0] == "Valuable Drop"  # file order preserved
    assert types[-1] == "Bin"
    # every loaded pattern is Java/Python dialect-clean
    assert check_pattern_compat(cfg.parse) == []
    # the non-parse sections
    assert cfg.mapping_rules[0].target == "zezima"
    assert cfg.item_overrides["Twisted bow"].item_id == "20997"
    assert cfg.item_overrides["an extraordinary amount of loot"].item_id is None
    assert "clan_broadcasts" in cfg.schemas
    assert cfg.schemas["clan_broadcasts"]["Item_Value"] == "BIGINT"
    assert len(cfg.dashboard.leaderboard_reports) == 9
    assert len(cfg.dashboard.detailed_reports) == 3
    assert len(cfg.dashboard.timeseries_reports) == 3
    assert cfg.dashboard.personal_bests.pb_grouping_window_seconds == 15
    assert cfg.time.max_lookback_days == 90
    assert cfg.historical_pb_file == "historical_personal_bests.toml"


@ref_only
def test_reference_config_drives_parse_plan(spark):
    """The loaded reference pattern library compiles to a working
    Spark parse plan — real reference-grammar messages route and
    extract correctly."""
    from osrs_dashboard_elt_spark.plans import build_parse_plan

    cfg = load_config(REF_CONFIG)
    ts = datetime(2024, 1, 15, 12, 0)
    corpus = [
        (1, "Alice received a drop: Twisted bow (1,486,480,000 coins) from Chambers of Xeric."),
        (2, "Bob has unlocked the Grandmaster tier of rewards from Combat Achievements!"),
        (3, "Carol has expelled Dave from the clan."),
        (4, "Erin has died and lost a life. Erin's group has 2/3 lives left."),
        (5, "Frank has a funny feeling like he's being followed: Pet snakeling at 1,219 kills."),
        (6, "utter nonsense matching nothing"),
    ]
    raw = spark.createDataFrame(
        [(i, ts, c) for i, c in corpus],
        "id long, timestamp timestamp, raw_content string",
    )
    streams = build_parse_plan(raw, cfg.parse)
    rows = {r["raw_log_id"]: r.asDict() for r in streams.broadcasts.collect()}
    assert rows[1]["Broadcast_Type"] == "Valuable Drop"
    assert rows[1]["Item_Value"] == 1486480000
    assert rows[2]["Broadcast_Type"] == "Combat Achievement Tier"
    assert rows[2]["Tier"] == "Grandmaster"
    assert rows[3]["Broadcast_Type"] == "Clan Expelled"
    assert rows[3]["Username"] == "Dave"
    assert rows[3]["Action_By"] == "Carol"
    assert rows[4]["Broadcast_Type"] == "HC Life Lost"
    assert rows[4]["New_Group_Lives"] == "2/3"
    assert rows[5]["Broadcast_Type"] == "Pet"
    assert rows[5]["Pet_KC"] == 1219
    un = {r["raw_log_id"] for r in streams.unparsed.collect()}
    assert un == {6}


@ref_only
def test_load_reference_historical_pbs():
    h = load_historical_pbs(REF_PBS)
    assert h.other_group_name == "Miscellaneous PBs"
    assert len(h.groups) >= 3
    names = h.task_names()
    assert "Chambers of Xeric (Team Size: Solo)" in names
    assert ("Theatre of Blood", "Entry mode") in h.exclude_rules
    # every seeded time parses
    for g in h.groups:
        for r in g.records:
            duration_str_to_seconds(r.time)


@ref_only
def test_load_reference_historical_clog():
    h = load_historical_clog(REF_CLOG)
    assert h.other_group_name == "Miscellaneous unsorted"
    assert h.initial_counts.get("3rd age amulet") == 0
    gm = h.group_map()
    assert any("Abyssal whip" in items for items in gm.values())
    assert (("Onyx bolt",)) in h.exclude_rules


# ---------------------------------------------------------------------------
# TOML validation report (reference src/Validate_toml.py:13-55)
# ---------------------------------------------------------------------------


def test_validate_toml_collects_all_issues(tmp_path):
    """One malformed file, one missing file, one shape-invalid file:
    the report contains ALL three with line/col + caret context for
    the decode error — not just the first failure."""
    from osrs_dashboard_elt_spark.config_loader import (
        format_validation_report,
        load_config_dict,
        validate_toml_files,
    )

    bad = tmp_path / "broken.toml"
    bad.write_text('[section]\nkey = "unclosed\n')
    missing = str(tmp_path / "nope.toml")
    shape = tmp_path / "shape.toml"
    shape.write_text("[api_settings]\nx = 1\n")  # valid TOML, no [patterns].Chat

    issues = validate_toml_files(
        [str(bad), missing, str(shape)],
        shape_loaders={str(shape): load_config_dict},
    )
    kinds = [(i.path, i.kind) for i in issues]
    assert kinds == [
        (str(bad), "decode"),
        (missing, "missing"),
        (str(shape), "shape"),
    ]
    decode = issues[0]
    assert decode.line == 2 and decode.col is not None
    assert decode.context is not None and "^" in decode.context
    assert 'key = "unclosed' in decode.context

    report = format_validation_report(issues)
    assert "Occurred at Line 2" in report
    assert "File not found" in report
    assert "Chat" in report  # shape error names the missing entry


def test_validate_toml_clean_files_no_issues(tmp_path):
    from osrs_dashboard_elt_spark.config_loader import (
        format_validation_report,
        validate_toml_files,
    )

    ok = tmp_path / "ok.toml"
    ok.write_text("[a]\nb = 1\n")
    issues = validate_toml_files([str(ok)])
    assert issues == []
    assert format_validation_report(issues) == "All TOML files valid."
