"""Config-as-data: parse the reference's TOML config format into the
typed engine model (SURVEY.md §1.1).

The reference's entire behavior is declared in three TOML files
(loader reference: src/shared_utils.py:44-65):

- ``config.toml`` — pattern library (``[patterns]``,
  config.example.toml:377-538), game modes
  (``[parse_settings.game_modes]`` :205-220), username-mapping rules
  (``[username_mapping]`` :99-117), exclusion windows
  (``[exclusion_settings]`` :127-139), item value overrides
  (``[item_value_overrides]`` :148-188), database schemas
  (``[database_schema]`` :367-371), dashboard report specs
  (``[dashboard_settings]`` :226-351), and time-range settings
  (``[time_settings]`` :62-77);
- ``historical_personal_bests.toml`` — PB page structure, blacklist,
  exclude rules, seeded records
  (historical_personal_bests.example.toml:20-196);
- ``historical_collection_logs.toml`` — item groups + initial counts.

``load_config`` maps all of that onto the engine's dataclasses so a
reference user's existing TOML drives this engine unchanged.
``dump_config`` emits the same format back (round-trip tested).
``check_pattern_compat`` guards the Java/Python regex dialect boundary
(SURVEY.md §7.3): every pattern must behave identically under
``java.util.regex`` (Spark's rlike/regexp_extract) and Python ``re``
(oracles, tests).
"""

from __future__ import annotations

import re
import tomllib
from collections.abc import Sequence
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

from .config import (
    BroadcastGroup,
    ChatConfig,
    GameModeRule,
    ParseConfig,
    PatternVariant,
)
from .operators.exclusions import BlacklistEntry, ExclusionWindow
from .operators.remap import MappingRule

_DATE_FMT = "%Y-%m-%d %H:%M"


# ---------------------------------------------------------------------------
# Model for the non-parse sections
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ItemOverride:
    """[item_value_overrides]: value for items parsed without one; the
    optional item id keys time-varying price fetches."""

    value: int
    item_id: str | None = None


@dataclass(frozen=True)
class LeaderboardSpec:
    report_name: str
    source_table: str
    group_by_column: str
    aggregations: tuple[tuple[str, str], ...]  # (out alias, source column)
    broadcast_types: tuple[str, ...] = ()
    item_name_filter: str | None = None
    search_phrases: tuple[str, ...] = ()


@dataclass(frozen=True)
class DetailedSpec:
    report_name_prefix: str
    broadcast_types: tuple[str, ...]


@dataclass(frozen=True)
class TimeseriesSpec:
    report_name: str
    broadcast_types: tuple[str, ...]
    frequencies: tuple[str, ...]


@dataclass(frozen=True)
class CollectionLogSettings:
    source_types: tuple[str, ...] = (
        "Collection Log",
        "Valuable Drop",
        "Raid Loot",
        "Clue Scroll Item",
    )
    deduplication_type: str = "Collection Log"


@dataclass(frozen=True)
class PersonalBestSettings:
    broadcast_type: str = "Personal Best"
    pb_time_similarity_threshold_seconds: float = 0.6
    pb_grouping_window_seconds: float = 15.0
    allow_multiple_holders_on_match: bool = False


@dataclass(frozen=True)
class RecentAchievementsSettings:
    source_types: tuple[str, ...] = ()
    limit_per_type: int = 15


@dataclass(frozen=True)
class DashboardSettings:
    week_start_day: str = "Monday"
    custom_lookback_days: int = 14
    top_drops_limit: int = 50
    collection_log: CollectionLogSettings = CollectionLogSettings()
    personal_bests: PersonalBestSettings = PersonalBestSettings()
    recent_achievements: RecentAchievementsSettings = RecentAchievementsSettings()
    leaderboard_reports: tuple[LeaderboardSpec, ...] = ()
    detailed_reports: tuple[DetailedSpec, ...] = ()
    timeseries_reports: tuple[TimeseriesSpec, ...] = ()


@dataclass(frozen=True)
class TimeSettings:
    """Incremental-fetch windowing (S2): overlap re-read + settle
    offset (reference config.example.toml:62-77)."""

    mode: str = "auto"
    start_time_overlap_minutes: int = 10
    end_time_offset_minutes: int = 1
    max_lookback_days: int = 90
    custom_start: datetime | None = None
    custom_end: datetime | None = None


@dataclass
class EngineConfig:
    """Everything a reference-format config.toml declares, typed."""

    parse: ParseConfig
    mapping_rules: tuple[MappingRule, ...] = ()
    exclusions: tuple[ExclusionWindow, ...] = ()
    item_overrides: dict[str, ItemOverride] = field(default_factory=dict)
    schemas: dict[str, dict[str, str]] = field(default_factory=dict)
    dashboard: DashboardSettings = field(default_factory=DashboardSettings)
    time: TimeSettings = field(default_factory=TimeSettings)
    historical_pb_file: str | None = None
    historical_clog_file: str | None = None


@dataclass(frozen=True)
class PBRecord:
    name: str
    time: str = "0:00"
    holders: tuple[str, ...] = ()
    discord_emoji: str = ""


@dataclass(frozen=True)
class PBGroup:
    title: str
    records: tuple[PBRecord, ...]
    image: str = ""


@dataclass
class HistoricalPBs:
    """historical_personal_bests.toml: page structure + seed records +
    PB blacklist + exclude rules."""

    other_group_name: str = "Miscellaneous PBs"
    default_group_sort: str = "config"
    default_item_sort: str = "config"
    recent_pb_count: int = 5
    blacklist: tuple[BlacklistEntry, ...] = ()
    exclude_rules: tuple[tuple[str, ...], ...] = ()
    groups: tuple[PBGroup, ...] = ()

    def task_names(self) -> list[str]:
        return [r.name for g in self.groups for r in g.records]

    def group_map(self) -> dict[str, list[str]]:
        return {g.title: [r.name for r in g.records] for g in self.groups}

    def seeded_records(self) -> list[PBRecord]:
        """Records with a real historical time ("0:00" = start fresh)."""
        return [
            r
            for g in self.groups
            for r in g.records
            if duration_str_to_seconds(r.time)
        ]


@dataclass(frozen=True)
class ClogGroup:
    title: str
    items: tuple[str, ...]


@dataclass
class HistoricalClog:
    """historical_collection_logs.toml: item groups + initial counts."""

    other_group_name: str = "Miscellaneous unsorted"
    default_group_sort: str = "config"
    default_item_sort: str = "config"
    exclude_rules: tuple[tuple[str, ...], ...] = ()
    initial_counts: dict[str, int] = field(default_factory=dict)
    groups: tuple[ClogGroup, ...] = ()

    def group_map(self) -> dict[str, list[str]]:
        return {g.title: list(g.items) for g in self.groups}


# ---------------------------------------------------------------------------
# Scalar helpers
# ---------------------------------------------------------------------------


def _parse_dt(s: str | None) -> datetime | None:
    if not s:
        return None
    return datetime.strptime(s, _DATE_FMT)


def duration_str_to_seconds(s: str | None) -> float:
    """'H:MM:SS.f' / 'M:SS.f' / 'SS.f' -> seconds (driver-side twin of
    functions.durations.duration_to_seconds; '0:00' -> 0.0 = unset)."""
    if not s:
        return 0.0
    parts = s.strip().split(":")
    if not all(re.fullmatch(r"\d+(\.\d+)?", p) for p in parts):
        raise ValueError(f"bad duration string: {s!r}")
    total = 0.0
    for p in parts:
        total = total * 60 + float(p)
    return total


def _as_tuple(v: Any) -> tuple[str, ...]:
    """The reference accepts a bare string anywhere a list is allowed."""
    if v is None:
        return ()
    if isinstance(v, str):
        return (v,)
    return tuple(v)


# ---------------------------------------------------------------------------
# Pattern compatibility check (SURVEY.md §7.3)
# ---------------------------------------------------------------------------

# Constructs that exist in only one of java.util.regex / Python re, or
# behave differently; patterns are rejected so plans and oracles agree.
_INCOMPAT = (
    (r"\(\?P[<=]", "Python-only named group / backref syntax (?P<...)"),
    (r"\(\?<[a-zA-Z]", "named group (syntax differs between dialects)"),
    (r"\\p\{", "Java-only \\p{...} character class"),
    (r"\\[hHV]", "Java-only horizontal/vertical whitespace class"),
    (r"(?<![\\\[])[*+?]\+", "Java-only possessive quantifier"),
    (r"\(\?\(", "Python-only conditional group"),
    (r"\(\?[aiLmsux]+\)", "inline global flag (position rules differ)"),
)


def check_pattern_compat(cfg: ParseConfig) -> list[str]:
    """Validate every pattern compiles under Python ``re``, declares as
    many capture groups as mapped columns, and avoids dialect-divergent
    constructs.  Returns a list of problems (empty = compatible)."""
    problems: list[str] = []

    def _check(where: str, rx: str, n_columns: int | None) -> None:
        try:
            compiled = re.compile(rx)
        except re.error as e:
            problems.append(f"{where}: does not compile under re: {e}")
            return
        if n_columns is not None and compiled.groups != n_columns:
            problems.append(
                f"{where}: {compiled.groups} capture groups != "
                f"{n_columns} mapped columns"
            )
        for pat, why in _INCOMPAT:
            if re.search(pat, rx):
                problems.append(f"{where}: {why}")

    _check("chat", cfg.chat.regex, len(cfg.chat.columns))
    for g in cfg.groups:
        for i, v in enumerate(g.variants):
            _check(f"{g.broadcast_type}[{i}]", v.regex, len(v.columns))
    return problems


# ---------------------------------------------------------------------------
# load_config
# ---------------------------------------------------------------------------


def _parse_patterns(patterns: dict[str, Any]) -> tuple[ChatConfig, tuple[BroadcastGroup, ...]]:
    """[patterns] section -> (chat, groups), preserving file order —
    order IS the first-match-wins priority
    (reference src/2_parse_engine.py:158)."""
    chat: ChatConfig | None = None
    groups: list[BroadcastGroup] = []
    for name, gdef in patterns.items():
        if name.lower() == "chat" or "broadcast_type" not in gdef:
            if "regex" in gdef:
                chat = ChatConfig(
                    regex=gdef["regex"],
                    columns=tuple(gdef.get("columns", ())),
                    required=tuple(
                        gdef.get("required_columns", ("Username", "Content"))
                    ),
                )
            continue
        variants = tuple(
            PatternVariant(
                regex=v["regex"],
                columns=tuple(v.get("columns", ())),
                required=(
                    tuple(v["required_columns"])
                    if "required_columns" in v
                    else None
                ),
            )
            for v in gdef.get("variants", ())
        )
        groups.append(
            BroadcastGroup(
                broadcast_type=gdef["broadcast_type"],
                variants=variants,
                required=(),
            )
        )
    if chat is None:
        raise ValueError("[patterns] has no Chat entry")
    return chat, tuple(groups)


def _parse_game_modes(gm: dict[str, Any]) -> tuple[GameModeRule, ...]:
    """OR-of-ANDs icon rules -> literal-prefix GameModeRules, exactly
    the reference's startswith("".join(icons)) semantics."""
    rules: list[GameModeRule] = []
    for mode, spec in gm.items():
        if isinstance(spec, str):
            prefixes: tuple[str, ...] = (spec,)
        elif isinstance(spec, list) and spec and isinstance(spec[0], str):
            prefixes = ("".join(spec),)
        elif isinstance(spec, list):
            prefixes = tuple("".join(sub) for sub in spec)
        else:
            raise ValueError(f"bad game-mode spec for {mode!r}: {spec!r}")
        rules.append(GameModeRule(mode=mode, prefixes=prefixes))
    return tuple(rules)


def _parse_leaderboard(d: dict[str, Any]) -> LeaderboardSpec:
    aggs = tuple((alias, src) for alias, src in d.get("aggregations", {}).items())
    return LeaderboardSpec(
        report_name=d["report_name"],
        source_table=d.get("source_table", "clan_broadcasts"),
        group_by_column=d["group_by_column"],
        aggregations=aggs,
        broadcast_types=_as_tuple(d.get("broadcast_type")),
        item_name_filter=d.get("item_name_filter"),
        search_phrases=_as_tuple(d.get("search_phrases")),
    )


def load_config_dict(config: dict[str, Any]) -> EngineConfig:
    """Build an EngineConfig from an already-parsed TOML dict (the
    shape ``tomllib.load(config.toml)`` produces)."""
    chat, groups = _parse_patterns(config.get("patterns", {}))
    game_modes = _parse_game_modes(
        config.get("parse_settings", {}).get("game_modes", {})
    )
    parse = ParseConfig(chat=chat, groups=groups, game_modes=game_modes)

    mapping = tuple(
        MappingRule(
            target=r["target_username"],
            sources=tuple(r.get("source_usernames", ())),
            start=_parse_dt(r.get("start_date")),
            end=_parse_dt(r.get("end_date")),
        )
        for r in config.get("username_mapping", {}).get("rules", ())
    )

    exclusions = tuple(
        ExclusionWindow(
            start=_parse_dt(r["start_date"]),
            end=_parse_dt(r["end_date"]),
            types=_as_tuple(r.get("exclude_types")),
        )
        for r in config.get("exclusion_settings", {}).get("ranges", ())
    )

    overrides: dict[str, ItemOverride] = {}
    for item, v in config.get("item_value_overrides", {}).items():
        if isinstance(v, list):
            overrides[item] = ItemOverride(value=int(v[0]), item_id=str(v[1]))
        else:
            overrides[item] = ItemOverride(value=int(v))

    schemas = {
        table: dict(cols)
        for table, cols in config.get("database_schema", {}).items()
    }

    ds = config.get("dashboard_settings", {})
    cl = ds.get("collection_log", {})
    pb = ds.get("personal_bests", {})
    ra = ds.get("recent_achievements", {})
    dashboard = DashboardSettings(
        week_start_day=ds.get("week_start_day", "Monday"),
        custom_lookback_days=int(ds.get("custom_lookback_days", 14)),
        top_drops_limit=int(ds.get("top_drops_limit", 50)),
        collection_log=CollectionLogSettings(
            source_types=_as_tuple(cl.get("source_types"))
            or CollectionLogSettings().source_types,
            deduplication_type=cl.get("deduplication_type", "Collection Log"),
        ),
        personal_bests=PersonalBestSettings(
            broadcast_type=pb.get("broadcast_type", "Personal Best"),
            pb_time_similarity_threshold_seconds=float(
                pb.get("pb_time_similarity_threshold_seconds", 0.6)
            ),
            pb_grouping_window_seconds=float(
                pb.get("pb_grouping_window_seconds", 15)
            ),
            allow_multiple_holders_on_match=bool(
                pb.get("allow_multiple_holders_on_match", False)
            ),
        ),
        recent_achievements=RecentAchievementsSettings(
            source_types=_as_tuple(ra.get("source_types")),
            limit_per_type=int(ra.get("limit_per_type", 15)),
        ),
        leaderboard_reports=tuple(
            _parse_leaderboard(d) for d in ds.get("leaderboard_reports", ())
        ),
        detailed_reports=tuple(
            DetailedSpec(
                report_name_prefix=d["report_name_prefix"],
                broadcast_types=_as_tuple(d.get("broadcast_types")),
            )
            for d in ds.get("detailed_reports", ())
        ),
        timeseries_reports=tuple(
            TimeseriesSpec(
                report_name=d["report_name"],
                broadcast_types=_as_tuple(d.get("broadcast_type")),
                frequencies=tuple(d.get("frequencies", ())),
            )
            for d in ds.get("timeseries_reports", ())
        ),
    )

    ts = config.get("time_settings", {})
    ctr = config.get("custom_time_range", {})
    time_settings = TimeSettings(
        mode=ts.get("mode", "auto"),
        start_time_overlap_minutes=int(ts.get("start_time_overlap_minutes", 10)),
        end_time_offset_minutes=int(ts.get("end_time_offset_minutes", 1)),
        max_lookback_days=int(ts.get("max_lookback_days", 90)),
        custom_start=_parse_dt(ctr.get("custom_start_date")),
        custom_end=_parse_dt(ctr.get("custom_end_date")),
    )

    hist = config.get("historical_data", {})
    return EngineConfig(
        parse=parse,
        mapping_rules=mapping,
        exclusions=exclusions,
        item_overrides=overrides,
        schemas=schemas,
        dashboard=dashboard,
        time=time_settings,
        historical_pb_file=hist.get("personal_bests_file"),
        historical_clog_file=hist.get("collection_log_file"),
    )


def load_config(path: str) -> EngineConfig:
    """Load a reference-format ``config.toml``
    (reference src/shared_utils.py:44-65, minus the secrets merge —
    credentials never enter the engine config)."""
    with open(path, "rb") as f:
        return load_config_dict(tomllib.load(f))


def load_historical_pbs(path: str) -> HistoricalPBs:
    with open(path, "rb") as f:
        d = tomllib.load(f)
    blacklist = tuple(
        BlacklistEntry(
            user=b["username"],
            task=b.get("task_name"),
            max_time=(
                duration_str_to_seconds(b["max_time"])
                if "max_time" in b
                else None
            ),
        )
        for b in d.get("blacklist", ())
    )
    groups = tuple(
        PBGroup(
            title=g["title"],
            image=g.get("Image", g.get("image", "")),
            records=tuple(
                PBRecord(
                    name=r["name"],
                    time=r.get("time", "0:00"),
                    holders=_as_tuple(r.get("holder")),
                    discord_emoji=r.get("discord_emoji", ""),
                )
                for r in g.get("records", ())
            ),
        )
        for g in d.get("groups", ())
    )
    return HistoricalPBs(
        other_group_name=d.get("other_group_name", "Miscellaneous PBs"),
        default_group_sort=d.get("default_group_sort", "config"),
        default_item_sort=d.get("default_item_sort", "config"),
        recent_pb_count=int(d.get("recent_PB_count", d.get("recent_pb_count", 5))),
        blacklist=blacklist,
        exclude_rules=tuple(tuple(r) for r in d.get("exclude_rules", ())),
        groups=groups,
    )


def load_historical_clog(path: str) -> HistoricalClog:
    with open(path, "rb") as f:
        d = tomllib.load(f)
    return HistoricalClog(
        other_group_name=d.get("other_group_name", "Miscellaneous unsorted"),
        default_group_sort=d.get("default_group_sort", "config"),
        default_item_sort=d.get("default_item_sort", "config"),
        exclude_rules=tuple(tuple(r) for r in d.get("exclude_rules", ())),
        initial_counts={
            c["name"]: int(c["count"]) for c in d.get("initial_counts", ())
        },
        groups=tuple(
            ClogGroup(title=g["title"], items=tuple(g.get("items", ())))
            for g in d.get("groups", ())
        ),
    )


# ---------------------------------------------------------------------------
# dump_config (round-trip)
# ---------------------------------------------------------------------------


def _toml_str(s: str) -> str:
    return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'


def _toml_rx(s: str) -> str:
    if "'''" in s:
        raise ValueError("regex contains ''' — cannot emit literal string")
    return f"'''{s}'''"


def _toml_list(items: Any) -> str:
    return "[" + ", ".join(_toml_str(i) for i in items) + "]"


def _key(broadcast_type: str) -> str:
    return re.sub(r"[^a-z0-9]+", "_", broadcast_type.lower()).strip("_")


def _fmt_dt(dt: datetime | None) -> str | None:
    return dt.strftime(_DATE_FMT) if dt else None


def dump_config(cfg: EngineConfig) -> str:
    """Emit a reference-format config.toml for ``cfg``.  Inverse of
    ``load_config`` (asserted by the round-trip test); emoji-NAME game
    mode rules are engine-native and have no TOML form — only
    prefix-style rules are emitted."""
    out: list[str] = []

    if cfg.time:
        out.append("[time_settings]")
        out.append(f"mode = {_toml_str(cfg.time.mode)}")
        out.append(
            f"start_time_overlap_minutes = {cfg.time.start_time_overlap_minutes}"
        )
        out.append(f"end_time_offset_minutes = {cfg.time.end_time_offset_minutes}")
        out.append(f"max_lookback_days = {cfg.time.max_lookback_days}")
        if cfg.time.custom_start or cfg.time.custom_end:
            out.append("\n[custom_time_range]")
            if cfg.time.custom_start:
                out.append(
                    f"custom_start_date = {_toml_str(_fmt_dt(cfg.time.custom_start))}"
                )
            if cfg.time.custom_end:
                out.append(
                    f"custom_end_date = {_toml_str(_fmt_dt(cfg.time.custom_end))}"
                )

    if cfg.historical_pb_file or cfg.historical_clog_file:
        out.append("\n[historical_data]")
        if cfg.historical_pb_file:
            out.append(f"personal_bests_file = {_toml_str(cfg.historical_pb_file)}")
        if cfg.historical_clog_file:
            out.append(
                f"collection_log_file = {_toml_str(cfg.historical_clog_file)}"
            )

    if cfg.mapping_rules:
        out.append("\n[username_mapping]")
        out.append("rules = [")
        for r in cfg.mapping_rules:
            parts = [
                f"target_username = {_toml_str(r.target)}",
                f"source_usernames = {_toml_list(r.sources)}",
            ]
            if r.start:
                parts.append(f"start_date = {_toml_str(_fmt_dt(r.start))}")
            if r.end:
                parts.append(f"end_date = {_toml_str(_fmt_dt(r.end))}")
            out.append("  { " + ", ".join(parts) + " },")
        out.append("]")

    for w in cfg.exclusions:
        out.append("\n[[exclusion_settings.ranges]]")
        out.append(f"start_date = {_toml_str(_fmt_dt(w.start))}")
        out.append(f"end_date = {_toml_str(_fmt_dt(w.end))}")
        out.append(f"exclude_types = {_toml_list(w.types)}")

    if cfg.item_overrides:
        out.append("\n[item_value_overrides]")
        for item, ov in cfg.item_overrides.items():
            if ov.item_id is not None:
                out.append(
                    f"{_toml_str(item)} = [{ov.value}, {_toml_str(ov.item_id)}]"
                )
            else:
                out.append(f"{_toml_str(item)} = {ov.value}")

    gm_rules = [r for r in cfg.parse.game_modes if r.prefixes]
    if gm_rules:
        out.append("\n[parse_settings.game_modes]")
        for r in gm_rules:
            ors = ", ".join("[" + _toml_str(p) + "]" for p in r.prefixes)
            out.append(f"{r.mode} = [{ors}]")

    ds = cfg.dashboard
    out.append("\n[dashboard_settings]")
    out.append(f"week_start_day = {_toml_str(ds.week_start_day)}")
    out.append(f"custom_lookback_days = {ds.custom_lookback_days}")
    out.append(f"top_drops_limit = {ds.top_drops_limit}")
    out.append("\n[dashboard_settings.collection_log]")
    out.append(f"source_types = {_toml_list(ds.collection_log.source_types)}")
    out.append(
        f"deduplication_type = {_toml_str(ds.collection_log.deduplication_type)}"
    )
    out.append("\n[dashboard_settings.personal_bests]")
    out.append(f"broadcast_type = {_toml_str(ds.personal_bests.broadcast_type)}")
    out.append(
        "pb_time_similarity_threshold_seconds = "
        f"{ds.personal_bests.pb_time_similarity_threshold_seconds}"
    )
    out.append(
        f"pb_grouping_window_seconds = {ds.personal_bests.pb_grouping_window_seconds}"
    )
    out.append(
        "allow_multiple_holders_on_match = "
        f"{str(ds.personal_bests.allow_multiple_holders_on_match).lower()}"
    )
    out.append("\n[dashboard_settings.recent_achievements]")
    out.append(
        f"source_types = {_toml_list(ds.recent_achievements.source_types)}"
    )
    out.append(f"limit_per_type = {ds.recent_achievements.limit_per_type}")
    for lb in ds.leaderboard_reports:
        out.append("\n[[dashboard_settings.leaderboard_reports]]")
        out.append(f"report_name = {_toml_str(lb.report_name)}")
        out.append(f"source_table = {_toml_str(lb.source_table)}")
        if lb.broadcast_types:
            out.append(f"broadcast_type = {_toml_list(lb.broadcast_types)}")
        if lb.search_phrases:
            out.append(f"search_phrases = {_toml_list(lb.search_phrases)}")
        if lb.item_name_filter:
            out.append(f"item_name_filter = {_toml_str(lb.item_name_filter)}")
        out.append(f"group_by_column = {_toml_str(lb.group_by_column)}")
        aggs = ", ".join(f"{alias} = {_toml_str(src)}" for alias, src in lb.aggregations)
        out.append("aggregations = { " + aggs + " }")
    for det in ds.detailed_reports:
        out.append("\n[[dashboard_settings.detailed_reports]]")
        out.append(f"report_name_prefix = {_toml_str(det.report_name_prefix)}")
        out.append(f"broadcast_types = {_toml_list(det.broadcast_types)}")
    for tsr in ds.timeseries_reports:
        out.append("\n[[dashboard_settings.timeseries_reports]]")
        out.append(f"report_name = {_toml_str(tsr.report_name)}")
        out.append(f"broadcast_type = {_toml_list(tsr.broadcast_types)}")
        out.append(f"frequencies = {_toml_list(tsr.frequencies)}")

    if cfg.schemas:
        out.append("\n[database_schema]")
        for table, cols in cfg.schemas.items():
            decl = ", ".join(f"{c} = {_toml_str(t)}" for c, t in cols.items())
            out.append(f"{table} = {{ {decl} }}")

    out.append("\n[patterns]")
    out.append("\n[patterns.Chat]")
    out.append('type = "chat"')
    out.append(f"regex = {_toml_rx(cfg.parse.chat.regex)}")
    out.append(f"columns = {_toml_list(cfg.parse.chat.columns)}")
    out.append(f"required_columns = {_toml_list(cfg.parse.chat.required)}")
    for g in cfg.parse.groups:
        out.append(f"\n[patterns.{_key(g.broadcast_type)}]")
        out.append(f"broadcast_type = {_toml_str(g.broadcast_type)}")
        out.append("variants = [")
        for v in g.variants:
            parts = [
                f"regex = {_toml_rx(v.regex)}",
                f"columns = {_toml_list(v.columns)}",
            ]
            req = g.variant_required(v)
            parts.append(f"required_columns = {_toml_list(req)}")
            out.append("  { " + ", ".join(parts) + " },")
        out.append("]")

    return "\n".join(out) + "\n"


# ---------------------------------------------------------------------------
# TOML validation report (reference src/Validate_toml.py:13-55)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ValidationIssue:
    """One problem found while validating a TOML config file.

    kind: 'missing' | 'decode' | 'shape'.  Decode issues carry the
    1-based line/column parsed from the TOMLDecodeError (the
    reference's compatibility regex) and a two-line caret context
    excerpt when the file is readable."""

    path: str
    kind: str
    message: str
    line: int | None = None
    col: int | None = None
    context: str | None = None


_TOML_LOC_RX = re.compile(r"\(at line (\d+), column (\d+)\)")


def _decode_context(path: str, line: int, col: int) -> str | None:
    try:
        with open(path, "r", encoding="utf-8") as f:
            lines = f.readlines()
        bad = lines[line - 1].rstrip("\n")
        return f"| {bad}\n| {' ' * (col - 1)}^"
    except (OSError, IndexError):
        return None


def validate_toml_files(
    paths: Sequence[str],
    shape_loaders: dict[str, Any] | None = None,
) -> list[ValidationIssue]:
    """Validate every file, collecting ALL problems instead of raising
    on the first (the reference validator walks its whole file list
    and pretty-prints each failure with line/col + a caret excerpt —
    Validate_toml.py:20-52; plain ``load_config`` still raises).

    ``shape_loaders`` optionally maps a path to a loader callable
    (e.g. ``load_config_dict``) run on the decoded dict, so schema
    problems (missing [patterns].Chat, bad durations, regex dialect)
    are reported alongside syntax errors."""
    issues: list[ValidationIssue] = []
    for path in paths:
        try:
            with open(path, "rb") as f:
                decoded = tomllib.load(f)
        except FileNotFoundError:
            issues.append(
                ValidationIssue(path, "missing", f"File not found at '{path}'")
            )
            continue
        except tomllib.TOMLDecodeError as e:
            msg = str(e)
            m = _TOML_LOC_RX.search(msg)
            line = int(m.group(1)) if m else None
            col = int(m.group(2)) if m else None
            ctx = _decode_context(path, line, col) if m else None
            issues.append(
                ValidationIssue(path, "decode", msg, line, col, ctx)
            )
            continue
        loader = (shape_loaders or {}).get(path)
        if loader is not None:
            try:
                loader(decoded)
            except Exception as e:  # noqa: BLE001 - collected, not raised
                issues.append(ValidationIssue(path, "shape", str(e)))
    return issues


def format_validation_report(issues: Sequence[ValidationIssue]) -> str:
    """Human-readable report in the reference validator's voice."""
    if not issues:
        return "All TOML files valid."
    out: list[str] = []
    for i in issues:
        out.append(f"{i.path}: [{i.kind}] {i.message}")
        if i.line is not None:
            out.append(f"   -> Occurred at Line {i.line}, Column {i.col}")
        if i.context:
            out.extend("   " + ln for ln in i.context.splitlines())
    return "\n".join(out)
