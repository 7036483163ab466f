"""Typed config model for the parse engine and reports.

The reference declares its whole parse behavior as config data
(pattern library, column mappings, game-mode rules, report specs) in
TOML (reference src/config.example.toml:377-538 patterns, :205-220
game-mode rules, :256-351 report specs) and interprets it row-by-row
in Python.  Here the same declarations COMPILE to Spark Column
expressions (see plans/parse_plan.py) — config stays data, execution
becomes a Catalyst plan.  ``config_loader.load_config`` parses the
reference's TOML format directly into this model.

``default_config()`` ships the FULL pattern library — 22 broadcast
types + chat, 42 regex variants, mirroring the reference grammar
(config.example.toml:377-538) variant-for-variant, written
independently against the same public OSRS clan-broadcast message
grammar.

Regex dialect note: patterns must run identically under Java
(``java.util.regex``, which Spark's ``rlike``/``regexp_extract``
use) and Python ``re`` for testability — stick to capture groups,
literal text, character classes, and greedy/lazy quantifiers; no
inline flags, lookbehind, named groups, or ``\\p{...}`` classes.
``config_loader.check_pattern_compat`` enforces this.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PatternVariant:
    """One regex alternative for a broadcast group.

    ``columns`` name the capture groups positionally; ``"_"`` discards
    a group (reference src/2_parse_engine.py:65-81).  ``required``
    overrides the group-level required set per-variant (the reference
    carries ``required_columns`` on each variant); ``None`` falls back
    to the group's.
    """

    regex: str
    columns: tuple[str, ...]
    required: tuple[str, ...] | None = None


@dataclass(frozen=True)
class BroadcastGroup:
    """A broadcast type with ordered variants (first match wins across
    groups AND variants — order is load-bearing, reference
    src/2_parse_engine.py:141-252)."""

    broadcast_type: str
    variants: tuple[PatternVariant, ...]
    required: tuple[str, ...] = ()

    def variant_required(self, variant: PatternVariant) -> tuple[str, ...]:
        return variant.required if variant.required is not None else self.required


@dataclass(frozen=True)
class GameModeRule:
    """Leading-icon game-mode tag (reference src/2_parse_engine.py:
    83-116: ``content.startswith("".join(icons))``, first rule wins).

    Two match forms, OR'd together:
    - ``emojis``: first-token emoji NAMES — a broadcast starting with
      ``<:NAME:123>`` where NAME is in ``emojis`` matches regardless
      of the numeric id (id-portable form);
    - ``prefixes``: literal string prefixes, each the concatenation of
      an AND-sequence of full icon tokens — exactly the reference's
      semantics for its single-icon / AND-list / OR-of-ANDs config
      shapes.

    On match the ``Broadcast_Type`` is prefixed ``"(mode) "`` and the
    icon prefix stripped before pattern dispatch.
    """

    mode: str
    emojis: tuple[str, ...] = ()
    prefixes: tuple[str, ...] = ()


@dataclass(frozen=True)
class ChatConfig:
    regex: str
    columns: tuple[str, ...]
    required: tuple[str, ...] = ("Username", "Content")


@dataclass(frozen=True)
class ParseConfig:
    chat: ChatConfig
    groups: tuple[BroadcastGroup, ...]
    game_modes: tuple[GameModeRule, ...] = ()
    numeric_columns: tuple[str, ...] = ("Item_Value", "Pet_KC", "New_Level")
    multi_user_column: str = "Username"

    def all_columns(self) -> list[str]:
        """Union of output columns across groups, in first-seen order."""
        seen: dict[str, None] = {}
        for g in self.groups:
            for v in g.variants:
                for c in v.columns:
                    if c != "_":
                        seen.setdefault(c, None)
        return list(seen)

    def n_variants(self) -> int:
        return sum(len(g.variants) for g in self.groups)


# Username group: word chars, hyphen, space — plus comma so glued
# multi-user broadcasts ("A, B and C has been invited...") match and
# can be exploded downstream.
_USER = r"([\w,\- ]+)"
_VALUE = r"([\d,]+)"
# Up to two leading Discord icon tokens (rank / game-mode badges) are
# tolerated by every broadcast pattern, like the reference's
# (?:<:\w+:\d+>){0,2} prefixes.
_ICONS = r"(?:<:\w+:\d+>\s*){0,2}"


def default_config() -> ParseConfig:
    """The full 42-variant / 22-type pattern library, group-for-group
    and variant-for-variant equivalent to the reference's
    (config.example.toml:377-538), in the same declaration order
    (order is the first-match-wins priority)."""
    groups = (
        BroadcastGroup(
            "Valuable Drop",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} received a drop: (.+?) \({_VALUE} coins\) from (.+?)\.?$",
                    ("Username", "Item_Name", "Item_Value", "Source_Mob"),
                    required=("Username", "Item_Name", "Item_Value", "Source_Mob"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} received a drop: (.+?) \({_VALUE} coins\)\.?$",
                    ("Username", "Item_Name", "Item_Value"),
                    required=("Username", "Item_Name", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_USER} received a rare drop: (.+)$",
                    ("Username", "Item_Name"),
                    required=("Username", "Item_Name"),
                ),
                PatternVariant(
                    rf"^{_USER} received an item: (.+)$",
                    ("Username", "Item_Name"),
                    required=("Username", "Item_Name"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Clue Scroll Item",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} received a clue item: (.+?) \({_VALUE} coins\)\.?$",
                    ("Username", "Item_Name", "Item_Value"),
                    required=("Username", "Item_Name", "Item_Value"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Collection Log",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} received a new collection log item: (.+?) \((\d+/\d+)\)$",
                    ("Username", "Item_Name", "Collection_Log_Progress"),
                    required=("Username", "Item_Name", "Collection_Log_Progress"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Raid Loot",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} received special loot from a raid: (.+?)\.?$",
                    ("Username", "Item_Name"),
                    required=("Username", "Item_Name"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Pet",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has a funny feeling[^:]*: (.+?) at {_VALUE} ([\w ]+)\.$",
                    ("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
                    required=("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} feels something weird[^:]*: (.+?) at {_VALUE} ([\w ]+)\.$",
                    ("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
                    required=("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has a funny feeling[^:]*: (.+?) at {_VALUE} ([\w ]+?) \(.*$",
                    ("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
                    required=("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} feels like .+? acquired something special: (.+)$",
                    ("Username", "Pet_Name"),
                    required=("Username", "Pet_Name"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has a funny feeling like \S+ being followed: (.+?)\.?$",
                    ("Username", "Pet_Name"),
                    required=("Username", "Pet_Name"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has a funny feeling like \S+ would have been followed: (.+?)\.?$",
                    ("Username", "Pet_Name"),
                    required=("Username", "Pet_Name"),
                ),
            ),
            required=("Username", "Pet_Name"),
        ),
        BroadcastGroup(
            "Level Up",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has reached ([\w ]+) level (\d+)\.?$",
                    ("Username", "Skill", "New_Level"),
                    required=("Username", "Skill", "New_Level"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has reached the highest possible (combat) level of (\d+)!$",
                    ("Username", "Skill", "New_Level"),
                    required=("Username", "Skill", "New_Level"),
                ),
            ),
            required=("Username", "Skill", "New_Level"),
        ),
        BroadcastGroup(
            "Total Level",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has reached a total level of (\d+)\.?$",
                    ("Username", "New_Level"),
                    required=("Username", "New_Level"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has reached the highest possible total level of (\d+)!?$",
                    ("Username", "New_Level"),
                    required=("Username", "New_Level"),
                ),
            ),
            required=("Username", "New_Level"),
        ),
        BroadcastGroup(
            "XP Milestone",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has reached {_VALUE} XP in ([\w ]+)\.?$",
                    ("Username", "New_Level", "Skill"),
                    required=("Username", "New_Level", "Skill"),
                ),
            ),
            required=("Username", "Skill"),
        ),
        BroadcastGroup(
            "Quest",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has completed a quest: (.+?)\.?$",
                    ("Username", "Task_Name"),
                    required=("Username", "Task_Name"),
                ),
            ),
            required=("Username", "Task_Name"),
        ),
        BroadcastGroup(
            "Diary",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has completed the (.+?) (.+?) diary\.$",
                    ("Username", "Tier", "Task_Name"),
                    required=("Username", "Tier", "Task_Name"),
                ),
            ),
            required=("Username", "Task_Name"),
        ),
        BroadcastGroup(
            "Combat Task",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has completed an? (.+?) combat task: (.+?)\.?$",
                    ("Username", "Tier", "Task_Name"),
                    required=("Username", "Tier", "Task_Name"),
                ),
            ),
            required=("Username", "Task_Name"),
        ),
        BroadcastGroup(
            "Personal Best",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has achieved a new (.+?) personal best: ([\d:.]+)$",
                    ("Username", "Task_Name", "PB_Time"),
                    required=("Username", "Task_Name", "PB_Time"),
                ),
            ),
            required=("Username", "Task_Name", "PB_Time"),
        ),
        BroadcastGroup(
            "PvP Kill",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has defeated (.+?) and received \({_VALUE} coins\) worth of loot!(.*)$",
                    ("Username", "Opponent", "Item_Value", "_"),
                    required=("Username", "Opponent", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has defeated (.+?), causing (.+?) to lose \({_VALUE} coins\) worth of loot!(.*)$",
                    ("Username", "Opponent", "_", "Item_Value", "_"),
                    required=("Username", "Opponent", "Item_Value"),
                ),
            ),
            required=("Username", "Opponent"),
        ),
        BroadcastGroup(
            "PvP Death",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has been defeated by (.+?) in The Wilderness and lost \({_VALUE} coins\) worth of loot(.*)$",
                    ("Username", "Opponent", "Item_Value", "_"),
                    required=("Username", "Opponent", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has been defeated by (.+?) in The Wilderness(.*)$",
                    ("Username", "Opponent", "_"),
                    required=("Username", "Opponent"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has been defeated by (.+?) and lost \({_VALUE} coins\) worth of loot\.$",
                    ("Username", "Opponent", "Item_Value"),
                    required=("Username", "Opponent", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has been defeated by (.+?) and lost (an extraordinary amount of loot)\.$",
                    ("Username", "Opponent", "Item_Name"),
                    required=("Username", "Opponent", "Item_Name"),
                ),
                PatternVariant(
                    rf"^{_ICONS}{_USER} has been defeated by (.+?)\.$",
                    ("Username", "Opponent"),
                    required=("Username", "Opponent"),
                ),
            ),
            required=("Username", "Opponent"),
        ),
        BroadcastGroup(
            "Combat Achievement Tier",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has unlocked the (.+?) tier of rewards from Combat Achievements!$",
                    ("Username", "Tier"),
                    required=("Username", "Tier"),
                ),
            ),
            required=("Username", "Tier"),
        ),
        BroadcastGroup(
            "Clan Invite",
            (
                PatternVariant(
                    rf"^{_ICONS}{_USER} has been invited into the clan by (.+?)\.?$",
                    ("Username", "Action_By"),
                    required=("Username", "Action_By"),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Clan Expelled",
            (
                PatternVariant(
                    rf"^{_USER} has expelled (.+?) from the clan\.?$",
                    ("Action_By", "Username"),
                    required=("Action_By", "Username"),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Clan Left",
            (
                PatternVariant(
                    rf"^{_USER} has left the clan\.?$",
                    ("Username",),
                    required=("Username",),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "HC Life Lost",
            (
                PatternVariant(
                    rf"^{_USER} has died and lost a life\. (.+?) group has [^0-9]*(\d+/\d+) lives left\.$",
                    ("Username", "_", "New_Group_Lives"),
                    required=("Username", "New_Group_Lives"),
                ),
                PatternVariant(
                    rf"^{_USER} has died and lost their Hardcore Ironman status\.$",
                    ("Username",),
                    required=("Username",),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Clan Coffer Deposit",
            (
                PatternVariant(
                    rf"^{_USER} has deposited {_VALUE} coins into the coffer\.$",
                    ("Username", "Item_Value"),
                    required=("Username", "Item_Value"),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Clan Coffer Withdraw",
            (
                PatternVariant(
                    rf"^{_USER} has withdrawn {_VALUE} coins from the coffer\.$",
                    ("Username", "Item_Value"),
                    required=("Username", "Item_Value"),
                ),
            ),
            required=("Username",),
        ),
        # Catch-all bin for lines to discard downstream (reference
        # config.example.toml bin group; its first entry is shadowed by
        # Valuable Drop's "received an item" variant, faithfully kept —
        # first-match-wins makes it dead there too).
        BroadcastGroup(
            "Bin",
            (
                PatternVariant(
                    rf"^{_USER} received an item: Infernal cape$",
                    ("Username",),
                    required=("Username",),
                ),
                PatternVariant(
                    rf"^{_USER} has deposited one coin into the coffer\.$",
                    ("Username",),
                    required=("Username",),
                ),
                PatternVariant(
                    r"^<@\d+>$",
                    (),
                    required=(),
                ),
                PatternVariant(
                    r"^<@\d+> ?",
                    (),
                    required=(),
                ),
            ),
            required=(),
        ),
    )
    chat = ChatConfig(
        regex=r"^<:(\w+):\d+>(?:<:(\w+):\d+>)?\*\*([\w\- ]+)\*\*: (.+)$",
        columns=("Rank", "Status", "Username", "Content"),
    )
    game_modes = (
        GameModeRule("GIM", ("gim", "Group_ironman")),
        GameModeRule("HCIM", ("hcim", "Hardcore_ironman")),
        GameModeRule("UIM", ("uim", "Ultimate_ironman")),
        GameModeRule("IM", ("im", "Ironman")),
    )
    return ParseConfig(chat=chat, groups=groups, game_modes=game_modes)
