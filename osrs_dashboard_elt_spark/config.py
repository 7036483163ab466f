"""Typed config model for the parse engine and reports.

The reference declares its whole parse behavior as config data
(pattern library, column mappings, game-mode rules, report specs) in
TOML (reference src/config.example.toml:377-538 patterns, :205-220
game-mode rules, :256-351 report specs) and interprets it row-by-row
in Python.  Here the same declarations COMPILE to Spark Column
expressions (see plans/parse_plan.py) — config stays data, execution
becomes a Catalyst plan.

``default_config()`` ships a pattern library with equivalent coverage
to the reference's (written independently against the same message
grammar): drops, pets, levels, XP, collection log, clues, raids,
personal bests, quests, diaries, combat tasks, PvP, clan membership,
hardcore lives, coffer movements.

Regex dialect note: patterns must run identically under Java
(``java.util.regex``) and Python ``re`` for testability — stick to
capture groups, literal text, character classes, and greedy/lazy
quantifiers; no inline flags, lookbehind, or ``\\p{...}`` classes.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PatternVariant:
    """One regex alternative for a broadcast group.

    ``columns`` name the capture groups positionally; ``"_"`` discards
    a group (reference src/2_parse_engine.py:65-81).
    """

    regex: str
    columns: tuple[str, ...]


@dataclass(frozen=True)
class BroadcastGroup:
    """A broadcast type with ordered variants (first match wins across
    groups AND variants — order is load-bearing, reference
    src/2_parse_engine.py:141-252)."""

    broadcast_type: str
    variants: tuple[PatternVariant, ...]
    required: tuple[str, ...] = ()


@dataclass(frozen=True)
class GameModeRule:
    """Leading emoji token -> game-mode tag.  A broadcast starting with
    ``<:NAME:123>`` where NAME is in ``emojis`` gets its
    ``Broadcast_Type`` prefixed ``"(mode) "`` and the emoji prefix
    stripped before pattern dispatch (reference
    src/2_parse_engine.py:83-116 matches icon prefixes the same way)."""

    mode: str
    emojis: tuple[str, ...]


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


# Username group: word chars, hyphen, space — plus comma so glued
# multi-user broadcasts ("A, B and C has been invited...") match and
# can be exploded downstream.
_USER = r"([\w,\- ]+)"
_VALUE = r"([\d,]+)"


def default_config() -> ParseConfig:
    """Pattern library with the reference's coverage, written against
    the OSRS clan-broadcast message grammar."""
    groups = (
        BroadcastGroup(
            "Valuable Drop",
            (
                PatternVariant(
                    rf"^{_USER} received a drop: (.+?) \({_VALUE} coins\) from (.+?)\.?$",
                    ("Username", "Item_Name", "Item_Value", "Source_Mob"),
                ),
                PatternVariant(
                    rf"^{_USER} received a drop: (.+?) \({_VALUE} coins\)\.?$",
                    ("Username", "Item_Name", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_USER} received a drop: (.+?)\.?$",
                    ("Username", "Item_Name"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Collection Log",
            (
                PatternVariant(
                    rf"^{_USER} received a new collection log item: (.+?) \((\d+)/(\d+)\)$",
                    ("Username", "Item_Name", "Collection_Log_Progress", "_"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Clue Item",
            (
                PatternVariant(
                    rf"^{_USER} received a clue item: (.+?) \({_VALUE} coins\)\.?$",
                    ("Username", "Item_Name", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_USER} received a clue item: (.+?)\.?$",
                    ("Username", "Item_Name"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Raid Loot",
            (
                PatternVariant(
                    rf"^{_USER} received special loot from a raid: (.+?) \({_VALUE} coins\)\.?$",
                    ("Username", "Item_Name", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_USER} received special loot from a raid: (.+?)\.?$",
                    ("Username", "Item_Name"),
                ),
            ),
            required=("Username", "Item_Name"),
        ),
        BroadcastGroup(
            "Pet",
            (
                PatternVariant(
                    rf"^{_USER} (?:has a funny feeling like .+? followed|feels something weird sneaking into .+? backpack): (.+?) at {_VALUE} (chompy kills|kills|killcount|rift searches|hard fights|points)\.?$",
                    ("Username", "Pet_Name", "Pet_KC", "Pet_KC_Type"),
                ),
                PatternVariant(
                    rf"^{_USER} (?:has a funny feeling like|feels) .+? (?:followed|acquired something special): (.+?)\.?$",
                    ("Username", "Pet_Name"),
                ),
            ),
            required=("Username", "Pet_Name"),
        ),
        BroadcastGroup(
            "Personal Best",
            (
                PatternVariant(
                    rf"^{_USER} has achieved a new (.+?) personal best: ([\d:.]+)$",
                    ("Username", "Task_Name", "PB_Time"),
                ),
            ),
            required=("Username", "Task_Name", "PB_Time"),
        ),
        BroadcastGroup(
            "Max Combat",
            (
                PatternVariant(
                    rf"^{_USER} has reached the highest possible combat level of 126!$",
                    ("Username",),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Total Level",
            (
                PatternVariant(
                    rf"^{_USER} has reached a total level of (\d+)\.?$",
                    ("Username", "New_Level"),
                ),
            ),
            required=("Username", "New_Level"),
        ),
        BroadcastGroup(
            "Level Up",
            (
                PatternVariant(
                    rf"^{_USER} has reached (\w+(?: \w+)?) level (\d+)\.?$",
                    ("Username", "Skill", "New_Level"),
                ),
            ),
            required=("Username", "Skill", "New_Level"),
        ),
        BroadcastGroup(
            "XP Milestone",
            (
                PatternVariant(
                    rf"^{_USER} has reached {_VALUE} XP in (\w+(?: \w+)?)\.?$",
                    ("Username", "_", "Skill"),
                ),
            ),
            required=("Username", "Skill"),
        ),
        BroadcastGroup(
            "Quest Complete",
            (
                PatternVariant(
                    rf"^{_USER} has completed a quest: (.+?)$",
                    ("Username", "Task_Name"),
                ),
            ),
            required=("Username", "Task_Name"),
        ),
        BroadcastGroup(
            "Diary Complete",
            (
                PatternVariant(
                    rf"^{_USER} has completed the (Easy|Medium|Hard|Elite) (.+?) diary\.?$",
                    ("Username", "Tier", "Task_Name"),
                ),
            ),
            required=("Username", "Task_Name"),
        ),
        BroadcastGroup(
            "Combat Task",
            (
                PatternVariant(
                    rf"^{_USER} has completed an? (Easy|Medium|Hard|Elite|Master|Grandmaster) combat task: (.+?)\.?$",
                    ("Username", "Tier", "Task_Name"),
                ),
            ),
            required=("Username", "Task_Name"),
        ),
        BroadcastGroup(
            "PvP Kill",
            (
                PatternVariant(
                    rf"^{_USER} has defeated (.+?) and received \({_VALUE} coins\) worth of loot!$",
                    ("Username", "Opponent", "Item_Value"),
                ),
                PatternVariant(
                    rf"^{_USER} has defeated (.+?) and received an extraordinary amount of loot!$",
                    ("Username", "Opponent"),
                ),
            ),
            required=("Username", "Opponent"),
        ),
        BroadcastGroup(
            "PvP Death",
            (
                PatternVariant(
                    rf"^{_USER} has been defeated by (.+?) and lost \({_VALUE} coins\) worth of loot\.?$",
                    ("Username", "Opponent", "Item_Value"),
                ),
            ),
            required=("Username", "Opponent"),
        ),
        BroadcastGroup(
            "Clan Invite",
            (
                PatternVariant(
                    rf"^{_USER} has been invited into the clan by {_USER}\.?$",
                    ("Username", "Action_By"),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Clan Expel",
            (
                PatternVariant(
                    rf"^{_USER} has been expelled from the clan by {_USER}\.?$",
                    ("Username", "Action_By"),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Clan Leave",
            (
                PatternVariant(
                    rf"^{_USER} has left the clan\.?$",
                    ("Username",),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "HC Life Lost",
            (
                PatternVariant(
                    rf"^{_USER} has died as a Hardcore Group Ironman and lost a group life\. \((\d+)/(\d+) lives remaining\)$",
                    ("Username", "New_Group_Lives", "_"),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Coffer Deposit",
            (
                PatternVariant(
                    rf"^{_USER} has deposited {_VALUE} coins into the coffer\.?$",
                    ("Username", "Item_Value"),
                ),
            ),
            required=("Username",),
        ),
        BroadcastGroup(
            "Coffer Withdraw",
            (
                PatternVariant(
                    rf"^{_USER} has withdrawn {_VALUE} coins from the coffer\.?$",
                    ("Username", "Item_Value"),
                ),
            ),
            required=("Username",),
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
