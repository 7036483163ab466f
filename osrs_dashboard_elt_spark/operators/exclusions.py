"""Exclusion / blacklist predicates (reference P6-P8).

All three are pure negated-predicate scans — no shuffle, fully
pushdown-friendly (Catalyst folds them into the parquet scan filter):

- P6 time x type exclusion windows (src/3_transform_data.py:172-221):
  drop rows whose timestamp falls in a window AND whose type matches
  (the literal "All Broadcasts" matches every type); OR over rules.
- P7 contains-ALL rules (src/3_transform_data.py:643-653): drop rows
  where a text column contains every string of any rule set.
- P8 blacklist with 3 arities (src/3_transform_data.py:599-641):
  (user), (user, task), (user, task, max_time: drop records FASTER
  than the cutoff — suspected cheats); plus scrubbing the user from
  holder arrays via the higher-order ``filter``.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ExclusionWindow:
    start: datetime
    end: datetime  # inclusive, matching the reference's between()
    types: tuple[str, ...] = ()  # empty or "All Broadcasts" -> all types


ALL_TYPES = "All Broadcasts"


def exclusion_predicate(
    ts: Column, type_col: Column, windows: list[ExclusionWindow]
) -> Column:
    """True for rows that should be DROPPED."""
    pred = F.lit(False)
    for w in windows:
        in_time = (ts >= F.lit(w.start)) & (ts <= F.lit(w.end))
        if not w.types or ALL_TYPES in w.types:
            type_cond = F.lit(True)
        else:
            type_cond = type_col.isin(*w.types)
        pred = pred | (in_time & type_cond)
    return pred


def apply_exclusions(
    df: DataFrame, ts_col: str, type_col: str, windows: list[ExclusionWindow]
) -> DataFrame:
    if not windows:
        return df
    return df.filter(
        ~exclusion_predicate(F.col(ts_col), F.col(type_col), windows)
    )


def contains_all_predicate(col: Column, rule_sets: list[list[str]]) -> Column:
    """True for rows to DROP: the column contains every string of at
    least one rule set (case-insensitive, like the reference)."""
    lowered = F.lower(col)
    pred = F.lit(False)
    for rule in rule_sets:
        rule_pred = F.lit(True)
        for s in rule:
            rule_pred = rule_pred & lowered.contains(s.lower())
        pred = pred | rule_pred
    return pred


@dataclass(frozen=True)
class BlacklistEntry:
    user: str
    task: str | None = None  # None -> all tasks
    max_time: float | None = None  # drop records strictly FASTER (<) than this


def blacklist_predicate(
    user: Column, task: Column, seconds: Column, entries: list[BlacklistEntry]
) -> Column:
    """True for rows to DROP under the 3-arity blacklist semantics."""
    pred = F.lit(False)
    for e in entries:
        p = user == F.lit(e.user)
        if e.task is not None:
            p = p & (task == F.lit(e.task))
        if e.max_time is not None:
            p = p & (seconds < F.lit(e.max_time))
        pred = pred | p
    return pred


def scrub_holder_arrays(
    df: DataFrame, holders_col: str, users: list[str]
) -> DataFrame:
    """Remove blacklisted users from an array<string> holder column
    (higher-order filter; reference mutates python lists per row)."""
    if not users:
        return df
    return df.withColumn(
        holders_col,
        F.filter(F.col(holders_col), lambda u: ~u.isin(*users)),
    )
