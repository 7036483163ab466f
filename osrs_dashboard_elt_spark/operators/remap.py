"""Temporal entity remapping (SCD-style rewrite) and rule validation.

Reference W4 (src/3_transform_data.py:138-168): username mapping rules
carry optional [start, end) validity; rules are applied with
later-rule-wins precedence (documented at config.example.toml:96-97,
implemented there by iterating ``reversed(rules)``).  Applied to the
Username / Action_By / Opponent columns.

Spark-first: order-dependent iteration is not a Spark-safe idiom; the
precedence is compiled INTO the expression — a ``when`` chain emitted in
reverse rule order, so the highest-priority (latest) matching rule wins
per row, in one scan with no shuffle.  (The reference's sequential
application can cascade renames rule-to-rule; the declarative form
resolves each row against the original value, which is the documented
intent — see conflict validation below for overlaps.)

W5 (src/3_transform_data.py:103-136): pairwise overlap validation of
rules — driver-side, O(rules^2), rules are config-sized.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime
from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class MappingRule:
    target: str
    sources: tuple[str, ...]
    start: datetime | None = None  # inclusive
    end: datetime | None = None  # exclusive


def _rule_cond(col: Column, ts: Column, rule: MappingRule) -> Column:
    cond = col.isin(*rule.sources)
    if rule.start is not None:
        cond = cond & (ts >= F.lit(rule.start))
    if rule.end is not None:
        cond = cond & (ts < F.lit(rule.end))
    return cond


def remap_expr(col: Column, ts: Column, rules: list[MappingRule]) -> Column:
    """when-chain in reverse rule order: later rules take precedence."""
    expr = col
    for rule in rules:  # build otherwise->when inside-out
        expr = F.when(_rule_cond(col, ts, rule), F.lit(rule.target)).otherwise(expr)
    return expr


def apply_mapping(
    df: DataFrame,
    ts_col: str,
    name_cols: list[str],
    rules: list[MappingRule],
) -> DataFrame:
    """Rewrite every ``name_cols`` column under the rules (reference
    applies to Username, Action_By, Opponent)."""
    ts = F.col(ts_col)
    out = df
    for c in name_cols:
        out = out.withColumn(c, remap_expr(F.col(c), ts, rules))
    return out


def find_conflicts(rules: list[MappingRule]) -> list[tuple[int, int, set[str]]]:
    """Pairs of rule indexes sharing a source with overlapping validity
    (later rule wins; surfaced as warnings, mirroring W5)."""
    conflicts = []
    for (i, a), (j, b) in combinations(enumerate(rules), 2):
        shared = set(a.sources) & set(b.sources)
        if not shared:
            continue
        # open bounds compared symbolically (None = unbounded) rather
        # than via datetime.min/max sentinels: naive sentinels raise
        # TypeError against tz-aware rule datetimes (tomllib parses
        # '...Z' timestamps as aware)
        starts_before_b_ends = (
            a.start is None or b.end is None or a.start < b.end
        )
        b_starts_before_a_ends = (
            b.start is None or a.end is None or b.start < a.end
        )
        if starts_before_b_ends and b_starts_before_a_ends:
            conflicts.append((i, j, shared))
    return conflicts
