"""Calendar periods and multi-period conditional aggregation.

Reference F5/A3 (src/shared_utils.py:84-126 +
src/3_transform_data.py:259-292): leaderboards are computed per period
(All_Time, This_Week, Prev_Week, MTD, Prev_Month, YTD, last-N-days...)
as K separate groupbys merged K times.  Spark-first redesign: period
boundaries are computed ONCE driver-side (they are scalars), and the
whole wide table is ONE conditional aggregation pass —
``sum(when(ts_in_period, v))`` per period — no joins, one shuffle.
Catalyst will not do this rewrite for you; it is a logical redesign
(SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Period:
    name: str
    start: datetime | None  # inclusive; None -> unbounded
    end: datetime | None  # exclusive; None -> unbounded

    def contains(self, ts: Column) -> Column:
        cond = F.lit(True)
        if self.start is not None:
            cond = cond & (ts >= F.lit(self.start))
        if self.end is not None:
            cond = cond & (ts < F.lit(self.end))
        return cond


def _week_start(now: datetime, week_start_day: int) -> datetime:
    """Most recent midnight whose weekday == week_start_day (Mon=0)."""
    day = datetime(now.year, now.month, now.day)
    delta = (day.weekday() - week_start_day) % 7
    return day - timedelta(days=delta)


def standard_periods(
    now: datetime, week_start_day: int = 0, lookback_days: int = 30
) -> list[Period]:
    """The reference's period set, anchored at ``now`` (driver-side
    scalars; the anchor must be pinned for reproducible tests)."""
    som = datetime(now.year, now.month, 1)
    prev_som = (
        datetime(now.year - 1, 12, 1)
        if now.month == 1
        else datetime(now.year, now.month - 1, 1)
    )
    soy = datetime(now.year, 1, 1)
    wk = _week_start(now, week_start_day)
    prev_wk = wk - timedelta(days=7)
    return [
        Period("All_Time", None, None),
        Period("This_Week", wk, None),
        Period("Prev_Week", prev_wk, wk),
        Period("MTD", som, None),
        Period("Prev_Month", prev_som, som),
        Period("YTD", soy, None),
        Period(f"Last_{lookback_days}d", now - timedelta(days=lookback_days), None),
    ]


def period_agg_columns(
    ts: Column,
    periods: list[Period],
    measures: dict[str, tuple[str, Column]],
) -> list[Column]:
    """One aliased aggregate per (measure, period).

    ``measures``: out-prefix -> (kind, value column) with kind in
    {'count', 'sum'}.  Output columns ``{prefix}_{period}`` — the wide
    leaderboard shape in a single pass.
    """
    cols: list[Column] = []
    for prefix, (kind, val) in measures.items():
        for p in periods:
            inside = p.contains(ts)
            if kind == "count":
                c = F.sum(F.when(inside, 1).otherwise(0)).cast("long")
            elif kind == "sum":
                c = F.sum(F.when(inside, F.coalesce(val, F.lit(0))).otherwise(0))
            else:
                raise ValueError(f"unknown measure kind {kind!r}")
            cols.append(c.alias(f"{prefix}_{p.name}"))
    return cols
