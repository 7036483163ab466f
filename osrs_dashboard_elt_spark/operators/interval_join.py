"""Interval (range-validity) join.

Reference J8 (src/3_transform_data.py:146-166): username mapping rules
carry ``[start, end)`` validity windows and are matched against event
timestamps.  Two strategies:

- ``interval_join``: plain conditional join ``key-equal AND start <= ts
  < end``.  When the interval side is small (mapping rules, price
  windows — always true in this workload) Spark broadcasts it and the
  range predicate is evaluated stream-side: no shuffle at all.

- ``binned_interval_join``: for two LARGE sides, explode intervals into
  fixed-width time bins and equi-join on (key, bin) before applying the
  exact range predicate.  Turns an O(n*m)-per-key nested loop into a
  hash join at the cost of interval duplication; bin width should be
  chosen near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    on: list[str] | None = None,
    how: str = "inner",
    closed: str = "left",
) -> DataFrame:
    """Join left rows to right intervals containing ``left_ts``.

    ``closed``: 'left' -> [start, end) (the reference's convention),
    'both' -> [start, end].
    """
    lo = F.col(left_ts) >= F.col(start_col)
    hi = (
        F.col(left_ts) < F.col(end_col)
        if closed == "left"
        else F.col(left_ts) <= F.col(end_col)
    )
    cond = lo & hi
    for k in on or []:
        cond = cond & (left[k] == right[k])
    return left.join(F.broadcast(right), cond, how)


_UNIT_SECONDS = {
    "second": 1, "seconds": 1,
    "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600,
    "day": 86400, "days": 86400,
    "week": 604800, "weeks": 604800,
}


def _width_seconds(bin_width: str) -> int:
    n, _, unit = bin_width.strip().partition(" ")
    try:
        return int(n) * _UNIT_SECONDS[unit.lower()]
    except (ValueError, KeyError):
        raise ValueError(
            f"bin_width must be '<n> <unit>' with unit in {sorted(_UNIT_SECONDS)}; got {bin_width!r}"
        ) from None


def binned_interval_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    start_col: str,
    end_col: str,
    bin_width: str = "1 day",
    on: list[str] | None = None,
) -> DataFrame:
    """Equi-join on (keys, time-bin) then exact range filter — the
    scale path when neither side is broadcastable.

    Bins are integer ``floor(epoch / width)`` — plain codegen
    arithmetic; ``F.window`` can't be used here because an interval
    needs its start AND end bins in one projection, and Spark rejects
    multiple time-window expressions per plan node (the previous
    window()-based form raised on every call).  An interval explodes
    to one row per overlapped bin (choose ``bin_width`` near the
    median interval length to bound the duplication)."""
    on = on or []

    def _bin(c: str):
        # cast through TIMESTAMP: legal from both TIMESTAMP and
        # TIMESTAMP_NTZ, and the epoch offset cancels between sides
        return F.floor(
            F.col(c).cast("timestamp").cast("double") / _width_seconds(bin_width)
        ).cast("long")

    lb = left.withColumn("__bin", _bin(left_ts))
    rb = right.withColumn(
        "__bin", F.explode(F.sequence(_bin(start_col), _bin(end_col)))
    )
    joined = lb.join(rb, [*on, "__bin"], "inner").drop("__bin")
    return joined.filter(
        (F.col(left_ts) >= F.col(start_col)) & (F.col(left_ts) < F.col(end_col))
    )
