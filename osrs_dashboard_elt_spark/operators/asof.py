"""As-of (nearest-key temporal) join.

Reference semantics (reference src/2_parse_engine.py:16-63): for each
(item_id, broadcast_date) the price is resolved as a 3-tier point lookup
executed per-row with SQL round trips:

    1. exact-date match,
    2. else the latest price strictly before the date,
    3. else the earliest price after the date.

Per-row lookups are the reference's biggest scale bug; here the whole
join is ONE union + window pass:

- union the (tagged) left probe rows with the right quote rows, the
  LEFT PAYLOAD CARRIED THROUGH the union (quote rows null-padded), so
  the result needs no re-join and no synthetic row id,
- a single shuffle partitioned by the key, sorted by time,
- ``last(value, ignorenulls=True)`` over the backward frame resolves
  "latest quote at-or-before" (tier 1+2 collapse: an exact-date quote IS
  the latest at-or-before quote),
- the mirrored scan over the forward frame resolves tier 3,
- ``coalesce(backward, forward)`` applies the tier priority.

This is the standard scalable as-of pattern: no range join, no
per-row lookups, ONE shuffle total, linear scan per partition, and no
dependence on nondeterministic row ids (safe under AQE re-planning and
task retry — the round-1 ``monotonically_increasing_id`` re-join shape
could silently mis-join when the upstream plan was nondeterministic).
Skewed keys are handled by AQE skew-join splitting (frames are per-key
so the split is safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_is_probe"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    values: list[str],
    direction: str = "nearest",
    suffix: str = "",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """Join each left row to the temporally nearest right row per key.

    direction:
      - ``backward``: latest right row with ``right_ts <= left_ts``.
      - ``forward``:  earliest right row with ``right_ts >= left_ts``.
      - ``nearest``:  backward if any, else forward (the reference's
        exact -> latest-before -> earliest-after tier order).

    ``values`` columns from ``right`` are appended to ``left`` (with
    ``suffix``); all left columns pass through unchanged.  Left column
    names must not collide with the suffixed value names.

    ``tiebreak``: right-side columns (must be in ``values``) ordering
    quotes that share a timestamp — backward picks the LAST by
    tiebreak, forward the FIRST, making ties deterministic.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    left_cols = left.columns
    clash = [v + suffix for v in values if v + suffix in left_cols]
    if clash:
        raise ValueError(f"left columns collide with output values: {clash}")
    passthrough = [c for c in left_cols if c not in keys and c != left_ts]

    # Probe rows carry the full left payload and null value slots;
    # quote rows carry real values and a null-padded left payload.
    probe_u = left.select(
        *keys,
        left_ts,
        F.lit(1).alias(_MARK),
        *passthrough,
        *[F.lit(None).cast(right.schema[v].dataType).alias(v) for v in values],
    )
    quotes_u = right.select(
        *keys,
        F.col(right_ts).alias(left_ts),
        F.lit(0).alias(_MARK),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in passthrough],
        *values,
    )
    u = quotes_u.unionByName(probe_u)

    tb = tiebreak or []
    # At equal timestamps quote rows (mark 0) must be scanned BEFORE
    # probe rows in BOTH directions so an exact-timestamp quote is
    # visible to the probe's frame: backward scans ts asc, forward
    # scans ts desc, and _MARK ascends in both.
    back_order = [F.col(left_ts).asc(), F.col(_MARK).asc()] + [
        F.col(t).asc_nulls_last() for t in tb
    ]
    fwd_order = [F.col(left_ts).desc(), F.col(_MARK).asc()] + [
        F.col(t).desc_nulls_last() for t in tb
    ]
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(*back_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(*fwd_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )

    out_vals: list[Column] = []
    for v in values:
        back = F.last(F.when(F.col(_MARK) == 0, F.col(v)), ignorenulls=True).over(w_back)
        fwd = F.last(F.when(F.col(_MARK) == 0, F.col(v)), ignorenulls=True).over(w_fwd)
        if direction == "backward":
            expr = back
        elif direction == "forward":
            expr = fwd
        else:
            expr = F.coalesce(back, fwd)
        out_vals.append(expr.alias(v + suffix))

    return (
        u.select(*keys, left_ts, _MARK, *passthrough, *out_vals)
        .filter(F.col(_MARK) == 1)
        .drop(_MARK)
        .select(*left_cols, *[v + suffix for v in values])
    )
