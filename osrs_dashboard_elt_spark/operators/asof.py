"""As-of (nearest-key temporal) join.

Reference semantics (reference src/2_parse_engine.py:16-63): for each
(item_id, broadcast_date) the price is resolved as a 3-tier point lookup
executed per-row with SQL round trips:

    1. exact-date match,
    2. else the latest price strictly before the date,
    3. else the earliest price after the date.

Per-row lookups are the reference's biggest scale bug; here the whole
join is ONE union + window pass:

- union the (tagged) left probe rows with the right quote rows,
- a single shuffle partitioned by the key, sorted by time,
- ``last(value, ignorenulls=True)`` over the backward frame resolves
  "latest quote at-or-before" (tier 1+2 collapse: an exact-date quote IS
  the latest at-or-before quote),
- the mirrored ``first`` over the forward frame resolves tier 3,
- ``coalesce(backward, forward)`` applies the tier priority.

This is the standard scalable as-of pattern: no range join, no
per-row lookups, one shuffle, linear scan per partition.  Skewed keys
are handled by AQE skew-join splitting (frames are per-key so the split
is safe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_MARK = "__asof_is_probe"
_ROW = "__asof_row_id"


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
    ``suffix``); all left columns pass through unchanged.

    ``tiebreak``: right-side columns (must be in ``values``) ordering
    quotes that share a timestamp — backward picks the LAST by
    tiebreak, forward the FIRST, making ties deterministic.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    left_cols = left.columns
    probe = left.withColumn(_MARK, F.lit(1)).withColumn(
        _ROW, F.monotonically_increasing_id()
    )
    quotes = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias(left_ts),
        *[F.col(v) for v in values],
    ).withColumn(_MARK, F.lit(0)).withColumn(_ROW, F.lit(None).cast("long"))

    probe_u = probe.select(
        *keys, left_ts, _MARK, _ROW,
        *[F.lit(None).cast(quotes.schema[v].dataType).alias(v) for v in values],
    )
    # Quote rows sort before probe rows at equal timestamps (_MARK 0 < 1)
    # so "at-or-before" is inclusive of an exact-timestamp quote.
    u = quotes.select(probe_u.columns).unionByName(probe_u)

    tb = tiebreak or []
    # Nulls (probe rows) must not disturb the quote ordering: probes
    # already sort after/before quotes via _MARK at equal timestamps.
    back_order = [F.col(left_ts).asc(), F.col(_MARK).asc()] + [
        F.col(t).asc_nulls_last() for t in tb
    ]
    fwd_order = [F.col(left_ts).desc(), F.col(_MARK).desc()] + [
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

    resolved = u.select(F.col(_ROW), F.col(_MARK), *out_vals).filter(
        F.col(_MARK) == 1
    ).drop(_MARK)

    return (
        probe.select(*left_cols, _ROW)
        .join(resolved, _ROW, "inner")
        .drop(_ROW)
    )
