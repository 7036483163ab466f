"""Stream-stream joins with event-time interval bounds.

The reference has no streaming engine, but its attribution-style
lookups (e.g. matching a name-change embed to the chat line that
triggered it, src/6_fetch_name_changes.py, or pricing a drop at the
moment it happened, src/3_transform_data.py:817-860) are point-in-time
correlations between two event feeds.  The scalable live form is
Spark's stream-stream join: both sides are watermarked, and the join
condition carries BOTH an equi-key and an event-time interval — the
interval is what lets the state store evict rows once the other
side's watermark passes, so state stays bounded no matter how long
the streams run.

The same function works on batch DataFrames (the condition is just a
join predicate there), which is how the DuckDB oracle checks it:
``q_stream_interval_join`` batch-drives this exact code path, and
``tests/test_stream_join.py`` proves the streaming drive (availableNow
file streams) emits the identical row set.

Scale notes:
- State size ~ (input rate x interval width) per side; the interval
  and lateness are the knobs, not executor memory.
- The join shuffles both sides on the equi-key once (state store is
  hash-partitioned on it).  A missing equi-key would make every
  partition hold every row — the function refuses that.
- ``left_outer``/``right_outer`` need watermarks on both sides (Spark
  emits the null-padded row only when the watermark proves no match
  can arrive); in batch mode they degrade to plain outer joins.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HOW = {"inner", "left_outer", "right_outer", "full_outer"}


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    lateness: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join ``right`` rows to ``left`` rows with matching ``keys``
    where ``right_ts`` falls in ``[left_ts, left_ts + within]``.

    Both inputs keep their own columns; the duplicated key columns are
    dropped from the right side after the join.  Works identically on
    batch and streaming inputs (streaming inputs are watermarked on
    their event-time columns first).
    """
    if not keys:
        raise ValueError(
            "stream_interval_join requires at least one equi-key: "
            "without it every state-store partition must buffer every "
            "row of both streams"
        )
    if how not in _HOW:
        raise ValueError(f"how must be one of {sorted(_HOW)}, got {how!r}")
    clash = (set(left.columns) & set(right.columns)) - set(keys)
    if clash:
        raise ValueError(
            f"non-key columns present on BOTH sides: {sorted(clash)} — "
            "the output would carry ambiguous duplicate names; rename "
            "one side first"
        )
    if left.isStreaming:
        left = left.withWatermark(left_ts, lateness)
    if right.isStreaming:
        right = right.withWatermark(right_ts, lateness)
    l, r = left.alias("sj_l"), right.alias("sj_r")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"sj_l.{k}") == F.col(f"sj_r.{k}") for k in keys],
    )
    cond = (
        cond
        & (F.col(f"sj_r.{right_ts}") >= F.col(f"sj_l.{left_ts}"))
        & (
            F.col(f"sj_r.{right_ts}")
            <= F.col(f"sj_l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    out = l.join(r, cond, how)
    # merge the duplicated key columns: under right/full outer joins
    # an unmatched right row's ONLY copy of the key is the right one,
    # so dropping it would emit keyless rows — coalesce instead
    key_cols = [
        F.coalesce(F.col(f"sj_l.{k}"), F.col(f"sj_r.{k}")).alias(k)
        for k in keys
    ]
    l_rest = [
        F.col(f"sj_l.{c}") for c in left.columns if c not in keys
    ]
    r_rest = [
        F.col(f"sj_r.{c}") for c in right.columns if c not in keys
    ]
    return out.select(*key_cols, *l_rest, *r_rest)
