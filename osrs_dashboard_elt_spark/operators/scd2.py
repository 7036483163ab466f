"""Slowly-changing-dimension (type 2) compression.

The reference materializes "current state" tables by replaying its
event log row-by-row (pandas loops over name-change and PB rows, e.g.
``3_transform_data.py``'s latest-name resolution).  A warehouse at
scale wants the *history* form instead: one row per (key, attribute
run) with a validity interval, so any as-of date can be answered with
the J8 interval join.  ``scd2_compress`` builds that history in two
window passes over a single shuffle:

1. partition by key, order by event time; keep only rows whose
   attribute differs from the previous row's (run starts),
2. the next run-start's timestamp becomes this run's exclusive
   ``valid_to`` (NULL for the open current run).

Both passes share one ``partitionBy(key) orderBy(ts)`` window, so
Spark plans a single Exchange + sort and evaluates lag and lead in
the same Window node — at 100 TB the cost is exactly one shuffle of
the change rows (not the full fact table: project key/ts/attr first).

Determinism: ties on ``ts`` within a key are broken by the explicit
``tiebreak`` column (default: the attribute itself) so the run
sequence is total-ordered and reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def scd2_compress(
    df: DataFrame,
    key: str | list[str],
    attr: str,
    ts_col: str = "ts",
    tiebreak: str | None = None,
    version_col: str = "version",
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Collapse an attribute change-log into SCD2 validity intervals.

    Returns one row per run of equal ``attr`` values per key, with
    ``valid_from`` (inclusive), ``valid_to`` (exclusive, NULL = open)
    and a 1-based ``version`` sequence per key.
    """
    keys = [key] if isinstance(key, str) else list(key)
    order = [F.col(ts_col).asc(), F.col(tiebreak or attr).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)

    changed = (
        df.select(*keys, ts_col, attr)
        .withColumn("_prev", F.lag(attr).over(w))
        .withColumn("_rn", F.row_number().over(w))
        # row_number==1 (not lag-is-NULL) marks the first row: a NULL
        # first attribute must still start a run, and eqNullSafe makes
        # NULL->value / value->NULL transitions register as changes
        .filter(
            (F.col("_rn") == 1) | ~F.col(attr).eqNullSafe(F.col("_prev"))
        )
        .drop("_prev", "_rn")
    )
    # run starts are a subset of the same partitioning; re-use the same
    # window spec (one Exchange reused by AQE, second sort is cheap on
    # the reduced rowset)
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        changed.withColumn(valid_from_col, F.col(ts_col))
        .withColumn(valid_to_col, F.lead(valid_from_col).over(w2))
        .withColumn(version_col, F.row_number().over(w2).cast("long"))
        .drop(ts_col)
    )


def scd2_as_of(
    history: DataFrame,
    as_of: Column,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
) -> DataFrame:
    """Point-in-time slice of an SCD2 history: rows whose validity
    interval covers ``as_of`` (half-open [from, to))."""
    return history.filter(
        (F.col(valid_from_col) <= as_of)
        & (F.col(valid_to_col).isNull() | (as_of < F.col(valid_to_col)))
    )
