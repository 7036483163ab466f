"""The six report generators (reference ``src/3_transform_data.py``,
orchestrated at :839-870), re-expressed as pure DataFrame -> DataFrame
functions.

Each generator is one declarative plan: no pandas row loops, no
per-period re-scans, no driver-side collect.  The caller materializes
the dict of outputs with ``df.write.mode("overwrite")`` — the Spark
analog of the reference's ``if_exists='replace'`` full-recompute
publish (S10/T5); atomicity notes in ``..sources.io``.

Scale shape of every generator: filters push to the scan, dimensions
(group skeletons, historical seeds) are literal/broadcast DataFrames,
and each output needs at most ONE shuffle (its groupBy or window key).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.temporal import Period, period_agg_columns
from ..literals import literal_frame
from ..operators.dedup import dedup_keep_first_asc
from ..operators.resample import resample
from ..operators.sessionize import near_best_band
from ..operators.topn import top_n_per_group


def leaderboard_report(
    df: DataFrame,
    group_col: str,
    ts_col: str,
    periods: list[Period],
    value_col: str | None = None,
) -> DataFrame:
    """Wide multi-period leaderboard (reference :259-292, A3).

    The reference loops K periods -> K groupbys -> K merges; here the
    whole wide table is ONE conditional-aggregation pass (one shuffle).
    """
    measures: dict[str, tuple[str, Column | None]] = {"Count": ("count", None)}
    if value_col is not None:
        measures["Value"] = ("sum", F.col(value_col))
    cols = period_agg_columns(F.col(ts_col), periods, measures)
    return df.groupBy(group_col).agg(*cols)


def detailed_report(
    df: DataFrame,
    type_col: str,
    types: list[str],
    ts_col: str,
    start: datetime | None = None,
    end: datetime | None = None,
) -> DataFrame:
    """Filtered detail listing, newest first (reference :311-317,
    P2+P5+O1).  Pure scan + pushdown filter; the sort is the output
    order contract, applied last."""
    out = df.filter(F.col(type_col).isin(*types))
    if start is not None:
        out = out.filter(F.col(ts_col) >= F.lit(start))
    if end is not None:
        out = out.filter(F.col(ts_col) < F.lit(end))
    return out.orderBy(F.col(ts_col).desc())


def timeseries_report(
    df: DataFrame,
    ts_col: str,
    freqs: list[str],
    value_col: str,
    value_type: str = "decimal(18,2)",
) -> DataFrame:
    """Multi-frequency resample with gap fill + cumulative sums
    (reference :367-384, T1+W3).

    Per frequency: tumbling buckets (calendar-aligned for day/week,
    epoch-aligned sub-day), an explicit bucket spine so empty buckets
    exist (pandas-resample parity — the cumulative series depends on
    them), then running totals.  Frequencies are unioned with a
    ``Frequency`` tag, exactly the reference's output shape.
    """
    outs: list[DataFrame] = []
    for freq in freqs:
        r = resample(
            df,
            ts_col,
            freq,
            {
                "Count": F.count(F.lit(1)),
                "Total_Value": F.sum(F.col(value_col).cast(value_type)),
            },
            gap_fill=True,
        )
        outs.append(
            r.select(
                F.lit(freq).alias("Frequency"),
                F.col("bucket").alias("Date"),
                F.col("Count").cast("long").alias("Count"),
                F.col("Total_Value").cast(value_type).alias("Total_Value"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    # ONE cumulative window over the union, partitioned by Frequency:
    # each frequency's running total sorts in its own task instead of
    # N per-branch single-partition global sorts.  Partition size is
    # the BUCKET count (dates in range, ~365/decade per frequency at
    # daily grain), bounded regardless of input rows — safe at 100 TB.
    w = (
        Window.partitionBy("Frequency")
        .orderBy("Date")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return out.select(
        "*",
        F.sum("Count").over(w).cast("long").alias("Cumulative_Count"),
        F.sum("Total_Value").over(w).alias("Cumulative_Value"),
    )


_QTY_RX = r"^(\d+)\s*x\s+"


def parse_item_and_quantity(item_raw: Column) -> tuple[Column, Column]:
    """R6 (reference :434-453): '72 x Onyx bolts' -> (name, 72); no
    prefix -> (name, 1).  Two regexp_extracts + coalesce, no UDF."""
    qty = F.nullif(F.regexp_extract(item_raw, _QTY_RX, 1), F.lit("")).cast("long")
    name = F.regexp_replace(item_raw, _QTY_RX, "")
    return F.trim(name), F.coalesce(qty, F.lit(1))


def collection_log_report(
    spark: SparkSession,
    df: DataFrame,
    user_col: str,
    item_raw_col: str,
    ts_col: str,
    order_cols: list[str],
    groups: dict[str, list[str]],
    historical_counts: dict[str, int] | None = None,
    other_group: str = "Other",
) -> DataFrame:
    """Collection-log rollup (reference :414-506): quantity parse (R6),
    per-(user, item) dedup keeping the earliest row (O5), per-item
    counts (A4), then the full group skeleton — configured groups plus
    observed-but-ungrouped items routed to ``other_group`` (J5) — left
    joined with counts (J3) and historical seed counts (J4).

    The skeleton and historical sides are literal/broadcast frames;
    the only data-sized shuffles are the dedup and the item count.
    """
    name, qty = parse_item_and_quantity(F.col(item_raw_col))
    parsed = df.select(
        F.col(user_col).alias("Username"),
        name.alias("Item_Name"),
        qty.alias("Item_Quantity"),
        F.col(ts_col).alias("__ts"),
        *[F.col(c).alias(f"__o_{i}") for i, c in enumerate(order_cols)],
    )
    deduped = dedup_keep_first_asc(
        parsed,
        ["Username", "Item_Name"],
        ["__ts"] + [f"__o_{i}" for i in range(len(order_cols))],
    )
    counts = deduped.groupBy("Item_Name").agg(
        F.count(F.lit(1)).alias("n_holders"),
        F.sum("Item_Quantity").alias("total_quantity"),
    )

    grouped_rows = [
        (g, item) for g, items in groups.items() for item in items
    ]
    skeleton = literal_frame(spark, grouped_rows, ["Item_Group", "Item_Name"])
    # observed items from the (already tiny) counts aggregate — NOT
    # from deduped, which would re-run the dedup window a second time
    observed = counts.select("Item_Name")
    ungrouped = observed.join(
        F.broadcast(skeleton.select("Item_Name")), "Item_Name", "left_anti"
    ).select(F.lit(other_group).alias("Item_Group"), "Item_Name")
    full = skeleton.unionByName(ungrouped)

    out = full.join(counts, "Item_Name", "left").select(
        "Item_Group",
        "Item_Name",
        F.coalesce("n_holders", F.lit(0)).cast("long").alias("n_holders"),
        F.coalesce("total_quantity", F.lit(0)).cast("long").alias("total_quantity"),
    )
    hist = historical_counts or {}
    if hist:
        hist_df = literal_frame(
            spark, list(hist.items()), ["Item_Name", "historical_count"]
        )
        out = out.join(F.broadcast(hist_df), "Item_Name", "left")
    else:
        out = out.withColumn("historical_count", F.lit(None).cast("long"))
    return out.select(
        "Item_Group",
        "Item_Name",
        "n_holders",
        "total_quantity",
        F.coalesce("historical_count", F.lit(0)).cast("long").alias("historical_count"),
        (F.coalesce("historical_count", F.lit(0)) + F.col("total_quantity"))
        .cast("long")
        .alias("total_with_historical"),
    )


def personal_bests_report(
    spark: SparkSession,
    df: DataFrame,
    task_col: str,
    user_col: str,
    seconds_col: str,
    ts_col: str,
    threshold: float,
    grouping_window_seconds: float,
    historical_tasks: list[str] | None = None,
    append_later_matchers: bool = False,
) -> DataFrame:
    """Personal-bests rollup (reference :643-729, W6+A8+A9+J6).

    Per task: rows within ``threshold`` of the group-best time form the
    band (one window min — A8); the earliest band record is definitive,
    and co-holders are band members within ``grouping_window_seconds``
    of it (the reference's tie/session window), or every band member
    with ``append_later_matchers``.  Holder sets are assembled with
    array functions (A9), and configured historical tasks that produced
    no rows are back-filled as placeholders (J6).
    """
    band = near_best_band(
        df.select(
            F.col(task_col).alias("Task"),
            F.col(user_col).alias("Username"),
            F.col(seconds_col).alias("seconds"),
            F.col(ts_col).alias("__ts"),
        ),
        ["Task"],
        "seconds",
        threshold,
        best_col="best",
    )
    w = Window.partitionBy("Task")
    band = band.withColumn("first_ts", F.min("__ts").over(w))
    if not append_later_matchers:
        band = band.filter(
            F.col("__ts").cast("timestamp").cast("double")
            <= F.col("first_ts").cast("timestamp").cast("double")
            + F.lit(grouping_window_seconds)
        )
    agged = band.groupBy("Task").agg(
        F.min("best").alias("best_seconds"),
        F.min("first_ts").alias("record_ts"),
        F.array_sort(F.collect_set("Username")).alias("holders"),
    )
    out = agged.select(
        "Task",
        "best_seconds",
        "record_ts",
        F.array_join("holders", ",").alias("All_Holders"),
        F.size("holders").cast("long").alias("n_holders"),
    )
    if historical_tasks:
        hist = literal_frame(spark, [(t,) for t in historical_tasks], ["Task"])
        missing = hist.join(out.select("Task"), "Task", "left_anti").select(
            "Task",
            F.lit(None).cast(out.schema["best_seconds"].dataType).alias("best_seconds"),
            F.lit(None).cast("timestamp").alias("record_ts"),
            F.lit("").alias("All_Holders"),
            F.lit(0).cast("long").alias("n_holders"),
        )
        out = out.unionByName(missing)
    return out


def recent_achievements_report(
    df: DataFrame,
    type_col: str,
    ts_col: str,
    limit_per_type: int,
    derived: list[tuple[Column, str]] | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Recent achievements (reference :743-760, F11+W1): optional
    derived categories (rows satisfying a predicate reappear under a
    new type — the maxed-skill derivation) unioned with the source,
    then top-N per type, newest first — one window, no global sort."""
    out = df
    for pred, new_type in derived or []:
        out = out.unionByName(
            df.filter(pred).withColumn(type_col, F.lit(new_type))
        )
    order = [F.col(ts_col).desc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    return top_n_per_group(out, [type_col], order, limit_per_type, rank_col="rank")
