"""Market-basket co-occurrence with a degenerate-basket guard.

Frequent co-purchase pairs are the textbook self-join trap: joining
the fact table to itself on the order key shuffles it twice and lands
every line of a hot order on one reducer.  The scale-correct shape
assembles each basket as ONE sorted array (one shuffle) and generates
the i<j pairs INSIDE the array expression, so the blow-up is bounded
per row — and then BOUNDS the basket itself, because a single
degenerate basket (a 10k-item order) would still emit ~50M structs
from one row.  The cap is the same hot-key discipline as the LSH
bucket caps (``operators/dedup.py::_drop_hot_keys``): truncate the
sorted basket to ``max_basket`` items and (optionally) count the
truncations via an ``Observation`` so the drop is loud, not silent.

Truncating keeps the lexicographically-first ``max_basket`` items of
the sorted distinct set — deterministic, and support counts for pairs
wholly inside the cap are exact; pairs involving dropped items lose
that basket's vote (the standard cap trade-off; raise ``max_basket``
above the data's max basket size for exact results, as the oracle-
checked suite query does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def copurchase_pairs(
    df: DataFrame,
    order_col: str,
    item_col: str,
    min_support: int = 2,
    max_basket: int = 64,
    observation=None,
) -> DataFrame:
    """(item_a, item_b, n_orders) for every unordered item pair
    co-occurring in >= ``min_support`` baskets.

    One shuffle assembles per-order DISTINCT sorted item arrays; the
    pairs come from an array ``transform``/``slice`` expression (never
    a table self-join); baskets longer than ``max_basket`` are
    truncated before pair generation, bounding the per-row output at
    ``max_basket*(max_basket-1)/2`` structs.  Pass an ``Observation``
    to receive ``n_truncated_baskets`` / ``n_dropped_items`` metrics
    with no extra job (collected by Spark on the same action).
    """
    if max_basket < 2:
        raise ValueError(f"max_basket must be >= 2, got {max_basket}")
    per_order = df.groupBy(order_col).agg(
        F.array_sort(F.collect_set(item_col)).alias("__parts")
    )
    if observation is not None:
        over = F.size("__parts") > max_basket
        # coalesce: F.sum over an EMPTY frame is NULL, and callers do
        # arithmetic on the observed dict — report 0, not None
        per_order = per_order.observe(
            observation,
            F.coalesce(F.sum(over.cast("long")), F.lit(0).cast("long"))
            .alias("n_truncated_baskets"),
            F.coalesce(
                F.sum(
                    F.when(over, F.size("__parts") - max_basket).otherwise(0)
                ).cast("long"),
                F.lit(0).cast("long"),
            ).alias("n_dropped_items"),
        )
    capped = per_order.select(
        F.slice("__parts", 1, max_basket).alias("__parts")
    )
    pairs = capped.select(
        F.explode(
            F.expr(
                "flatten(transform(__parts, (x, i) -> "
                "transform(slice(__parts, i + 2, size(__parts) - i - 1), "
                "y -> struct(x AS item_a, y AS item_b))))"
            )
        ).alias("p")
    ).select("p.item_a", "p.item_b")
    return (
        pairs.groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= min_support)
    )
