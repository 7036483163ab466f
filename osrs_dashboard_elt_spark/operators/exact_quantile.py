"""Exact distributed order statistics (k-th element / quantiles).

The histogram sketches (``operators/sketches.py``) answer quantile
queries approximately in one pass; some consumers need the EXACT
value (billing thresholds, regulatory cut-offs, deterministic dataset
splits).  The classic scalable form is iterative range narrowing:

1. histogram the column into ``n_bins`` equal-width bins over the
   current [lo, hi) range (one map-side-combined aggregate — the
   exchange carries at most n_bins rows per upstream partition);
2. walk the bin counts driver-side to find the bin containing the
   k-th element and recurse INTO that bin's range;
3. stop when the candidate bin holds <= ``collect_limit`` rows and
   sort just those driver-side.

Rounds are bounded by ``log_{n_bins}(range/resolution)`` — for 64-bit
integer domains at n_bins=4096 that is <= 6 scans, independent of row
count; each scan is a full pass but carries ONE long per row into a
bounded aggregate.  Skew cannot break it: a degenerate bin (many
duplicates of one value) terminates immediately because the range
collapses to a point.

Values must be integral (long) — exactness over doubles is
ill-defined under binning; fixed-point-encode decimals first (the
caller knows the scale, e.g. cents).  NULLs are excluded, matching
SQL ``percentile_disc``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _stats(df: DataFrame, col: str):
    vals = df.select(F.col(col).cast("long").alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    s = vals.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("__v").alias("lo"),
        F.max("__v").alias("hi"),
    ).collect()[0]
    return vals, s["n"], s["lo"], s["hi"]


def exact_kth(
    df: DataFrame,
    col: str,
    k: int,
    n_bins: int = 4096,
    collect_limit: int = 100_000,
    max_rounds: int = 20,
) -> int:
    """The exact k-th smallest (1-based) of an integral column.

    Driver loop like the kmeans fit: each round is one bounded
    aggregate; the driver holds only bin counts (n_bins longs) and,
    at the end, one small sorted slice."""
    vals, n, lo, hi = _stats(df, col)
    if n == 0:
        raise ValueError("exact_kth: no non-null values")
    if not 1 <= k <= n:
        raise ValueError(f"exact_kth: k={k} out of range 1..{n}")
    return _kth_in_range(
        vals, k, lo, hi, n_bins, collect_limit, max_rounds
    )


def _kth_in_range(
    vals: DataFrame,
    rank: int,
    lo: int,
    hi: int,
    n_bins: int,
    collect_limit: int,
    max_rounds: int,
) -> int:
    for _ in range(max_rounds):
        if lo == hi:
            return int(lo)
        if hi - lo + 1 > 2**63:
            # Full-long-domain range: ``__v - lo`` would overflow
            # BIGINT Spark-side.  One bisection at 0 (a single count)
            # shrinks every later span below 2^63.
            neg = vals.filter(
                (F.col("__v") >= lo) & (F.col("__v") < 0)
            ).count()
            if rank <= neg:
                hi = -1
            else:
                rank -= neg
                lo = 0
            continue
        span = hi - lo + 1
        if span <= n_bins:
            # one exact count per distinct value — finish here
            counts = (
                vals.filter((F.col("__v") >= lo) & (F.col("__v") <= hi))
                .groupBy("__v")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            acc = 0
            for r in sorted(counts, key=lambda r: r["__v"]):
                acc += r["c"]
                if acc >= rank:
                    return int(r["__v"])
            raise AssertionError("rank exceeded slice count")
        width = -(-span // n_bins)  # ceil
        # Integral DIV, not `/`: Spark `/` is DOUBLE division, and for
        # offsets >= 2^53 (nanosecond-epoch longs) the rounding step
        # can push a boundary value into the neighbouring bin,
        # silently corrupting the rank adjustment.
        hist = (
            vals.filter((F.col("__v") >= lo) & (F.col("__v") <= hi))
            .select(
                F.expr(
                    f"CAST((__v - {lo}L) DIV {width}L AS INT)"
                ).alias("__b")
            )
            .groupBy("__b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        acc = 0
        target_bin = None
        for r in sorted(hist, key=lambda r: r["__b"]):
            if acc + r["c"] >= rank:
                target_bin = r["__b"]
                rank -= acc
                break
            acc += r["c"]
        if target_bin is None:
            raise AssertionError("rank exceeded histogram total")
        lo, hi = lo + target_bin * width, min(hi, lo + (target_bin + 1) * width - 1)
        # small-slice shortcut: collect and sort the survivors
        slice_n = [r for r in hist if r["__b"] == target_bin][0]["c"]
        if slice_n <= collect_limit:
            rows = (
                vals.filter((F.col("__v") >= lo) & (F.col("__v") <= hi))
                .orderBy("__v")
                .limit(int(rank))
                .collect()
            )
            return int(rows[rank - 1]["__v"])
    raise RuntimeError("exact_kth: max_rounds exceeded (range not shrinking?)")


def _ceil_rank(q: float, n: int) -> int:
    from fractions import Fraction

    frac = Fraction(q) * n
    return max(1, -(-frac.numerator // frac.denominator))


def exact_quantiles(
    df: DataFrame, col: str, qs, **kwargs
) -> dict:
    """Several exact discrete percentiles with ONE shared stats scan
    (the per-q narrowing loops reuse the same count/min/max) —
    ``{q: value}``.  Same rank rule as :func:`exact_quantile`."""
    n_bins = kwargs.pop("n_bins", 4096)
    collect_limit = kwargs.pop("collect_limit", 100_000)
    max_rounds = kwargs.pop("max_rounds", 20)
    vals, n, lo, hi = _stats(df, col)
    if n == 0:
        raise ValueError("exact_quantiles: no non-null values")
    return {
        q: _kth_in_range(
            vals, _ceil_rank(q, n), lo, hi, n_bins, collect_limit,
            max_rounds,
        )
        for q in qs
    }


def exact_quantile(
    df: DataFrame, col: str, q: float, **kwargs
) -> int:
    """Exact discrete percentile: the smallest value whose rank
    covers ``ceil(q * n)`` (the cume_dist >= q rule).  ``q`` is taken
    at its exact IEEE value via Fraction, so the rank is engine-
    independent — an oracle replays the same rule with ROW_NUMBER
    rather than trusting any engine's percentile_disc rounding."""
    return exact_quantiles(df, col, [q], **kwargs)[q]
