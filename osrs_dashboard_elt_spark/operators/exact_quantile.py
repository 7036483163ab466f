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
3. finish a range by exact per-value counts once it is small enough
   (span <= n_bins, or the range is known to hold <= ``collect_limit``
   rows from the previous round's bin count).

Rounds are bounded by ``log_{n_bins}(range/resolution)`` — for 64-bit
integer domains at n_bins=4096 that is <= 6 scans, independent of row
count; each scan is a full pass but carries ONE long per row into a
bounded aggregate.  Skew cannot break it: a degenerate bin (many
duplicates of one value) terminates immediately because the range
collapses to a point.

MULTI-QUANTILE REQUESTS SHARE EVERY PASS: all active quantiles'
current ranges (pairwise disjoint — they descend from disjoint bins
of one shared initial range, with identical ranges merged) are
histogrammed/finished by ONE aggregate per round, keyed by a range id
(optimization guide §2.3-§2.4 — each narrowing pass is a full column
scan at scale, so three quantiles must not triple it).  Previously
each quantile ran its own narrowing loop: 3 quantiles over a ~1e7
span cost ~7-10 passes; shared rounds cost stats + 2 (bench-protocol
medians at sf0.1: ~4.5 s -> ~2 s interleaved old/new on the same
host, and the pass count is the 100 TB cost).

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
    aggregate; the driver holds only per-range bin counts and, for a
    finishing range, one small value-count slice."""
    vals, n, lo, hi = _stats(df, col)
    if n == 0:
        raise ValueError("exact_kth: no non-null values")
    if not 1 <= k <= n:
        raise ValueError(f"exact_kth: k={k} out of range 1..{n}")
    return _kth_multi(
        vals, {0: k}, n, lo, hi, n_bins, collect_limit, max_rounds
    )[0]


def _kth_multi(
    vals: DataFrame,
    want: dict,
    n_rows: int,
    lo0: int,
    hi0: int,
    n_bins: int,
    collect_limit: int,
    max_rounds: int,
) -> dict:
    """Resolve ``{qid: rank}`` -> ``{qid: value}`` with ONE shared
    bounded aggregate per round, whatever the number of quantiles.

    Per-quantile state: (remaining rank, lo, hi, rows known to lie in
    [lo, hi]).  Each round classifies every value into the distinct
    active ranges (disjoint by construction) and emits one (range,
    key) count row, where key is an exact value offset for finishing
    ranges and a bin index otherwise; the driver walk then advances
    every quantile from the same collected counts."""
    st = {qid: [rank, lo0, hi0, n_rows] for qid, rank in want.items()}
    out: dict = {}
    for _ in range(max_rounds):
        for qid, (rank, lo, hi, _rows) in st.items():
            if qid not in out and lo == hi:
                out[qid] = int(lo)
        active = {q: s for q, s in st.items() if q not in out}
        if not active:
            return out
        # distinct ranges shared by the quantiles inside them
        ranges: dict = {}
        for qid, (_rank, lo, hi, rows) in active.items():
            ranges.setdefault((lo, hi), []).append(qid)
        specs = []  # (rid, lo, hi, mode, width)
        for rid, ((lo, hi), qids) in enumerate(ranges.items()):
            span = hi - lo + 1
            rows = st[qids[0]][3]
            if span > 2**63:
                # Full-long-domain range: ``__v - lo`` would overflow
                # BIGINT Spark-side.  One bisection at 0 shrinks every
                # later span below 2^63 (folded into the shared pass
                # as a two-bin histogram with its boundary at 0).
                specs.append((rid, lo, hi, "bisect", None))
            elif span <= n_bins or rows <= collect_limit:
                # exact per-value counts: <= min(span, rows) driver
                # rows — span-bounded by n_bins or row-bounded by
                # collect_limit, never both unbounded
                specs.append((rid, lo, hi, "exact", None))
            else:
                specs.append((rid, lo, hi, "hist", -(-span // n_bins)))
        # ONE pass: classify into (range id, key) and count.
        # Integral DIV, not `/`: Spark `/` is DOUBLE division, and for
        # offsets >= 2^53 (nanosecond-epoch longs) the rounding step
        # can push a boundary value into the neighbouring bin,
        # silently corrupting the rank adjustment.
        rid_c = None
        key_c = None
        for rid, lo, hi, mode, width in specs:
            cond = (F.col("__v") >= lo) & (F.col("__v") <= hi)
            if mode == "bisect":
                key = F.when(F.col("__v") < 0, F.lit(0)).otherwise(
                    F.lit(1)
                ).cast("long")
            elif mode == "exact":
                key = F.expr(f"__v - {lo}L")
            else:
                key = F.expr(f"(__v - {lo}L) DIV {width}L")
            rid_c = (
                F.when(cond, F.lit(rid))
                if rid_c is None
                else rid_c.when(cond, F.lit(rid))
            )
            key_c = F.when(cond, key) if key_c is None else key_c.when(cond, key)
        collected = (
            vals.select(rid_c.alias("__r"), key_c.alias("__k"))
            .filter(F.col("__r").isNotNull())
            .groupBy("__r", "__k")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_rid: dict = {}
        for r in collected:
            by_rid.setdefault(r["__r"], []).append((r["__k"], r["c"]))
        for rid, lo, hi, mode, width in specs:
            counts = sorted(by_rid.get(rid, []))
            for qid in ranges[(lo, hi)]:
                rank = st[qid][0]
                if mode == "exact":
                    acc = 0
                    for key, c in counts:
                        acc += c
                        if acc >= rank:
                            out[qid] = int(lo + key)
                            break
                    else:
                        raise AssertionError("rank exceeded slice count")
                elif mode == "bisect":
                    neg = sum(c for key, c in counts if key == 0)
                    if rank <= neg:
                        st[qid] = [rank, lo, -1, neg]
                    else:
                        total = sum(c for _, c in counts)
                        st[qid] = [rank - neg, 0, hi, total - neg]
                else:
                    acc = 0
                    target = None
                    for key, c in counts:
                        if acc + c >= rank:
                            target = key
                            st[qid] = [
                                rank - acc,
                                lo + key * width,
                                min(hi, lo + (key + 1) * width - 1),
                                c,
                            ]
                            break
                        acc += c
                    if target is None:
                        raise AssertionError("rank exceeded histogram total")
    pending = [q for q in st if q not in out]
    raise RuntimeError(
        f"exact quantiles: max_rounds exceeded with {pending} "
        "unresolved (range not shrinking?)"
    )


def _ceil_rank(q: float, n: int) -> int:
    from fractions import Fraction

    frac = Fraction(q) * n
    return max(1, -(-frac.numerator // frac.denominator))


def exact_quantiles(
    df: DataFrame, col: str, qs, **kwargs
) -> dict:
    """Several exact discrete percentiles with ONE shared stats scan
    AND one shared bounded aggregate per narrowing round for ALL
    requested quantiles — ``{q: value}``.  Same rank rule as
    :func:`exact_quantile`."""
    n_bins = kwargs.pop("n_bins", 4096)
    collect_limit = kwargs.pop("collect_limit", 100_000)
    max_rounds = kwargs.pop("max_rounds", 20)
    vals, n, lo, hi = _stats(df, col)
    if n == 0:
        raise ValueError("exact_quantiles: no non-null values")
    got = _kth_multi(
        vals,
        {q: _ceil_rank(q, n) for q in qs},
        n,
        lo,
        hi,
        n_bins,
        collect_limit,
        max_rounds,
    )
    return {q: got[q] for q in qs}


def exact_quantile(
    df: DataFrame, col: str, q: float, **kwargs
) -> int:
    """Exact discrete percentile: the smallest value whose rank
    covers ``ceil(q * n)`` (the cume_dist >= q rule).  ``q`` is taken
    at its exact IEEE value via Fraction, so the rank is engine-
    independent — an oracle replays the same rule with ROW_NUMBER
    rather than trusting any engine's percentile_disc rounding."""
    return exact_quantiles(df, col, [q], **kwargs)[q]
