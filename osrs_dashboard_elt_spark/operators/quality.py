"""One-pass data-quality profiling (deequ-style) and constraint checks.

A 100 TB ingest wants per-column health metrics — row/null/distinct
counts, numeric ranges — computed in ONE scan, not one scan per
metric.  ``quality_metrics`` builds a single aggregate whose output
row carries every (column x metric) cell, then explodes it to the
long form with ``inline`` — so the plan is: scan -> one hash
aggregate (the distinct counts share one Expand) -> a generator
projection.  No per-column jobs, no driver loops.

``check_constraints`` evaluates declarative expectations (non-null,
unique, range, referential) against the metrics row and returns
(constraint, passed, observed) — the pipeline-gate form: a failed
row means quarantine the batch, in the spirit of the reference's
required-column validation (P9) scaled up to table level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def quality_metrics(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-form per-column profile: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — numeric min/max via try_cast
    (NULL for non-numeric columns), computed in one aggregate."""
    cols = cols or df.columns
    # internal aliases are __qm_-prefixed so profiled columns named
    # _n / _nn_x etc. cannot collide
    aggs = [F.count(F.lit(1)).alias("__qm_n")]
    for c in cols:
        num = F.expr(f"try_cast(`{c}` AS DOUBLE)")
        aggs += [
            F.count(F.col(c)).alias(f"__qm_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"__qm_nd_{c}"),
            F.min(num).alias(f"__qm_mn_{c}"),
            F.max(num).alias(f"__qm_mx_{c}"),
        ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__qm_n").alias("n_rows"),
                (F.col("__qm_n") - F.col(f"__qm_nn_{c}")).alias("n_nulls"),
                F.col(f"__qm_nd_{c}").alias("n_distinct"),
                F.col(f"__qm_mn_{c}").alias("min_value"),
                F.col(f"__qm_mx_{c}").alias("max_value"),
            )
            for c in cols
        ]
    )
    return wide.select(F.inline(rows))


def check_constraints(
    df: DataFrame, constraints: list[tuple[str, str]]
) -> DataFrame:
    """Evaluate (name, boolean SQL expression over one aggregate pass)
    pairs, e.g. ``("pk_unique", "count(distinct id) = count(*)")`` or
    ``("value_range", "min(value) >= 0")``.  Returns one row per
    constraint: (constraint, passed).  All expressions share a single
    aggregate — one scan regardless of how many checks."""
    aggs = [
        F.expr(expr).cast("boolean").alias(f"__qm_c{i}")
        for i, (_, expr) in enumerate(constraints)
    ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("constraint"),
                F.coalesce(F.col(f"__qm_c{i}"), F.lit(False)).alias("passed"),
            )
            for i, (name, _) in enumerate(constraints)
        ]
    )
    return wide.select(F.inline(rows))


def table_checksum(
    df: DataFrame,
    cols: list[str] | None = None,
    sep: str = "\x1f",
) -> DataFrame:
    """Order-independent content digest of a table: one row
    ``(n_rows, checksum)`` where checksum is the exact DECIMAL(38,0)
    SUM of each row's 60-bit md5 (decimal, not int64: 2^60-sized
    terms overflow a long within a few thousand rows under ANSI
    arithmetic; 38 digits hold ~10^19 rows).  Because addition
    commutes, the digest
    is independent of partitioning, ordering, and merge plan — two
    tables are (almost surely) row-identical iff their checksums and
    counts agree.  The blue/green publish validation: checksum the
    inactive color against the expected input before flipping.

    Rows serialize as ``concat_ws(sep, cols-as-strings)`` with NULL as
    an explicit sentinel (concat_ws drops NULLs, which would make
    ('a', NULL) collide with ('a',)).  Pass a ``sep`` that cannot
    occur inside values.

    DuckDB mirror (for cross-engine audit):
      SELECT COUNT(*), SUM(('0x' || substr(md5(<serialized>), 1, 15))::BIGINT)
    with the identical COALESCE/CAST serialization.
    """
    cols = cols or df.columns
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00NULL"))
        for c in cols
    ]
    row_hash = F.conv(
        F.substring(F.md5(F.concat_ws(sep, *parts)), 1, 15), 16, 10
    ).cast("long")
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_hash.cast("decimal(38,0)")).cast("decimal(38,0)").alias("checksum"),
    )


# ---------------------------------------------------------------------------
# Row-level expectations: violation counts, row routing, referential rules
# ---------------------------------------------------------------------------


def rule_violation_counts(
    df: DataFrame, rules: list[tuple[str, str]]
) -> DataFrame:
    """Per-rule VIOLATION counts in one scan: ``rules`` are (name,
    boolean SQL predicate meaning the row is VALID); a NULL predicate
    result counts as a violation (SQL three-valued logic would
    otherwise let nulls slip through every gate).  Returns (rule,
    n_violations, n_rows) — one conditional aggregate, no joins, so
    adding a rule costs one codegen term, never a scan."""
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(
            F.when(
                ~F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)),
                1,
            ).otherwise(0)
        ).alias(f"__v{i}")
        for i, (_, pred) in enumerate(rules)
    ]
    wide = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"__v{i}").cast("long").alias("n_violations"),
                F.col("__n").cast("long").alias("n_rows"),
            )
            for i, (name, _) in enumerate(rules)
        ]
    )
    return wide.select(F.inline(rows))


def split_by_rules(
    df: DataFrame,
    rules: list[tuple[str, str]],
    reasons_col: str = "failed_rules",
) -> tuple[DataFrame, DataFrame]:
    """Route rows: (good, bad) where ``bad`` carries the array of
    failed rule names — the row-level quarantine form
    (``streaming/dedup_ingest.py`` routes by reason the same way).
    One scan-side projection per frame, no shuffle; at 100 TB this is
    a filter pushed into the scan, not a validation job."""
    reasons = F.array_compact(
        F.array(
            *[
                F.when(
                    ~F.coalesce(F.expr(pred).cast("boolean"), F.lit(False)),
                    F.lit(name),
                )
                for name, pred in rules
            ]
        )
    )
    tagged = df.withColumn(reasons_col, reasons)
    good = tagged.filter(F.size(reasons_col) == 0).drop(reasons_col)
    bad = tagged.filter(F.size(reasons_col) > 0)
    return good, bad


def referential_violations(
    fact: DataFrame,
    fk: str,
    dim: DataFrame,
    pk: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Foreign-key expectation: fact rows whose ``fk`` has no match in
    ``dim.pk`` (NULL fks violate too — an orphan is an orphan).  A
    left-anti join, dimension side broadcast by default (dims that
    don't fit a broadcast want the shuffle variant: pass False).  This
    is the one expectation a single-scan aggregate can't express."""
    keys = dim.select(F.col(pk).alias(fk)).distinct()
    if broadcast_dim:
        keys = F.broadcast(keys)
    return fact.join(keys, fk, "left_anti")


def corpus_gate_rules(
    text_col: str = "text",
    min_words: int = 5,
    max_mean_word_len: int = 12,
    max_symbol_pct: int = 10,
    max_word_len: int = 100,
) -> list[tuple[str, str]]:
    """C4/Gopher-style heuristic pretraining gates as expectations
    rules — composable with :func:`rule_violation_counts` (audit) and
    :func:`split_by_rules` (routing), so the whole pack is one
    conditional aggregate or one scan-side projection, never one job
    per heuristic.

    Every predicate is integer/regex arithmetic (ratios are
    cross-multiplied, e.g. ``100*symbols <= pct*length`` instead of a
    double division), so an oracle reproduces each count exactly.
    The pack (documents with fewer than ``min_words`` words, mean word
    length above ``max_mean_word_len``, symbol share above
    ``max_symbol_pct`` percent, any single word longer than
    ``max_word_len``, no common-stopword hit) mirrors the public
    C4/Gopher repetition-and-gibberish screens at the granularity a
    row-local rule can express; corpus-level screens (dedup,
    perplexity) are their own operators."""
    t = text_col
    words = f"size(split(trim({t}), '\\\\s+'))"
    letters = f"length(regexp_replace({t}, '\\\\s+', ''))"
    symbols = f"length(regexp_replace({t}, '[A-Za-z0-9\\\\s]', ''))"
    return [
        ("min_words", f"{words} >= {min_words}"),
        (
            "mean_word_len",
            f"{letters} <= {max_mean_word_len} * {words}",
        ),
        (
            "symbol_ratio",
            f"100 * {symbols} <= {max_symbol_pct} * length({t})",
        ),
        ("max_word_len", f"NOT {t} RLIKE '\\\\S{{{max_word_len + 1}}}'"),
        (
            "has_stopword",
            f"lower({t}) RLIKE '\\\\b(the|and|of|to|in|a|is)\\\\b'",
        ),
    ]


# ---------------------------------------------------------------------------
# Metrics history + drift: the deequ metrics-repository half
# ---------------------------------------------------------------------------


def metrics_history_append(
    metrics: DataFrame,
    path: str,
    run_day: str,
    run_id: str | None = None,
) -> None:
    """Persist one run's metrics (any long-form frame — the outputs of
    :func:`quality_metrics` and :func:`rule_violation_counts` both
    qualify) under ``path``, partitioned by ``day`` with dynamic
    partition REPLACEMENT: a replayed run overwrites exactly its own
    day, never doubling history (the at-rest register discipline,
    ``operators/sketches.py``).  One day per run is the deequ
    metrics-repository granularity; pass ``run_id`` to tell intra-day
    re-runs apart in the audit trail (replacement still applies — the
    LAST run of a day is that day's record).

    ``run_id`` is ALWAYS written (NULL when not provided): day
    partitions written with and without a run id would otherwise have
    different parquet schemas, and a later whole-history read takes
    its schema from one file — silently dropping the column — unless
    every reader remembers ``mergeSchema``."""
    out = metrics.withColumn("day", F.lit(run_day)).withColumn(
        "run_id", F.lit(run_id).cast("string")
    )
    (
        out.coalesce(1)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(path)
    )


def metric_drift(
    history: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window: int = 3,
    tol_pct: int = 20,
) -> DataFrame:
    """Run-over-run drift detection: flag a run whose metric falls
    outside its trailing-window band — ``[lo - tol, hi + tol]`` where
    ``[lo, hi]`` is the min/max of the previous ``window`` runs for
    the same key and ``tol = tol_pct% * (hi - lo)``.

    Band = min/max (not mean ± k·σ) deliberately: min/max are
    order-insensitive and exactly reproducible across engines, while a
    distributed stddev's summation order is not — drift verdicts must
    be bit-stable or the alert itself flaps.  Runs with fewer than
    ``window`` predecessors are not judged (``drifted`` NULL): an
    empty/short band would flag every early run.

    One window pass, partitioned by key — at 100 TB this frame is
    runs × metrics (KBs/day), so the window never sees data-sized
    input; keep ``history`` to metric rows, not row-level data.
    Returns the input plus (band_lo, band_hi, drifted)."""
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    lo = F.min(v).over(w)
    hi = F.max(v).over(w)
    n = F.count(v).over(w)
    tol = F.lit(tol_pct) / F.lit(100.0) * (hi - lo)
    drifted = F.when(
        n >= window, (v < lo - tol) | (v > hi + tol)
    )
    return history.select(
        "*",
        lo.alias("band_lo"),
        hi.alias("band_hi"),
        drifted.alias("drifted"),
    )


def assert_no_drift(
    history: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    window: int = 3,
    tol_pct: int = 20,
) -> None:
    """The gate form: raise if the LATEST run of any key drifted —
    wire this after :func:`metrics_history_append` to fail a pipeline
    whose profile jumped out of band."""
    d = metric_drift(
        history, key_cols, order_col, value_col, window, tol_pct
    )
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    latest = d.withColumn("__rn", F.row_number().over(w)).filter(
        "__rn = 1 AND drifted"
    )
    rows = latest.select(*key_cols, order_col, value_col,
                         "band_lo", "band_hi").collect()
    if rows:
        detail = "; ".join(str(tuple(r)) for r in rows[:5])
        raise RuntimeError(
            f"metric drift: {len(rows)} key(s) out of band on their "
            f"latest run (window={window}, tol={tol_pct}%): {detail}"
        )
