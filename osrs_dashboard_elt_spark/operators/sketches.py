"""Mergeable cardinality sketches as pure relational algebra.

At 100 TB, exact COUNT(DISTINCT) is the expensive path: it shuffles
every distinct value.  The scale answer is a mergeable sketch —
HyperLogLog registers combine with MAX, so partial sketches merge
map-side like any other partial aggregate and the final answer never
moves more than ``2^p`` small integers per group.

Spark's built-in ``approx_count_distinct`` is exactly this, but its
register hashing is engine-private — its estimates can't be checked
against another engine.  This module re-derives HLL from first
principles as PLAIN COLUMN ALGEBRA on an md5 hash, so the whole
sketch — bucket assignment, register values, the final estimate — is
bit-identical in any engine with md5/bin/shift (DuckDB oracle
included):

- hash: first 15 hex chars of md5 -> 60-bit unsigned integer that
  fits a signed BIGINT in both engines (the repo-wide hashing
  discipline of ``dedup.token_hash32``)
- bucket: top ``p`` bits (shift right by ``w = 60 - p``)
- rho: leading-zero count of the remaining ``w`` bits + 1, via
  ``LENGTH(bin(rem))`` (both engines' ``bin`` drops leading zeros)
- registers: ``MAX(rho)`` per (group, bucket) — the mergeable core
- estimate: harmonic mean of ``2^-M_j``.  The inner sum is computed
  on INTEGER-SCALED registers (``2^(w+1-M)`` as BIGINT, empty
  registers contributing ``2^(w+1)``): a sum of dyadic rationals in
  floating point rounds differently per fold order, but the scaled
  sum is exact 64-bit integer arithmetic — order-independent, so the
  estimate survives a cross-engine value-hash compare.  Max total is
  ``m * 2^(w+1) = 2^61`` < 2^63: no overflow.
- small-range correction (the standard linear-counting branch) when
  ``raw <= 2.5m`` and empty registers exist: ``m * ln(m / V)``.

Error ~ 1.04/sqrt(2^p).  Default p=9 (512 registers, ~4.6%).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_HASH_HEX = 15  # 60 bits: unsigned value fits signed int64 everywhere


def _rho_sql(w: int) -> str:
    """DuckDB rho expression over a 60-bit hash column ``h`` — shared
    by every HLL oracle so the register derivation cannot drift
    between them."""
    mask = (1 << w) - 1
    return (
        f"CASE WHEN (h & {mask}) > 0 "
        f"THEN {w + 1} - LENGTH(bin(h & {mask})) "
        f"ELSE {w + 1} END"
    )


def _est_sql(p: int) -> str:
    """DuckDB estimate expression over ``ssum0``/``nbuckets`` columns
    — the single source of the estimator arithmetic for every HLL
    oracle (a tweak here reaches all of them, mirroring the shared
    ``hll_estimate`` on the Spark side)."""
    m = 1 << p
    w = 60 - p
    alpha_num = repr(_alpha(m) * m * m * float(1 << (w + 1)))
    raw = (
        f"{alpha_num} / CAST(ssum0 + ({m} - nbuckets) * "
        f"{1 << (w + 1)}::BIGINT AS DOUBLE)"
    )
    return f"""CAST(CAST(
             CASE WHEN ({raw}) <= {2.5 * m}
                   AND ({m} - nbuckets) > 0
                  THEN {float(m)!r} * ln({float(m)!r} / CAST({m} - nbuckets AS DOUBLE))
                  ELSE {raw}
             END AS DECIMAL(28,4)) AS DOUBLE)"""


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_rho(value: Column, p: int) -> tuple[Column, Column]:
    """(bucket, rho) columns for one hashed value."""
    w = 60 - p
    h = F.conv(F.substring(F.md5(value), 1, _HASH_HEX), 16, 10).cast("long")
    bucket = F.shiftright(h, w)
    rem = h.bitwiseAND(F.lit((1 << w) - 1))
    rho = F.when(rem > 0, F.lit(w + 1) - F.length(F.bin(rem))).otherwise(
        F.lit(w + 1)
    )
    return bucket.alias("bucket"), rho.cast("int").alias("rho")


def hll_distinct(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    p: int = 9,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-group HLL distinct estimate, deterministic across engines.

    Two hash aggregates, both with map-side partials: (group, bucket)
    -> MAX(rho), then group -> estimate.  At cluster scale the second
    aggregate moves at most ``2^p`` rows per group.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    regs = hll_registers(df, ks, value_col, p)
    return hll_estimate(regs, ks, p, out_col)


def hll_registers(
    df: DataFrame, ks: list[str], value_col: str, p: int
) -> DataFrame:
    """(keys..., bucket, M) register table — the mergeable core.
    Registers from different slices combine with MAX on (keys,
    bucket); ``hll_estimate`` turns any register table back into an
    estimate.  NULLs are excluded, matching COUNT(DISTINCT): an
    unfiltered NULL hashes to a phantom (bucket=NULL, rho=w+1)
    register that inflates the occupancy count without a matching
    scaled-sum term — at full register occupancy the correction term
    goes NEGATIVE."""
    bucket, rho = hll_rho(F.col(value_col).cast("string"), p)
    df = df.filter(F.col(value_col).isNotNull())
    return (
        df.select(*ks, bucket, rho)
        .groupBy(*ks, "bucket")
        .agg(F.max("rho").alias("M"))
    )


def hll_estimate(
    regs: DataFrame, ks: list[str], p: int, out_col: str = "approx_distinct"
) -> DataFrame:
    """Per-group estimate from a (keys..., bucket, M) register table
    (same arithmetic discipline as the module docstring: exact
    integer-scaled harmonic sum, linear-counting small-range branch,
    4-decimal rounding for cross-engine value-hash stability)."""
    m = 1 << p
    w = 60 - p
    # 2^(w+1-M) as exact BIGINT via shift; summed in int64 (exact,
    # order-independent); empty registers contribute 2^(w+1) each.
    # (F.shiftleft only takes a literal shift -> SQL fragment.)
    scaled = F.expr(f"shiftleft(CAST(1 AS BIGINT), {w + 1} - M)")
    per_group = regs.groupBy(*ks).agg(
        F.sum(scaled).alias("_ssum"),
        F.count(F.lit(1)).alias("_nbuckets"),
    )
    full = F.lit(1 << (w + 1)).cast("long")
    ssum = F.col("_ssum") + (F.lit(m) - F.col("_nbuckets")) * full
    raw = (
        F.lit(_alpha(m) * m * m * float(1 << (w + 1))) / ssum.cast("double")
    )
    v = (F.lit(m) - F.col("_nbuckets")).cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return per_group.select(
        *ks,
        est.cast("decimal(28,4)").cast("double").alias(out_col),
    )


def hll_set_overlap(
    df_a: DataFrame,
    df_b: DataFrame,
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """Approximate set algebra over two slices' distinct values: one
    row (n_a, n_b, n_union, n_overlap) where the union estimate comes
    from REGISTER-LEVEL max-merge (the sketch's native union — no
    rescan, no exact distinct) and the intersection from
    inclusion-exclusion ``n_a + n_b - n_union``, clamped at 0 (the
    estimator's error can push a near-empty intersection negative).

    This is the period-over-period audience-overlap shape: each
    slice's registers are 2^p small integers regardless of data size,
    union is an elementwise MAX over them, and the whole computation
    after the two register aggregates touches at most ``3 * 2^p``
    rows.  Intersection error compounds (~3x a single estimate's
    relative error scaled by the larger set) — standard for HLL
    inclusion-exclusion; use a higher ``p`` when overlaps are small
    relative to the sets.

    For two slices of the SAME table, prefer
    :func:`hll_set_overlap_pred` — identical result from ONE scan."""
    # project to ONLY the value column under an internal name before
    # labeling: a caller frame that already carries a "side" (or the
    # value col literally named "__side") must not collide
    regs_a = hll_registers(
        df_a.select(
            F.lit("a").alias("__side"), F.col(value_col).alias("__v")
        ),
        ["__side"], "__v", p,
    )
    regs_b = hll_registers(
        df_b.select(
            F.lit("b").alias("__side"), F.col(value_col).alias("__v")
        ),
        ["__side"], "__v", p,
    )
    return _overlap_from_sided_regs(regs_a.unionByName(regs_b), p)


def hll_set_overlap_pred(
    df: DataFrame,
    value_col: str,
    pred_a,
    pred_b,
    p: int = 9,
) -> DataFrame:
    """:func:`hll_set_overlap` for two predicate-defined slices of ONE
    table, in ONE scan: each row explodes into its matching side
    labels (0, 1 or 2 of them) before the register aggregate, so the
    input parquet is read and hashed once instead of once per side —
    at 100 TB the duplicate scan, not the register algebra, would
    dominate the two-frame form."""
    sides = F.filter(
        F.array(
            F.when(pred_a, F.lit("a")), F.when(pred_b, F.lit("b"))
        ),
        lambda x: x.isNotNull(),
    )
    sided = df.select(
        F.explode(sides).alias("__side"), F.col(value_col).alias("__v")
    )
    return _overlap_from_sided_regs(
        hll_registers(sided, ["__side"], "__v", p), p
    )


def _overlap_from_sided_regs(both: DataFrame, p: int) -> DataFrame:
    """(n_a, n_b, n_union, n_overlap) from a (__side in {a, b},
    bucket, M) register table — the shared tail of both overlap forms.

    The register table feeds BOTH the per-side estimates and the
    union max-merge; without truncation each reference re-plans the
    whole upstream scan+aggregate (measured: 3 source scans).  The
    checkpoint materializes at most ``2 * 2^p`` tiny rows once —
    the same multi-referenced-intermediate discipline as the
    embedding-LSH posting table."""
    both = both.localCheckpoint(eager=False)
    regs_u = (
        both.groupBy("bucket")
        .agg(F.max("M").alias("M"))
        .select(F.lit("u").alias("__side"), "bucket", "M")
    )
    est = hll_estimate(both.unionByName(regs_u), ["__side"], p, "e")
    one = est.groupBy().pivot("__side", ["a", "b", "u"]).agg(F.first("e"))
    # an EMPTY slice produces no register rows, hence no pivot column
    # value — a silent NULL would poison every downstream field
    n_a = F.coalesce(F.col("a"), F.lit(0.0))
    n_b = F.coalesce(F.col("b"), F.lit(0.0))
    n_u = F.coalesce(F.col("u"), F.lit(0.0))

    def _d4(c):
        return c.cast("decimal(28,4)").cast("double")

    overlap = F.greatest(F.lit(0.0), _d4((n_a + n_b) - n_u))
    # set differences by the same inclusion-exclusion: |A \ B| =
    # |A∪B| - |B| (clamped; estimator error can cross zero)
    a_only = F.greatest(F.lit(0.0), _d4(n_u - n_b))
    b_only = F.greatest(F.lit(0.0), _d4(n_u - n_a))
    return one.select(
        n_a.alias("n_a"),
        n_b.alias("n_b"),
        n_u.alias("n_union"),
        overlap.alias("n_overlap"),
        a_only.alias("n_a_only"),
        b_only.alias("n_b_only"),
    )


def hll_oracle_sql(
    table: str,
    keys: list[str],
    value_expr: str,
    p: int = 9,
    out_col: str = "approx_distinct",
) -> str:
    """The DuckDB mirror of ``hll_distinct`` — same hash, same integer
    scaling, same branch, same rounding."""
    w = 60 - p
    kl = ", ".join(keys)
    return f"""
    WITH hashed AS (
      SELECT {kl},
             ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, {_HASH_HEX}))::BIGINT AS h
      FROM {table}
      WHERE {value_expr} IS NOT NULL
    ),
    br AS (
      SELECT {kl}, h >> {w} AS bucket, {_rho_sql(w)} AS rho
      FROM hashed
    ),
    regs AS (
      SELECT {kl}, bucket, MAX(rho) AS M FROM br GROUP BY {kl}, bucket
    ),
    g AS (
      SELECT {kl},
             SUM((1::BIGINT << ({w + 1} - M)))::BIGINT AS ssum0,
             COUNT(*) AS nbuckets
      FROM regs GROUP BY {kl}
    )
    SELECT {kl}, {_est_sql(p)} AS {out_col}
    FROM g
    """


def hll_rolling_distinct(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    window_days: int = 7,
    p: int = 9,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Per-day TRAILING-window distinct estimate — "distinct users in
    the last N days, for every day" — from daily HLL registers, never
    from a rescan:

    1. one register aggregate per (day, bucket) — the same daily
       sketch a rollup table would persist;
    2. each day's trailing sketch = register MAX over the window's
       days.  Day d needs every bucket touched ANYWHERE in
       ``(d-N, d]`` — including buckets idle on day d itself — so the
       day spine (tiny: one row per day) broadcast-joins the register
       table on the day-range condition and a (day, bucket) MAX
       re-aggregates.  The range join is a nested loop against a
       |days|-row broadcast side: bounded by the calendar, not the
       data;
    3. the shared estimator per day.

    The classic sketch-rollup marriage: daily registers are ~2^p
    ints/day, any trailing window re-derives from them by MAX, and no
    event is ever read twice.  Output: (day, ``out_col``), one row
    per day present in the data, each covering ``window_days`` ending
    that day inclusive.
    """
    daily = hll_daily_registers(df, ts_col, value_col, p)
    return hll_rolling_from_daily(daily, window_days, p, out_col)


def hll_daily_registers(
    df: DataFrame, ts_col: str, value_col: str, p: int = 9
) -> DataFrame:
    """(day, bucket, M) — the daily sketch a rollup table persists.
    ~2^p small integers per day regardless of data size; combine
    slices/replays with MAX on (day, bucket)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    return hll_registers(
        df.select(day, F.col(value_col).alias("__v")), ["day"], "__v", p
    )


def hll_rolling_from_daily(
    daily: DataFrame,
    window_days: int,
    p: int = 9,
    out_col: str = "approx_distinct",
) -> DataFrame:
    """The trailing-window estimate from a (day, bucket, M) register
    table — shared by the rescan form (``hll_rolling_distinct``) and
    the at-rest form (``read_hll_registers`` input)."""
    spine = daily.select("day").distinct().withColumnRenamed("day", "anchor")
    in_window = (F.col("day") <= F.col("anchor")) & (
        F.col("day") > F.date_sub(F.col("anchor"), window_days)
    )
    rolled = (
        daily.join(F.broadcast(spine), in_window)
        .groupBy("anchor", "bucket")
        .agg(F.max("M").alias("M"))
        .withColumnRenamed("anchor", "day")
    )
    # no orderBy: the value-hash gate is order-insensitive and a
    # global sort over the per-day output would add a range exchange
    # every caller pays; sort at the consumer when display needs it
    return hll_estimate(rolled, ["day"], p, out_col)


# ---------------------------------------------------------------------------
# At-rest register tables: the sketch analog of the dedup index.
# ---------------------------------------------------------------------------


def write_hll_registers(
    daily: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist a (day, bucket, M) daily register table, partitioned by
    day — the ingest cadence appends ONE day's ~2^p rows per run and
    every rolling/overlap query thereafter reads registers, never
    events.  Append is replay-safe by construction: registers merge
    with MAX, and ``read_hll_registers`` re-MAXes per (day, bucket),
    so a double-appended day changes nothing (sketch idempotency —
    no dedup bookkeeping needed).  At 100 TB the table is bounded by
    calendar x 2^p rows; day partitioning makes any window query a
    partition-pruned scan.  Clustered by day before the write so each
    day lands as ONE file instead of a sliver per upstream shuffle
    partition (~days x partitions tiny files otherwise)."""
    daily.repartition("day").write.mode(mode).partitionBy("day").parquet(path)


def read_hll_registers(
    spark: SparkSession, path: str, day_from=None
) -> DataFrame:
    """The merged (day, bucket, M) view of an at-rest register table:
    MAX per (day, bucket) collapses replayed appends and multiple
    slices of one day into the canonical registers.  Pass the window
    start as ``day_from`` to enforce the retention contract — a
    window reaching past a vacuumed floor raises instead of silently
    under-counting (see :func:`vacuum_registers`)."""
    if day_from is not None:
        check_window_retention(spark, path, day_from)
    return (
        spark.read.parquet(path)
        .groupBy("day", "bucket")
        .agg(F.max("M").alias("M"))
    )


def hll_overlap_from_daily(
    daily: DataFrame,
    pred_a,
    pred_b,
    p: int = 9,
) -> DataFrame:
    """:func:`hll_set_overlap` between two DAY-RANGE slices, served
    entirely from a daily register table: each side's registers are
    the MAX over its days (pred_a/pred_b are predicates over the
    ``day`` column), then the shared inclusion-exclusion tail.  The
    period-over-period audience overlap with zero event reads."""
    sided = daily.select(
        F.explode(
            F.filter(
                F.array(F.when(pred_a, F.lit("a")), F.when(pred_b, F.lit("b"))),
                lambda x: x.isNotNull(),
            )
        ).alias("__side"),
        "bucket",
        "M",
    )
    regs = sided.groupBy("__side", "bucket").agg(F.max("M").alias("M"))
    return _overlap_from_sided_regs(regs, p)


def hll_rolling_oracle_sql(
    table: str,
    ts_expr: str,
    value_expr: str,
    window_days: int = 7,
    p: int = 9,
    out_col: str = "approx_distinct",
) -> str:
    """DuckDB mirror of :func:`hll_rolling_distinct`: identical daily
    registers, identical spine range-join + MAX rollup, identical
    estimate arithmetic (shared ``_rho_sql``/``_est_sql``)."""
    w = 60 - p
    return f"""
    WITH hashed AS (
      SELECT CAST(date_trunc('day', {ts_expr}) AS DATE) AS day,
             ('0x' || substr(md5(CAST({value_expr} AS VARCHAR)), 1, {_HASH_HEX}))::BIGINT AS h
      FROM {table} WHERE {value_expr} IS NOT NULL
    ),
    br AS (
      SELECT day, h >> {w} AS bucket, {_rho_sql(w)} AS rho
      FROM hashed
    ),
    daily AS (
      SELECT day, bucket, MAX(rho) AS M FROM br GROUP BY day, bucket
    ),
    spine AS (SELECT DISTINCT day AS anchor FROM daily),
    rolled AS (
      SELECT s.anchor AS day, d.bucket, MAX(d.M) AS M
      FROM spine s JOIN daily d
        ON d.day <= s.anchor AND d.day > s.anchor - INTERVAL {window_days} DAY
      GROUP BY s.anchor, d.bucket
    ),
    g AS (
      SELECT day,
             SUM((1::BIGINT << ({w + 1} - M)))::BIGINT AS ssum0,
             COUNT(*) AS nbuckets
      FROM rolled GROUP BY day
    )
    SELECT day, {_est_sql(p)} AS {out_col}
    FROM g
    """


def hll_overlap_oracle_sql(
    table: str,
    value_expr: str,
    pred_a: str,
    pred_b: str,
    p: int = 9,
) -> str:
    """DuckDB mirror of :func:`hll_set_overlap` /
    :func:`hll_set_overlap_pred` for slices of one table defined by
    two predicates: identical registers, union by register MAX,
    identical estimate arithmetic and rounding (shared
    ``_rho_sql``/``_est_sql``), empty slices coalesced to 0.0 exactly
    like the Spark side."""
    w = 60 - p
    return f"""
    WITH src AS (
      SELECT CAST({value_expr} AS VARCHAR) AS v,
             ({pred_a}) AS pa, ({pred_b}) AS pb
      FROM {table} WHERE {value_expr} IS NOT NULL
    ),
    sided AS (
      SELECT 'a' AS side, v FROM src WHERE pa
      UNION ALL SELECT 'b' AS side, v FROM src WHERE pb
    ),
    hashed AS (
      SELECT side, ('0x' || substr(md5(v), 1, {_HASH_HEX}))::BIGINT AS h
      FROM sided
    ),
    br AS (
      SELECT side, h >> {w} AS bucket, {_rho_sql(w)} AS rho
      FROM hashed
    ),
    regs AS (
      SELECT side, bucket, MAX(rho) AS M FROM br GROUP BY side, bucket
    ),
    allregs AS (
      SELECT side, bucket, M FROM regs
      UNION ALL
      SELECT 'u' AS side, bucket, MAX(M) AS M FROM regs GROUP BY bucket
    ),
    g AS (
      SELECT side,
             SUM((1::BIGINT << ({w + 1} - M)))::BIGINT AS ssum0,
             COUNT(*) AS nbuckets
      FROM allregs GROUP BY side
    ),
    est AS (SELECT side, {_est_sql(p)} AS e FROM g),
    pv AS (
      SELECT COALESCE(MAX(CASE WHEN side = 'a' THEN e END), 0.0) AS na,
             COALESCE(MAX(CASE WHEN side = 'b' THEN e END), 0.0) AS nb,
             COALESCE(MAX(CASE WHEN side = 'u' THEN e END), 0.0) AS nu
      FROM est
    )
    SELECT na AS n_a, nb AS n_b, nu AS n_union,
           GREATEST(CAST(0 AS DOUBLE),
             CAST(CAST((na + nb) - nu AS DECIMAL(28,4)) AS DOUBLE)
           ) AS n_overlap,
           GREATEST(CAST(0 AS DOUBLE),
             CAST(CAST(nu - nb AS DECIMAL(28,4)) AS DOUBLE)
           ) AS n_a_only,
           GREATEST(CAST(0 AS DOUBLE),
             CAST(CAST(nu - na AS DECIMAL(28,4)) AS DOUBLE)
           ) AS n_b_only
    FROM pv
    """


def histogram_quantile(
    df: DataFrame,
    keys: str | list[str],
    value_col: str,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Mergeable quantile estimate from a fixed-width histogram.

    Exact ``percentile`` shuffles every value per group; the scale
    form is a bounded sketch.  A fixed-[lo, hi) equi-width histogram
    is the simplest mergeable one — bin counts add across partitions
    and windows — and unlike t-digest/KLL its estimate is a pure
    function of the bin counts, so it is bit-reproducible across
    engines and merge orders (the property the oracle gate checks).

    Estimate: the classic grouped-data interpolation.  With ``F(b)``
    the cumulative count through bin ``b`` and target rank
    ``r = q * (n - 1)`` (the same convention as ``percentile``), the
    answer is ``left_edge(b*) + width * (r - F(b*-1)) / cnt(b*)``
    where ``b*`` is the first bin with ``F(b*) > r``.

    Error ≤ one bin width — choose ``n_bins`` for the precision the
    consumer needs.  Values outside [lo, hi) clamp into the end bins.
    Two hash aggregates, both with map-side partials; at most
    ``n_bins`` rows per group ever shuffle.

    Cross-engine caveat: pick (lo, hi, n_bins) so the bin width is NOT
    exactly representable in binary (e.g. width 0.8, not 0.78125).  A
    dyadic width makes interpolated values able to land EXACTLY on a
    decimal-rounding midpoint, where Spark (half-up) and DuckDB
    (half-even) round apart by one ulp of the last kept digit.
    """
    ks = [keys] if isinstance(keys, str) else list(keys)
    width = (hi - lo) / n_bins
    # NULLs are excluded like exact percentile(): greatest(0, NULL) is
    # 0 in Spark (null-skipping), which would silently bin every NULL
    # at the lo edge and drag all quantiles down
    df = df.filter(F.col(value_col).isNotNull())
    counts = (
        df.select(*ks, _hist_bin(value_col, lo, width, n_bins).alias("bin"))
        .groupBy(*ks, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # per group: sorted (bin, cnt) pairs -> cumulative walk in ONE
    # array expression (groups are small: <= n_bins elements)
    packed = counts.groupBy(*ks).agg(
        F.sort_array(
            F.collect_list(F.struct("bin", "cnt"))
        ).alias("bins"),
        F.sum("cnt").alias("n"),
    )
    return packed.select(*ks, *_hq_out_cols(quantiles, lo, width))


def _hist_bin(value_col: str, lo: float, width: float, n_bins: int):
    """The shared fixed-width bin expression (end bins clamp)."""
    v = F.col(value_col).cast("double")
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((v - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )


def _hq_out_cols(quantiles: list[float], lo: float, width: float):
    """Quantile output columns over a frame carrying ``bins`` (sorted
    (bin, cnt) structs) and ``n`` — the grouped-data interpolation as
    one aggregate() walk per quantile."""
    outs = []
    for q in quantiles:
        # rank r = q*(n-1); find first bin with cumulative > r, then
        # interpolate within it.  aggregate() walks the sorted bins
        # carrying (cum_before, found_flag, answer).
        r = f"({q!r} * (CAST(n AS DOUBLE) - 1.0))"
        expr = f"""
        CAST(CAST(
          aggregate(
            bins,
            named_struct('cum', CAST(0 AS BIGINT), 'done', false, 'ans', CAST(0.0 AS DOUBLE)),
            (acc, b) -> IF(
              acc.done,
              acc,
              IF(
                CAST(acc.cum + b.cnt AS DOUBLE) > {r},
                named_struct(
                  'cum', acc.cum + b.cnt,
                  'done', true,
                  'ans', {lo!r} + CAST(b.bin AS DOUBLE) * {width!r}
                         + {width!r} * (({r} - CAST(acc.cum AS DOUBLE))
                                        / CAST(b.cnt AS DOUBLE))
                ),
                named_struct('cum', acc.cum + b.cnt, 'done', false, 'ans', acc.ans)
              )
            ),
            acc -> acc.ans
          )
        AS DECIMAL(28,6)) AS DOUBLE)
        """
        outs.append(F.expr(expr).alias(f"hq_{str(q).replace('.', '_')}"))
    return outs


def histogram_quantile_oracle_sql(
    table: str,
    keys: list[str],
    value_expr: str,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> str:
    """DuckDB mirror of ``histogram_quantile`` — same binning, same
    cumulative interpolation, same rounding, via window cumsums."""
    kl = ", ".join(keys)
    width = (hi - lo) / n_bins
    qcols = []
    for q in quantiles:
        name = f"hq_{str(q).replace('.', '_')}"
        r = f"({q!r} * (CAST(n AS DOUBLE) - 1.0))"
        qcols.append(
            f"""CAST(CAST(
              MIN(CASE WHEN CAST(cum AS DOUBLE) > {r}
                        AND CAST(cum - cnt AS DOUBLE) <= {r}
                   THEN {lo!r} + CAST(bin AS DOUBLE) * {width!r}
                        + {width!r} * (({r} - CAST(cum - cnt AS DOUBLE)) / CAST(cnt AS DOUBLE))
                   END)
            AS DECIMAL(28,6)) AS DOUBLE) AS {name}"""
        )
    return f"""
    WITH binned AS (
      SELECT {kl},
             LEAST({n_bins - 1}, GREATEST(0,
               CAST(FLOOR((CAST({value_expr} AS DOUBLE) - {lo!r}) / {width!r}) AS INT))) AS bin
      FROM {table}
      WHERE {value_expr} IS NOT NULL
    ),
    counts AS (
      SELECT {kl}, bin, COUNT(*) AS cnt FROM binned GROUP BY {kl}, bin
    ),
    walk AS (
      SELECT {kl}, bin, cnt,
             SUM(cnt) OVER (PARTITION BY {kl} ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY {kl}) AS n
      FROM counts
    )
    SELECT {kl}, {", ".join(qcols)}
    FROM walk GROUP BY {kl}, n
    """


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def _cms_bucket(j_col: Column, val_col: Column, w: int) -> Column:
    """Row j's counter index for a value: 60-bit md5 of ``j:value``
    mod w — the same hashing discipline as ``hll_rho`` (and thus
    reproducible verbatim in the DuckDB oracle)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(j_col.cast("string"), F.lit(":"), val_col)),
            1,
            _HASH_HEX,
        ),
        16,
        10,
    ).cast("long")
    return (h % F.lit(w)).alias("bucket")


def count_min_registers(
    df: DataFrame, value_col: str, d: int = 3, w: int = 256
) -> DataFrame:
    """The CMS register table ``(j, bucket, c)``: d hash rows of w
    counters.  Counters are plain COUNTs, so partials combine map-side
    and two sketches merge by element-wise ADDITION — the mergeable
    core that makes CMS the 100-TB answer for approximate frequency:
    the full register table is ``d*w`` integers regardless of input
    size or cardinality."""
    v = F.col(value_col).cast("string").alias("val")
    rows = df.select(v).select(
        "val",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    )
    rows = rows.withColumn("bucket", _cms_bucket(F.col("j"), F.col("val"), w))
    return rows.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("c"))


def cms_heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold: int,
    d: int = 3,
    w: int = 256,
) -> DataFrame:
    """Keys whose count-min ESTIMATE reaches ``threshold``, with the
    estimate and the exact count.  est = min_j regs[j][h_j(key)] —
    always >= exact (one-sided error; overestimate ~ n/w per hash
    row), so the result is a superset of the true heavy hitters:
    the sketch prunes, an exact pass confirms.  Everything is 64-bit
    integer arithmetic — bit-identical across engines and partition
    orders.  The register table is broadcast (d*w rows); the only
    shuffle is the per-key exact count this demo carries alongside."""
    regs = count_min_registers(df, value_col, d=d, w=w)
    keys = (
        df.select(F.col(value_col).cast("string").alias("val"))
        .groupBy("val")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    kb = keys.select(
        "val",
        "exact",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col("j"), F.col("val"), w))
    est = (
        kb.join(F.broadcast(regs), ["j", "bucket"])
        .groupBy("val", "exact")
        .agg(F.min("c").alias("est"))
    )
    return est.filter(F.col("est") >= threshold).select("val", "est", "exact")


def cms_oracle_sql(
    table: str,
    value_expr: str,
    threshold: int,
    d: int = 3,
    w: int = 256,
    val_alias: str = "val",
) -> str:
    """DuckDB mirror of ``cms_heavy_hitters`` — same md5 hashing, same
    integer counters, same min-over-rows estimate."""
    return f"""
    WITH vals AS (
      SELECT CAST({value_expr} AS VARCHAR) AS val FROM {table}
    ),
    jt AS (SELECT unnest(generate_series(0, {d - 1})) AS j),
    hashed AS (
      SELECT val, j,
             (('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || val), 1, {_HASH_HEX}))::BIGINT) % {w} AS bucket
      FROM vals CROSS JOIN jt
    ),
    regs AS (
      SELECT j, bucket, COUNT(*) AS c FROM hashed GROUP BY j, bucket
    ),
    keys AS (
      SELECT val, COUNT(*) AS exact FROM vals GROUP BY val
    ),
    kb AS (
      SELECT k.val, k.exact, jt.j,
             (('0x' || substr(md5(CAST(jt.j AS VARCHAR) || ':' || k.val), 1, {_HASH_HEX}))::BIGINT) % {w} AS bucket
      FROM keys k CROSS JOIN jt
    )
    SELECT kb.val AS {val_alias}, MIN(regs.c) AS est, kb.exact
    FROM kb JOIN regs ON kb.j = regs.j AND kb.bucket = regs.bucket
    GROUP BY kb.val, kb.exact
    HAVING MIN(regs.c) >= {threshold}
    """


def cms_daily_registers(
    df: DataFrame, ts_col: str, value_col: str, d: int = 3, w: int = 256
) -> DataFrame:
    """(day, j, bucket, c) — the daily CMS register table.  d*w small
    integers per day; a window's sketch is the element-wise SUM of
    its days' registers (counters are counts — addition-mergeable)."""
    day = F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    v = F.col(value_col).cast("string").alias("val")
    rows = df.select(day, v).select(
        "day",
        "val",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    )
    rows = rows.withColumn("bucket", _cms_bucket(F.col("j"), F.col("val"), w))
    return rows.groupBy("day", "j", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )


def _write_day_replaced(daily: DataFrame, path: str) -> None:
    """Day-partitioned persist that REPLACES any day being written
    (dynamic partition overwrite) — the idempotency contract shared
    by every ADDITION-merged register family (CMS counters, histogram
    bin counts): a replayed append would double-count, so replay
    safety is per-day partition replacement."""
    spark = daily.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        # cluster by day before the partitioned write: without it every
        # upstream shuffle partition writes a sliver into every day
        # directory (~days x shuffle-partitions files of a few rows —
        # measured ~900 at sf0.1); clustered, each day is ONE file,
        # which is also what the per-day replacement contract wants
        daily.repartition("day").write.mode("overwrite").partitionBy(
            "day"
        ).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_cms_registers(daily: DataFrame, path: str) -> None:
    """Persist daily CMS registers day-partitioned, REPLACING any day
    being written.  Unlike HLL's MAX registers, CMS counters merge by
    ADDITION, so a replayed append would double-count — recompute a
    day's d*w rows, swap its partition.  (Partial-day increments
    would need a batch-id ledger like streaming/incremental_sink.py —
    out of scope for the rollup cadence this serves.)"""
    _write_day_replaced(daily, path)


def read_cms_registers(
    spark: SparkSession, path: str, day_from=None
) -> DataFrame:
    """The (day, j, bucket, c) view of an at-rest CMS register table.
    SUM per (day, j, bucket) collapses multiple slice files of one
    day (a fully replayed day was already replaced at write time).
    ``day_from`` enforces the retention floor (loud, not silent)."""
    if day_from is not None:
        check_window_retention(spark, path, day_from)
    return (
        spark.read.parquet(path)
        .groupBy("day", "j", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def cms_window_heavy_hitters(
    daily: DataFrame,
    candidates: DataFrame,
    day_from,
    day_to,
    threshold: int,
    d: int = 3,
    w: int = 256,
    val_col: str = "val",
) -> DataFrame:
    """(val, est) for CANDIDATE keys whose count-min estimate over the
    day window ``[day_from, day_to]`` reaches ``threshold`` — served
    entirely from a daily register table: the window's sketch is the
    SUM of its days' registers (d*w rows after the fold, broadcast),
    and the probe never rescans events.  The candidate list is the
    caller's (typically: keys seen TODAY, screened against a month of
    volume).  Estimates are one-sided (>= exact), integer-exact and
    engine-independent."""
    regs = (
        daily.filter(
            (F.col("day") >= F.lit(day_from)) & (F.col("day") <= F.lit(day_to))
        )
        .groupBy("j", "bucket")
        .agg(F.sum("c").alias("c"))
    )
    kb = candidates.select(
        F.col(val_col).cast("string").alias("val")
    ).distinct().select(
        "val",
        F.explode(F.array(*[F.lit(j) for j in range(d)])).alias("j"),
    ).withColumn("bucket", _cms_bucket(F.col("j"), F.col("val"), w))
    est = (
        kb.join(F.broadcast(regs), ["j", "bucket"], "left")
        .groupBy("val")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est"))
    )
    return est.filter(F.col("est") >= threshold).select("val", "est")


# ---------------------------------------------------------------------------
# At-rest histogram registers: the third register family (HLL = MAX
# merge, CMS = ADD + day replacement, histogram = ADD + day
# replacement) — windowed quantiles with no event rescan
# ---------------------------------------------------------------------------


def histogram_daily_registers(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """(day, bin, cnt) — the daily fixed-width histogram register
    table.  At most ``n_bins`` small-integer rows per day; any window
    of days merges by element-wise ADDITION, and the quantile
    estimate is a pure function of the merged counts (same binning
    and interpolation as :func:`histogram_quantile`, so the at-rest
    path answers bit-for-bit what the from-events path answers)."""
    width = (hi - lo) / n_bins
    day = F.date_trunc("day", F.col(ts_col)).cast("date").alias("day")
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(day, _hist_bin(value_col, lo, width, n_bins).alias("bin"))
        .groupBy("day", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def write_histogram_registers(daily: DataFrame, path: str) -> None:
    """Persist daily histogram registers day-partitioned with per-day
    REPLACEMENT (bin counts ADD — a replayed append would
    double-count, exactly the CMS contract)."""
    _write_day_replaced(daily, path)


def read_histogram_registers(
    spark: SparkSession, path: str, day_from=None
) -> DataFrame:
    """(day, bin, cnt) view of an at-rest histogram register table;
    SUM per (day, bin) collapses multiple slice files of one day.
    ``day_from`` enforces the retention floor (loud, not silent)."""
    if day_from is not None:
        check_window_retention(spark, path, day_from)
    return (
        spark.read.parquet(path)
        .groupBy("day", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def histogram_window_quantiles(
    daily: DataFrame,
    day_from,
    day_to,
    quantiles: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """One row of quantile estimates for the day window ``[day_from,
    day_to]``, served ENTIRELY from a daily register table: the
    window's histogram is the sum of its days' bins (<= n_bins rows
    after the fold), then the shared grouped-data interpolation —
    the window's events are never rescanned.  Same arithmetic as
    :func:`histogram_quantile`, so a from-events oracle reproduces
    every estimate bit-for-bit."""
    width = (hi - lo) / n_bins
    regs = (
        daily.filter(
            (F.col("day") >= F.lit(day_from)) & (F.col("day") <= F.lit(day_to))
        )
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    packed = regs.agg(
        F.sort_array(F.collect_list(F.struct("bin", "cnt"))).alias("bins"),
        F.sum("cnt").alias("n"),
    )
    return packed.select(*_hq_out_cols(quantiles, lo, width))


# ---------------------------------------------------------------------------
# Retention for at-rest register tables: all three kinds (HLL, CMS,
# histogram) share the day= partition layout, so one vacuum serves all
# ---------------------------------------------------------------------------

_RETENTION_SIDECAR = "_retention.json"


def _register_fs(spark: SparkSession, path: str):
    jvm = spark._jvm  # noqa: SLF001
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def vacuum_registers(
    spark: SparkSession, path: str, keep_days: int, as_of=None
) -> list[str]:
    """Drop day partitions older than the retention window and record
    the retention FLOOR (first day still present) in a sidecar.

    ``as_of`` anchors the window (a ``date`` or ISO string); default
    is the newest day partition present, so a nightly vacuum after the
    day's register append keeps exactly the trailing ``keep_days``
    calendar days.  Returns the dropped partition names.

    The floor is what makes retention SAFE rather than silent: every
    window reader here goes through :func:`check_window_retention`
    (directly or via the ``*_registers`` read helpers' ``day_from``),
    and a window reaching past the floor RAISES — an under-counted
    sum/MAX over missing days would otherwise be indistinguishable
    from a quiet period.  At 100 TB this is a metadata-only operation:
    one directory listing plus O(dropped partitions) deletes; no data
    is read."""
    import datetime as _dt
    import json as _json

    if keep_days < 1:
        raise ValueError("keep_days must be >= 1")
    fs, jpath, jvm = _register_fs(spark, path)
    days: list[str] = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith("day="):
            days.append(name[4:])
    if not days:
        return []
    if as_of is None:
        as_of = max(days)
    as_of = _dt.date.fromisoformat(str(as_of))
    floor = as_of - _dt.timedelta(days=keep_days - 1)
    # The floor is MONOTONE: a later vacuum with a larger keep_days
    # (or an earlier as_of) must not move it backwards past days
    # already deleted — that would let check_window_retention wave
    # through a window whose early days are gone.
    prev_floor = retention_floor(spark, path)
    if prev_floor is not None and prev_floor > floor:
        floor = prev_floor
    dropped = sorted(d for d in days if _dt.date.fromisoformat(d) < floor)
    # Sidecar FIRST, deletes second: a crash between the two leaves a
    # floor with some pre-floor days still present (readers merely
    # refuse windows they could have served — safe), never deleted
    # days with no recorded floor (silent under-count).
    side = jvm.org.apache.hadoop.fs.Path(path, _RETENTION_SIDECAR)
    out = fs.create(side, True)
    out.write(bytearray(_json.dumps(
        {"floor": floor.isoformat(), "keep_days": keep_days,
         "as_of": as_of.isoformat()}
    ).encode()))
    out.close()
    for d in dropped:
        fs.delete(jvm.org.apache.hadoop.fs.Path(path, f"day={d}"), True)
    return [f"day={d}" for d in dropped]


def retention_floor(spark: SparkSession, path: str):
    """The first retained day of a vacuumed register table (``None``
    if the table was never vacuumed — nothing was ever dropped, so
    any window is servable)."""
    import datetime as _dt
    import json as _json

    fs, _, jvm = _register_fs(spark, path)
    side = jvm.org.apache.hadoop.fs.Path(path, _RETENTION_SIDECAR)
    if not fs.exists(side):
        return None
    stream = fs.open(side)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return _dt.date.fromisoformat(_json.loads(data)["floor"])


def check_window_retention(spark: SparkSession, path: str, day_from) -> None:
    """Raise if a window starting at ``day_from`` reaches past the
    table's retention floor — the loud-failure half of the vacuum
    contract (all three register kinds merge windows by SUM or MAX,
    which would silently UNDER-COUNT over vacuumed days)."""
    import datetime as _dt

    floor = retention_floor(spark, path)
    if floor is None:
        return
    start = _dt.date.fromisoformat(str(day_from))
    if start < floor:
        raise ValueError(
            f"window start {start} precedes the retention floor {floor} "
            f"of {path}: days before the floor were vacuumed, so the "
            "window's register merge would silently under-count. "
            "Shorten the window or raise keep_days."
        )
