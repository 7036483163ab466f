"""Deterministic sampling / splitting / rebalancing for training-data
pipelines.

At 100 TB, random sampling via ``df.sample()`` is the wrong tool for
corpus curation: it is non-reproducible across retries (task re-execution
re-draws), non-joinable (the same document lands in different samples in
different runs), and stateful.  Everything here is a pure function of a
key column through the repo-wide md5-derived 32-bit hash
(``operators.dedup.token_hash32``) — so a sample is:

- **re-runnable**: same key -> same bucket, forever, on any engine;
- **join-stable**: a doc sampled into ``train`` stays in ``train`` in
  every downstream job that re-derives the split instead of persisting it;
- **oracle-checkable**: DuckDB reproduces every decision bit-for-bit
  (``('0x' || substr(md5(k),1,8))::BIGINT % buckets``).

Scale shapes (all verified via .explain):

- ``hash_sample`` / ``split_assign`` are single column expressions — a
  scan-side filter / projection.  No shuffle, no RNG state, and the
  sample filter sits directly above the parquet scan so column pruning
  and (for partition-keyed samples) partition pruning still apply.
- ``domain_mix_thresholds`` is one tiny aggregate (|domains| rows) whose
  output broadcast-joins back; the quota arithmetic is pure int64 so
  both engines compute identical thresholds from identical counts.
- ``shuffle_order`` is a column; a global training-order sort with it is
  Spark's classic total-order shape (range partition by sampled bounds)
  — the cheapest possible global shuffle, and deterministic.

The reference has no sampling surface (its corpus fits a Raspberry Pi);
this family is part of the LLM-pipeline extension mandated by SURVEY §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import token_hash32

#: Bucket resolution for all sampling decisions.  10k buckets = 0.01%
#: granularity; fractions are snapped to an integer bucket count so the
#: accept test is pure integer compare (no float crossing engines).
BUCKETS = 10_000


def sample_bucket(key: Column, seed: int = 42) -> Column:
    """Deterministic bucket in ``[0, BUCKETS)`` for a key.

    DuckDB: ``('0x' || substr(md5('<seed>|' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % 10000``
    """
    tagged = F.concat_ws("|", F.lit(str(seed)), key.cast("string"))
    return token_hash32(tagged) % BUCKETS


def sample_bucket_sql(key_sql: str, seed: int = 42) -> str:
    """The DuckDB expression matching :func:`sample_bucket`."""
    return (
        f"('0x' || substr(md5('{seed}|' || CAST({key_sql} AS VARCHAR)), 1, 8))"
        f"::BIGINT % {BUCKETS}"
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash.

    The filter is a scan-side predicate (one md5 per row, no shuffle);
    ``fraction`` is snapped to 1/BUCKETS granularity.
    """
    thr = int(round(fraction * BUCKETS))
    return df.filter(sample_bucket(F.col(key_col), seed) < F.lit(thr))


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Assign each row a deterministic train/val/test-style split label.

    ``weights`` maps label -> weight (normalized internally).  Labels
    are laid out on the bucket line in the dict's insertion order; the
    LAST label absorbs rounding remainder so every bucket is owned.
    Pure projection — no shuffle, no persisted split table needed
    (though persisting one is cheap: it's (key, label)).
    """
    total = sum(weights.values())
    labels = list(weights)
    b = sample_bucket(F.col(key_col), seed)
    expr: Column | None = None
    cum = 0.0
    for lab in labels[:-1]:
        cum += weights[lab] / total
        thr = int(round(cum * BUCKETS))
        branch = b < F.lit(thr)
        expr = F.when(branch, lab) if expr is None else expr.when(branch, lab)
    last = F.lit(labels[-1])
    return df.withColumn(out, last if expr is None else expr.otherwise(last))


def leakage_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    weights: dict[str, float],
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """Group-aware train/val/test split: the split label is a function
    of the near-dup CLUSTER id (min-id connected component over
    ``pairs``), so two near-duplicate documents can NEVER straddle
    splits.  A row-keyed :func:`split_assign` leaks by construction:
    every duplicate class is scattered across splits in proportion to
    the weights, and each leaked twin is a val answer sitting in
    train.  Keying the same deterministic bucket hash by cluster
    moves whole classes together — decontamination between splits by
    construction, with the same bucket-line weight semantics.

    ``pairs`` comes from any pair generator here (MinHash, SimHash,
    embedding LSH, semantic cells).  Cost on top of the dedup you
    already run: the components pass (O(log D) rounds over id pairs)
    plus one id-equi-join of the (id, cluster_id) frame back to
    ``docs``; the split itself is a pure projection.  Returns ``docs``
    plus (cluster_id, ``out``)."""
    from .components import dedup_clusters

    clusters = dedup_clusters(docs.select(id_col), pairs, id_col)
    labeled = split_assign(
        clusters.select(id_col, "cluster_id"), "cluster_id", weights,
        seed, out,
    )
    return docs.join(labeled, id_col)


def split_case_sql(key_sql: str, weights: dict[str, float], seed: int = 42) -> str:
    """DuckDB CASE expression matching :func:`split_assign`."""
    total = sum(weights.values())
    labels = list(weights)
    bucket = sample_bucket_sql(key_sql, seed)
    cases, cum = [], 0.0
    for lab in labels[:-1]:
        cum += weights[lab] / total
        cases.append(f"WHEN ({bucket}) < {int(round(cum * BUCKETS))} THEN '{lab}'")
    return "CASE " + " ".join(cases) + f" ELSE '{labels[-1]}' END"


def length_bucket(
    n_tokens: Column, boundaries: list[int]
) -> Column:
    """Sequence-length bucket label for packing/batching: boundaries
    ``[b1, b2, ...]`` produce labels ``"<b1"``, ``"b1-b2"``, ...,
    ``">=bn"``.  A chained-when projection — stays in codegen; at scale
    this is the groupBy key for per-bucket batch assembly, so buckets
    (not raw lengths) become the shuffle key: bounded cardinality.
    """
    expr = None
    lo = None
    for b in boundaries:
        lab = f"<{b}" if lo is None else f"{lo}-{b}"
        cond = n_tokens < F.lit(b)
        expr = F.when(cond, lab) if expr is None else expr.when(cond, lab)
        lo = b
    return expr.otherwise(F.lit(f">={boundaries[-1]}"))


def length_bucket_sql(n_tokens_sql: str, boundaries: list[int]) -> str:
    cases, lo = [], None
    for b in boundaries:
        lab = f"<{b}" if lo is None else f"{lo}-{b}"
        cases.append(f"WHEN ({n_tokens_sql}) < {b} THEN '{lab}'")
        lo = b
    return "CASE " + " ".join(cases) + f" ELSE '>={boundaries[-1]}' END"


def domain_mix_thresholds(
    df: DataFrame,
    domain_col: str,
    target_ppm: dict[str, int],
    budget_frac_ppm: int,
) -> DataFrame:
    """Per-domain accept thresholds hitting a target domain mix.

    Given a corpus with per-domain counts ``n_d``, a total budget of
    ``budget_frac_ppm/1e6`` of all rows, and target shares
    ``target_ppm[d]`` (parts-per-million, summing to <= 1e6), compute
    an integer bucket threshold per domain::

        budget   = (N_total * budget_frac_ppm) div 1e6
        desired  = (budget * target_ppm[d]) div 1e6
        thr[d]   = least(BUCKETS, (desired * BUCKETS) div n_d)

    Exact at ANY scale: the two products that can exceed int64
    (n_total * ppm past ~9.2e12 rows) are computed in DECIMAL(38,0)
    and divided with integral DIV (never double `/`, whose 2^53
    mantissa would silently round) — DuckDB reproduces thresholds
    bit-exactly from the same table via HUGEINT `//`.  Result: (domain, n_domain, thr) — |domains| rows,
    always broadcastable.  Domains absent from ``target_ppm`` get
    thr=0 (dropped).  A domain with fewer rows than desired saturates
    at BUCKETS (takes everything; no oversampling — upweighting is a
    training-loader concern, not a data op).
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_domain")
    )
    # n_total = sum of the per-domain counts: a global window over the
    # |domains|-row aggregate output, so no second scan and no join
    # (a crossJoin with a 1-row total would plan as a nested-loop join).
    n_total = F.sum("n_domain").over(Window.partitionBy())
    tgt = F.create_map(
        *[x for d, p in target_ppm.items() for x in (F.lit(d), F.lit(p))]
    )
    return counts.select(
        "domain",
        "n_domain",
        n_total.alias("__n_total"),
        F.coalesce(tgt[F.col("domain")], F.lit(0))
        .cast("long")
        .alias("__tgt"),
    ).select(
        "domain",
        "n_domain",
        F.least(
            F.lit(BUCKETS).cast("long"),
            F.expr(
                # DECIMAL(38,0) products + integral DIV: exact past
                # 2^53 where double `/` rounds, and past 2^63 where
                # bigint products overflow.
                "CAST(CAST(CAST(CAST(__n_total AS DECIMAL(38,0))"
                f" * {budget_frac_ppm} DIV 1000000 AS DECIMAL(38,0))"
                " * __tgt DIV 1000000 AS DECIMAL(38,0))"
                f" * {BUCKETS} DIV n_domain AS BIGINT)"
            ),
        ).alias("thr"),
    )


def temperature_mix_targets(
    df: DataFrame,
    domain_col: str,
    temperature: float,
    scale_ppm: int = 1_000_000,
) -> dict[str, int]:
    """Derive a target mix from the corpus itself by temperature
    scaling: ``p_d ∝ n_d^T`` — the multilingual-LM mixing rule
    (T=1 keeps natural proportions, T=0 is uniform, 0<T<1 upweights
    rare domains without drowning common ones).  Returns integer ppm
    shares summing EXACTLY to ``scale_ppm`` via largest-remainder
    rounding (ties: larger remainder first, then domain name), so the
    dict feeds :func:`domain_mix_thresholds` deterministically — an
    oracle re-derives the identical integers from the same counts.
    One |domains|-row aggregate; the weights live driver-side."""
    rows = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n")
    ).collect()
    if not rows:
        return {}
    weights = {r["domain"]: float(r["n"]) ** temperature for r in rows}
    total = sum(weights.values())
    floors: dict[str, int] = {}
    rems: list[tuple[float, str]] = []
    for d, w in weights.items():
        exact = w / total * scale_ppm
        fl = int(exact)
        floors[d] = fl
        rems.append((exact - fl, d))
    leftover = scale_ppm - sum(floors.values())
    for _, d in sorted(rems, key=lambda t: (-t[0], t[1]))[:leftover]:
        floors[d] += 1
    return floors


def domain_mix_sample(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    target_ppm: dict[str, int],
    budget_frac_ppm: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministically subsample ``df`` toward a target domain mix.

    One tiny aggregate -> broadcast join -> scan-side hash filter.  The
    big side is never shuffled.
    """
    thr = domain_mix_thresholds(df, domain_col, target_ppm, budget_frac_ppm)
    return (
        df.join(
            F.broadcast(thr.withColumnRenamed("domain", domain_col)),
            domain_col,
        )
        .filter(sample_bucket(F.col(key_col), seed) < F.col("thr"))
        .drop("n_domain", "thr")
    )


def shuffle_order(key: Column, seed: int = 42) -> Column:
    """Deterministic global-shuffle sort key: full md5 hex of the
    seeded key.  ``df.orderBy(shuffle_order(...))`` is a reproducible
    'random' training order — a range-partitioned total sort, the
    plan Spark already does best, and identical on re-run (resumable
    training epochs without persisting an order table).

    DuckDB: ``md5('<seed>|' || CAST(k AS VARCHAR))``.
    """
    return F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string")))


def with_global_position(
    df: DataFrame,
    order_cols: list[str],
    pos_col: str = "pos",
) -> DataFrame:
    """Assign every row its 1-based position in the total order over
    ``order_cols`` — WITHOUT an unpartitioned window (which moves the
    whole table to one task; Spark even warns "No Partition Defined").

    The distributed zipWithIndex-as-DataFrame shape:

    1. ``repartitionByRange`` + ``sortWithinPartitions`` — Spark's
       native total-sort: range partition i holds keys strictly below
       partition i+1's, so ``spark_partition_id()`` ascends with the
       order.
    2. A window PARTITIONED by partition id ranks rows locally — each
       task ranks only its own slice.
    3. Per-partition row counts (a |partitions|-row aggregate) turn
       into offsets via a tiny triangular self-join (no window at all,
       so nothing in this plan is single-partition), broadcast back.

    ``pos = offset + local_rank``.  Deterministic when ``order_cols``
    form a unique key.  This is the epoch-order assignment a training
    pipeline runs over the full corpus — at 100 TB every stage here is
    parallel: the sort is the classic range-exchange, and the only
    driver-size data is the per-partition count list.
    """
    from pyspark.sql import Window

    parted = df.repartitionByRange(*order_cols).sortWithinPartitions(
        *order_cols
    )
    with_pid = parted.withColumn("__pid", F.spark_partition_id())
    w = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    local = with_pid.withColumn("__local", F.row_number().over(w).cast("long"))
    counts = local.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    earlier = counts.select(
        F.col("__pid").alias("__epid"), F.col("__n").alias("__en")
    )
    offsets = (
        counts.join(earlier, F.col("__epid") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__en"), F.lit(0)).alias("__offset"))
    )
    return (
        local.join(F.broadcast(offsets), "__pid")
        .withColumn(pos_col, (F.col("__offset") + F.col("__local")))
        .drop("__pid", "__local", "__offset")
    )


def es_key(key: Column, weight: Column, seed: int = 42) -> Column:
    """Efraimidis-Spirakis weighted-sampling rank key, deterministic.

    A-ES draws u ~ U(0,1) per item and ranks by u^(1/w); the top-k by
    that key is a weighted sample without replacement.  Here u comes
    from the repo's 60-bit md5 hash (``(h+1) / (2^60+1)`` — strictly
    inside (0,1)), so the 'randomness' is a pure function of
    (seed, key): reproducible across runs, engines, and partitionings.
    Ranking by ``ln(u)/w`` is the same order as ``u^(1/w)`` with one
    transcendental call instead of two.  (ln is the one operation here
    IEEE does not require correctly rounded; engines may differ in the
    last ulp.  Selection only flips if two items' keys straddle the
    k-boundary within ~1 ulp of each other — with hash-spread keys the
    chance is negligible, and the ORDER is the only float consumer: no
    float ever reaches the output.)

    DuckDB mirror:
      ln((('0x'||substr(md5('<seed>|'||k),1,15))::BIGINT + 1)
          / 1152921504606846977.0) / w
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), key.cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float((1 << 60) + 1))
    return F.log(u) / weight.cast("double")


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement: top-k rows
    by the A-ES key (ties broken by the key column).  Plans as
    TakeOrdered — per-partition partial top-k, k rows per partition
    shuffled to one merge — never a global sort, so it holds at any
    corpus size.  Heavier ``weight_col`` rows are proportionally more
    likely to survive; re-runs select the identical set.

    Precondition: weights must be strictly positive (w <= 0 yields a
    NULL/garbage rank key; both engines then sort it last, but the
    selection is no longer a weighted sample)."""
    kc = F.col(key_col)
    return (
        df.withColumn("__esk", es_key(kc, F.col(weight_col), seed))
        .orderBy(F.col("__esk").desc(), kc.asc())
        .limit(k)
        .drop("__esk")
    )


def stratified_fixed_k(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: rank rows inside
    each stratum by the seeded md5 of their key and keep the first k.
    Complements ``hash_sample`` (fraction-based, no per-group
    guarantee): this form gives every stratum the same budget no
    matter how skewed the stratum sizes are — the shape for building
    balanced eval slices.  One window over one shuffle on the stratum
    key; strata smaller than k keep all their rows."""
    from pyspark.sql import Window

    order = F.md5(
        F.concat_ws("|", F.lit(str(seed)), F.col(key_col).cast("string"))
    )
    w = Window.partitionBy(stratum_col).orderBy(order.asc(), F.col(key_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )
