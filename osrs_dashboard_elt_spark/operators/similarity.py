"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the standard ANN playbook:

- ``cosine_topk``: brute-force exact top-k — a single scan with the
  score as a JVM column expression (``zip_with`` + left-fold
  ``aggregate``; no Python in the hot path) followed by a top-k.  At
  100 TB this is the per-partition map side of a TakeOrdered — Spark
  computes partial top-k per partition and merges on the driver, so the
  shuffle is k rows per partition, not the data.

- ``lsh_ann_topk``: random-hyperplane (sign) LSH — bucket vectors by
  the sign pattern of ``n_planes`` fixed hyperplanes, probe only the
  query's bucket, exact-rank within it.  Hyperplanes come from a seeded
  RNG (``hyperplanes``) so an external oracle can reproduce bucketing
  exactly.  The scale path: bucketing is scan-side, the probe touches
  ~1/2^n_planes of the data, and multi-probe (flip one bit) trades
  recall for cost.

Determinism contract: dot products are LEFT FOLDS over index order with
elements cast to double first — DuckDB's ``list_reduce`` over the same
values produces bit-identical doubles, so results survive a value-hash
comparison (scores additionally rounded to 6 decimals).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_raw(a: Column, b: Column) -> Column:
    """Left-fold dot product of two arrays ALREADY cast to double."""
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two numeric arrays (double)."""
    return dot_raw(_as_double(a), _as_double(b))


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k rows by cosine similarity to a literal query vector.

    Ties broken by id for determinism.  Score rounded to 6 decimals.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.withColumn(
        "score", cosine(F.col(vec_col), q).cast("decimal(28,6)").cast("double")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score")
    )


def hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """Deterministic Rademacher (+/-1) hyperplanes; inline the same
    literals into a SQL oracle for cross-engine parity."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket_raw(vecd: Column, planes: list[list[int]]) -> Column:
    """Sign-LSH bucket id over a pre-cast double array: bit j set iff
    dot(vec, plane_j) > 0."""
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(
            dot_raw(vecd, p) > 0, F.lit(2**j).cast("long")
        ).otherwise(F.lit(0))
    return bucket


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-LSH bucket id: bit j set iff dot(vec, plane_j) > 0."""
    return lsh_bucket_raw(_as_double(vec), planes)


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.25,
    n_planes: int = 4,
    seed: int = 42,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-blocked.

    Scale path for near-dup detection over embeddings: bucket every
    vector by sign-LSH (scan-side column expression), self-join ONLY
    within buckets (equi-join — shuffle on the bucket key instead of a
    cross join), exact cosine on the surviving ~1/2^n_planes pairs.
    Returns (id_a, id_b, score) with id_a < id_b, score rounded to 6
    decimals.  Replaces the all-pairs O(n^2) scan the reference-style
    pandas approach would need.
    """
    planes = hyperplanes(n_planes, dim, seed)
    # Stage per-VECTOR work before the pair join: the double-cast array
    # and its norm are computed once per vector here; scoring a pair is
    # then ONE zip_with fold + a division.  (Inlining cosine() on the
    # pair would recompute both norms — two extra array folds — for
    # every candidate pair.)
    vecd = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vd")
    )
    b = vecd.select(
        "id",
        "vd",
        F.sqrt(dot_raw(F.col("vd"), F.col("vd"))).alias("nrm"),
        lsh_bucket_raw(F.col("vd"), planes).alias("bucket"),
    )
    left = b.select(
        F.col("id").alias("id_a"), F.col("vd").alias("vd_a"), F.col("nrm").alias("n_a"), "bucket"
    )
    right = b.select(
        F.col("id").alias("id_b"), F.col("vd").alias("vd_b"), F.col("nrm").alias("n_b"), "bucket"
    )
    pairs = left.join(right, "bucket").filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.withColumn(
        "score",
        (dot_raw(F.col("vd_a"), F.col("vd_b")) / (F.col("n_a") * F.col("n_b")))
        .cast("decimal(28,6)")
        .cast("double"),
    )
    return scored.filter(F.col("score") >= threshold).select("id_a", "id_b", "score")


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: exact cosine rank within the query's LSH
    bucket only.  Returns (id, score, bucket)."""
    planes = hyperplanes(n_planes, len(query), seed)
    qb = 0
    for j, plane in enumerate(planes):
        if sum(p * v for p, v in zip(plane, query)) > 0:
            qb |= 1 << j
    q = F.array(*[F.lit(float(x)) for x in query])
    bucketed = df.withColumn(
        "bucket", lsh_bucket(F.col(vec_col), planes)
    ).filter(F.col("bucket") == qb)
    scored = bucketed.withColumn(
        "score", cosine(F.col(vec_col), q).cast("decimal(28,6)").cast("double")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score", "bucket")
    )


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids_norm: list[list[float]],
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF cell assignment: cell = argmin-index among max-dot centroids.

    ``centroids_norm`` are UNIT-NORM centroid vectors (normalize driver
    side) — argmax dot(v, c/|c|) == argmax cosine(v, c) because |v| is
    a common positive factor.  Ties resolve to the smallest centroid
    index via first-match-at-max, which an external SQL oracle can
    reproduce with GREATEST + a CASE chain over identical doubles.

    Scale shape: assignment is scan-side (C folds per row, no shuffle);
    the cell column then partitions/clusters the table so a probe scans
    only ``nprobe/C`` of the data.  At 100 TB the centroid list comes
    from a k-means(sample) job and is broadcast; a fixed deterministic
    pick keeps this oracle-checkable.
    """
    vd = _as_double(F.col(vec_col))
    staged = df.select("*", vd.alias("__vd"))
    scores = [
        dot_raw(F.col("__vd"), F.array(*[F.lit(float(x)) for x in c])).alias(
            f"__s{i}"
        )
        for i, c in enumerate(centroids_norm)
    ]
    staged = staged.select("*", *scores)
    m = F.greatest(*[F.col(f"__s{i}") for i in range(len(centroids_norm))])
    cell = None
    for i in range(len(centroids_norm)):
        cond = F.col(f"__s{i}") == m
        cell = F.when(cond, i) if cell is None else cell.when(cond, i)
    out = staged.select(
        *[c for c in df.columns], cell.cast("int").alias("cell")
    )
    return out


def ivf_ann_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    centroids_norm: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` cells nearest the
    query (computed driver-side), exact cosine rank within them.
    Returns (id, score, cell)."""
    qscores = [
        sum(float(v) * float(c) for v, c in zip(query, cn))
        for cn in centroids_norm
    ]
    best = max(qscores)
    order = sorted(range(len(qscores)), key=lambda i: (-qscores[i], i))
    probe = order[:nprobe]

    assigned = ivf_assign(df, vec_col, centroids_norm, id_col)
    q = F.array(*[F.lit(float(x)) for x in query])
    hits = assigned.filter(F.col("cell").isin(probe))
    scored = hits.withColumn(
        "score", cosine(F.col(vec_col), q).cast("decimal(28,6)").cast("double")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score", "cell")
    )


def query_bucket(query: list[float], planes: list[list[int]]) -> int:
    """Driver-side sign-LSH bucket of a literal query vector — the
    same bit rule as :func:`lsh_bucket` (bit j set iff dot > 0)."""
    qb = 0
    for j, plane in enumerate(planes):
        if sum(p * v for p, v in zip(plane, query)) > 0:
            qb |= 1 << j
    return qb


def write_lsh_index(
    df: DataFrame,
    path: str,
    vec_col: str,
    n_planes: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> None:
    """Materialize an embedding table AT REST partitioned by its
    sign-LSH bucket: ``path/bucket=<b>/part-*.parquet``.

    This is the scale story for LSH probes: ``lsh_ann_topk`` over a
    flat table must scan every row to compute its bucket before it
    can discard it; against this layout the probe's ``bucket = qb``
    predicate becomes a PARTITION filter, so Spark lists (and reads)
    only ~1/2^n_planes of the files — the same at-rest contract as
    the IVF ``cell`` column (see ``ivf_assign``).  Repartitioning by
    bucket before the write keeps it to one file per bucket per
    shuffle partition rather than (input partitions x buckets) small
    files.
    """
    sample = df.select(F.size(F.col(vec_col)).alias("d")).first()
    d = dim if dim is not None else int(sample["d"])
    planes = hyperplanes(n_planes, d, seed)
    bucketed = df.withColumn("bucket", lsh_bucket(F.col(vec_col), planes))
    (
        bucketed.repartition("bucket")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(path)
    )


def lsh_ann_topk_at_rest(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    n_planes: int = 4,
    seed: int = 42,
    multi_probe: bool = False,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a :func:`write_lsh_index` table: partition-pruned scan of
    the query's bucket (plus all Hamming-distance-1 buckets when
    ``multi_probe`` — the standard recall/cost dial), exact cosine
    rank within.  Same (id, score, bucket) surface as
    ``lsh_ann_topk``; identical results on the same data/planes by
    construction, since the bucket rule is the one function.
    """
    planes = hyperplanes(n_planes, len(query), seed)
    qb = query_bucket(query, planes)
    probes = [qb] + (
        [qb ^ (1 << j) for j in range(n_planes)] if multi_probe else []
    )
    df = spark.read.parquet(path).filter(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.withColumn(
        "score", cosine(F.col(vec_col), q).cast("decimal(28,6)").cast("double")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score", F.col("bucket").cast("long").alias("bucket"))
    )


def write_ivf_index(
    df: DataFrame,
    path: str,
    vec_col: str,
    centroids_norm: list[list[float]],
    id_col: str = "vec_id",
) -> None:
    """Materialize an embedding table AT REST partitioned by its IVF
    cell: ``path/cell=<c>/part-*.parquet`` — the cell-column contract
    ``ivf_assign`` documents, made physical.  A probe's
    ``cell IN (nprobe cells)`` predicate becomes a PARTITION filter,
    so Spark lists only ~nprobe/C of the files; same layout story as
    :func:`write_lsh_index`, with the cell list coming from k-means
    centroids instead of random hyperplanes."""
    assigned = ivf_assign(df, vec_col, centroids_norm, id_col)
    (
        assigned.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def ivf_ann_topk_at_rest(
    spark,
    path: str,
    query: list[float],
    centroids_norm: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a :func:`write_ivf_index` table: partition-pruned scan of
    the ``nprobe`` cells nearest the query (ranked driver-side exactly
    like ``ivf_ann_topk``), exact cosine rank within.  Identical
    results to the flat-table form on the same data/centroids — the
    assignment rule is the one function."""
    qscores = [
        sum(float(v) * float(c) for v, c in zip(query, cn))
        for cn in centroids_norm
    ]
    order = sorted(range(len(qscores)), key=lambda i: (-qscores[i], i))
    probe = order[:nprobe]
    df = spark.read.parquet(path).filter(F.col("cell").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query])
    scored = df.withColumn(
        "score", cosine(F.col(vec_col), q).cast("decimal(28,6)").cast("double")
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "score", F.col("cell").cast("int").alias("cell"))
    )
