"""Product quantization (PQ) for compressed ANN over embeddings.

Jégou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011): split each d-dim vector into ``m`` contiguous
subvectors, train an independent k-codeword codebook per subspace
(plain Lloyd's — ``operators/kmeans.py`` already trains those with a
bit-replayable trajectory), and store each vector as ``m`` small
codes.  A 64-dim float32 embedding (256 B) becomes 4 bytes at
``m=4, k<=256`` — the difference between an embedding corpus that
fits in cluster memory and one that doesn't.  Search is asymmetric
distance computation (ADC): the query is NOT quantized; a tiny
``m x k`` lookup table of ``dot(q_j, codeword)`` partials is built
driver-side and inlined into a scan expression, so scoring a code is
``m`` array lookups + ``m-1`` adds — no vector math touches the scan.

Spark shape:

- training: ``m`` independent :func:`~.kmeans.kmeans_fit` runs over
  SLICES of the same projected vector column — each is K scans with a
  k*subdim-bounded shuffle; the slices never materialize as tables;
- encoding: ONE narrow pass — all ``m`` cell assignments are
  scan-side chunked-codegen expressions (``kmeans._with_cell``), no
  shuffle, output is (id, array<int> codes);
- search: one scan of the CODES table (m ints/row, not d floats),
  LUT lookups inlined as literals, ``TakeOrderedAndProject`` top-k —
  the full-precision vectors are never read at query time.

Exactness contract (what lets a DuckDB oracle replay all of it):
subspace training inherits the kmeans decimal-sum/IEEE-divide
guarantee, so codebooks match bit-for-bit; assignments are the same
first-index-at-max rule both sides; the ADC score is a left-fold sum
of ``m`` doubles both engines compute on identical operands, compared
through the repo-standard DECIMAL(28,6) cast.

At 100 TB: codes are ~1.6% of the raw embedding bytes, so the ADC
scan reads 60x less; compose with IVF (assign codes WITHIN
centroid cells and partition the codes table by cell —
``write_pq_index(..., partition_cols=["cell"])``) for
partition-pruned probes that read only nprobe/k of that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .kmeans import _with_cell, kmeans_fit
from .similarity import _dlit, vd_cast


def _fold_dot(a, b) -> float:
    """Left-fold dot product starting at 0.0 — the exact fold order of
    ``plane_dot_sql`` / DuckDB ``list_dot_product``, so a LUT entry
    computed here is bit-identical to the oracle's join-side dot."""
    acc = 0.0
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def pq_train(
    df: DataFrame,
    vec_col: str,
    m: int,
    k: int,
    n_iter: int = 2,
    id_col: str = "vec_id",
    seed: int = 0,
    dim: int | None = None,
) -> list[list[list[float]]]:
    """Train ``m`` subspace codebooks of ``k`` codewords each.
    Returns ``codebooks[j][c]`` = codeword ``c`` of subspace ``j``
    (driver-side floats — m*k*subdim doubles, tiny).  ``dim`` defaults
    to the first valid vector's length and must be divisible by
    ``m``."""
    if dim is None:
        probe = (
            df.select(vd_cast(vec_col).alias("__vd"))
            .filter(F.col("__vd").isNotNull())
            .select(F.size("__vd").alias("n"))
            .limit(1)
            .collect()
        )
        if not probe:
            raise ValueError("pq_train: no non-null vectors")
        dim = int(probe[0]["n"])
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    sub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sliced = df.select(
            F.col(id_col),
            F.slice(vd_cast(vec_col), j * sub + 1, sub).alias("__subv"),
        )
        books.append(
            kmeans_fit(
                sliced, "__subv", k, n_iter=n_iter, id_col=id_col, seed=seed
            )
        )
    return books


def pq_encode(
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """(id, codes) — ``codes[j]`` is the nearest codeword index in
    subspace ``j`` (first-index-at-max tie rule, same as kmeans).
    One narrow scan-side pass: every assignment is an inlined
    expression, nothing shuffles.  Invalid vectors (NULL, wrong
    length, null elements) are dropped, matching the training
    contract."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    dim = m * sub
    out = df.select(F.col(id_col), vd_cast(vec_col).alias("__full")).filter(
        F.col("__full").isNotNull()
        & (F.size("__full") == dim)
        & F.forall("__full", lambda x: x.isNotNull())
    )
    ccols = []
    for j, cb in enumerate(codebooks):
        out = _with_cell(
            out.withColumn("__vd", F.slice("__full", j * sub + 1, sub)), cb
        ).withColumnRenamed("__cell", f"__c{j}").drop("__vd")
        ccols.append(f"__c{j}")
    return out.select(
        F.col(id_col), F.array(*ccols).alias(codes_col)
    )


def adc_score_expr(
    codebooks: list[list[list[float]]],
    query: list[float],
    codes_col: str = "codes",
):
    """The ADC score as ONE Column expression: per subspace, the
    ``dot(q_j, codeword)`` partials become an inlined literal array
    indexed by the stored code; the total is the left-fold sum of the
    ``m`` lookups.  Cast through DECIMAL(28,6) — the repo-standard
    cross-engine score comparison."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    terms = []
    for j, cb in enumerate(codebooks):
        qj = query[j * sub : (j + 1) * sub]
        lut = [_fold_dot(qj, cw) for cw in cb]
        arr = "ARRAY(" + ", ".join(_dlit(v) for v in lut) + ")"
        terms.append(
            f"element_at({arr}, element_at({codes_col}, {j + 1}) + 1)"
        )
    z = " + ".join(terms)
    return F.expr(f"CAST(CAST(({z}) AS DECIMAL(28,6)) AS DOUBLE)")


def pq_adc_topk(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int,
    id_col: str = "vec_id",
    codes_col: str = "codes",
) -> DataFrame:
    """Top-k by ADC score over an encoded table.  The plan is a scan
    of (id, m ints) + a TakeOrderedAndProject — per-partition heaps,
    no global sort, and the raw vectors are never touched."""
    return (
        codes.select(
            F.col(id_col),
            adc_score_expr(codebooks, query, codes_col).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def write_pq_index(
    spark: SparkSession,
    df: DataFrame,
    vec_col: str,
    codebooks: list[list[list[float]]],
    path: str,
    id_col: str = "vec_id",
    partition_cols: list[str] | None = None,
) -> None:
    """Materialize the encoded table (the at-rest PQ index).  Pass
    ``partition_cols`` (e.g. an IVF cell column already on ``df``) to
    make probes partition-pruned scans."""
    enc = pq_encode(df, vec_col, codebooks, id_col=id_col)
    keep = [id_col, "codes"] + (partition_cols or [])
    if partition_cols:
        enc = enc.join(
            df.select(id_col, *partition_cols), id_col, "inner"
        )
    w = enc.select(*keep).write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def pq_adc_topk_at_rest(
    spark: SparkSession,
    path: str,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Search a written PQ index: the scan reads only the code bytes
    (column pruning drops everything else at the parquet reader)."""
    return pq_adc_topk(
        spark.read.parquet(path), codebooks, query, k, id_col=id_col
    )
