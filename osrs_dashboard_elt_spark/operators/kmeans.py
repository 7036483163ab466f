"""Distributed Lloyd's k-means over an embedding column.

The IVF ANN path (`operators/similarity.py::ivf_assign`) partitions
vectors by nearest CENTROID — until now the centroids were a
deterministic sample.  This trains them properly: classic Lloyd's,
Spark-shaped —

- centroids live driver-side (k x d doubles — tiny) and are inlined
  into the assignment expression each round, exactly how the
  hyperplane/centroid fragments in `similarity.py` already work
  (broadcast-by-literal; no Python in the scan);
- each iteration is ONE scan + one bounded shuffle: the per-(cell,
  dim) sums partial-aggregate map-side, so the exchange carries at
  most k*d rows per upstream partition regardless of data size;
- the update is EXACT: float32-origin elements integerize exactly
  via a power-of-two scale (x * 2^50, an exponent shift), sum as
  DECIMAL integers (order-independent), and scale back exactly — one
  IEEE division per (cell, dim) is the only rounding, so a DuckDB
  oracle reproduces every centroid bit-for-bit, iteration by
  iteration, and so does any re-run on any partitioning.

At 100 TB: K iterations = K scan jobs (cache the projected vector
column once if memory allows); the shuffle is k*d*partitions rows of
decimals — centroid count, not data size, bounds it.  Init is a
deterministic hash-order sample (md5 of the id, seeded) — k-means++
would cost k more scans for usually-nicer seeds; the hash pick keeps
init reproducible everywhere, which the oracle needs.

Assignment ties (exactly equidistant centroids) resolve to the
smallest cell index, matching the oracle's (score DESC, cell ASC)
window rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import _dlit, plane_dot_sql, vd_cast


def valid_vec(dim: int, col: str = "__vd"):
    """The shared validity predicate over a projected vector column:
    non-null array, exact length, and NO null ELEMENTS — an element
    null makes every score term NULL, so the assignment cell would be
    NULL (crashing the fit's ``new[cell]`` update and silently
    diverging downstream consumers from their SQL oracles)."""
    return (
        F.col(col).isNotNull()
        & (F.size(col) == dim)
        & F.forall(col, lambda x: x.isNotNull())
    )


def _half_sq_norm(c: list[float]) -> float:
    """0.5 * |c|^2 as the exact left-fold python double — the same
    fold order as ``plane_dot_sql(c, c)`` so both engines agree."""
    acc = 0.0
    for x in c:
        acc = acc + x * x
    return 0.5 * acc


def kmeans_init(
    df: DataFrame, vec_col: str, k: int, id_col: str, seed: int = 0
) -> list[list[float]]:
    """Deterministic pseudo-random init: the k vectors whose
    md5(seed || id) sorts smallest.  Reproducible on any engine that
    has md5 — which is what lets the oracle replay training."""
    rows = (
        df.select(
            F.md5(F.concat(F.lit(str(seed) + ":"), F.col(id_col).cast("string"))).alias(
                "__h"
            ),
            vd_cast(vec_col).alias("__vd"),
        )
        # a NULL vector (or one carrying null ELEMENTS) must not
        # become a seed centroid; wrong-LENGTH vectors are dropped
        # downstream once dim is fixed by the picks
        .filter(
            F.col("__vd").isNotNull()
            & F.forall("__vd", lambda x: x.isNotNull())
        )
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    return [[float(x) for x in r["__vd"]] for r in rows]


# Exact integerization of float32-origin doubles: x * 2^50 is an
# integer whenever |x| >= 2^-27 (24-bit mantissa, exponent >= -27);
# the multiply is a pure exponent shift (exact), the DECIMAL(38,0)
# sum is integer arithmetic (order-independent), and the scale-back
# by 2^-50 is again exact — so a centroid mean incurs exactly ONE
# IEEE rounding (the division), identical in any engine and under
# any partitioning.  kmeans_fit validates the magnitude floor.
_SCALE_UP = 2.0**50
_SCALE_DOWN = 2.0**-50
_MIN_EXACT_ABS = 2.0**-27


def kmeans_iterate(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    floor_out: dict | None = None,
) -> list[list[float]]:
    """One Lloyd's round: assign to the nearest current centroid, then
    exact element means per cell (integerized sums).  Empty cells
    keep their old centroid.  One scan, one k*d-bounded shuffle.

    NULL, wrong-length, or null-element vectors take no part in
    training (a NULL assignment would otherwise surface as a
    ``new[None]`` TypeError mid-fit — the scores array over any
    invalid vector is NULL).

    ``floor_out``: when a dict is passed, the round's aggregate ALSO
    computes the global min |nonzero element| (the exact-mean
    magnitude guard) and stores it under ``floor_out["floor"]`` —
    the fit folds its validation scan into round 1 this way instead
    of paying a separate full pass (round 13; guide §1.2: don't add
    passes the pipeline already makes)."""
    dim = len(centroids[0])
    assigned = _with_cell(
        df.select(vd_cast(vec_col).alias("__vd")).filter(valid_vec(dim)),
        centroids,
    )
    floor_cols = []
    if floor_out is not None:
        # min over the row's nonzero |elements| (NULL when none), then
        # MIN-aggregated per cell — rides the same scan + exchange
        floor_cols = [
            F.min(
                F.array_min(
                    F.transform(
                        F.col("__vd"),
                        lambda x: F.when(x != 0.0, F.abs(x)),
                    )
                )
            ).alias("__floor")
        ]
    # one aggregate row per cell, one sum column per dim: no row
    # amplification (vs posexplode'ing dim x rows through the agg)
    # and the exchange carries k rows x (dim+1) columns per partition
    agg_df = (
        assigned.groupBy("__cell")
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *floor_cols,
            *[
                F.sum(
                    (
                        F.element_at(F.col("__vd"), d + 1) * F.lit(_SCALE_UP)
                    ).cast("decimal(38,0)")
                ).alias(f"__s{d}")
                for d in range(dim)
            ],
        )
        .select(
            "__cell",
            *(["__floor"] if floor_cols else []),
            *[
                (
                    (F.col(f"__s{d}").cast("double") / F.col("__n"))
                    * F.lit(_SCALE_DOWN)
                ).alias(f"__m{d}")
                for d in range(dim)
            ],
        )
    )
    # NOTE: at k*dim >= ~512 the fused project+agg overflows janino's
    # method limit — Spark logs one "Failed to compile" and falls
    # back to interpreted evaluation for the stage.  Correctness is
    # unaffected; the fixed per-iteration planning cost dominates at
    # test scale either way (SCALE.md "serialized expression trees").
    stats = agg_df.collect()
    if floor_out is not None:
        floors = [r["__floor"] for r in stats if r["__floor"] is not None]
        floor_out["floor"] = min(floors) if floors else None
    new = [list(c) for c in centroids]  # empty cells keep old
    for r in stats:
        new[r["__cell"]] = [float(r[f"__m{d}"]) for d in range(dim)]
    return new


# centroids per scores-array chunk: each chunk expression carries
# ~(this * dim) multiply-adds — 512 terms is the measured-safe size
# for janino's per-method bytecode limit (the k=8, dim=64 path)
_CHUNK_TERMS = 512


def _with_cell(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Append ``__cell`` to a frame carrying ``__vd``: first-index-at-
    max over the score expressions — smallest index wins ties,
    matching the oracle's (score DESC, cell ASC) rank.

    Scores live in CHUNKED arrays of <= ~512 terms each, so every
    generated method stays under janino's size limit at ANY k (a
    single k*dim array fails compilation past ~512 terms, and Spark
    then pays an expensive failed-compile + interpreted fallback per
    stage — measured 3x wall on a k=32, dim=64 assignment).  The
    argmax is a CASE over per-chunk maxes: first chunk holding the
    global max, first position within it — the same
    first-index-at-max rule as the single-array form.  Each chunk
    column and the global max get their OWN projection and are
    referenced more than once downstream, so CollapseProject keeps
    them materialized instead of re-fusing one giant expression."""
    dim = len(centroids[0])
    # extract each element ONCE into a scalar column: element_at
    # generates bounds-check + error-branch code, so referencing the
    # array 8x per dim bloats the fused method past janino's limit —
    # extracted attrs are plain locals and CollapseProject keeps the
    # extraction separate (non-cheap expr, referenced k times)
    xs = [f"__x{d}" for d in range(dim)]
    extracted = df.select(
        "*",
        *[
            F.element_at(F.col("__vd"), d + 1).alias(xs[d])
            for d in range(dim)
        ],
    )

    def score(c: list[float]) -> str:
        terms = " + ".join(
            f"{xs[d]} * {_dlit(v)}" for d, v in enumerate(c)
        )
        return f"({_dlit(0.0)} + {terms} - {_dlit(_half_sq_norm(c))})"

    per = max(1, _CHUNK_TERMS // dim)
    if len(centroids) <= per:
        arr = "ARRAY(" + ", ".join(score(c) for c in centroids) + ")"
        return (
            extracted.withColumn("__scores", F.expr(arr))
            .withColumn(
                "__cell",
                F.expr(
                    "CAST(array_position(__scores, array_max(__scores)) - 1 AS INT)"
                ),
            )
            .drop("__scores", *xs)
        )
    groups = [
        centroids[i : i + per] for i in range(0, len(centroids), per)
    ]
    sc = [f"__sc{g}" for g in range(len(groups))]
    chunked = extracted.select(
        "*",
        *[
            F.expr(
                "ARRAY(" + ", ".join(score(c) for c in grp) + ")"
            ).alias(sc[g])
            for g, grp in enumerate(groups)
        ],
    )
    best = "greatest(" + ", ".join(f"array_max({c})" for c in sc) + ")"
    case = (
        "CASE "
        + " ".join(
            f"WHEN array_max({c}) = __best THEN "
            f"CAST({g * per} + array_position({c}, __best) - 1 AS INT)"
            for g, c in enumerate(sc)
        )
        + " END"
    )
    return (
        chunked.withColumn("__best", F.expr(best))
        .withColumn("__cell", F.expr(case))
        .drop("__best", *sc, *xs)
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    n_iter: int = 3,
    id_col: str = "vec_id",
    seed: int = 0,
    init: list[list[float]] | None = None,
    check_floor: bool = True,
) -> list[list[float]]:
    """Train k centroids with ``n_iter`` Lloyd's rounds.  Returns the
    final centroids (driver-side floats, ready to hand to
    ``ivf_assign``/``write_ivf_index`` after unit-normalizing if the
    index uses dot-product cells).  ``check_floor=False`` skips the
    exact-mean magnitude guard — for callers that already validated
    the SAME elements (e.g. ``pq_train`` checks the full vector once
    instead of paying one check per subspace slice).  The guard no
    longer costs its own corpus scan: it rides round 1's aggregate
    (round 13) and raises before any trained centroid is returned —
    the training rows a bad corpus would corrupt are exactly the rows
    the folded guard inspects."""
    if n_iter < 1 and check_floor:
        raise ValueError(
            "kmeans_fit: check_floor requires n_iter >= 1 (the guard "
            "rides round 1's aggregate)"
        )
    cents = init if init is not None else kmeans_init(df, vec_col, k, id_col, seed)
    if len(cents) < k:
        raise ValueError(f"need >= {k} vectors to init, got {len(cents)}")
    floor_out: dict | None = {} if check_floor else None
    for i in range(n_iter):
        cents = kmeans_iterate(
            df, vec_col, cents, floor_out=floor_out if i == 0 else None
        )
        if i == 0 and floor_out is not None:
            floor = floor_out.get("floor")
            if floor is not None and floor < _MIN_EXACT_ABS:
                raise ValueError(
                    f"kmeans_fit exact-mean contract: nonzero |element| "
                    f"{floor!r} < 2^-27 — x*2^50 would not be an integer "
                    "and the centroid means would pick up "
                    "engine-dependent rounding.  Rescale the embeddings "
                    "(or lower _SCALE_UP)."
                )
    return cents


def kmeans_assignments(
    df: DataFrame,
    vec_col: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cell) for the given centroids — the scan-side expression
    IVF uses, exposed for the final labeling pass.  Invalid vectors
    (NULL, wrong length, null elements) are dropped, matching the
    training-pass contract."""
    dim = len(centroids[0])
    return _with_cell(
        df.select(F.col(id_col), vd_cast(vec_col).alias("__vd")).filter(
            valid_vec(dim)
        ),
        centroids,
    ).select(F.col(id_col), F.col("__cell").alias("cell"))
