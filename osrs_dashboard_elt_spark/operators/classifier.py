"""Trained linear quality probe over document embeddings.

The modern quality-filter recipe (FineWeb-Edu, DCLM) is a small
regression head on frozen embeddings: cheap to train, cheap to apply
at corpus scale.  This is that head, Spark-shaped: full-batch
gradient descent on a least-squares objective, each iteration ONE
scan + one (d+1)-bounded aggregate — the weights live driver-side
(65 doubles) and are inlined into the next iteration's expression,
exactly how ``operators/kmeans.py`` handles centroids.

Why least squares and not logistic: the gradient is pure arithmetic
(no ``exp``), so the ENTIRE training trajectory stays inside the
repo's exact-replay discipline — per-row residual terms are doubles
both engines compute identically (identical IEEE folds on identical
operands), immediately cast to DECIMAL(28,12) (deterministic
rounding), summed as decimals (exact, order-independent), and the
one division + update per weight is IEEE on identical operands.  A
DuckDB oracle replays every intermediate weight vector bit-for-bit.
A sigmoid would stake that on ``Math.exp == libm exp`` — a much
bigger bet than the ``ln`` one ``operators/lm.py`` already makes.

Scale shape at 100 TB:

- training: K iterations = K scans (cache the projected features if
  memory allows); the shuffle per iteration carries (d+1) decimal
  sums per upstream partition — feature width, not corpus size,
  bounds it;
- scoring: one narrow scan-side expression, no shuffle, no Python;
- the model is 65 doubles — broadcast-by-literal, never a join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kmeans import valid_vec
from .similarity import _dlit, vd_cast

# decimal cast for gradient terms: 12 fractional digits, exact
# order-independent sums (the lm.py discipline)
_GRAD_DEC = "decimal(28,12)"


def _z_expr(weights: list[float], xs: list[str]) -> str:
    """The linear score as a left-fold literal expression:
    ``b + w1*x0 + w2*x1 + ...`` — the exact fold the oracle uses."""
    terms = [_dlit(weights[0])]
    terms += [f"{_dlit(w)} * {x}" for w, x in zip(weights[1:], xs)]
    return "(" + " + ".join(terms) + ")"


def _projected(df: DataFrame, vec_col: str, label_col: str | None,
               dim: int, id_col: str | None = None,
               ) -> tuple[DataFrame, list[str]]:
    """Rows that take part in training/scoring: valid vector, plus a
    non-null label when ``label_col`` is given (training).  Scoring
    passes ``label_col=None`` — the production corpus being filtered
    has no labels, and dropping unlabeled rows there would silently
    score nothing.  Elements are extracted once into scalar columns
    (the kmeans janino-hygiene trick)."""
    xs = [f"__x{d}" for d in range(dim)]
    cols = [F.col(id_col)] if id_col else []
    ycols = (
        [F.col(label_col).cast("double").alias("__y")] if label_col else []
    )
    base = df.select(
        *cols, vd_cast(vec_col).alias("__vd"), *ycols
    ).filter(valid_vec(dim))
    if label_col:
        base = base.filter(F.col("__y").isNotNull())
    return (
        base.select(
            "*",
            *[F.element_at(F.col("__vd"), d + 1).alias(xs[d]) for d in range(dim)],
        ),
        xs,
    )


def linear_probe_iterate(
    proj: DataFrame, xs: list[str], weights: list[float], lr: float
) -> list[float]:
    """One GD round: residual ``r = z - y`` per row, exact decimal
    gradient sums, IEEE update.  One scan, one (d+1)-bounded
    shuffle.

    Codegen hygiene (measured 4x on the scale probe): the weights ride
    in as a BROADCAST single-row frame rather than inlined literals,
    so every iteration of every fit reuses the same generated classes
    (literal weights made each round a fresh compile); and the
    residual gets its OWN projected column, so the aggregate's 65 sum
    expressions each stay a tiny method instead of one fused
    64-term-fold-times-65 body that janino refuses."""
    spark = proj.sparkSession
    wdf = spark.createDataFrame(
        [tuple(float(w) for w in weights)],
        ", ".join(
            ["__wb double"] + [f"__w{i} double" for i in range(len(xs))]
        ),
    )
    # same left fold as _z_expr: bias first, then one term per dim
    z = "(" + " + ".join(
        ["__wb"] + [f"__w{i} * {x}" for i, x in enumerate(xs)]
    ) + ")"
    withr = proj.crossJoin(F.broadcast(wdf)).withColumn(
        "__r", F.expr(f"({z} - __y)")
    )
    agg = withr.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.expr(f"CAST(__r AS {_GRAD_DEC})")).alias("__gb"),
        *[
            F.sum(F.expr(f"CAST(__r * {x} AS {_GRAD_DEC})")).alias(f"__g{i}")
            for i, x in enumerate(xs)
        ],
    ).collect()[0]
    n = agg["__n"]
    if n == 0:
        raise ValueError("linear_probe: no valid training rows")
    new = [weights[0] - lr * (float(agg["__gb"]) / n)]
    new += [
        w - lr * (float(agg[f"__g{d}"]) / n)
        for d, w in enumerate(weights[1:])
    ]
    return new


def linear_probe_fit(
    df: DataFrame,
    vec_col: str,
    label_col: str,
    dim: int,
    n_iter: int = 3,
    lr: float = 0.5,
    init: list[float] | None = None,
) -> list[float]:
    """Train ``[bias, w_1..w_dim]`` with ``n_iter`` full-batch GD
    rounds from a zero (or given) init.  Deterministic on any
    partitioning and bit-replayable in SQL."""
    proj, xs = _projected(df, vec_col, label_col, dim)
    w = list(init) if init is not None else [0.0] * (dim + 1)
    if len(w) != dim + 1:
        raise ValueError(f"init must have {dim + 1} weights, got {len(w)}")
    for _ in range(n_iter):
        w = linear_probe_iterate(proj, xs, w, lr)
    return w


def probe_score_expr(weights: list[float], xs: list[str]) -> Column:
    """The trained score through the repo-standard DECIMAL(28,6)
    cross-engine cast."""
    return F.expr(
        f"CAST(CAST({_z_expr(weights, xs)} AS DECIMAL(28,6)) AS DOUBLE)"
    )


#: feature names for :func:`text_probe_features`, in array order —
#: persisted next to the weights in the model registry
TEXT_PROBE_FEATURES = [
    "stopword_ratio",
    "punct_ratio",
    "log1p_tokens_over_10",
]


def text_probe_features(text_col: str) -> Column:
    """The scan-side feature vector the distilled corpus-pipeline
    quality gate trains on — ONE definition shared by training
    (scripts/run_corpus_pipeline.py) and serving (the streaming
    ingest), so a registry-loaded model scores exactly the values it
    was trained against."""
    from ..functions.text import quality_score_cols, token_count

    q = quality_score_cols(F.col(text_col))
    return F.array(
        q["stopword_ratio"],
        q["punct_ratio"],
        F.log1p(token_count(F.col(text_col)).cast("double")) / F.lit(10.0),
    )


def linear_probe_scores(
    df: DataFrame,
    vec_col: str,
    label_col: str | None,
    weights: list[float],
    id_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """(id, score, pred[, y]): scan-side scoring with the trained
    weights — prediction is ``z >= threshold`` on the RAW double (both
    engines hold identical z, so the boundary is safe).  Pass
    ``label_col=None`` for the production case (scoring an unlabeled
    corpus): no label filter, no ``y`` column — EVERY valid-vector
    row is scored."""
    dim = len(weights) - 1
    proj, xs = _projected(df, vec_col, label_col, dim, id_col=id_col)
    z = _z_expr(weights, xs)
    out = [
        F.col(id_col),
        probe_score_expr(weights, xs).alias("score"),
        F.expr(f"CAST({z} >= {_dlit(threshold)} AS INT)").alias("pred"),
    ]
    if label_col:
        out.append(F.col("__y").cast("int").alias("y"))
    return proj.select(*out)
