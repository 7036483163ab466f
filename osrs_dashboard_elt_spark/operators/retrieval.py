"""Hybrid retrieval: reciprocal-rank fusion of heterogeneous rankers.

Sparse (BM25) and dense (embedding cosine) retrieval disagree on
scale and distribution, so scores can't be averaged — RRF fuses the
RANKS instead: ``rrf(d) = sum_i 1/(k + rank_i(d))`` over the rankers
that returned d (Cormack et al.'s parameter-robust k=60 default).

Scale shape: each ranker has already truncated to its top-N
candidates (TakeOrdered / index probe — bounded, tiny), so
everything here — the rank windows, the outer-join chain, the final
top — runs on a few dozen rows regardless of corpus size.  The
expensive part IS the rankers, and they stay untouched.

Determinism: ranks are integers from (score DESC, id ASC) windows;
each contribution is one IEEE division of exact integers; the sum
adds the rankers in argument order — bit-identical in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    score_col: str = "score",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Fuse named candidate lists [(name, df)] — each df carrying
    (id_col, score_col), higher-better, ALREADY truncated — into
    (id, rrf_score, <name>_rank ...), best first, ties to smaller id.

    A document absent from a ranker contributes nothing for it (its
    <name>_rank is NULL), the standard RRF treatment of truncated
    lists.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    fused: DataFrame | None = None
    for name, df in rankings:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        ranked = df.select(
            F.col(id_col),
            F.row_number().over(w).cast("long").alias(f"{name}_rank"),
        )
        fused = (
            ranked
            if fused is None
            else fused.join(ranked, id_col, "full_outer")
        )
    contribs = [
        F.coalesce(
            F.lit(1.0) / (F.lit(float(k)) + F.col(f"{name}_rank")),
            F.lit(0.0),
        )
        for name, _ in rankings
    ]
    rrf = contribs[0]
    for c in contribs[1:]:
        rrf = rrf + c
    return (
        fused.select(
            id_col,
            rrf.alias("rrf_score"),
            *[F.col(f"{name}_rank") for name, _ in rankings],
        )
        .orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
        .limit(top)
    )
