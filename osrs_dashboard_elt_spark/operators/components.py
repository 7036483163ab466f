"""Connected components over near-duplicate pair edges.

Pair generators (``minhash_lsh_pairs``, ``simhash_pairs``,
``embedding_neardup_pairs``) emit EDGES; deduplication needs the
CLUSTERS those edges imply, with one canonical document kept per
cluster.  Spark has no built-in connected components (GraphFrames is
an external package), so this composes one from DataFrame ops — the
classic iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors' labels)

repeated until a fixpoint.  Each iteration is two hash joins + one
aggregate (edges are used in both directions); lineage is truncated
per iteration with ``localCheckpoint`` so the plan does not grow
across iterations (the standard Spark iterative-algorithm pattern —
without it iteration k replans k-deep).  Convergence needs at most
``diameter`` iterations; near-dup graphs are overwhelmingly tiny
cliques, so the loop usually exits after 2-3 rounds via the
``changed == 0`` check.  Deterministic: labels are ids, min is
order-free, so the final labeling is unique regardless of execution.

At 100 TB scale: each round shuffles (id, label) pairs — never
documents — and the hot "giant component" risk is bounded upstream by
the pair generators' hot-bucket caps.  (For truly adversarial graphs
the large-star/small-star variant halves round counts; min-label is
the right default for dedup graphs.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """Label every vertex with the MINIMUM vertex id reachable from it
    (the component id).  ``vertices`` may include isolated ids (they
    label themselves).  Returns (id, component).
    """
    both = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionByName(
        edges.select(
            F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
        )
    )
    both = both.localCheckpoint(eager=False)
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=False)

    for _ in range(max_iter):
        neighbor_min = (
            both.join(
                labels.select(
                    F.col("id").alias("dst"),
                    F.col("component").alias("n_comp"),
                ),
                "dst",
            )
            .groupBy("src")
            .agg(F.min("n_comp").alias("n_min"))
        )
        updated = (
            labels.join(
                neighbor_min.select(F.col("src").alias("id"), "n_min"),
                "id",
                "left",
            )
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("n_min"), F.col("component")) < F.col("component"))
                .cast("int")
                .alias("__chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = updated.agg(F.sum("__chg").alias("c")).collect()[0]["c"] or 0
        labels = updated.drop("__chg")
        if changed == 0:
            break
    else:
        # the loop NEVER converged: labels are still moving after
        # max_iter hops, so some component is mislabeled (split into
        # several).  Silent wrong answers here mean duplicates survive
        # dedup — fail loudly; diameter grows with chain-shaped
        # near-dup clusters, so raise max_iter (propagation is one
        # hop/iteration) or pre-collapse exact dups first.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise "
            "max_iter — the graph's diameter exceeds it"
        )
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, cluster_id, is_canonical) for every document: cluster_id =
    the component's minimum doc id; the canonical member is that
    minimum (keep-lowest-id, the deterministic dedup policy).  Feed
    ``pairs`` from any near-dup generator; documents with no pair are
    their own singleton cluster."""
    comp = connected_components(
        docs.select(F.col(id_col).alias("id")), pairs, "id", src_col, dst_col,
        max_iter=max_iter,
    )
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
