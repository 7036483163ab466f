"""Connected components over near-duplicate pair edges.

Pair generators (``minhash_lsh_pairs``, ``simhash_pairs``,
``embedding_neardup_pairs``) emit EDGES; deduplication needs the
CLUSTERS those edges imply, with one canonical document kept per
cluster.  Spark has no built-in connected components (GraphFrames is
an external package), so this composes one from DataFrame ops — the
classic iterative min-label propagation:

    label(v) <- min(label(v), min over neighbors' labels)

repeated until a fixpoint, ACCELERATED with a pointer-shortcut step
(path halving, the Shiloach-Vishkin / large-star idea)::

    label(v) <- label(label(v))

after every propagation hop.  The hop alone needs ``diameter``
rounds; hop+shortcut roughly doubles the distance each label has
travelled toward its component minimum per round, so a diameter-D
chain converges in O(log D) rounds (measured: a 1000-vertex chain
converges in 10 rounds; see tests/test_round3_ops.py).  Each round is
three hash joins + one aggregate, all over (id, label) pairs; lineage
is truncated per iteration with ``localCheckpoint`` so the plan does
not grow across iterations (the standard Spark iterative-algorithm
pattern — without it iteration k replans k-deep).  Near-dup graphs
are overwhelmingly tiny cliques, so the loop usually exits after 2-3
rounds via the ``changed == 0`` check.  Deterministic: labels are
ids, min is order-free and the shortcut only follows min-pointers, so
the final labeling is unique regardless of execution order.

At 100 TB scale: each round shuffles (id, label) pairs — never
documents — and the hot "giant component" risk is bounded upstream by
the pair generators' hot-bucket caps.
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
    stats: dict | None = None,
) -> DataFrame:
    """Label every vertex with the MINIMUM vertex id reachable from it
    (the component id).  ``vertices`` may include isolated ids (they
    label themselves).  Edge endpoints absent from ``vertices`` are
    ignored.  Returns (id, component).  When ``stats`` is passed, the
    executed round count is written to ``stats["iterations"]``.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    # truncate the CALLER's edge lineage once before mirroring: the
    # two union branches below would otherwise each re-derive it (a
    # pair generator — LSH join + dedup — is the typical input, and
    # re-deriving it per branch doubles the pre-loop WORK; on an
    # under-loaded local box the two branches merely ran in parallel,
    # but a saturated cluster pays both).  `both` itself is NOT
    # checkpointed: mirroring a materialized RDD is a trivial
    # re-plan per iteration, and a second checkpoint here would add a
    # sequential materialization barrier before the first round
    # (measured: the two-checkpoint form regressed the crossmodal
    # clusters query ~20%).
    e0 = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=False)
    both = e0.unionByName(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = vertices.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    ).localCheckpoint(eager=False)

    for it in range(1, max_iter + 1):
        if stats is not None:
            stats["iterations"] = it
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
        hopped = (
            labels.join(
                neighbor_min.select(F.col("src").alias("id"), "n_min"),
                "id",
                "left",
            )
            .select(
                "id",
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce(F.col("n_min"), F.col("component"))
                ).alias("component"),
            )
            # hopped feeds BOTH sides of the shortcut self-join below —
            # truncate here so the branch is not recomputed per side
            .localCheckpoint(eager=False)
        )
        # Shortcut (path halving): component <- hopped[component].
        # Labels are monotonically non-increasing vertex ids, so
        # following the just-hopped mapping one extra step roughly
        # doubles how far each label has travelled toward the
        # component minimum — O(log diameter) rounds overall instead
        # of O(diameter).  Unique renamed columns sidestep the
        # shared-lineage self-join ambiguity.
        parent = hopped.select(
            F.col("id").alias("__pid"), F.col("component").alias("__pcomp")
        )
        new_comp = F.coalesce(F.col("__pcomp"), F.col("component"))
        updated = (
            hopped.join(parent, F.col("component") == F.col("__pid"), "left")
            .select(
                "id",
                new_comp.alias("component"),
                (new_comp < F.col("__old")).cast("int").alias("__chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = updated.agg(F.sum("__chg").alias("c")).collect()[0]["c"] or 0
        labels = updated.drop("__chg")
        if changed == 0:
            break
    else:
        # the loop NEVER converged: labels are still moving after
        # max_iter rounds, so some component is mislabeled (split into
        # several).  Silent wrong answers here mean duplicates survive
        # dedup — fail loudly; hop+shortcut needs ~log2(diameter)+2
        # rounds, so max_iter=20 covers any graph a pair generator can
        # realistically emit — hitting this means a pathological
        # component (raise max_iter, or pre-collapse exact dups).
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} "
            f"iterations ({changed} labels still changing); raise "
            "max_iter — the graph's diameter exceeds 2^rounds"
        )
    return labels


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iter: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """(id, cluster_id, is_canonical) for every document: cluster_id =
    the component's minimum doc id; the canonical member is that
    minimum (keep-lowest-id, the deterministic dedup policy).  Feed
    ``pairs`` from any near-dup generator; documents with no pair are
    their own singleton cluster.  ``stats`` is forwarded to
    :func:`connected_components` (round count)."""
    comp = connected_components(
        docs.select(F.col(id_col).alias("id")), pairs, "id", src_col, dst_col,
        max_iter=max_iter, stats=stats,
    )
    return comp.select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )
