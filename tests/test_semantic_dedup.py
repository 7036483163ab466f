"""SemDeDup semantic dedup (operators/semantic_dedup.py): dominance
rule by hand, cell blocking (cross-cell twins survive), hot-cell cap,
and the pair-feed into transitive dedup_clusters."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.semantic_dedup import (
    semantic_dedup,
    semantic_dup_pairs,
)

# two fixed 2-d centroids: cell 0 faces +x, cell 1 faces +y — no
# training, so the test pins the dedup semantics in isolation
CENTS = [[1.0, 0.0], [0.0, 1.0]]


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0]),       # cell 0
        (2, [0.999, 0.01]),    # cell 0, cos(1,2) ~ 0.9999 -> dropped
        (4, [0.01, 0.999]),    # cell 1
        (5, [0.0, 1.0]),       # cell 1, cos(4,5) ~ 0.99   -> dropped
        (6, [0.76, 0.65]),     # cell 0 \ cos(6,7) ~ 0.988 BUT the
        (7, [0.65, 0.76]),     # cell 1 / cells differ: both kept
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_dominance_rule_and_cell_blocking(spark, vecs):
    got = {
        r.vec_id: (r.cell, r.kept)
        for r in semantic_dedup(vecs, "embedding", CENTS, 0.95).collect()
    }
    assert got == {
        1: (0, True),
        2: (0, False),  # dominated by smaller-id cell-mate 1
        4: (1, True),
        5: (1, False),  # dominated by 4
        6: (0, True),   # near-twin 7 sits in the OTHER cell
        7: (1, True),
    }


def test_hot_cell_cap_keeps_all_members(spark, vecs):
    # cell 0 holds {1, 2, 6} = 3 members; cap at 2 excludes the whole
    # cell from pair generation, so 2 SURVIVES; cell 1 (size 3) is
    # also over the cap -> 5 survives too: cap trades recall for
    # bounded work, never truncates membership
    got = {
        r.vec_id: r.kept
        for r in semantic_dedup(
            vecs, "embedding", CENTS, 0.95, max_cell_size=2
        ).collect()
    }
    assert got == {1: True, 2: True, 4: True, 5: True, 6: True, 7: True}


def test_pairs_feed_transitive_clusters(spark):
    """A chain a~b~c (adjacent cos >= tau, cos(a,c) < tau) yields two
    dominance pairs; dedup_clusters over semantic_dup_pairs closes
    the chain into ONE cluster with the min id canonical."""
    from osrs_dashboard_elt_spark.operators.components import dedup_clusters

    t20, t40 = math.radians(20), math.radians(40)
    rows = [
        (10, [1.0, 0.0]),
        (11, [math.cos(t20), math.sin(t20)]),
        (12, [math.cos(t40), math.sin(t40)]),
        (99, [0.0, 1.0]),  # other cell, untouched singleton
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = semantic_dup_pairs(df, "embedding", CENTS, 0.9)
    got_pairs = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got_pairs == {(10, 11), (11, 12)}  # cos(10,12)=cos40 < 0.9
    clusters = {
        r.vec_id: (r.cluster_id, r.is_canonical)
        for r in dedup_clusters(
            df.select("vec_id"), pairs, "vec_id"
        ).collect()
    }
    assert clusters == {
        10: (10, True),
        11: (10, False),
        12: (10, False),
        99: (99, True),
    }


def test_invalid_vectors_take_no_part(spark, vecs):
    dirty = vecs.unionByName(
        spark.createDataFrame(
            [(50, None), (51, [1.0, 0.0, 0.0]), (52, [None, 1.0])],
            "vec_id long, embedding array<float>",
        )
    )
    out = semantic_dedup(dirty, "embedding", CENTS, 0.95)
    ids = {r.vec_id for r in out.collect()}
    assert {50, 51, 52}.isdisjoint(ids)
    assert len(ids) == 6
