"""Hot-bucket guards in the dedup family (adversarial corpora).

At scale one degenerate blocking bucket — a stop shingle in every doc,
empty docs all hashing to simhash fp=0, a bucket of identical minhash
signatures — emits O(bucket^2) candidates and sinks the job.  These
tests build exactly those corpora and prove the guards bound the
candidate volume while leaving honest pairs intact.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# n-gram Jaccard: stop-shingle guard (default ON)
# ---------------------------------------------------------------------------


def test_ngram_stop_shingle_guard_bounds_pairs(spark):
    """200 docs share one stop shingle but are otherwise unique: the
    guard drops the hot shingle, so NO near-zero-Jaccard pairs are
    emitted from it (unguarded: 19,900 candidate pairs)."""
    rows = [
        (i, f"the common prefix unique{i} word{i} tail{i} end{i}")
        for i in range(200)
    ]
    docs = _docs(spark, rows)
    guarded = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_doc_freq=50
    )
    assert guarded.count() == 0
    unguarded = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.0, max_doc_freq=None
    )
    assert unguarded.count() == 200 * 199 // 2


def test_ngram_guard_keeps_honest_pairs(spark):
    """Real near-dups (sharing many non-hot shingles) survive the
    guard with identical scores."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),  # 3 of 4 shingles shared
        (3, "completely different text goes here now"),
    ]
    docs = _docs(spark, rows)
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5
        ).collect()
    }
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == pytest.approx(3 / 5)


def test_ngram_guard_default_matches_unguarded_on_clean_corpus(spark):
    """With no shingle above the default cap the guard is a no-op."""
    rows = [(i, f"doc number {i} has words {i % 7} and {i % 5}") for i in range(40)]
    docs = _docs(spark, rows)
    a = ngram_jaccard_pairs(docs, "doc_id", "text", n=2, threshold=0.3)
    b = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=2, threshold=0.3, max_doc_freq=None
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------------------
# SimHash: empty docs routed out of the fp=0 bucket (default ON)
# ---------------------------------------------------------------------------


def test_simhash_empty_docs_routed_out(spark):
    """100 empty docs would all land in the fp=0 bucket and emit
    4,950 hamming-0 pairs; drop_empty (default) removes them without
    touching real pairs."""
    rows = [(i, "   ") for i in range(100)]
    rows += [(1000, "identical real text body"), (1001, "identical real text body")]
    docs = _docs(spark, rows)
    out = simhash_pairs(docs, "doc_id", "text", bits=32, max_hamming=3).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1000, 1001)}
    legacy = simhash_pairs(
        docs, "doc_id", "text", bits=32, max_hamming=3, drop_empty=False
    )
    assert legacy.count() == 100 * 99 // 2 + 1


def test_simhash_bucket_cap_bounds_candidates(spark):
    """60 identical docs form one degenerate bucket per chunk; a cap
    below the bucket size suppresses it entirely (recall trade),
    leaving disjoint honest pairs intact."""
    rows = [(i, "same exact document body here") for i in range(60)]
    rows += [
        (2000, "quite different other text entirely"),
        (2001, "quite different other text entirely"),
    ]
    docs = _docs(spark, rows)
    capped = simhash_pairs(
        docs, "doc_id", "text", bits=32, max_hamming=3, max_bucket_size=10
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {(2000, 2001)}
    uncapped = simhash_pairs(docs, "doc_id", "text", bits=32, max_hamming=3)
    assert uncapped.count() == 60 * 59 // 2 + 1


def test_simhash_packed_lanes_match_per_bit_form(spark):
    """The packed 3-bit-lane vote aggregate (round-13 optimization:
    ceil(bits/3) SUMs instead of one per bit) must produce
    bit-identical fingerprints to the per-bit reference form on a
    corpus exercising every vote path: empty docs, single tokens,
    heavy repetition (ties: 2c == n must NOT set the bit), and
    shared/disjoint vocabulary — at a bits width NOT divisible by 3
    (the partial top group) and the suite's bits=48."""
    from osrs_dashboard_elt_spark.operators.dedup import (
        simhash_fingerprints,
    )

    rows = [
        (0, ""),  # empty -> fp 0
        (1, "one"),  # single token: every hash bit wins its vote
        (2, "tie tie other other"),  # 2c == n on shared bits -> unset
        (3, "alpha beta gamma delta epsilon"),
        (4, "alpha alpha alpha beta"),  # repetition skews votes
        (5, " ".join(f"w{i}" for i in range(97))),  # wide vocabulary
        (6, "alpha beta gamma delta epsilon"),  # exact dup of 3
    ]
    docs = _docs(spark, rows)
    for bits in (32, 48):
        packed = {
            r["id"]: r["fp"]
            for r in simhash_fingerprints(
                docs, "doc_id", "text", bits, drop_empty=False
            ).collect()
        }
        ref = {
            r["id"]: r["fp"]
            for r in simhash_fingerprints(
                docs, "doc_id", "text", bits, drop_empty=False,
                packed=False,
            ).collect()
        }
        assert packed == ref, f"packed/per-bit fingerprints differ at bits={bits}"


def test_simhash_packed_aggregate_count_shrinks(spark):
    """The plan must carry ceil(bits/3) + 1 aggregate buffers, not
    bits + 1 — the point of the packing (fewer accumulators and
    per-row updates in the signature aggregate)."""
    from osrs_dashboard_elt_spark.operators.dedup import (
        simhash_fingerprints,
    )

    docs = _docs(spark, [(1, "alpha beta"), (2, "gamma delta")])
    plan = simhash_fingerprints(
        docs, "doc_id", "text", 48
    )._jdf.queryExecution().optimizedPlan().toString()
    assert "__s15" in plan and "__s16" not in plan
    assert "__c0" not in plan


# ---------------------------------------------------------------------------
# MinHash LSH: band-bucket cap
# ---------------------------------------------------------------------------


def test_minhash_bucket_cap_bounds_candidates(spark):
    """50 identical docs share every band bucket (identical
    signatures); the cap drops those buckets so candidates stay
    bounded, while a distinct near-dup pair still surfaces."""
    rows = [(i, "the very same document text appears again and again") for i in range(50)]
    rows += [
        (3000, "zebra yak xylophone walrus vulture unicorn tapir seal"),
        (3001, "zebra yak xylophone walrus vulture unicorn tapir rhino"),
    ]
    docs = _docs(spark, rows)
    capped = minhash_lsh_pairs(
        docs, "doc_id", "text", num_perm=16, bands=4, shingle_n=3,
        max_bucket_size=10,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in capped}
    assert all(a >= 3000 for a, _ in pairs)  # hot cluster fully suppressed
    assert (3000, 3001) in pairs
    uncapped = minhash_lsh_pairs(
        docs, "doc_id", "text", num_perm=16, bands=4, shingle_n=3
    )
    assert uncapped.count() >= 50 * 49 // 2


def test_shingles_short_and_empty_docs(spark):
    """Docs with fewer than n words (incl. empty/whitespace-only) must
    yield NO shingles — the old sequence(1,0)->slice(_,0,n) form
    crashed the job on them."""
    from osrs_dashboard_elt_spark.operators.dedup import shingles_col, with_shingles

    df = spark.createDataFrame(
        [
            (1, "only two"),
            (2, "a b c d e"),
            (3, ""),
            (4, "   \t  "),
            (5, "one two three"),
            (6, "  x \t y  z  w  v "),
        ],
        ["doc_id", "text"],
    )
    got = {r.id: sorted(r.toks) for r in with_shingles(df, "doc_id", "text", 4).collect()}
    assert got == {
        1: [],
        2: ["a b c d", "b c d e"],
        3: [],
        4: [],
        5: [],
        6: ["x y z w", "y z w v"],
    }
    got_col = {
        r.doc_id: sorted(r.s)
        for r in df.select("doc_id", shingles_col("text", 4).alias("s")).collect()
    }
    assert got_col == got


# ---------------------------------------------------------------------------
# Embedding near-dup: banded sign-LSH hot-bucket cap
# ---------------------------------------------------------------------------


def _vecs(spark, rows, dim):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>",
    )


def test_embedding_neardup_hot_bucket_cap(spark):
    """An adversarial near-duplicate-heavy corpus: 120 copies of one
    vector (all land in the same bucket of every band — 7,140 pairs
    from one reducer if unguarded) plus a handful of honest near-dup
    pairs elsewhere.  The cap drops the degenerate buckets entirely
    while honest pairs survive."""
    from osrs_dashboard_elt_spark.operators.similarity import (
        embedding_neardup_pairs,
    )

    dim = 8
    hot = [(i, [1.0] * dim) for i in range(120)]
    # honest near-dups: two tight pairs far from the hot direction
    honest = [
        (200, [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0]),
        (201, [1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -0.9]),
        (300, [-1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0]),
        (301, [-0.9, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0]),
    ]
    df = _vecs(spark, hot + honest, dim)

    uncapped = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.9,
        n_planes=6, bands=3, dim=dim, max_bucket_size=None,
    )
    capped = embedding_neardup_pairs(
        df, "vec_id", "embedding", threshold=0.9,
        n_planes=6, bands=3, dim=dim, max_bucket_size=50,
    )

    n_uncapped = uncapped.count()
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    # unguarded: the hot bucket floods the join with all 120*119/2 pairs
    assert n_uncapped >= 120 * 119 // 2
    # guarded: degenerate bucket dropped, honest pairs intact
    assert (200, 201) in got and (300, 301) in got
    assert all(a >= 200 for a, _ in got), got


def test_duplicate_ngram_spans_shapes_agree(spark):
    """The single-pass (string-shuffle) and hash-first (int-shuffle +
    rehydrate) shapes must return identical (span, n_docs) sets — the
    hash-first form is the 100 TB path and must not drift."""
    from osrs_dashboard_elt_spark.operators.dedup import (
        duplicate_ngram_spans,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {
        (r.span, r.n_docs)
        for r in duplicate_ngram_spans(
            docs, "doc_id", "text", n=8, min_docs=2
        ).collect()
    }
    b = {
        (r.span, r.n_docs)
        for r in duplicate_ngram_spans(
            docs, "doc_id", "text", n=8, min_docs=2, hash_first=True
        ).collect()
    }
    assert a == b
    assert a, "fixture produced zero duplicated spans — weak test"
