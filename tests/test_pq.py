"""Product quantization: training shape, encode contract, ADC
search, and the at-rest index round trip (operators/pq.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.pq import (
    _fold_dot,
    adc_score_expr,
    pq_adc_topk,
    pq_adc_topk_at_rest,
    pq_encode,
    pq_train,
    write_pq_index,
)

DIM, M, K = 8, 2, 4
SUB = DIM // M


def _vec(i: int) -> list[float]:
    # four well-separated float32-exact clusters in each subspace so
    # two Lloyd's rounds converge and assignments are unambiguous
    base = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
    ][i % 4]
    jitter = 0.0625 * ((i // 4) % 3)  # exact: power-of-two multiples
    return [x + jitter for x in base] * M


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, _vec(i)) for i in range(48)]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    ).cache()


@pytest.fixture(scope="module")
def books(corpus):
    return pq_train(
        corpus, "embedding", m=M, k=K, n_iter=2, id_col="vec_id", seed=3
    )


def test_train_shapes(books):
    assert len(books) == M
    assert all(len(cb) == K for cb in books)
    assert all(len(cw) == SUB for cb in books for cw in cb)


def test_train_rejects_bad_m(corpus):
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(corpus, "embedding", m=3, k=2, id_col="vec_id")


def test_pq_train_shared_pass_matches_per_subspace(corpus, books):
    """The round-13 shared-pass training (one scan updates all m
    codebooks per round) must be BIT-IDENTICAL to m independent
    ``kmeans_fit`` runs over the slices — same init, same chunked
    argmax assignment, same integerized decimal means."""
    from osrs_dashboard_elt_spark.operators.kmeans import (
        kmeans_fit,
        kmeans_init,
        valid_vec,
    )
    from osrs_dashboard_elt_spark.operators.similarity import vd_cast

    base = corpus.select(
        F.col("vec_id"), vd_cast("embedding").alias("__fv")
    ).filter(valid_vec(DIM, "__fv"))
    full_init = kmeans_init(base, "__fv", K, "vec_id", 3)
    reference = []
    for j in range(M):
        sliced = base.select(
            "vec_id", F.slice("__fv", j * SUB + 1, SUB).alias("__subv")
        )
        reference.append(
            kmeans_fit(
                sliced, "__subv", K, n_iter=2, id_col="vec_id", seed=3,
                init=[v[j * SUB : (j + 1) * SUB] for v in full_init],
                check_floor=False,
            )
        )
    assert books == reference


def test_encode_codes_and_validity(spark, corpus, books):
    bad = spark.createDataFrame(
        [
            (100, None),
            (101, [0.5] * (DIM - 1)),          # wrong length
            (102, [0.5] * (DIM - 1) + [None]),  # null element
        ],
        "vec_id bigint, embedding array<double>",
    )
    codes = pq_encode(
        corpus.unionByName(bad), "embedding", books, id_col="vec_id"
    )
    rows = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert set(rows) == {i for i in range(48)}  # invalid ids dropped
    assert all(len(c) == M for c in rows.values())
    assert all(0 <= x < K for c in rows.values() for x in c)


def test_adc_matches_manual_lut(corpus, books):
    """The ADC score must equal the manual LUT sum for the stored
    codes — the expression is just lookups, no re-derivation."""
    q = _vec(5)
    codes = pq_encode(corpus, "embedding", books, id_col="vec_id")
    got = {
        r["vec_id"]: (r["codes"], r["s"])
        for r in codes.select(
            "vec_id", "codes", adc_score_expr(books, q).alias("s")
        ).collect()
    }
    for vid, (cs, s) in got.items():
        want = 0.0
        for j, c in enumerate(cs):
            want = want + _fold_dot(q[j * SUB : (j + 1) * SUB], books[j][c])
        # expression casts through DECIMAL(28,6)
        assert abs(s - want) <= 5e-7, (vid, s, want)


def test_adc_topk_recall_vs_brute(corpus, books):
    """PQ is lossy but on a well-clustered corpus the quantized top-10
    must overlap the exact top-10 heavily (>= 6/10) and the scores
    must be monotonically ordered."""
    q = _vec(7)
    codes = pq_encode(corpus, "embedding", books, id_col="vec_id")
    approx = pq_adc_topk(codes, books, q, k=10, id_col="vec_id").collect()
    scores = [r["score"] for r in approx]
    assert scores == sorted(scores, reverse=True)
    exact = (
        corpus.select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "embedding",
                    F.lit(q).cast("array<double>"),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dot"),
        )
        .orderBy(F.desc("dot"), "vec_id")
        .limit(10)
        .collect()
    )
    overlap = {r["vec_id"] for r in approx} & {r["vec_id"] for r in exact}
    assert len(overlap) >= 6, sorted(overlap)


def test_at_rest_index_round_trip(spark, corpus, books, tmp_path):
    q = _vec(2)
    path = str(tmp_path / "pq_idx")
    write_pq_index(corpus, "embedding", books, path, id_col="vec_id")
    at_rest = pq_adc_topk_at_rest(
        spark, path, books, q, k=5, id_col="vec_id"
    ).collect()
    live = pq_adc_topk(
        pq_encode(corpus, "embedding", books, id_col="vec_id"),
        books, q, k=5, id_col="vec_id",
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in at_rest] == [
        (r["vec_id"], r["score"]) for r in live
    ]


def test_at_rest_index_partitioned(spark, corpus, books, tmp_path):
    """partition_cols lands as a hive layout so an IVF-cell probe is
    a pruned scan."""
    with_cell = corpus.withColumn(
        "cell", (F.col("vec_id") % 2).cast("int")
    )
    path = str(tmp_path / "pq_part")
    write_pq_index(
        with_cell, "embedding", books, path,
        id_col="vec_id", partition_cols=["cell"],
    )
    got = spark.read.parquet(path)
    assert set(got.columns) == {"vec_id", "codes", "cell"}
    import os

    assert any(d.startswith("cell=") for d in os.listdir(path))
    # a single-cell read sees only that cell's ids
    ids = {r["vec_id"] for r in got.filter(F.col("cell") == 0).collect()}
    assert ids == {i for i in range(48) if i % 2 == 0}


def test_ivfpq_probe_partition_prunes(spark, corpus, books, tmp_path):
    """The composed scale path: cells from IVF centroids partition the
    code table; a probe reads ONLY the nprobe nearest cells (a
    PARTITION filter on the scan, not a row filter) and ADC-scores
    m-int rows."""
    import re

    from osrs_dashboard_elt_spark.operators.kmeans import (
        kmeans_assignments,
    )
    from osrs_dashboard_elt_spark.operators.pq import ivfpq_topk_at_rest

    cents = [_vec(i) for i in range(4)]  # 4 well-separated cells
    cells = kmeans_assignments(corpus, "embedding", cents, id_col="vec_id")
    with_cell = corpus.join(cells, "vec_id").withColumnRenamed(
        "cell", "cell"
    )
    path = str(tmp_path / "ivfpq")
    write_pq_index(
        with_cell, "embedding", books, path,
        id_col="vec_id", partition_cols=["cell"],
    )
    q = _vec(1)
    got = ivfpq_topk_at_rest(
        spark, path, books, cents, q, k=5, nprobe=1, id_col="vec_id"
    )
    rows = got.collect()
    assert len(rows) == 5
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert pf and "cell" in pf.group(0), plan
    # every returned id lives in the probed cell
    probed = {r["vec_id"] for r in rows}
    cell_of = {r["vec_id"]: r["cell"] for r in cells.collect()}
    assert len({cell_of[i] for i in probed}) == 1
    # equality with the flat ADC ranking restricted to that cell
    want_cell = cell_of[rows[0]["vec_id"]]
    flat = pq_adc_topk(
        pq_encode(
            with_cell.filter(F.col("cell") == want_cell),
            "embedding", books, id_col="vec_id",
        ),
        books, q, k=5, id_col="vec_id",
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in rows] == [
        (r["vec_id"], r["score"]) for r in flat
    ]


def test_append_index_lifecycle(spark, corpus, books, tmp_path):
    """Incremental ingest: write a base index, append a new batch
    encoded with the SAME codebooks, search sees both; a redelivered
    batch with skip_existing never duplicates ids."""
    from osrs_dashboard_elt_spark.operators.pq import pq_append_index

    base = corpus.filter(F.col("vec_id") < 40)
    batch = corpus.filter(F.col("vec_id") >= 40)
    path = str(tmp_path / "pq_inc")
    write_pq_index(base, "embedding", books, path, id_col="vec_id")
    pq_append_index(batch, "embedding", books, path, id_col="vec_id")
    got = spark.read.parquet(path)
    assert got.count() == 48
    # search over the appended index equals a fresh full encode
    q = _vec(3)
    a = pq_adc_topk_at_rest(spark, path, books, q, k=5).collect()
    b = pq_adc_topk(
        pq_encode(corpus, "embedding", books, id_col="vec_id"),
        books, q, k=5,
    ).collect()
    assert [(r["vec_id"], r["score"]) for r in a] == [
        (r["vec_id"], r["score"]) for r in b
    ]
    # redelivery: the same batch again with skip_existing is a no-op
    pq_append_index(
        batch, "embedding", books, path, id_col="vec_id",
        skip_existing=True,
    )
    after = spark.read.parquet(path)
    assert after.count() == 48
    assert after.select("vec_id").distinct().count() == 48


def test_compression_ratio_story(books):
    """The claim in the module docstring: m small ints vs d floats.
    Not a perf test — just pins the arithmetic the docs cite."""
    raw_bytes = DIM * 4
    code_bytes = M  # k<=256 -> 1 byte/code at rest
    assert raw_bytes / code_bytes >= 16


def test_delete_and_compact_lifecycle(spark, corpus, books, tmp_path):
    """Tombstoned ids vanish from searches immediately, survive
    compaction (a redelivered deleted id must not resurrect), and the
    compactor physically drops their codes."""
    from osrs_dashboard_elt_spark.operators.pq import (
        pq_append_index,
        pq_compact_index,
        pq_delete_from_index,
    )

    path = str(tmp_path / "pq_life")
    write_pq_index(corpus, "embedding", books, path, id_col="vec_id")
    q = _vec(2)
    before = {r["vec_id"] for r in
              pq_adc_topk_at_rest(spark, path, books, q, k=48).collect()}
    victim = sorted(before)[0]
    assert pq_delete_from_index([victim], path) == 1
    after = {r["vec_id"] for r in
             pq_adc_topk_at_rest(spark, path, books, q, k=48).collect()}
    assert victim not in after and after == before - {victim}
    # compaction drops the codes physically; searches unchanged
    n = pq_compact_index(spark, path)
    assert n == 47
    assert spark.read.parquet(path).count() == 47
    post = {r["vec_id"] for r in
            pq_adc_topk_at_rest(spark, path, books, q, k=48).collect()}
    assert post == after
    # a redelivered deleted id cannot resurrect: the tombstone
    # survives compaction, so the appended code stays invisible
    pq_append_index(
        corpus.filter(F.col("vec_id") == victim), "embedding", books,
        path, id_col="vec_id",
    )
    again = {r["vec_id"] for r in
             pq_adc_topk_at_rest(spark, path, books, q, k=48).collect()}
    assert victim not in again


def test_delete_string_keyed_index(spark, corpus, books, tmp_path):
    """A PQ index keyed by STRING ids accepts a plain id list — the
    tombstone frame's type is resolved from the index schema, not
    hard-coded bigint (the dedup_index contract)."""
    from osrs_dashboard_elt_spark.operators.pq import pq_delete_from_index

    path = str(tmp_path / "pq_str")
    named = corpus.select(
        F.concat(F.lit("doc-"), F.col("vec_id")).alias("vec_id"),
        "embedding",
    )
    write_pq_index(named, "embedding", books, path, id_col="vec_id")
    assert pq_delete_from_index(["doc-2"], path) == 1
    got = {r["vec_id"] for r in
           pq_adc_topk_at_rest(spark, path, books, _vec(2), k=48).collect()}
    assert "doc-2" not in got and len(got) == 47


def test_corrupt_tombstones_fail_loudly(spark, corpus, books, tmp_path):
    """A tombstone dir that EXISTS but cannot be read must raise —
    swallowing the error would silently resurrect deleted/takedown
    vectors.  An ABSENT dir still means 'no tombstones'."""
    import os

    path = str(tmp_path / "pq_corrupt")
    write_pq_index(corpus, "embedding", books, path, id_col="vec_id")
    # absent dir: fine
    assert pq_adc_topk_at_rest(spark, path, books, _vec(0), k=5).count() == 5
    tomb = path + "__tombstones"
    os.makedirs(tomb)
    with open(os.path.join(tomb, "part-00000.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    with pytest.raises(Exception):
        pq_adc_topk_at_rest(spark, path, books, _vec(0), k=5).collect()


def test_delete_against_bootstrap_empty_index(spark, tmp_path):
    """A bootstrap index (empty-frame write: no data files yet) still
    accepts plain-id deletes — the tombstone type falls back to long
    when the index has no readable schema."""
    from osrs_dashboard_elt_spark.operators.pq import pq_delete_from_index

    path = str(tmp_path / "pq_boot")
    spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    ).write.parquet(path)
    assert pq_delete_from_index([42], path) == 1
