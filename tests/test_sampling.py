"""Unit tests for the deterministic sampling family
(operators/sampling.py): stability, proportions, quota math, and the
join-stability property that motivates hash-based sampling at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.sampling import (
    BUCKETS,
    domain_mix_sample,
    domain_mix_thresholds,
    hash_sample,
    length_bucket,
    sample_bucket,
    shuffle_order,
    split_assign,
)


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("domain"),
    )


def test_hash_sample_fraction_and_determinism(spark):
    df = _docs(spark)
    s1 = hash_sample(df, "doc_id", 0.25, seed=7)
    s2 = hash_sample(df, "doc_id", 0.25, seed=7)
    ids1 = sorted(r.doc_id for r in s1.collect())
    ids2 = sorted(r.doc_id for r in s2.collect())
    assert ids1 == ids2  # re-runnable: identical membership
    assert 0.20 < len(ids1) / 2000 < 0.30  # near the requested fraction
    # different seed -> different (but still deterministic) sample
    ids3 = sorted(r.doc_id for r in hash_sample(df, "doc_id", 0.25, seed=8).collect())
    assert ids1 != ids3


def test_hash_sample_is_subset_monotone(spark):
    # A 10% sample is a strict subset of the 30% sample (same seed) —
    # the property that lets a pipeline grow its sample without
    # resampling from scratch.
    df = _docs(spark)
    small = {r.doc_id for r in hash_sample(df, "doc_id", 0.1, seed=7).collect()}
    big = {r.doc_id for r in hash_sample(df, "doc_id", 0.3, seed=7).collect()}
    assert small < big


def test_split_assign_partitions_everything(spark):
    df = _docs(spark)
    out = split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # total partition, no row lost
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # split is a pure function of the key: same row never changes label
    again = {
        (r.doc_id, r.split)
        for r in split_assign(df, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    first = {(r.doc_id, r.split) for r in out.collect()}
    assert first == again


def test_split_disjoint_from_sample_leakage(spark):
    # join-stability: a doc sampled under seed A keeps its split label
    # from seed B — membership in one never perturbs the other.
    df = _docs(spark)
    labeled = split_assign(df, "doc_id", {"train": 0.9, "test": 0.1}, seed=1)
    sampled = hash_sample(labeled, "doc_id", 0.5, seed=2)
    merged = sampled.join(labeled.select("doc_id", F.col("split").alias("s2")), "doc_id")
    assert merged.filter(F.col("split") != F.col("s2")).count() == 0


def test_length_bucket_labels(spark):
    df = spark.createDataFrame([(3,), (10,), (64,), (200,)], "n long")
    out = df.select(length_bucket(F.col("n"), [8, 32, 128]).alias("b")).collect()
    assert [r.b for r in out] == ["<8", "8-32", "32-128", ">=128"]


def test_domain_mix_thresholds_quota_math(spark):
    # 4 domains x 500 rows; target 50/50 on domains 0,1; budget 40%.
    # budget = floor(2000*0.4) = 800; desired = 400 each;
    # thr = floor(400*10000/500) = 8000; domains 2,3 -> thr 0.
    df = _docs(spark)
    thr = {
        r.domain: r.thr
        for r in domain_mix_thresholds(
            df, "domain", {"0": 500_000, "1": 500_000}, 400_000
        ).collect()
    }
    assert thr == {"0": 8000, "1": 8000, "2": 0, "3": 0}


def test_domain_mix_sample_saturates_small_domain(spark):
    # A domain with fewer rows than its quota is taken whole (thr caps
    # at BUCKETS), never oversampled.
    df = _docs(spark).filter((F.col("domain") != "0") | (F.col("doc_id") < 40))
    # domain 0 has 10 rows; ask for far more than that
    thr = {
        r.domain: r.thr
        for r in domain_mix_thresholds(df, "domain", {"0": 1_000_000}, 900_000).collect()
    }
    assert thr["0"] == BUCKETS
    kept = domain_mix_sample(df, "domain", "doc_id", {"0": 1_000_000}, 900_000)
    assert kept.count() == 10  # all of domain 0, nothing else


def test_shuffle_order_reproducible_and_seed_sensitive(spark):
    df = _docs(spark, 200)
    o1 = [r.doc_id for r in df.orderBy(shuffle_order(F.col("doc_id"), 5)).collect()]
    o2 = [r.doc_id for r in df.orderBy(shuffle_order(F.col("doc_id"), 5)).collect()]
    o3 = [r.doc_id for r in df.orderBy(shuffle_order(F.col("doc_id"), 6)).collect()]
    assert o1 == o2
    assert o1 != o3
    assert o1 != sorted(o1)  # actually shuffled


def test_sample_bucket_range(spark):
    df = _docs(spark, 500).select(sample_bucket(F.col("doc_id")).alias("b"))
    mn, mx = df.agg(F.min("b"), F.max("b")).first()
    assert 0 <= mn and mx < BUCKETS


def test_with_global_position_matches_total_order(spark):
    """pos must equal the rank a (single-task) global window would
    assign, while the PLAN contains no unpartitioned window: every
    windowspecdefinition is keyed by the partition id."""
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.sampling import (
        shuffle_order,
        with_global_position,
    )

    df = spark.range(500).select(
        F.col("id"), shuffle_order(F.col("id"), 7).alias("ord")
    )
    out = with_global_position(df, ["ord", "id"])
    rows = out.orderBy("pos").collect()
    assert [r.pos for r in rows] == list(range(1, 501))
    # positions follow the (ord, id) total order
    ords = [(r.ord, r.id) for r in rows]
    assert ords == sorted(ords)
    # plan hygiene: no unpartitioned window (the "move everything to
    # one task" shape Spark warns about)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for line in plan.splitlines():
        if "windowspecdefinition(" in line:
            spec = line.split("windowspecdefinition(", 1)[1]
            assert "__pid" in spec.split(")")[0] + spec, line


def test_leakage_safe_split_keeps_clusters_whole(spark):
    """Every member of a near-dup cluster gets the SAME split label
    (the whole point), and the label equals split_assign keyed by the
    cluster id — a row-keyed split would straddle at least one of the
    many multi-member clusters across labels."""
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.sampling import (
        leakage_safe_split,
        split_assign,
    )

    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    # chain pairs: clusters {0..3}, {10,11}, rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    w = {"train": 0.6, "val": 0.2, "test": 0.2}
    out = leakage_safe_split(docs, pairs, "doc_id", w, seed=7).collect()
    by_doc = {r.doc_id: (r.cluster_id, r.split) for r in out}
    assert len(by_doc) == 200
    # clusters whole
    assert len({by_doc[i] for i in (0, 1, 2, 3)}) == 1
    assert by_doc[10] == by_doc[11]
    assert by_doc[0][0] == 0 and by_doc[10][0] == 10
    # label == the bucket hash OF THE CLUSTER ID
    expected = {
        r.cluster_id: r.split
        for r in split_assign(
            spark.createDataFrame(
                [(c,) for c in {c for c, _ in by_doc.values()}],
                "cluster_id long",
            ),
            "cluster_id", w, seed=7,
        ).collect()
    }
    for cid, split in by_doc.values():
        assert split == expected[cid]
    # all three labels actually used across 200 keys
    assert {s for _, s in by_doc.values()} == {"train", "val", "test"}


def test_domain_mix_thresholds_exact_past_double_mantissa(spark):
    """The quota products are DECIMAL(38,0) + integral DIV, so they
    stay exact where double `/` loses integers (>= 2^53) and bigint
    products overflow (n_total * ppm past ~9.2e12 rows).  Replayed
    against DuckDB HUGEINT `//` on the same synthetic counts."""
    import duckdb
    from pyspark.sql import functions as F

    n_total, n_domain, budget_ppm, tgt_ppm = 10**13, 5 * 10**12, 600_000, 333_333
    got = (
        spark.createDataFrame(
            [(n_total, n_domain)], "__n_total long, n_domain long"
        )
        .select(
            F.expr(
                "CAST(CAST(CAST(__n_total AS DECIMAL(38,0))"
                f" * {budget_ppm} DIV 1000000 AS DECIMAL(38,0))"
                f" * {tgt_ppm} DIV 1000000 AS BIGINT)"
                " * 10000 DIV n_domain"
            ).alias("thr")
        )
        .collect()[0]["thr"]
    )
    (exp,) = duckdb.sql(
        f"SELECT (CAST({n_total} AS HUGEINT) * {budget_ppm} // 1000000)"
        f" * {tgt_ppm} // 1000000 * 10000 // {n_domain}"
    ).fetchone()
    assert got == int(exp) == 3999
