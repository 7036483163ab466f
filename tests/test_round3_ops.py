"""Edge cases for the round-3 operators: SCD2 compression, RANGE-frame
rolling aggregates, z-score outliers."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators import (
    rolling_range_agg,
    scd2_as_of,
    scd2_compress,
    zscore_outliers,
)


def _ts(d, h=0):
    return datetime(2024, 1, d, h)


class TestScd2:
    def rows(self, spark, data):
        return spark.createDataFrame(data, "k string, ts timestamp, a string")

    def test_compresses_runs(self, spark):
        df = self.rows(
            spark,
            [
                ("u", _ts(1), "A"),
                ("u", _ts(2), "A"),
                ("u", _ts(3), "B"),
                ("u", _ts(4), "B"),
                ("u", _ts(5), "A"),
            ],
        )
        out = scd2_compress(df, key="k", attr="a", ts_col="ts")
        got = sorted(
            (r.version, r.a, r.valid_from, r.valid_to)
            for r in out.collect()
        )
        assert got == [
            (1, "A", _ts(1), _ts(3)),
            (2, "B", _ts(3), _ts(5)),
            (3, "A", _ts(5), None),
        ]

    def test_null_first_attr_starts_run(self, spark):
        df = self.rows(spark, [("u", _ts(1), None), ("u", _ts(2), "A")])
        out = scd2_compress(df, key="k", attr="a", ts_col="ts")
        got = sorted((r.version, r.a) for r in out.collect())
        assert got == [(1, None), (2, "A")]

    def test_null_transitions_register(self, spark):
        df = self.rows(
            spark,
            [("u", _ts(1), "A"), ("u", _ts(2), None), ("u", _ts(3), "A")],
        )
        out = scd2_compress(df, key="k", attr="a", ts_col="ts")
        assert out.count() == 3

    def test_as_of_slice(self, spark):
        df = self.rows(
            spark, [("u", _ts(1), "A"), ("u", _ts(5), "B"), ("v", _ts(2), "C")]
        )
        hist = scd2_compress(df, key="k", attr="a", ts_col="ts")
        at = scd2_as_of(hist, F.lit(_ts(3)))
        got = {(r.k, r.a) for r in at.collect()}
        assert got == {("u", "A"), ("v", "C")}

    def test_single_partition_shuffle(self, spark):
        df = self.rows(spark, [("u", _ts(1), "A"), ("u", _ts(2), "B")])
        plan = scd2_compress(df, key="k", attr="a", ts_col="ts")._jdf.queryExecution().executedPlan().toString()
        # both window passes hash-partition on the key; only one
        # Exchange may appear (the second window reuses the first's
        # partitioning)
        assert plan.count("Exchange hashpartitioning") == 1


class TestRolling:
    def test_frame_boundaries_inclusive(self, spark):
        # window_seconds=10: events at t, t+10 share a frame; t+11 not
        df = spark.createDataFrame(
            [
                (1, "u", datetime(2024, 1, 1, 0, 0, 0), 1.0),
                (2, "u", datetime(2024, 1, 1, 0, 0, 10), 2.0),
                (3, "u", datetime(2024, 1, 1, 0, 0, 21), 4.0),
            ],
            "id long, k string, ts timestamp, v double",
        )
        out = rolling_range_agg(
            df, key="k", ts_col="ts", value_col="v", window_seconds=10
        )
        got = {r.id: (r.rolling_sum, r.rolling_cnt) for r in out.collect()}
        assert got == {1: (1.0, 1), 2: (3.0, 2), 3: (4.0, 1)}

    def test_ties_are_peers(self, spark):
        df = spark.createDataFrame(
            [
                (1, "u", datetime(2024, 1, 1), 1.0),
                (2, "u", datetime(2024, 1, 1), 2.0),
            ],
            "id long, k string, ts timestamp, v double",
        )
        out = rolling_range_agg(
            df, key="k", ts_col="ts", value_col="v", window_seconds=5
        )
        # RANGE frame: both rows see both peers regardless of order
        for r in out.collect():
            assert (r.rolling_sum, r.rolling_cnt) == (3.0, 2)

    def test_keys_isolated(self, spark):
        df = spark.createDataFrame(
            [
                (1, "u", datetime(2024, 1, 1), 1.0),
                (2, "v", datetime(2024, 1, 1), 5.0),
            ],
            "id long, k string, ts timestamp, v double",
        )
        out = rolling_range_agg(
            df, key="k", ts_col="ts", value_col="v", window_seconds=60
        )
        got = {r.id: r.rolling_sum for r in out.collect()}
        assert got == {1: 1.0, 2: 5.0}


class TestZscore:
    def test_flags_only_outliers(self, spark):
        rows = [(i, "g", 10.0) for i in range(20)] + [(99, "g", 1000.0)]
        df = spark.createDataFrame(rows, "id long, g string, v double")
        out = zscore_outliers(df, key="g", value_col="v", threshold=2.5)
        got = [r.id for r in out.collect()]
        assert got == [99]

    def test_zero_variance_group_silent(self, spark):
        df = spark.createDataFrame(
            [(1, "g", 5.0), (2, "g", 5.0)], "id long, g string, v double"
        )
        out = zscore_outliers(df, key="g", value_col="v")
        assert out.count() == 0

    def test_singleton_group_silent(self, spark):
        df = spark.createDataFrame([(1, "g", 5.0)], "id long, g string, v double")
        out = zscore_outliers(df, key="g", value_col="v")
        assert out.count() == 0

    def test_broadcast_moments(self, spark):
        df = spark.createDataFrame(
            [(i, "g", float(i)) for i in range(10)],
            "id long, g string, v double",
        )
        plan = zscore_outliers(df, key="g", value_col="v")._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


class TestHll:
    def test_estimate_within_error(self, spark):
        from osrs_dashboard_elt_spark.operators.sketches import hll_distinct

        df = spark.range(0, 5000).select(
            (F.col("id") % 4).alias("g"), F.expr("id div 4").alias("v")
        )
        out = hll_distinct(df, "g", "v", p=9)
        # exactly 1250 true distinct per group; p=9 -> ~4.6% std error
        for r in out.collect():
            assert abs(r.approx_distinct - 1250) / 1250 < 0.15

    def test_merge_invariance(self, spark):
        """The sketch is mergeable: estimate must not depend on input
        partitioning (MAX-merged registers are order/partition-free)."""
        from osrs_dashboard_elt_spark.operators.sketches import hll_distinct

        df = spark.range(0, 2000).select(
            F.lit("g").alias("g"), (F.col("id") % 700).alias("v")
        )
        a = hll_distinct(df.repartition(1), "g", "v", p=7).collect()[0]
        b = hll_distinct(df.repartition(16), "g", "v", p=7).collect()[0]
        assert a.approx_distinct == b.approx_distinct

    def test_small_range_branch(self, spark):
        from osrs_dashboard_elt_spark.operators.sketches import hll_distinct

        df = spark.range(0, 10).select(F.lit("g").alias("g"), F.col("id").alias("v"))
        out = hll_distinct(df, "g", "v", p=9).collect()[0]
        assert abs(out.approx_distinct - 10) < 2


class TestQuality:
    def test_metrics_one_pass(self, spark):
        from osrs_dashboard_elt_spark.operators import quality_metrics

        df = spark.createDataFrame(
            [(1, "a", 2.0), (2, None, 4.0), (2, "b", None)],
            "id long, s string, v double",
        )
        out = {r.column: r for r in quality_metrics(df).collect()}
        assert out["id"].n_rows == 3 and out["id"].n_nulls == 0
        assert out["id"].n_distinct == 2
        assert out["s"].n_nulls == 1 and out["s"].min_value is None
        assert out["v"].min_value == 2.0 and out["v"].max_value == 4.0

    def test_constraints(self, spark):
        from osrs_dashboard_elt_spark.operators import check_constraints

        df = spark.createDataFrame(
            [(1, 5.0), (2, -1.0)], "id long, v double"
        )
        out = {
            r.constraint: r.passed
            for r in check_constraints(
                df,
                [
                    ("pk_unique", "count(distinct id) = count(*)"),
                    ("v_nonneg", "min(v) >= 0"),
                    ("nonempty", "count(*) > 0"),
                ],
            ).collect()
        }
        assert out == {"pk_unique": True, "v_nonneg": False, "nonempty": True}

    def test_single_scan(self, spark):
        from osrs_dashboard_elt_spark.operators import quality_metrics

        df = spark.createDataFrame([(1, "a")], "id long, s string")
        plan = quality_metrics(df)._jdf.queryExecution().executedPlan().toString()
        # distinct counts share one Expand; no join/union of per-column scans
        assert "Union" not in plan and "Join" not in plan


class TestWeightedSample:
    def test_weights_bias_selection(self, spark):
        from osrs_dashboard_elt_spark.operators import weighted_sample

        # ids 0..999 weight 1, ids 1000..1099 weight 1000: the heavy
        # 9% of mass should dominate a k=50 sample
        df = spark.range(0, 1100).select(
            F.col("id"),
            F.when(F.col("id") >= 1000, 1000.0).otherwise(1.0).alias("w"),
        )
        got = [r.id for r in weighted_sample(df, "id", "w", k=50).collect()]
        heavy = sum(1 for i in got if i >= 1000)
        assert heavy > 30

    def test_deterministic_and_partition_free(self, spark):
        from osrs_dashboard_elt_spark.operators import weighted_sample

        df = spark.range(0, 500).select(
            F.col("id"), F.lit(1.0).alias("w")
        )
        a = {r.id for r in weighted_sample(df.repartition(1), "id", "w", 20).collect()}
        b = {r.id for r in weighted_sample(df.repartition(13), "id", "w", 20).collect()}
        assert a == b and len(a) == 20

    def test_no_global_sort(self, spark):
        from osrs_dashboard_elt_spark.operators import weighted_sample

        df = spark.range(0, 100).select(F.col("id"), F.lit(1.0).alias("w"))
        plan = weighted_sample(df, "id", "w", 10)._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


class TestHistogramQuantile:
    def test_accuracy_vs_exact(self, spark):
        from osrs_dashboard_elt_spark.operators.sketches import histogram_quantile

        df = spark.range(0, 10000).select(
            F.lit("g").alias("g"), (F.col("id") % 1000).cast("double").alias("v")
        )
        out = histogram_quantile(
            df, "g", "v", [0.5, 0.9], lo=0.0, hi=1000.0, n_bins=100
        ).collect()[0]
        # bin width 10 -> estimate within one bin of the exact value
        assert abs(out.hq_0_5 - 499.5) <= 10
        assert abs(out.hq_0_9 - 899.1) <= 10

    def test_merge_invariance(self, spark):
        from osrs_dashboard_elt_spark.operators.sketches import histogram_quantile

        df = spark.range(0, 3000).select(
            F.lit("g").alias("g"), (F.col("id") % 321).cast("double").alias("v")
        )
        a = histogram_quantile(df.repartition(1), "g", "v", [0.5], 0.0, 400.0, 64).collect()[0]
        b = histogram_quantile(df.repartition(16), "g", "v", [0.5], 0.0, 400.0, 64).collect()[0]
        assert a.hq_0_5 == b.hq_0_5

    def test_out_of_range_clamps(self, spark):
        from osrs_dashboard_elt_spark.operators.sketches import histogram_quantile

        df = spark.createDataFrame(
            [("g", -50.0), ("g", 5.0), ("g", 999.0)], "g string, v double"
        )
        out = histogram_quantile(df, "g", "v", [0.0, 1.0], 0.0, 10.0, 10).collect()[0]
        # p0 lands in bin 0 (clamped -50), p100 in the top bin (clamped 999)
        assert 0.0 <= out.hq_0_0 <= 1.0
        assert 9.0 <= out.hq_1_0 <= 10.0


class TestIncremental:
    def test_merge_equals_full(self, spark):
        from osrs_dashboard_elt_spark.operators.incremental import (
            agg_state,
            finalize,
            merge_states,
        )

        df = spark.range(0, 1000).select(
            (F.col("id") % 3).alias("g"), (F.col("id") % 17).cast("double").alias("v")
        )
        parts = [df.filter(F.col("id") % 4 == i) for i in range(4)]
        inc = finalize(
            merge_states([agg_state(p, "g", "v") for p in parts], "g"), "g"
        )
        full = finalize(agg_state(df, "g", "v"), "g")
        a = sorted(map(tuple, inc.collect()))
        b = sorted(map(tuple, full.collect()))
        assert a == b

    def test_hll_state_merge_equals_full(self, spark):
        from osrs_dashboard_elt_spark.operators.incremental import (
            hll_state,
            merge_hll_states,
        )

        df = spark.range(0, 2000).select(
            F.lit("g").alias("g"), (F.col("id") % 700).alias("v")
        )
        parts = [df.filter(F.col("id") % 3 == i) for i in range(3)]
        merged = merge_hll_states(
            [hll_state(p, "g", "v", p=7) for p in parts], "g"
        )
        full = hll_state(df, "g", "v", p=7)
        a = sorted(map(tuple, merged.collect()))
        b = sorted(map(tuple, full.collect()))
        assert a == b


class TestChecksumAndStratified:
    def test_checksum_partition_and_order_free(self, spark):
        from osrs_dashboard_elt_spark.operators import table_checksum

        df = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "c")], "id long, s string"
        )
        a = table_checksum(df.repartition(1)).collect()[0]
        b = table_checksum(df.repartition(8).orderBy(F.desc("id"))).collect()[0]
        assert (a.n_rows, a.checksum) == (b.n_rows, b.checksum)

    def test_checksum_detects_any_row_change(self, spark):
        from osrs_dashboard_elt_spark.operators import table_checksum

        base = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
        changed = spark.createDataFrame([(1, "a"), (2, "B")], "id long, s string")
        assert (
            table_checksum(base).collect()[0].checksum
            != table_checksum(changed).collect()[0].checksum
        )

    def test_checksum_null_vs_empty_distinct(self, spark):
        from osrs_dashboard_elt_spark.operators import table_checksum

        a = spark.createDataFrame([(1, None)], "id long, s string")
        b = spark.createDataFrame([(1, "")], "id long, s string")
        assert (
            table_checksum(a).collect()[0].checksum
            != table_checksum(b).collect()[0].checksum
        )

    def test_stratified_exact_k_and_small_strata(self, spark):
        from osrs_dashboard_elt_spark.operators import stratified_fixed_k

        rows = [(i, "big") for i in range(50)] + [(100, "tiny"), (101, "tiny")]
        df = spark.createDataFrame(rows, "id long, g string")
        out = stratified_fixed_k(df, "g", "id", k=5)
        counts = {r.g: r.n for r in out.groupBy("g").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert counts == {"big": 5, "tiny": 2}

    def test_stratified_deterministic(self, spark):
        from osrs_dashboard_elt_spark.operators import stratified_fixed_k

        df = spark.range(0, 100).select(F.col("id"), (F.col("id") % 3).cast("string").alias("g"))
        a = {r.id for r in stratified_fixed_k(df.repartition(2), "g", "id", 7).collect()}
        b = {r.id for r in stratified_fixed_k(df.repartition(9), "g", "id", 7).collect()}
        assert a == b and len(a) == 21


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------


def test_cms_estimate_never_undercounts(spark):
    """CMS error is one-sided: est >= exact for EVERY key."""
    from osrs_dashboard_elt_spark.operators.sketches import cms_heavy_hitters

    df = spark.range(0, 2000).select(
        (F.col("id") % 37).alias("k")
    )
    out = cms_heavy_hitters(df, "k", threshold=0, d=3, w=16).collect()
    assert len(out) == 37
    assert all(r.est >= r.exact for r in out)


def test_cms_registers_merge_by_addition(spark):
    """Register tables of two disjoint halves summed element-wise must
    equal the whole's register table — the mergeable-sketch core."""
    from osrs_dashboard_elt_spark.operators.sketches import (
        count_min_registers,
    )

    base = spark.range(0, 1000).select("id", (F.col("id") % 53).alias("k"))
    a = base.filter(F.col("id") < 500).select("k")
    b = base.filter(F.col("id") >= 500).select("k")
    full = {
        (r.j, r.bucket): r.c
        for r in count_min_registers(base.select("k"), "k", d=3, w=32).collect()
    }
    ra = {
        (r.j, r.bucket): r.c
        for r in count_min_registers(a, "k", d=3, w=32).collect()
    }
    rb = {
        (r.j, r.bucket): r.c
        for r in count_min_registers(b, "k", d=3, w=32).collect()
    }
    merged: dict = {}
    for part in (ra, rb):
        for k, v in part.items():
            merged[k] = merged.get(k, 0) + v
    assert merged == full


def test_cms_register_table_is_bounded(spark):
    """The register table never exceeds d*w rows regardless of input
    cardinality."""
    from osrs_dashboard_elt_spark.operators.sketches import (
        count_min_registers,
    )

    df = spark.range(0, 5000).select(F.col("id").alias("k"))  # 5000 distinct
    n = count_min_registers(df, "k", d=4, w=64).count()
    assert n <= 4 * 64


# ---------------------------------------------------------------------------
# CDC merge
# ---------------------------------------------------------------------------


def _merge_fixtures(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k BIGINT, name STRING, v DOUBLE",
    )
    changes = spark.createDataFrame(
        [
            (2, "b2", 25.0, "U"),   # update
            (3, None, None, "D"),   # delete
            (4, "d", 40.0, "I"),    # insert new
            (1, "dupe", 0.0, "I"),  # insert on existing key -> ignored
            (9, "ghost", 0.0, "U"), # update miss -> ignored (no upsert)
        ],
        "k BIGINT, name STRING, v DOUBLE, op STRING",
    )
    return target, changes


def test_merge_apply_semantics(spark):
    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    target, changes = _merge_fixtures(spark)
    out = {r.k: (r.name, r.v) for r in merge_apply(target, changes, ["k"]).collect()}
    assert out == {
        1: ("a", 10.0),   # insert on existing key keeps the target row
        2: ("b2", 25.0),  # updated
        4: ("d", 40.0),   # inserted
    }  # 3 deleted, 9 ignored


def test_merge_apply_upsert_promotes_update_miss(spark):
    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    target, changes = _merge_fixtures(spark)
    out = {
        r.k: (r.name, r.v)
        for r in merge_apply(target, changes, ["k"], upsert=True).collect()
    }
    assert out[9] == ("ghost", 0.0)
    assert set(out) == {1, 2, 4, 9}


def test_merge_apply_rejects_duplicate_change_keys(spark):
    import pytest as _pytest

    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    target, _ = _merge_fixtures(spark)
    dup = spark.createDataFrame(
        [(2, "x", 1.0, "U"), (2, "y", 2.0, "U")],
        "k BIGINT, name STRING, v DOUBLE, op STRING",
    )
    with _pytest.raises(ValueError, match="one winner per key"):
        merge_apply(target, dup, ["k"])


def test_merge_apply_rejects_missing_columns(spark):
    import pytest as _pytest

    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    target, _ = _merge_fixtures(spark)
    bad = spark.createDataFrame([(2, "U")], "k BIGINT, op STRING")
    with _pytest.raises(ValueError, match="missing columns"):
        merge_apply(target, bad, ["k"])


def test_merge_apply_rejects_unknown_ops(spark):
    import pytest as _pytest

    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    target, _ = _merge_fixtures(spark)
    bad = spark.createDataFrame(
        [(2, "x", 1.0, "X")], "k BIGINT, name STRING, v DOUBLE, op STRING"
    )
    with _pytest.raises(ValueError, match="unknown or NULL op"):
        merge_apply(target, bad, ["k"])


def test_merge_apply_rejects_null_ops(spark):
    """NULL op is three-valued-logic bait: ~isin() returns NULL, so an
    unguarded filter lets it slip into silent-ignore."""
    import pytest as _pytest

    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    target, _ = _merge_fixtures(spark)
    bad = spark.createDataFrame(
        [(2, "x", 1.0, None)], "k BIGINT, name STRING, v DOUBLE, op STRING"
    )
    with _pytest.raises(ValueError, match="NULL op"):
        merge_apply(target, bad, ["k"])


def test_merge_apply_preserves_null_key_target_rows(spark):
    """A target row with a NULL key never equi-joins but is still a
    real row — merge must not delete it."""
    from osrs_dashboard_elt_spark.operators.cdc import merge_apply

    target = spark.createDataFrame(
        [(None, "orphan", 1.0), (1, "a", 2.0)],
        "k BIGINT, name STRING, v DOUBLE",
    )
    changes = spark.createDataFrame(
        [(1, "a2", 3.0, "U")], "k BIGINT, name STRING, v DOUBLE, op STRING"
    )
    out = {(r.k, r.name) for r in merge_apply(target, changes, ["k"]).collect()}
    assert out == {(None, "orphan"), (1, "a2")}


def test_connected_components_raises_on_nonconvergence(spark):
    """A graph needing more rounds than max_iter must fail loudly — a
    silently split component means duplicates survive dedup.  With
    hop+shortcut a diameter-63 chain needs ~6 rounds, so max_iter=3
    cannot converge it."""
    import pytest as _pytest

    from osrs_dashboard_elt_spark.operators.components import (
        connected_components,
    )

    n = 64
    vertices = spark.createDataFrame([(i,) for i in range(n)], "id BIGINT")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a BIGINT, id_b BIGINT"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(vertices, chain, max_iter=3)
    # and with enough iterations the same graph converges to one label
    ok = connected_components(vertices, chain, max_iter=10)
    assert {r.component for r in ok.collect()} == {0}


def test_connected_components_validates_max_iter(spark):
    """max_iter < 1 is a caller bug: loud ValueError, not a NameError
    from the unentered loop (a round-3 ADVICE finding)."""
    import pytest as _pytest

    from osrs_dashboard_elt_spark.operators.components import (
        connected_components,
    )

    v = spark.createDataFrame([(1,)], "id BIGINT")
    e = spark.createDataFrame([], "id_a BIGINT, id_b BIGINT")
    with _pytest.raises(ValueError, match="max_iter"):
        connected_components(v, e, max_iter=0)


def test_connected_components_chain_1000_converges_logarithmically(spark):
    """Adversarial diameter: a 1000-vertex path converges in O(log D)
    rounds (hop + pointer-shortcut), not O(D) — the default
    max_iter=20 must handle it with room to spare."""
    from osrs_dashboard_elt_spark.operators.components import (
        connected_components,
    )

    n = 1000
    vertices = spark.range(n).withColumnRenamed("id", "id")
    chain = spark.range(n - 1).selectExpr("id AS id_a", "id + 1 AS id_b")
    stats: dict = {}
    out = connected_components(vertices, chain, stats=stats)
    assert stats["iterations"] < 15, stats
    assert out.filter("component <> 0").count() == 0
    assert out.count() == n


def test_copurchase_basket_cap_bounds_degenerate_orders(spark):
    """A synthetic 10k-item basket must emit at most cap*(cap-1)/2
    pairs (uncapped it would emit ~50M structs from one row), the
    truncation must be observable, and a cap ABOVE the data's max
    basket size must not change any support count."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.baskets import copurchase_pairs

    # one degenerate 10k-item order + two normal 3-item orders
    degenerate = spark.range(10_000).select(
        F.lit(1).alias("order_id"), F.col("id").alias("item")
    )
    normal = spark.createDataFrame(
        [(2, i) for i in (5, 6, 7)] + [(3, i) for i in (5, 6, 8)],
        "order_id INT, item BIGINT",
    )
    df = degenerate.unionByName(normal)

    obs = Observation("cap")
    out = copurchase_pairs(
        df, "order_id", "item", min_support=1, max_basket=64,
        observation=obs,
    )
    n_pairs = out.agg(F.sum("n_orders")).collect()[0][0]
    # degenerate basket contributes exactly C(64,2); each normal C(3,2)
    assert n_pairs == 64 * 63 // 2 + 3 + 3
    assert obs.get["n_truncated_baskets"] == 1
    assert obs.get["n_dropped_items"] == 10_000 - 64
    # support counts: the degenerate basket's surviving first-64 slice
    # (items 0..63) includes 5,6,7,8, so it votes alongside the two
    # normal orders
    sup = {(r.item_a, r.item_b): r.n_orders for r in out.collect()}
    assert sup[(5, 6)] == 3 and sup[(5, 7)] == 2 and sup[(6, 8)] == 2
    assert sup[(0, 63)] == 1 and (0, 64) not in sup  # cap boundary

    # cap above max basket size -> identical to uncapped
    capped = copurchase_pairs(normal, "order_id", "item", 1, max_basket=10)
    uncapped = copurchase_pairs(normal, "order_id", "item", 1, max_basket=1000)
    assert sorted(map(tuple, capped.collect())) == sorted(
        map(tuple, uncapped.collect())
    )


def test_hll_set_overlap_accuracy_and_union_merge(spark):
    """Inclusion-exclusion on max-merged registers tracks the exact
    overlap within sketch error, and disjoint sets clamp at >= 0."""
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.sketches import hll_set_overlap

    # |A| = 3000 (0..2999), |B| = 3000 (2000..4999), overlap 1000
    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(2000, 5000).select(F.col("id").alias("v"))
    r = hll_set_overlap(a, b, "v", p=9).collect()[0]
    assert abs(r.n_a - 3000) / 3000 < 0.15
    assert abs(r.n_b - 3000) / 3000 < 0.15
    assert abs(r.n_union - 5000) / 5000 < 0.15
    assert abs(r.n_overlap - 1000) / 1000 < 0.5  # compounded error
    # union from register max == estimate of the actual union
    from osrs_dashboard_elt_spark.operators.sketches import hll_distinct

    u = (
        hll_distinct(
            a.unionByName(b).select(F.lit("g").alias("g"), "v"), "g", "v", p=9
        ).collect()[0]
    )
    assert u.approx_distinct == r.n_union
    # disjoint sets: overlap clamps at zero or stays tiny
    c = spark.range(10_000, 13_000).select(F.col("id").alias("v"))
    r2 = hll_set_overlap(a, c, "v", p=9).collect()[0]
    assert r2.n_overlap >= 0.0
    assert r2.n_overlap < 0.2 * 3000


def test_hll_set_overlap_empty_side(spark):
    """An empty slice must yield 0.0 counts, not NULLs (no register
    rows means no pivot value for that side)."""
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.sketches import hll_set_overlap

    a = spark.range(0, 500).select(F.col("id").alias("v"))
    empty = spark.range(0).select(F.col("id").alias("v"))
    r = hll_set_overlap(a, empty, "v", p=9).collect()[0]
    assert r.n_b == 0.0 and r.n_overlap == 0.0
    assert abs(r.n_a - 500) / 500 < 0.15
    assert r.n_union == r.n_a


def test_hll_rolling_distinct_tracks_exact_trailing_windows(spark):
    """Each day's estimate must track the EXACT trailing-7-day
    distinct count within sketch error — including days whose window
    spans buckets idle on the day itself."""
    from datetime import datetime as _dt

    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.sketches import (
        hll_rolling_distinct,
    )

    # 20 days; day d sees users [100*d, 100*d + 500): windows overlap
    rows = spark.range(20 * 500).select(
        F.expr("CAST(id DIV 500 AS INT)").alias("d"),
        (F.expr("id DIV 500") * 100 + F.expr("id % 500")).alias("u"),
    )
    df = rows.select(
        F.expr(
            "CAST('2024-03-01' AS TIMESTAMP) + make_interval(0,0,0,d,0,0,0)"
        ).alias("ts"),
        F.col("u"),
    )
    got = {
        r.day.isoformat(): r.approx_distinct
        for r in hll_rolling_distinct(df, "ts", "u", window_days=7).collect()
    }
    assert len(got) == 20
    for d in range(20):
        lo = max(0, d - 6)
        exact = len(
            {100 * k + i for k in range(lo, d + 1) for i in range(500)}
        )
        day = (_dt(2024, 3, 1) + __import__("datetime").timedelta(days=d)).date()
        est = got[day.isoformat()]
        assert abs(est - exact) / exact < 0.15, (d, est, exact)


def test_hll_overlap_pred_single_scan_matches_two_frame(spark):
    """The one-scan predicate form must return exactly the two-frame
    form's row, and its plan must contain a single scan of the input."""
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.sketches import (
        hll_set_overlap,
        hll_set_overlap_pred,
    )

    df = spark.range(0, 4000).select(F.col("id").alias("v"))
    pa, pb = F.col("v") < 2500, F.col("v") >= 1500
    two = hll_set_overlap(
        df.filter(pa), df.filter(pb), "v", p=9
    ).collect()[0]
    one_df = hll_set_overlap_pred(df, "v", pa, pb, p=9)
    one = one_df.collect()[0]
    assert tuple(one) == tuple(two)
    # the register table is checkpointed, so the final plan reads the
    # materialized registers (ExistingRDD) and references the source
    # AT MOST once — never once per side/union branch (3 scans before
    # the truncation)
    plan = one_df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 4000") <= 1, plan
    assert "ExistingRDD" in plan, plan


def test_hll_overlap_differences_consistent(spark):
    """The difference estimates complete the algebra: a_only + b_only
    + overlap reconstructs the union (exactly, by construction), and
    each difference tracks its true size within sketch error."""
    from pyspark.sql import functions as F

    from osrs_dashboard_elt_spark.operators.sketches import hll_set_overlap

    a = spark.range(0, 3000).select(F.col("id").alias("v"))
    b = spark.range(2000, 5000).select(F.col("id").alias("v"))
    r = hll_set_overlap(a, b, "v", p=9).collect()[0]
    assert abs(r.n_a_only - 2000) / 2000 < 0.3
    assert abs(r.n_b_only - 2000) / 2000 < 0.3
    # identity holds on the rounded values (all derived from na/nb/nu)
    assert abs((r.n_a_only + r.n_b_only + r.n_overlap) - r.n_union) < 0.001
