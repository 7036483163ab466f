"""Bloom semi-join prefilter: no false negatives, exact semi-join
equality, and real selectivity (operators/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def frames(spark):
    big = spark.createDataFrame(
        [(i, i % 7) for i in range(2000)], "k bigint, v int"
    ).cache()
    small = spark.createDataFrame(
        [(i * 13,) for i in range(40)], "k bigint"
    ).cache()  # keys 0, 13, 26, ... 507
    return big, small


def test_no_false_negatives(spark, frames):
    _, small = frames
    words = bloom_build(small, "k", m_bits=1 << 12, k=5)
    passed = bloom_prefilter(small, "k", words, 5).count()
    assert passed == small.count()  # every built key must pass


def test_semi_join_equality(frames):
    big, small = frames
    got = sorted(
        (r["k"], r["v"])
        for r in bloom_semi_join(big, small, "k", m_bits=1 << 12, k=5).collect()
    )
    want = sorted(
        (r["k"], r["v"])
        for r in big.join(small, "k", "left_semi").collect()
    )
    assert got == want and len(got) > 0


def test_prefilter_is_selective(frames):
    """The point of the bloom: most non-matching probe rows drop at
    the scan.  2000 probe keys vs 40 built keys at m=4096, k=5 →
    well under 20% pass the prefilter."""
    big, small = frames
    words = bloom_build(small, "k", m_bits=1 << 12, k=5)
    n_pre = bloom_prefilter(big, "k", words, 5).count()
    n_true = big.join(small, "k", "left_semi").count()
    assert n_true <= n_pre < 0.2 * big.count(), (n_true, n_pre)


def test_m_bits_validation(frames):
    _, small = frames
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom_build(small, "k", m_bits=100)


def test_empty_build_side(spark, frames):
    big, _ = frames
    empty = spark.createDataFrame([], "k bigint")
    assert bloom_semi_join(big, empty, "k", m_bits=1 << 12, k=5).count() == 0


def test_bloom_persists_through_registry(spark, frames, tmp_path):
    """The docstring's claim: a built bloom is just longs — save it in
    the model registry, load in another session, prefilter
    identically."""
    from osrs_dashboard_elt_spark.operators.registry import (
        load_model,
        save_model,
    )

    big, small = frames
    words = bloom_build(small, "k", m_bits=1 << 12, k=5)
    path = str(tmp_path / "reg")
    save_model(spark, path, "urgent_keys", "bloom", {"words": words, "k": 5})
    loaded, _ = load_model(spark, path, "urgent_keys")
    a = sorted(r["k"] for r in bloom_prefilter(big, "k", words, 5).collect())
    b = sorted(
        r["k"]
        for r in bloom_prefilter(big, "k", loaded["words"], loaded["k"]).collect()
    )
    assert a == b


def test_null_build_keys_ignored(spark, frames):
    """A NULL build-side key must be dropped (a plain semi-join
    ignores NULL keys) — it used to crash the word assembly with a
    NULL hash position."""
    big, small = frames
    with_null = small.unionByName(
        spark.createDataFrame([(None,)], "k bigint")
    )
    words = bloom_build(with_null, "k", m_bits=1 << 12, k=5)
    got = sorted(
        r["k"] for r in bloom_semi_join(big, with_null, "k", k=5).collect()
    )
    want = sorted(r["k"] for r in big.join(small, "k", "left_semi").collect())
    assert got == want


def test_null_probe_keys_dropped(spark, frames):
    """xxhash64(NULL) is a non-null constant — without an explicit
    filter every NULL-key probe row would share one position set;
    they must drop instead (semi-join semantics)."""
    big, small = frames
    words = bloom_build(small, "k", m_bits=1 << 12, k=5)
    with_null = big.unionByName(
        spark.createDataFrame([(None, 0)], "k bigint, v int")
    )
    got = bloom_prefilter(with_null, "k", words, 5)
    assert got.filter(F.col("k").isNull()).count() == 0
