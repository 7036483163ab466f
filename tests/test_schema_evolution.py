"""Schema drift on bronze appends: strict rejection, additive
evolution, type-conflict detection, merged reads."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from osrs_dashboard_elt_spark.schema import (
    conform,
    evolve_schema,
    read_evolved,
)

BASE = T.StructType(
    [
        T.StructField("id", T.LongType(), True),
        T.StructField("name", T.StringType(), True),
    ]
)


def test_identical_batch_passes_both_policies(spark):
    b = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    assert evolve_schema(BASE, b, "strict") == BASE
    assert evolve_schema(BASE, b, "evolve") == BASE


def test_strict_rejects_new_columns(spark):
    b = spark.createDataFrame(
        [(1, "a", 2.0)], "id BIGINT, name STRING, score DOUBLE"
    )
    with pytest.raises(ValueError, match="undeclared columns.*score"):
        evolve_schema(BASE, b, "strict")


def test_evolve_appends_nullable_fields(spark):
    b = spark.createDataFrame(
        [(1, "a", 2.0)], "id BIGINT, name STRING, score DOUBLE"
    )
    widened = evolve_schema(BASE, b, "evolve")
    assert [f.name for f in widened.fields] == ["id", "name", "score"]
    assert widened.fields[2].nullable


def test_cross_family_type_conflict_rejected(spark):
    b = spark.createDataFrame([("x", "a")], "id STRING, name STRING")
    # string -> bigint loses information: conflict under either policy
    with pytest.raises(ValueError, match="type conflicts"):
        evolve_schema(BASE, b, "evolve")


def test_numeric_widening_is_not_a_conflict(spark):
    b = spark.createDataFrame([(1, "a")], "id INT, name STRING")
    assert evolve_schema(BASE, b, "strict") == BASE  # conform() casts


def test_merged_read_backfills_nulls(spark, tmp_path):
    path = str(tmp_path / "bronze")
    b1 = spark.createDataFrame([(1, "a")], "id BIGINT, name STRING")
    conform(b1, BASE).write.mode("append").parquet(path)
    b2 = spark.createDataFrame(
        [(2, "b", 9.5)], "id BIGINT, name STRING, score DOUBLE"
    )
    widened = evolve_schema(BASE, b2, "evolve")
    conform(b2, widened).write.mode("append").parquet(path)
    out = read_evolved(spark, path)
    assert set(out.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in out.collect()}
    assert rows == {1: None, 2: 9.5}


def test_lossy_numeric_casts_are_conflicts(spark):
    """double->long truncates and long->int overflows: both must be
    conflicts, not conformance."""
    base = T.StructType([T.StructField("id", T.LongType(), True)])
    d = spark.createDataFrame([(9.5,)], "id DOUBLE")
    with pytest.raises(ValueError, match="type conflicts"):
        evolve_schema(base, d, "evolve")
    narrow = T.StructType([T.StructField("id", T.IntegerType(), True)])
    l = spark.createDataFrame([(1,)], "id BIGINT")
    with pytest.raises(ValueError, match="type conflicts"):
        evolve_schema(narrow, l, "evolve")
    # int -> double is exact: allowed
    wide = T.StructType([T.StructField("id", T.DoubleType(), True)])
    i = spark.createDataFrame([(1,)], "id INT")
    assert evolve_schema(wide, i, "strict") == wide
