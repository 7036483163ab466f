"""Targeted delete (sources/maintenance.py::targeted_delete): rewrite
ONLY the files that can contain the target ids — bloom-planned via the
stats manifest — leaving every other file byte-untouched; freshness is
mandatory (a stale manifest missing files would leave rows behind)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.sources.maintenance import targeted_delete
from osrs_dashboard_elt_spark.sources.stats_manifest import (
    files_for_values,
    pruned_scan,
    write_stats_manifest,
)


def _tbl(spark, path, n=4000, files=8):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("tag"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    df.repartition(files, "doc_id").write.parquet(path)
    write_stats_manifest(
        spark, path, ["tag"], bloom_cols=["doc_id"], bloom_bits=1 << 15
    )


def _files(path):
    return sorted(
        (f, os.path.getmtime(os.path.join(path, f)))
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )


def test_delete_rewrites_only_matching_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _tbl(spark, path)
    before = dict(_files(path))
    targets = [17, 1234, 3999]
    planned = files_for_values(spark, path, "doc_id", targets)
    assert 0 < len(planned) < 8  # bloom pruning really narrowed it
    res = targeted_delete(spark, path, "doc_id", targets)
    assert res["rows_deleted"] == 3
    assert res["files_affected"] == len(planned)
    assert res["files_rewritten"] + res["files_removed"] >= 1
    # untouched files are byte-identical (same name, same mtime)
    after = dict(_files(path))
    untouched = set(before) & set(after)
    assert len(untouched) >= 8 - len(planned)
    for f in untouched:
        assert before[f] == after[f]
    # the rows are gone; everything else survived
    remaining = spark.read.parquet(path)
    assert remaining.filter(F.col("doc_id").isin(targets)).count() == 0
    assert remaining.count() == 4000 - 3
    # manifest was refreshed: pruned reads still work and are fresh
    assert pruned_scan(spark, path, points={"doc_id": 18}).count() == 1
    # idempotent: the refreshed blooms no longer contain the ids
    res2 = targeted_delete(spark, path, "doc_id", targets)
    assert res2["rows_deleted"] == 0


def test_fully_matching_file_is_removed(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _tbl(spark, path, n=100, files=2)
    # append a file containing ONLY the target ids
    spark.createDataFrame(
        [(100000 + i, 0, "x") for i in range(5)],
        "doc_id long, tag long, text string",
    ).coalesce(1).write.mode("append").parquet(path)
    from osrs_dashboard_elt_spark.sources.stats_manifest import (
        refresh_stats_manifest,
    )

    refresh_stats_manifest(spark, path, ["tag"])
    res = targeted_delete(
        spark, path, "doc_id", [100000 + i for i in range(5)]
    )
    assert res["files_removed"] == 1 and res["rows_deleted"] == 5
    assert spark.read.parquet(path).count() == 100


def test_null_rows_survive(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (None, "keep-me"), (3, "c")],
        "doc_id long, text string",
    )
    df.coalesce(1).write.parquet(path)
    write_stats_manifest(
        spark, path, ["doc_id"], bloom_cols=["doc_id"], bloom_bits=1 << 15
    )
    res = targeted_delete(spark, path, "doc_id", [2, 3])
    assert res["rows_deleted"] == 2
    got = sorted(
        ((r["doc_id"], r["text"]) for r in
         spark.read.parquet(path).collect()),
        key=lambda t: (t[0] is not None, t[0] or 0),
    )
    assert got == [(None, "keep-me"), (1, "a")]


def test_immutable_snapshot_refuses(spark, tmp_path):
    from osrs_dashboard_elt_spark.sources.maintenance import (
        publish_versioned,
    )

    root = str(tmp_path / "pub")
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    v = publish_versioned(df, root, stats_cols=["doc_id"])
    with pytest.raises(ValueError, match="immutable"):
        targeted_delete(spark, f"{root}/v{v}", "doc_id", [1])


def test_stale_manifest_refuses(spark, tmp_path):
    path = str(tmp_path / "tbl")
    _tbl(spark, path, n=100, files=2)
    spark.createDataFrame(
        [(777, 0, "x")], "doc_id long, tag long, text string"
    ).coalesce(1).write.mode("append").parquet(path)
    # the un-refreshed manifest doesn't know the new file: deleting
    # 777 would miss it — must refuse, not silently leave the row
    with pytest.raises(ValueError, match="stale"):
        targeted_delete(spark, path, "doc_id", [777])


def test_partition_column_delete_refuses(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    df = spark.range(100).select(
        (F.col("id") % 4).alias("day"), F.col("id").alias("doc_id")
    )
    df.write.partitionBy("day").parquet(path)
    write_stats_manifest(spark, path, ["day"])
    with pytest.raises(ValueError, match="partition column"):
        targeted_delete(spark, path, "day", [2])


def test_duplicate_values_in_delete_list(spark, tmp_path):
    """A duplicated id in the takedown list must not break bloom
    planning (the all-probes-hit count) — regression: [5, 5] doubled
    the probe rows and silently missed the file."""
    path = str(tmp_path / "tbl")
    _tbl(spark, path, n=500, files=4)
    planned = files_for_values(spark, path, "doc_id", [5, 5, 9])
    assert planned == files_for_values(spark, path, "doc_id", [5, 9])
    res = targeted_delete(spark, path, "doc_id", [5, 5, 9])
    assert res["rows_deleted"] == 2
    assert spark.read.parquet(path).filter("doc_id IN (5, 9)").count() == 0
