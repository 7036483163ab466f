"""File-skipping stats manifest (sources/stats_manifest.py): a
selective probe on a z-ordered table must read strictly fewer FILES
than the full scan (planning-time pruning, asserted via
DataFrame.inputFiles), with results exactly equal to scan+filter; a
stale manifest must fail loudly, never silently drop rows."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.zorder import write_zordered
from osrs_dashboard_elt_spark.sources.stats_manifest import (
    manifest_file_count,
    pruned_scan,
    write_stats_manifest,
)

N_FILES = 16


def _rows(df):
    """Null-safe canonical ordering (y is nullable)."""
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v or 0) for v in t),
    )


def _grid(spark):
    # 64x64 grid plus a null-y stripe: selective boxes in EITHER dim
    return spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        F.when(F.col("id") < 4000, (F.col("id") / 64).cast("long")).alias("y"),
        (F.col("id") * 7 % 1000).alias("payload"),
    )


@pytest.fixture(scope="module")
def zpath(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("z") / "tbl")
    write_zordered(
        _grid(spark), path, ["x", "y"], N_FILES, stats_cols=["x", "y"]
    )
    return path


def test_selective_probe_reads_strictly_fewer_files(spark, zpath):
    bounds = {"y": (10, 13)}  # ~6% of rows, non-leading dimension
    pruned = pruned_scan(spark, zpath, bounds)
    full = spark.read.parquet(zpath)
    assert len(full.inputFiles()) == N_FILES
    n_pruned = len(pruned.inputFiles())
    assert 0 < n_pruned < N_FILES
    assert n_pruned == manifest_file_count(spark, zpath, bounds)

    want = _rows(full.filter("y >= 10 AND y <= 13"))
    got = _rows(pruned)
    assert got == want and len(want) > 0


def test_box_probe_on_both_dims(spark, zpath):
    bounds = {"x": (5, 9), "y": (None, 20)}
    pruned = pruned_scan(spark, zpath, bounds)
    full = spark.read.parquet(zpath).filter(
        "x >= 5 AND x <= 9 AND y <= 20"
    )
    assert len(pruned.inputFiles()) < N_FILES
    assert _rows(pruned) == _rows(full)


def test_empty_probe_returns_schema_stable_empty(spark, zpath):
    out = pruned_scan(spark, zpath, {"x": (1000, 2000)})
    assert out.count() == 0
    assert out.schema == spark.read.parquet(zpath).schema


def test_stale_manifest_fails_loudly(spark, zpath, tmp_path):
    path = str(tmp_path / "tbl")
    df = _grid(spark)
    write_zordered(df, path, ["x", "y"], 4, stats_cols=["x"])
    pruned_scan(spark, path, {"x": (0, 3)}).count()
    # a file appended WITHOUT refreshing stats would be silently
    # skipped by pruning -> the read must refuse instead
    df.limit(10).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="stale"):
        pruned_scan(spark, path, {"x": (0, 3)})
    # refreshing the manifest heals the table
    write_stats_manifest(spark, path, ["x"])
    got = pruned_scan(spark, path, {"x": (0, 3)})
    want = spark.read.parquet(path).filter("x >= 0 AND x <= 3")
    assert _rows(got) == _rows(want)


def test_publish_versioned_carries_stats(spark, tmp_path):
    from osrs_dashboard_elt_spark.sources.maintenance import (
        publish_versioned,
        read_version,
    )

    root = str(tmp_path / "pub")
    v = publish_versioned(_grid(spark), root, stats_cols=["x"])
    snap = f"{root}/v{v}"
    # the snapshot read ignores the underscore manifest dir
    assert read_version(spark, root, v).count() == 64 * 64
    bounds = {"x": (0, 0)}
    pruned = pruned_scan(spark, snap, bounds)
    full = read_version(spark, root, v).filter("x = 0")
    assert _rows(pruned) == _rows(full)


def test_unbounded_bound_is_rejected(spark, zpath):
    """(None, None) adds no row predicate but would still skip
    all-NULL-stats files — must be rejected, not silently lossy."""
    from osrs_dashboard_elt_spark.sources.stats_manifest import (
        manifest_file_count,
    )

    with pytest.raises(ValueError, match="None, None"):
        pruned_scan(spark, zpath, {"y": (None, None)})
    with pytest.raises(ValueError, match="None, None"):
        manifest_file_count(spark, zpath, {"y": (None, None)})


def test_incremental_refresh_stats_manifest(spark, tmp_path):
    """refresh_stats_manifest stats ONLY the new files (O(append), not
    O(table)), drops rows for vanished files, and heals the stale
    check; a changed stats column set is rejected loudly."""
    from osrs_dashboard_elt_spark.sources.stats_manifest import (
        refresh_stats_manifest,
    )

    path = str(tmp_path / "tbl")
    df = _grid(spark)
    write_zordered(df, path, ["x", "y"], 4, stats_cols=["x"])
    # append without refresh -> stale; incremental refresh heals
    df.filter("x = 63").coalesce(1).write.mode("append").parquet(path)
    with pytest.raises(ValueError, match="stale"):
        pruned_scan(spark, path, {"x": (63, 63)})
    added, removed = refresh_stats_manifest(spark, path, ["x"])
    assert (added, removed) == (1, 0)
    got = pruned_scan(spark, path, {"x": (63, 63)})
    want = spark.read.parquet(path).filter("x = 63")
    assert got.count() == want.count() == 2 * 64  # base + appended copy
    # no-op refresh
    assert refresh_stats_manifest(spark, path, ["x"]) == (0, 0)
    # compaction: rewrite to fewer files -> removed rows dropped
    import os
    import shutil

    compacted = str(tmp_path / "tbl2")
    spark.read.parquet(path).coalesce(2).write.parquet(compacted)
    shutil.copytree(
        os.path.join(path, "_stats_manifest"),
        os.path.join(compacted, "_stats_manifest"),
    )
    added, removed = refresh_stats_manifest(spark, compacted, ["x"])
    assert added == 2 and removed == 5  # 4 z-files + 1 append vanished
    pruned_scan(spark, compacted, {"x": (0, 5)}).count()
    # changed column set: loud
    with pytest.raises(ValueError, match="Rebuild"):
        refresh_stats_manifest(spark, compacted, ["y"])
