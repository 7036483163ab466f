"""Z-order clustering: the written layout must actually enable
multi-dimensional file skipping (checked against parquet footer
min/max stats), and the key must interleave correctly."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.zorder import (
    column_ranges,
    write_zordered,
    zorder_key,
)

N_FILES = 16


def _candidate_files(path: str, col: str, lo: float, hi: float) -> int:
    """Files whose footer [min, max] for ``col`` intersects [lo, hi] —
    what any stats-based reader must open."""
    n = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            fmin = st.min if fmin is None else min(fmin, st.min)
            fmax = st.max if fmax is None else max(fmax, st.max)
        if fmin is not None and not (fmax < lo or fmin > hi):
            n += 1
    return n


def test_zorder_key_interleaves(spark):
    df = spark.range(1).select(
        F.lit(3).alias("a"), F.lit(1).alias("b")
    )
    # ranges [0, 3] with bits=2: a=3 -> 0b11, b=1 -> 0b01
    # interleave (a more significant per round): z = a1 b1 a0 b0 = 1 0 1 1
    z = df.select(
        zorder_key(["a", "b"], {"a": (0, 3), "b": (0, 3)}, bits=2).alias("z")
    ).first()["z"]
    assert z == 0b1011


def test_zordered_layout_prunes_non_leading_dimension(spark, tmp_path):
    """An x-sorted layout cannot skip files for a y-only box; the
    z-ordered one must."""
    df = (
        # pinned slice count: repartitionByRange SAMPLES its bounds
        # from the input partitioning, so an unpinned range() makes
        # file boundaries depend on whatever parallelism the suite
        # context left behind (observed flaky under the full run)
        spark.range(0, 40_000, 1, 8)
        .select(
            ((F.col("id") * 2654435761) % 10_000).alias("x"),
            ((F.col("id") * 40503) % 10_000).alias("y"),
        )
    )
    zpath = str(tmp_path / "zordered")
    xpath = str(tmp_path / "xsorted")
    # range-boundary sampling is the remaining nondeterminism under a
    # loaded full-suite run: oversample so the boundaries are exact
    # and the per-file min/max stats the assertions read are stable
    spark.conf.set(
        "spark.sql.execution.rangeExchange.sampleSizePerPartition", "20000"
    )
    try:
        write_zordered(df, zpath, ["x", "y"], n_files=N_FILES)
        (
            df.repartitionByRange(N_FILES, "x")
            .sortWithinPartitions("x")
            .write.mode("overwrite")
            .parquet(xpath)
        )
    finally:
        spark.conf.unset(
            "spark.sql.execution.rangeExchange.sampleSizePerPartition"
        )
    assert len(glob.glob(f"{zpath}/part-*.parquet")) == N_FILES
    # y-selective box: 5% of the y domain
    z_files = _candidate_files(zpath, "y", 1000, 1500)
    x_files = _candidate_files(xpath, "y", 1000, 1500)
    assert x_files == N_FILES  # x-sort: every file spans all of y
    assert z_files < N_FILES // 2, (z_files, x_files)
    # and the x dimension still prunes on the z layout too
    assert _candidate_files(zpath, "x", 1000, 1500) < N_FILES
    # rows are intact
    assert spark.read.parquet(zpath).count() == 40_000


def test_column_ranges_single_scan(spark):
    df = spark.range(0, 100).select(
        F.col("id").alias("a"), (99 - F.col("id")).alias("b")
    )
    r = column_ranges(df, ["a", "b"])
    assert r == {"a": (0.0, 99.0), "b": (0.0, 99.0)}
