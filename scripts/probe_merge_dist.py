"""Probe: the distributed no-collect MERGE at backfill scale
(sources/maintenance.py::targeted_upsert, round-9 judge ask #1).

Claims under test:

1. A changeset 8x larger (25k -> 200k update rows) schedules the SAME
   number of Spark jobs — the batched O(1)-job execution contract
   survives losing the driver-memory cap.
2. Wall clock grows sublinearly in changeset size (the work is the
   classification scan + one rewrite of the affected files, not
   per-row driver handling).
3. Results equal the driver-sized path bit-for-bit at a size both can
   run (parity spot-check at 25k rows).

Usage: python scripts/probe_merge_dist.py [max_rows]
       (default 200000)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from osrs_dashboard_elt_spark.session import get_spark  # noqa: E402
from osrs_dashboard_elt_spark.sources.maintenance import (  # noqa: E402
    targeted_upsert,
)
from osrs_dashboard_elt_spark.sources.stats_manifest import (  # noqa: E402
    read_table,
    write_stats_manifest,
)


def _count_jobs(spark, fn):
    sc = spark.sparkContext
    g = "probe-" + uuid.uuid4().hex
    sc.setJobGroup(g, "merge-dist probe")
    try:
        fn()
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    return len(sc.statusTracker().getJobIdsForGroup(g))


def _build(spark, path, n_rows=400_000, files=32):
    df = spark.range(n_rows).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("tag"),
        F.concat(F.lit("t"), F.col("id")).alias("text"),
    )
    df.repartition(files, "doc_id").write.parquet(path)
    write_stats_manifest(
        spark, path, ["tag"], bloom_cols=["doc_id"], bloom_bits=1 << 18
    )


def _changeset(spark, n, table_rows=400_000):
    # half updates (existing ids), half inserts (ids past the table)
    return spark.range(n).select(
        F.when(
            F.col("id") % 2 == 0, F.col("id")
        ).otherwise(table_rows + F.col("id")).alias("doc_id"),
        F.lit(1).alias("tag"),
        F.concat(F.lit("u"), F.col("id")).alias("text"),
    )


def main() -> None:
    max_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="merge-dist-")
    out = []
    n = 25_000
    while n <= max_rows:
        path = os.path.join(base, f"t{n}")
        _build(spark, path)
        ups = _changeset(spark, n)
        t0 = time.time()
        jobs = _count_jobs(
            spark,
            lambda: targeted_upsert(
                spark, path, "doc_id", ups, distributed=True
            ),
        )
        wall = time.time() - t0
        got = read_table(spark, path)
        rec = {
            "changeset_rows": n,
            "jobs": jobs,
            "wall_s": round(wall, 2),
            "table_rows_after": got.count(),
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)
        n *= 2
    # parity spot-check at the smallest size
    pa = os.path.join(base, "parity-a")
    pb = os.path.join(base, "parity-b")
    _build(spark, pa, n_rows=50_000, files=8)
    _build(spark, pb, n_rows=50_000, files=8)
    ups = _changeset(spark, 5_000, table_rows=50_000)
    targeted_upsert(spark, pa, "doc_id", ups)  # driver-sized path
    targeted_upsert(spark, pb, "doc_id", ups, distributed=True)
    same = (
        read_table(spark, pa)
        .exceptAll(read_table(spark, pb))
        .isEmpty()
        and read_table(spark, pb)
        .exceptAll(read_table(spark, pa))
        .isEmpty()
    )
    print(
        json.dumps(
            {
                "summary": "merge-dist",
                "jobs_flat": len({r["jobs"] for r in out}) == 1,
                "parity_driver_vs_distributed": bool(same),
                "rows": out,
            }
        ),
        flush=True,
    )
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
