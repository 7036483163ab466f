"""SparkSession factory with scale-aware defaults.

The engine targets large clusters (the reference ran on a Raspberry Pi;
we design for 1000 executors / 100 TB).  Every default here is chosen so
the same plan shape survives a 100x scale-up:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion replace hand-tuned partition counts.
- UTC session timezone: the reference re-parses ISO strings to tz-aware
  datetimes on every read (reference src/3_transform_data.py:817-818);
  we normalize once at the session boundary instead.
- Arrow enabled: every pandas interchange (and any pandas UDF on the
  slow path) is Arrow-batched, never row-at-a-time pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Local-mode heap cap: $SPARK_GRAFT_DRIVER_MEM if set, else ~40%
    of physical memory clamped to [2g, 48g].  local[N] runs the driver
    AND all N executor threads in one JVM, and the Java default heap
    (1 GB) starves 32 concurrent tasks into GC storms and heap OOMs
    long before the machine's memory is touched — but a hardcoded big
    number would let the heap outgrow a small host and trade a
    bounded java OutOfMemoryError for the OS OOM-killer.  An upper
    bound, not a reservation; spark-submit-managed drivers size
    themselves (static conf is ignored after JVM launch)."""
    env = os.environ.get("SPARK_GRAFT_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    total_gb = int(line.split()[1]) / 1024 / 1024
                    break
            else:
                return "4g"
    except OSError:
        return "4g"
    return f"{max(2, min(48, int(total_gb * 0.4)))}g"


_DEFAULTS = {
    # Static conf, applied only when THIS factory launches the JVM.
    "spark.driver.memory": _default_driver_mem(),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Files: keep scan partitions big enough to amortize task overhead at
    # scale but small enough to fit executor memory at 100 TB inputs.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Dimension tables in this workload are small (parts, nations,
    # price series, mapping rules) -> broadcast aggressively.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.sql.shuffle.partitions": "32",
    # The default 100-entry whole-stage-codegen class cache thrashes on
    # a multi-query workload (this suite alone compiles several hundred
    # codegen units; a long-lived cluster serves thousands) — each
    # eviction re-pays a Janino compile on the next run of that plan.
    # Entries are compiled classes (~KBs); 10k is still tiny memory.
    "spark.sql.codegen.cache.maxEntries": "10000",
}


def get_spark(
    app_name: str = "osrs-dashboard-elt-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master=None`` defers to the environment (spark-submit / existing
    session); tests pass ``local[N]``.
    """
    # before the JVM gateway launches: workers inherit the env set here
    from .compat import ensure_protobuf

    ensure_protobuf()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to a session we did not
    create (e.g. the driver's).  Static confs are skipped silently."""
    for k, v in _DEFAULTS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
    return spark
