"""Shared one-shot stream-drive harness.

Three operators bridge batch frames through a REAL streaming engine
for oracle checks and backfills (running-best changelog, timer
sessions, top-K entries).  The drive mechanics are identical — pin a
small stateful shuffle-partition count and (for transformWithState)
the RocksDB state-store provider for the query's start, availableNow
trigger into a named memory sink, bounded await, return the sink
table — so they live here once; the next harness fix lands in one
place.

Both pinned confs are read ONCE at query start (the partition count
is baked into the fresh checkpoint; the provider is resolved when the
state operator initializes), so restoring the session values in the
``finally`` immediately after ``start()`` is safe: ``start()``
synchronously clones the session conf into the StreamExecution before
returning, and the one-shot query never restarts against a changed
value.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)


def drive_available_now(
    out: DataFrame,
    qname_prefix: str,
    ckpt_dir: str,
    timeout_sec: int = 300,
    shuffle_partitions: int = 4,
    rocksdb: bool = True,
) -> DataFrame:
    """Run the streaming frame ``out`` as a one-shot query
    (availableNow + memory sink) and return the sink table.

    ``shuffle_partitions`` sizes the stateful shuffle for the FRESH
    checkpoint — each partition carries a state store and an Arrow
    Python worker, so 32 of each for a handful of keys is pure setup
    overhead; per-key state-server RPC-bound operators (timer
    sessions) want more, value-bound ones fewer.  ``rocksdb`` pins
    the provider transformWithState requires.  Raises TimeoutError
    (after stopping the query) rather than returning a silently
    truncated sink."""
    spark = out.sparkSession
    qname = f"{qname_prefix}_{uuid.uuid4().hex[:12]}"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_provider = None
    if rocksdb:
        try:
            prev_provider = spark.conf.get(_PROVIDER_KEY)
        except Exception:
            prev_provider = None
    spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if rocksdb:
        spark.conf.set(_PROVIDER_KEY, _ROCKSDB)
    try:
        q = (
            out.writeStream.queryName(qname)
            .format("memory")
            .outputMode("append")
            .option("checkpointLocation", ckpt_dir)
            .trigger(availableNow=True)
            .start()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        if rocksdb:
            if prev_provider is None:
                spark.conf.unset(_PROVIDER_KEY)
            else:
                spark.conf.set(_PROVIDER_KEY, prev_provider)
    if not q.awaitTermination(timeout_sec):
        # timed out: the query is STILL RUNNING — returning the sink
        # now would hand back a silently truncated result
        q.stop()
        raise TimeoutError(
            f"{qname_prefix} stream did not finish within {timeout_sec}s"
        )
    return spark.table(qname)
