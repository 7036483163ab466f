"""Shared one-shot stream-drive harness.

Three operators bridge batch frames through a REAL streaming engine
for oracle checks and backfills (running-best changelog, timer
sessions, top-K entries).  The drive mechanics are identical — pin a
stateful shuffle-partition count and (for transformWithState) the
RocksDB state-store provider for the query's start, availableNow
trigger into a named memory sink, bounded await, return the sink
table — so they live here once; the next harness fix lands in one
place.

The pinned confs are read ONCE at query start (the partition count
is baked into the fresh checkpoint; the provider and checkpoint
format are resolved when the state operator initializes), so
restoring the session values in the ``finally`` immediately after
``start()`` is safe: ``start()`` synchronously clones the session
conf into the StreamExecution before returning, and the one-shot
query never restarts against a changed value.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"
_ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state."
    "RocksDBStateStoreProvider"
)
def default_state_partitions(spark) -> int:
    """Stateful shuffle width for a ONE-SHOT drive, derived from the
    session's configured shuffle width rather than a constant.

    Each stateful partition pays a fixed engine start (a RocksDB
    store, an Arrow Python worker, and — under transformWithState —
    a state-server channel; measured ~0.25 s apiece cold on
    local[32]), while the per-key state RPCs parallelize across
    partitions.  A bounded drive therefore wants a FRACTION of the
    session width.  The fraction is an eighth (floor 2): under the
    bench's warm-run protocol an interleaved old/new A/B showed the
    formerly hard-coded width 4 already optimal at the bench's
    32-partition session (wider widths cost more engine starts than
    their RPC spread recovered once warm), and an eighth reproduces
    exactly that at the bench width while still scaling with a
    cluster session's real parallelism instead of being a local-mode
    constant.  RPC-bound drives (timer sessions: 4 state round trips
    for every key in the corpus) take a multiple of this base — see
    the call sites.  Long-lived streams should size their checkpoint
    width explicitly instead.

    ``SPARK_GRAFT_STREAM_STATE_PARTITIONS`` overrides (deployments
    that know their key cardinality)."""
    env = os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS")
    if env:
        # malformed override falls through to the derived width (same
        # defensive posture as the conf read below) instead of aborting
        # every streaming drive with an uncaught ValueError
        try:
            return max(1, int(env))
        except ValueError:
            pass
    try:
        sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        sp = 16
    # floor of 2, never wider than the session width itself (the
    # clamp order matters only for tiny sessions: sp=1 must give 1,
    # not a width above the session's own parallelism)
    return min(max(sp, 1), max(2, sp // 8))


def drive_available_now(
    out: DataFrame,
    qname_prefix: str,
    ckpt_dir: str,
    timeout_sec: int = 300,
    shuffle_partitions: int | None = None,
    rocksdb: bool = True,
) -> DataFrame:
    """Run the streaming frame ``out`` as a one-shot query
    (availableNow + memory sink) and return the sink table.

    ``shuffle_partitions`` sizes the stateful shuffle for the FRESH
    checkpoint; ``None`` (the default) derives it from the session's
    shuffle width via :func:`default_state_partitions`.  ``rocksdb``
    pins the provider transformWithState requires.  (RocksDB
    changelog checkpointing was tried here and REVERTED: in an
    interleaved A/B under the bench's warm-run protocol it was
    neutral-to-negative for these two-batch drives — the batch-2
    store load pays a changelog replay that a plain snapshot load
    does not, and a one-shot drive has no restore to amortize it.)
    Raises TimeoutError (after stopping the query) rather than
    returning a silently truncated sink."""
    spark = out.sparkSession
    if shuffle_partitions is None:
        shuffle_partitions = default_state_partitions(spark)
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
