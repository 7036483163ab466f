"""Custom stateful streaming operator: per-key running-best tracking
via ``applyInPandasWithState`` (SURVEY.md §2.9, beyond-ref).

The reference recomputes the whole personal-bests table every 15-minute
cron run (src/3_transform_data.py:643-729 — full recompute of min-per
task).  The streaming-native form is an incremental CHANGE-LOG: keep
one tiny state record per key (current best + holder) and emit a row
only when a new record beats it.  That is not expressible as a
windowed/session aggregation — it needs arbitrary per-key state across
micro-batches, i.e. ``applyInPandasWithState`` (Arrow-batched; the
Python side touches only the group's rows for the current batch).

Scale notes: state is O(#keys) and a few dozen bytes per key (bounded
by construction, no watermark needed for correctness); an optional
processing-time idle timeout evicts keys that stop receiving data.
Rows shuffle once (hash by key).  Each (key, micro-batch) group is
materialized in pandas to sort it — fine when per-key-per-batch volume
is modest (true for record events); extremely hot keys would call for
pre-aggregating ``min_by`` per key inside the batch first.

The same function runs in BATCH mode (Spark executes the plan with an
empty state store, one group invocation each), which is how the
DuckDB oracle checks it: on a single batch the emitted change-log is
exactly "rows strictly below the running minimum of all prior rows"
in (ts, seconds, holder) order — a window-function query.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("best_seconds", T.DoubleType()),
        T.StructField("holder", T.StringType()),
        T.StructField("record_ts", T.TimestampType()),
        T.StructField("prev_best", T.DoubleType()),
    ]
)
# state: current best + holder.  Flat tuple of primitives only — it
# round-trips through the state store on every batch.
STATE_SCHEMA = T.StructType(
    [
        T.StructField("best", T.DoubleType()),
        T.StructField("holder", T.StringType()),
    ]
)


def running_best_changelog(
    events: DataFrame,
    key_col: str = "Task",
    seconds_col: str = "seconds",
    user_col: str = "Username",
    ts_col: str = "ts",
    idle_timeout: str | None = None,
) -> DataFrame:
    """Emit one row per strict improvement of the per-``key`` minimum.

    Output: (key, best_seconds, holder, record_ts, prev_best) where
    ``prev_best`` is the beaten record (null for a key's first).
    Within a batch, rows are processed in (ts, seconds, holder) order,
    so ties at the same timestamp resolve deterministically and only
    genuine strict improvements emit.

    ``idle_timeout`` (e.g. ``"30 minutes"``) drops state for keys idle
    longer than that of processing time — use when the key space
    churns; dropping state means a later event for the key starts a
    fresh change-log.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    src = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(seconds_col).cast("double").alias("seconds"),
        F.col(user_col).cast("string").alias("holder"),
        F.col(ts_col).alias("ts"),
    )

    def track(
        key: tuple, pdf_iter: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best, holder = state.get if state.exists else (None, None)
        group = pd.concat(list(pdf_iter), ignore_index=True)
        if not group.empty:
            group = group.sort_values(
                ["ts", "seconds", "holder"], kind="mergesort", ignore_index=True
            )
            out_best, out_holder, out_ts, out_prev = [], [], [], []
            for seconds, h, ts in zip(
                group["seconds"], group["holder"], group["ts"]
            ):
                if pd.isna(seconds):
                    continue
                if best is None or seconds < best:
                    out_best.append(seconds)
                    out_holder.append(h)
                    out_ts.append(ts)
                    out_prev.append(best)
                    best, holder = float(seconds), h
            if out_best:
                yield pd.DataFrame(
                    {
                        "key": key[0],
                        "best_seconds": pd.array(out_best, dtype="Float64"),
                        "holder": out_holder,
                        "record_ts": out_ts,
                        # Float64 (masked) not float64: None must reach
                        # Arrow as null, not NaN
                        "prev_best": pd.array(out_prev, dtype="Float64"),
                    }
                )
        if best is not None:
            state.update((best, holder))
        if idle_timeout is not None:
            state.setTimeoutDuration(idle_timeout)

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout is not None
        else GroupStateTimeout.NoTimeout
    )
    return src.groupBy("key").applyInPandasWithState(
        track, OUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )


def changelog_via_stream(
    df: DataFrame,
    key_col: str = "Task",
    seconds_col: str = "seconds",
    user_col: str = "Username",
    ts_col: str = "ts",
    work_dir: str | None = None,
    timeout_sec: int = 300,
    engine: str = "apply",
) -> DataFrame:
    """Run the running-best operator over a batch DataFrame by driving
    it through a real one-shot stream (``availableNow`` + memory sink)
    and return the emitted change-log as a batch DataFrame.

    The stateful operators only execute under the streaming engine,
    so this is the bridge for oracle checks and backfills: the batch
    rows become a single-file parquet source (one file -> one
    micro-batch -> deterministic output given the in-operator sort).

    ``engine`` picks the physical operator — ``"apply"`` =
    ``applyInPandasWithState`` (runs everywhere), ``"tws"`` =
    ``transformWithStateInPandas`` (needs the protobuf state-server
    runtime and the RocksDB state store provider, which is pinned for
    the query's one-shot lifetime).  Identical semantics either way
    (equality pinned in tests/test_stateful_tws.py).
    """
    import tempfile

    spark = df.sparkSession
    root = work_dir or tempfile.mkdtemp(prefix="pb_changelog_")
    src_dir = f"{root}/src"
    ckpt_dir = f"{root}/ckpt"
    df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(seconds_col).cast("double").alias("seconds"),
        F.col(user_col).cast("string").alias("holder"),
        F.col(ts_col).alias("ts"),
    ).coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = (
        spark.readStream.schema(
            "key string, seconds double, holder string, ts timestamp"
        ).parquet(src_dir)
    )
    if engine == "tws":
        out = running_best_changelog_tws(
            stream, "key", "seconds", "holder", "ts"
        )
    elif engine == "apply":
        out = running_best_changelog(stream, "key", "seconds", "holder", "ts")
    else:
        raise ValueError(f"unknown engine {engine!r} (want 'apply'|'tws')")
    from .drive import drive_available_now

    # transformWithState requires the RocksDB provider; the shared
    # harness pins it (and the small stateful-shuffle count) for this
    # query's start only — see streaming/drive.py for why restoring
    # right after start() is safe.
    return drive_available_now(
        out, "pb_changelog", ckpt_dir, timeout_sec=timeout_sec,
        rocksdb=(engine == "tws"),
    )


# ---------------------------------------------------------------------------
# transformWithState form (Spark 4 stateful-processor API)
# ---------------------------------------------------------------------------


def running_best_changelog_tws(
    events: DataFrame,
    key_col: str = "Task",
    seconds_col: str = "seconds",
    user_col: str = "Username",
    ts_col: str = "ts",
    require_runtime: bool = True,
) -> DataFrame:
    """Same change-log semantics as ``running_best_changelog``, on the
    current-generation ``transformWithStateInPandas`` API: typed
    ``ValueState`` instead of a monolithic state tuple, explicit
    processor lifecycle, and (unused here) timers/list/map state for
    richer operators.  Streaming runs need the RocksDB state store
    provider (`spark.sql.streaming.stateStore.providerClass`).

    RUNTIME DEPENDENCY: the transformWithState state server speaks
    protobuf between JVM and Python (``pyspark/sql/streaming/proto``),
    so executing this requires ``google.protobuf`` — absent from this
    container, present on standard cluster images.  Plan construction
    and schema are environment-independent and tested; the
    ``applyInPandasWithState`` form above is the executable-everywhere
    implementation and the one the oracle gate checks.

    ``require_runtime=True`` (default) probes for the protobuf
    dependency at CALL time and raises an actionable ImportError —
    without it a missing dependency only surfaces as an opaque worker
    crash mid-query.  Pass ``require_runtime=False`` to build the
    (environment-independent) plan without the runtime, e.g. for plan
    inspection or schema checks."""
    if require_runtime:
        # best-effort unblock first: containers without a protobuf
        # wheel may carry a vendored copy (see compat.ensure_protobuf;
        # it must run before the JVM launches for WORKERS to see it —
        # get_spark() does, so sessions built there are covered)
        from ..compat import ensure_protobuf

        ensure_protobuf()
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "running_best_changelog_tws requires google.protobuf "
                "(the transformWithState JVM<->Python state server "
                "speaks protobuf). Install `protobuf` / use a cluster "
                "image with pyspark's connect extras, or use "
                "running_best_changelog (applyInPandasWithState), "
                "which has identical semantics and no extra "
                "dependency."
            ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    src = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(seconds_col).cast("double").alias("seconds"),
        F.col(user_col).cast("string").alias("holder"),
        F.col(ts_col).alias("ts"),
    )

    class RunningBest(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._best = handle.getValueState("best", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            stored = self._best.get()
            best, holder = stored if stored is not None else (None, None)
            group = pd.concat(list(rows), ignore_index=True)
            if group.empty:
                return
            group = group.sort_values(
                ["ts", "seconds", "holder"], kind="mergesort", ignore_index=True
            )
            out_best, out_holder, out_ts, out_prev = [], [], [], []
            for seconds, h, ts in zip(group["seconds"], group["holder"], group["ts"]):
                if pd.isna(seconds):
                    continue
                if best is None or seconds < best:
                    out_best.append(seconds)
                    out_holder.append(h)
                    out_ts.append(ts)
                    out_prev.append(best)
                    best, holder = float(seconds), h
            if best is not None:
                self._best.update((best, holder))
            if out_best:
                yield pd.DataFrame(
                    {
                        "key": key[0],
                        "best_seconds": pd.array(out_best, dtype="Float64"),
                        "holder": out_holder,
                        "record_ts": out_ts,
                        "prev_best": pd.array(out_prev, dtype="Float64"),
                    }
                )

        def close(self) -> None:
            pass

    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=RunningBest(),
        outputStructType=OUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )
