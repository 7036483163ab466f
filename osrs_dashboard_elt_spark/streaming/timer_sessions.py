"""Timer-based streaming sessionization on ``transformWithState``.

The batch engine already sessionizes by inactivity gap
(``operators/sessionize.py`` — lag -> flag -> running sum) and the
streaming engine has the built-in ``session_window`` rollup
(``streaming/ingest.py``).  What NEITHER gives you is a low-latency
per-session row emitted the moment a session is KNOWN closed — the
built-in holds results until the aggregation's output trigger, and
the batch form needs the whole table.  Event-time TIMERS express it
directly: each key holds its open session in a ``ValueState``;
every event extends (or rolls) the session and re-arms a timer at
``session_end + gap``; when the WATERMARK passes the timer, the
session provably cannot grow (late rows inside the watermark would
have re-armed it), so ``handleExpiredTimer`` emits the finished
session and clears the state.

This is the first operator here that genuinely needs the
transformWithState API surface (timers + typed state +
``timeMode="EventTime"``) — ``applyInPandasWithState`` exposes only
coarse per-group timeouts, not per-key re-armable event-time timers.
Runtime availability is probed by the caller (see
``compat.tws_runtime_executable``).

Semantics pinned by the oracle: identical session rows to the batch
``sessionize`` (same gap, per-key session ids numbered from 1 in
time order) once every session's close has been witnessed — the
suite drives the corpus through a real stream with a final
watermark-advancing sentinel so even the trailing open sessions
flush.

Scale: session state is O(open sessions) x ~40 bytes — expiry flips
the record to a closed-key marker (n_events=0) carrying only the id
counter (so the key's next session numbers on), in the SAME
ValueState (merged in round 13: one state get per key per batch, one
write per close — per-key state-server round trips are the one-shot
drive's measured cost).  The marker is retained for every key ever
seen — an explicit, stated cost of 4 longs/key, not live session
data.  It CANNOT be
TTL-bounded on this operator: Spark state TTL requires
timeMode=ProcessingTime (StatefulProcessorHandleImpl.validateTTLConfig
throws otherwise), while event-time TIMERS — the whole point here —
require timeMode=EventTime; the two are mutually exclusive on one
processor.  A deployment needing bounded key retention would run a
side processing-time stream that re-keys or tombstones stale
counters.  Each micro-batch shuffles once on the key; timers live in
the state store alongside the values.  Per-(key, batch) rows are
sorted in pandas — hot keys at 100 TB would pre-aggregate per
(key, gap-bucket) upstream first.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
    ]
)

# ONE state record per key: open-session bounds + the id counter,
# merged (round 13).  ``n_events > 0`` ⇒ an OPEN session with id
# ``session_id``; ``n_events == 0`` ⇒ a CLOSED-KEY marker whose
# ``session_id`` is the last closed id (so the key's next session
# numbers on).  Merging the former separate ``next_sid`` ValueState
# into this record removes one state-server round trip per key per
# batch (the get) and one per session close (the counter update) —
# the per-key RPCs are the measured cost of the one-shot drive
# (state probe: allUpdatesTimeMs tracks RPC count, not row bytes).
# Cost: a closed key retains 4 longs instead of 1 — still O(1).
# Primitives only — it round-trips through the state store.
_SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
    ]
)

_US = 1_000_000


def timer_sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    watermark_delay: str = "0 seconds",
    session_ids: str = "counter",
) -> DataFrame:
    """Sessionize a STREAM by inactivity gap with event-time timers;
    emits one row per CLOSED session (key, session_id, n_events,
    session_start, session_end).

    A session closes two ways: an event for the same key lands past
    ``end + gap`` (the successor's first event emits the predecessor
    immediately — no watermark wait), or the watermark passes the
    re-armed timer at ``end + gap`` (the tail session of a quiet
    key).  Late events inside the watermark merge into the open
    session; events older than the watermark are dropped by the
    engine, same as every event-time operator here.

    ``session_ids`` picks the id scheme — and with it the CLOSED-KEY
    state footprint:

    - ``"counter"`` (default): per-key ids numbered from 1 in time
      order, matching the batch ``sessionize`` exactly.  Cost: a
      closed-key marker (4 longs) survives every close, for every key
      ever seen (it cannot be TTL-bounded here — state TTL requires
      timeMode=ProcessingTime, event-time timers require EventTime).
    - ``"start_time"``: the session id IS the session's start (epoch
      micros) — unique per key (a key's sessions are time-disjoint),
      deterministic, and requiring NO surviving state: a closed key's
      state clears entirely, so long-lived deployments with unbounded
      key churn stay O(open sessions).  The batch twin is
      ``min(ts)``-per-session, so the scheme is oracle-checkable too.
    """
    if session_ids not in ("counter", "start_time"):
        raise ValueError(
            f"session_ids must be 'counter' or 'start_time', "
            f"got {session_ids!r}"
        )
    use_counter = session_ids == "counter"
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = int(round(gap_seconds * _US))

    src = stream.select(
        F.col(key_col).cast("long").alias("key"),
        F.col(ts_col).alias("ts"),
    ).withWatermark("ts", watermark_delay)

    class GapSessions(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # ONE merged record (open session OR closed-key counter
            # marker — see _SESSION_STATE_SCHEMA): one get per (key,
            # batch) instead of two, one write per close instead of
            # two.  It cannot carry a TTL either way (state TTL needs
            # ProcessingTime, timers need EventTime); start_time mode
            # leaves NO closed-key state at all.
            self._open = handle.getValueState("open", _SESSION_STATE_SCHEMA)
            self._handle = handle

        def _emit(self, key, sid, n, start_us, end_us) -> pd.DataFrame:
            return self._emit_many(
                key, [sid], [n], [start_us], [end_us]
            )

        def _emit_many(
            self, key, sids, ns, starts_us, ends_us
        ) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": pd.array([key] * len(sids), dtype="Int64"),
                    "session_id": pd.array(sids, dtype="Int64"),
                    "n_events": pd.array(ns, dtype="Int64"),
                    "session_start": pd.to_datetime(
                        pd.array(starts_us, dtype="int64"), unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        pd.array(ends_us, dtype="int64"), unit="us"
                    ),
                }
            )

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator[pd.DataFrame]:
            import numpy as np

            k = key[0]
            group = pd.concat(list(rows), ignore_index=True)
            if group.empty:
                return
            # Vectorized in-batch sessionization: the per-event work is
            # numpy (sort, diff, boundary split) — the per-key state
            # round-trips happen ONCE per (key, batch), not per event.
            ts = np.sort(
                group["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
            )
            # boundaries: positions whose predecessor gap exceeds the cap
            starts = np.flatnonzero(
                np.concatenate(([True], np.diff(ts) > gap_us))
            )
            seg_start = ts[starts]
            seg_end = ts[np.concatenate((starts[1:] - 1, [len(ts) - 1]))]
            seg_n = np.diff(np.concatenate((starts, [len(ts)])))
            segs = list(
                zip(
                    seg_start.tolist(), seg_end.tolist(), seg_n.tolist()
                )
            )

            stored = self._open.get()
            if stored is not None and stored[1] > 0:
                sid0, n0, start0, end0 = stored
                self._handle.deleteTimer(_us_to_ms_ceil(end0 + gap_us))
            elif stored is not None:
                # closed-key marker (counter mode): session_id is the
                # last CLOSED id, so numbering continues from it
                sid0, n0 = stored[0], 0
            else:
                sid0, n0 = 0, 0
            # The stored open session joins the segment list as a peer
            # interval and the whole list is gap-merged in time order.
            # Late events (non-zero watermark delay) may land BEFORE,
            # INSIDE, or BRIDGING the open session — segment-0-only
            # merging mis-segments all three (e.g. stored [100..200],
            # batch {150, 280}, gap 100: batch-local diff splits 150
            # from 280, but 280 chains through the stored end at 200).
            if n0 > 0:
                segs.append((start0, end0, n0))
                first_sid = sid0
            else:
                first_sid = sid0 + 1
            segs.sort()
            merged = [list(segs[0])]
            for s, e, n in segs[1:]:
                if s - merged[-1][1] <= gap_us:
                    merged[-1][1] = max(merged[-1][1], e)
                    merged[-1][2] += n
                else:
                    merged.append([s, e, n])
            # ids continue from the stored counter in time order within
            # this merged list; a session formed entirely by late data
            # that predates an ALREADY-EMITTED session necessarily gets
            # a later id (emitted rows can't renumber) — the open
            # session itself renumbers fine since its id is unemitted.
            if len(merged) > 1:  # all but the last segment are closed
                sids = (
                    list(range(first_sid, first_sid + len(merged) - 1))
                    if use_counter
                    else [m[0] for m in merged[:-1]]
                )
                yield self._emit_many(
                    k,
                    sids,
                    [m[2] for m in merged[:-1]],
                    [m[0] for m in merged[:-1]],
                    [m[1] for m in merged[:-1]],
                )
            last = (
                first_sid + len(merged) - 1
                if use_counter
                else int(merged[-1][0]),
                int(merged[-1][2]),
                int(merged[-1][0]),
                int(merged[-1][1]),
            )
            self._open.update(last)
            self._handle.registerTimer(_us_to_ms_ceil(last[3] + gap_us))

        def handleExpiredTimer(
            self, key, timerValues, expiredTimerInfo
        ) -> Iterator[pd.DataFrame]:
            stored = self._open.get()
            if stored is None or stored[1] == 0:
                return  # no open session (never seen, or closed marker)
            sid, n, start_us, end_us = stored
            # a stale timer (session rolled since) never matches the
            # live session's own expiry
            if _us_to_ms_ceil(end_us + gap_us) != expiredTimerInfo.getExpiryTimeInMs():
                return
            yield self._emit(key[0], sid, n, start_us, end_us)
            # counter mode: ONE write replaces the former clear +
            # counter update — the record flips to the closed-key
            # marker (n_events=0, session_id = the closed id) so the
            # key's next session numbers on; start_time mode: NOTHING
            # survives — a closed key's state is zero rows.
            if use_counter:
                self._open.update((sid, 0, 0, 0))
            else:
                self._open.clear()

        def close(self) -> None:
            pass

    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=GapSessions(),
        outputStructType=SESSION_OUT_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


def _us_to_ms_ceil(us: int) -> int:
    """Timer registry is millisecond-grained; round UP so a timer
    never fires before its microsecond-true expiry."""
    return -((-us) // 1000)


def sessions_via_stream(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: float = 1800.0,
    work_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drive a BATCH frame through ``timer_sessionize`` as a real
    one-shot stream and return every emitted session.

    One-batch drive: a single far-future SENTINEL row under a
    reserved key (filtered from the output) rides in the SAME batch
    as the data — its only job is to push the post-batch watermark
    past every real session's ``end + gap``, so the engine's no-data
    follow-up batch fires every trailing open session's timer (the
    streaming analog of "end of input").  In-batch sessions never
    needed the watermark, so one data batch + one no-data batch is
    the whole query.  Requires the transformWithState runtime (see
    ``compat.tws_runtime_executable``).
    """
    import tempfile

    spark = df.sparkSession
    root = work_dir or tempfile.mkdtemp(prefix="timer_sessions_")
    sentinel_key = -(2**62)  # reserved: below any real long key in use
    src = df.select(
        F.col(key_col).cast("long").alias("key"), F.col(ts_col).alias("ts")
    )
    sentinel = spark.range(1).select(
        F.lit(sentinel_key).alias("key"),
        F.lit("2199-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    # coalesce(1): the drive's source is read once by one availableNow
    # batch — one file instead of a sliver per scan split cuts the
    # write's task count, the source listing, and matches the other
    # drives' single-file contract
    src.unionByName(sentinel).coalesce(1).write.mode("overwrite").parquet(
        f"{root}/src"
    )

    stream = spark.readStream.schema("key long, ts timestamp").parquet(
        f"{root}/src"
    )
    out = timer_sessionize(stream, "key", "ts", gap_seconds)
    from .drive import drive_available_now

    # per-key state-server round trips dominate (4 RPCs per key per
    # batch, every key in the corpus): 4x the derived base width
    # (sp/2 at the bench's 32-partition session; the 4x multiple, not
    # a fixed fraction, is what's pinned — see
    # drive.default_state_partitions) spreads those RPCs across
    # workers; the lighter drives (topk, changelog) use the plain
    # derived width
    from .drive import default_state_partitions

    sink = drive_available_now(
        out, "timer_sessions", f"{root}/ckpt", timeout_sec=timeout_sec,
        shuffle_partitions=4 * default_state_partitions(df.sparkSession),
    )
    # null-safe: a NULL key (cast miss or genuine null) forms its own
    # group and must survive this filter, same as batch sessionize
    return sink.filter(~F.col("key").eqNullSafe(F.lit(sentinel_key)))
