"""Streaming per-key top-K entry changelog with in-key event dedup —
the ListState + MapState operator on ``transformWithState``.

``running_best_changelog`` (streaming/stateful.py) keeps ONE value per
key (ValueState); sessions keep one open interval (ValueState +
timers).  This operator needs genuinely richer typed state and is the
repo's exerciser for the remaining transformWithState surface:

- ``ListState`` — the key's current top-K entries (value, holder ts,
  insertion seq), mutated per batch and written back whole;
- ``MapState`` — event ids already processed for the key (in-key
  exactly-once: a redelivered event id is a no-op), with an optional
  processing-time TTL (``seen_ttl_ms``) bounding the dedup horizon —
  possible HERE because this operator needs no event-time timers
  (``timer_sessions`` can't TTL its counter: state TTL demands
  timeMode=ProcessingTime, its timers demand EventTime).
  TTL is for CONTINUOUS streams only: it forces
  timeMode=ProcessingTime, under which an ``availableNow`` one-shot
  drive never terminates (the engine schedules batches indefinitely
  to advance the TTL clock) — ``topk_via_stream`` therefore always
  runs the timeMode=None plan, and ``tests/test_topk_state.py``
  exercises TTL expiry on a processing-time-trigger stream instead.

Semantics (pinned by the oracle, identical in the batch twin): per
key, events are processed in ``(ts, value, event_id)`` order, first
occurrence per event id only, NULL values skipped; an event ENTERS the
running top-K iff fewer than K already-stored entries have
``value <= v`` (composite order (value, seq): an equal-valued earlier
entry outranks a later one); each entering event emits ONE row at
entry time, and the composite-largest entry is evicted when the list
exceeds K.  The emitted stream is the top-K ENTRY changelog — "this
result cracked the key's top K the moment it arrived" — the streaming
form of a leaderboard feed.

Why the entry rule is checkable in SQL: e enters iff its rank within
the processed-so-far prefix is <= K, i.e. COUNT(prior dedup'd events
with value <= e.value) < K — the stored list suffices for that count
because it always holds exactly the K composite-smallest prior events
(any event it evicted had MORE than K-1 smaller peers already).  The
DuckDB oracle replays the rule as a per-key self-join; the operator
and the batch twin share one pure-Python core
(:func:`_entries_in_order`), so engine equality is by construction.

Scale shape: one shuffle on the key per micro-batch; per-(key, batch)
state I/O is ONE ListState read+write plus, in the default BUCKETED
dedup layout (round 13), one MapState getValue+updateValue per
TOUCHED id-bucket (ids grouped by ``event_id DIV seen_bucket_ids``)
— B-fold fewer state-server round trips than the former
per-id containsKey/insert at the cost of rewriting a bucket's id
list when any of its ids arrives.  The TTL'd layout stays per-id
(TTL expiry is per map entry; bucketing would coarsen it).  State
per key is K entries + the seen-id map; the map is the unavoidable
cost of exactly-once-per-id.  Hot keys batch-sort in pandas, same
discipline as timer_sessions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOPK_OUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# ListState entry: (value, seq) — seq is a per-key monotonic insertion
# counter so equal values order deterministically (earlier wins).
_TOPK_ENTRY_SCHEMA = "value double, seq long"
_SEEN_KEY_SCHEMA = "event_id long"
_SEEN_VAL_SCHEMA = "one tinyint"
# Bucketed seen-id layout (round 13): map key = event_id DIV bucket
# width, value = the sorted id list within the bucket.  One
# getValue/updateValue round trip per TOUCHED BUCKET per (key, batch)
# instead of one containsKey per id + one updateValue per first-seen
# id — the per-id writes were the measured per-row cost of the
# one-shot drive (state probe: ~10k updateValue RPCs at ~0.8 ms
# each).  Used whenever no TTL is configured; a TTL keeps the
# per-id layout (bucketing would coarsen per-id expiry to per-bucket).
_SEEN_BUCKET_KEY_SCHEMA = "bucket long"
_SEEN_BUCKET_VAL_SCHEMA = "ids array<long>"


def _entries_in_order(
    rows: list[tuple[int, float, object]],
    k: int,
    topk: list[tuple[float, int]],
    seen: set[int],
    is_seen,
) -> tuple[list[tuple[int, float, object]], list[tuple[float, int]], list[int]]:
    """The shared semantic core: process ``(event_id, value, ts)``
    rows (ALREADY sorted in (ts, value, event_id) order) against the
    current ``topk`` [(value, seq)] and dedup state; returns (emitted
    rows, new topk, newly-seen ids).  ``seen`` is the within-call
    cache; ``is_seen(id)`` consults the durable state behind it."""
    emitted: list[tuple[int, float, object]] = []
    new_ids: list[int] = []
    seq = max((s for _, s in topk), default=-1) + 1
    for event_id, value, ts in rows:
        if event_id in seen or is_seen(event_id):
            continue
        seen.add(event_id)
        new_ids.append(event_id)
        if value is None or pd.isna(value):
            continue
        value = float(value)
        if sum(1 for v, _ in topk if v <= value) < k:
            emitted.append((event_id, value, ts))
            topk.append((value, seq))
            seq += 1
            if len(topk) > k:
                topk.remove(max(topk))  # composite-largest (value, seq)
    return emitted, topk, new_ids


def streaming_topk_entries(
    events: DataFrame,
    key_col: str,
    id_col: str,
    val_col: str,
    ts_col: str,
    k: int,
    seen_ttl_ms: int | None = None,
    require_runtime: bool = True,
    seen_bucket_ids: int = 16384,
) -> DataFrame:
    """The transformWithState form (ListState top-K + MapState seen
    ids).  Same runtime dependency story as
    ``running_best_changelog_tws``: the state server speaks protobuf;
    ``require_runtime`` probes loudly at call time.

    ``seen_bucket_ids`` sets the bucketed dedup-map width (ids per
    map entry = one state-server round trip per touched bucket
    instead of per id — see _SEEN_BUCKET_KEY_SCHEMA).  Ignored when
    ``seen_ttl_ms`` is set: TTL expiry is per map entry, so exact
    per-id TTL semantics require the per-id layout."""
    if require_runtime:
        from ..compat import ensure_protobuf

        ensure_protobuf()
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "streaming_topk_entries requires google.protobuf (the "
                "transformWithState JVM<->Python state server). Use "
                "topk_entries_batch for the batch twin, or install "
                "protobuf."
            ) from exc
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    src = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(val_col).cast("double").alias("value"),
        F.col(ts_col).alias("ts"),
    )

    bucketed = seen_ttl_ms is None
    bucket_w = max(1, int(seen_bucket_ids))

    class TopKEntries(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._topk = handle.getListState("topk", _TOPK_ENTRY_SCHEMA)
            if bucketed:
                self._seen = handle.getMapState(
                    "seen", _SEEN_BUCKET_KEY_SCHEMA, _SEEN_BUCKET_VAL_SCHEMA
                )
            else:
                self._seen = handle.getMapState(
                    "seen", _SEEN_KEY_SCHEMA, _SEEN_VAL_SCHEMA, seen_ttl_ms
                )

        def handleInputRows(
            self, key, rows, timerValues
        ) -> Iterator[pd.DataFrame]:
            group = pd.concat(list(rows), ignore_index=True)
            if group.empty:
                return
            group = group.sort_values(
                ["ts", "value", "event_id"], kind="mergesort",
                ignore_index=True,
            )
            topk = [tuple(t) for t in self._topk.get()]
            # exists() short-circuit: a key's FIRST batch has no seen
            # map, so skip the per-id/bucket probe RPCs entirely — the
            # probes are point lookups through the protobuf state
            # server, and they're the per-event cost that matters on
            # a bulk drive (measured: they dominated the one-shot
            # bench entry before this guard).
            seen_exists = self._seen.exists()
            buckets: dict[int, set] = {}
            if bucketed:
                def load_bucket(b: int) -> set:
                    s = buckets.get(b)
                    if s is None:
                        v = self._seen.getValue((b,)) if seen_exists else None
                        s = set(v[0]) if v is not None else set()
                        buckets[b] = s
                    return s

                is_seen = lambda eid: int(eid) in load_bucket(int(eid) // bucket_w)  # noqa: E731
            elif seen_exists:
                is_seen = lambda eid: self._seen.containsKey((int(eid),))  # noqa: E731
            else:
                is_seen = lambda eid: False  # noqa: E731
            emitted, topk, new_ids = _entries_in_order(
                list(
                    zip(
                        group["event_id"].astype("int64"),
                        group["value"],
                        group["ts"],
                    )
                ),
                k,
                topk,
                set(),
                is_seen,
            )
            if bucketed:
                # ONE write per touched bucket: merge the batch's new
                # ids into each bucket's (already-probed) set and put
                # the sorted list back
                touched: set[int] = set()
                for eid in new_ids:
                    b = int(eid) // bucket_w
                    load_bucket(b).add(int(eid))
                    touched.add(b)
                for b in sorted(touched):
                    self._seen.updateValue((b,), (sorted(buckets[b]),))
            else:
                for eid in new_ids:
                    self._seen.updateValue((int(eid),), (1,))
            self._topk.put([(float(v), int(s)) for v, s in topk])
            if emitted:
                yield pd.DataFrame(
                    {
                        "key": key[0],
                        "event_id": pd.array(
                            [e for e, _, _ in emitted], dtype="Int64"
                        ),
                        "value": pd.array(
                            [v for _, v, _ in emitted], dtype="Float64"
                        ),
                        "ts": [t for _, _, t in emitted],
                    }
                )

        def close(self) -> None:
            pass

    return src.groupBy("key").transformWithStateInPandas(
        statefulProcessor=TopKEntries(),
        outputStructType=TOPK_OUT_SCHEMA,
        outputMode="Append",
        # state TTL is clocked by the time mode — NoTime cannot host
        # a TTL'd state, so arm ProcessingTime exactly when asked
        timeMode="ProcessingTime" if seen_ttl_ms is not None else "None",
    )


def topk_entries_batch(
    df: DataFrame,
    key_col: str,
    id_col: str,
    val_col: str,
    ts_col: str,
    k: int,
) -> DataFrame:
    """Batch twin: identical semantics via the SAME core, one
    ``applyInPandas`` per key over the whole history (no state —
    the prefix is the partition).  The executable-everywhere
    fallback and the cross-engine equality anchor."""
    src = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(val_col).cast("double").alias("value"),
        F.col(ts_col).alias("ts"),
    )

    def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["ts", "value", "event_id"], kind="mergesort", ignore_index=True
        )
        emitted, _, _ = _entries_in_order(
            list(
                zip(
                    pdf["event_id"].astype("int64"),
                    pdf["value"],
                    pdf["ts"],
                )
            ),
            k,
            [],
            set(),
            lambda _eid: False,
        )
        return pd.DataFrame(
            {
                "key": [pdf["key"].iloc[0]] * len(emitted),
                "event_id": pd.array(
                    [e for e, _, _ in emitted], dtype="Int64"
                ),
                "value": pd.array(
                    [v for _, v, _ in emitted], dtype="Float64"
                ),
                "ts": pd.Series(
                    [t for _, _, t in emitted], dtype="datetime64[us]"
                ),
            }
        )

    return src.groupBy("key").applyInPandas(per_key, schema=TOPK_OUT_SCHEMA)


def topk_via_stream(
    df: DataFrame,
    key_col: str,
    id_col: str,
    val_col: str,
    ts_col: str,
    k: int,
    work_dir: str | None = None,
    timeout_sec: int = 300,
) -> DataFrame:
    """Drive a batch DataFrame through the REAL transformWithState
    stream (availableNow + memory sink) and return the emitted entry
    changelog — the oracle-check bridge, same harness discipline as
    ``changelog_via_stream`` (small pinned shuffle-partition count,
    RocksDB provider pinned for the one-shot query's lifetime).

    Deliberately NO ``seen_ttl_ms``: state TTL requires
    timeMode=ProcessingTime, and under that mode an ``availableNow``
    query never drains — the engine keeps scheduling batches to
    advance processing time for TTL eviction (measured here: 70
    epochs and counting on a one-row source).  TTL is a
    continuous-stream facility; the one-shot bridge runs the
    timeMode=None plan, whose dedup semantics are identical for the
    bounded drive (nothing expires inside one run)."""
    import tempfile

    spark = df.sparkSession
    root = work_dir or tempfile.mkdtemp(prefix="topk_state_")
    src_dir = f"{root}/src"
    df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("event_id"),
        F.col(val_col).cast("double").alias("value"),
        F.col(ts_col).alias("ts"),
    ).coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(
        "key string, event_id long, value double, ts timestamp"
    ).parquet(src_dir)
    out = streaming_topk_entries(
        stream, "key", "event_id", "value", "ts", k
    )
    from .drive import drive_available_now

    # the dedup-map state writes are the per-row cost — one RPC per
    # touched id-bucket under the bucketed layout (see
    # _SEEN_BUCKET_KEY_SCHEMA) — spread across the derived stateful
    # width (session shuffle width / 8 — the warm-protocol optimum;
    # see drive.default_state_partitions)
    return drive_available_now(
        out, "topk_state", f"{root}/ckpt", timeout_sec=timeout_sec,
    )
