"""Incremental view maintenance (IVM) from the change data feed.

The reference rebuilds every gold aggregate from the full fact table
on each run (/root/reference/src/3_transform_data.py — fine at
SQLite scale, a full-table shuffle at 100 TB).  With the change feed
recording row-level deltas, SELF-MAINTAINABLE aggregates (COUNT and
SUM — and anything derivable from them, e.g. AVG) update from the
deltas alone: an insert adds (+1, +value), a delete subtracts, an
update applies −preimage +postimage.  Maintenance cost is
O(changes + |affected groups|), never O(table).

State management rides :mod:`maintenance`'s versioned-snapshot
machinery: every refresh publishes the new state as an immutable
version (atomic, concurrent-reader-safe, time-travelable), and a tiny
``_view.json`` binds ``(last_seq, version)`` TOGETHER — the refresh
reads the state at the RECORDED version (not blindly the head) and
applies exactly ``(last_seq, head]``, so a crash between publish and
checkpoint write leaves an orphan version and a retry that re-derives
the same state, never a double-applied window.

MIN/MAX are NOT self-maintainable under deletes (retracting the
current minimum needs the base table) — requesting them raises, with
the full-recompute path (``init_view``) as the documented answer.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VIEW_META = "_view.json"

# Structured Streaming FILE-SOURCE options (Spark docs, "Input
# Sources" table): legal on the readStream, silently ignored on a
# writer — maintain_view_stream routes them to the right side
_SOURCE_OPTS = frozenset(
    {
        "maxFilesPerTrigger",
        "maxBytesPerTrigger",
        "latestFirst",
        "maxFileAge",
        "fileNameOnly",
        "cleanSource",
        "sourceArchiveDir",
        "maxCachedFiles",
    }
)


def _meta_path(state_root: str) -> str:
    return os.path.join(state_root, _VIEW_META)


def _read_view_meta(state_root: str) -> dict:
    with open(_meta_path(state_root)) as f:
        return json.load(f)


def _write_view_meta(state_root: str, meta: dict) -> None:
    fd, tmp = tempfile.mkstemp(dir=state_root, prefix=".view-")
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, _meta_path(state_root))


def _state_cols(group_cols: list[str], sum_cols: list[str]) -> list:
    return (
        [F.col(c) for c in group_cols]
        + [F.col("__n")]
        + [F.col(f"sum_{c}") for c in sum_cols]
    )


def _aggregate(
    df: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
    weight=None,
) -> DataFrame:
    w = F.lit(1) if weight is None else weight
    aggs = [F.sum(w).alias("__n")] + [
        F.sum(w * F.col(c)).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*group_cols).agg(*aggs)


def init_view(
    spark: SparkSession,
    table_path: str,
    state_root: str,
    group_cols: list[str],
    sum_cols: list[str],
) -> dict:
    """Bootstrap (or force-recompute) the aggregate state from the
    CURRENT table: one full aggregate, published as state version 1
    (or the next version), checkpointed at the feed head.  The one
    O(table) pass; every refresh after it is O(changes)."""
    from .change_feed import latest_change_seq
    from .maintenance import _mutation_gate, publish_versioned
    from .stats_manifest import read_table

    # under the table's mutation gate: a mutation committing between
    # reading the feed head and scanning the table would be baked
    # into the state yet carry a LATER seq, so the first refresh
    # would double-apply it (deletes at least trip the negative-count
    # guard; inserts would silently double)
    with _mutation_gate(table_path):
        head = latest_change_seq(table_path)
        base = read_table(spark, table_path)
        state = _aggregate(base, group_cols, sum_cols)
        version = publish_versioned(state, state_root)
    _write_view_meta(
        state_root,
        {
            "last_seq": head,
            "version": version,
            "group_cols": group_cols,
            "sum_cols": sum_cols,
        },
    )
    return {"version": version, "last_seq": head}


def read_view(spark: SparkSession, state_root: str) -> DataFrame:
    """The maintained aggregate at its checkpointed version (count
    per group as ``__n``, sums as ``sum_<col>``)."""
    from .maintenance import read_version

    meta = _read_view_meta(state_root)
    return read_version(spark, state_root, meta["version"])


def refresh_view(
    spark: SparkSession, table_path: str, state_root: str
) -> dict:
    """Fold the feed window ``(last_seq, head]`` into the aggregate
    state: ONE aggregate over the delta rows (weights: insert /
    update_postimage +1, delete / update_preimage −1) + ONE
    outer-join against the FULL state — never a table scan.  The
    join's full-state side is subsumed by the publish (each refresh
    rewrites the whole state as an immutable version), which bounds
    this mode to views whose group cardinality fits a rewrite; for
    O(changes) WRITES use the segmented state mode (below).  Groups whose count reaches zero drop out; a
    negative count means the feed is inconsistent with the recorded
    state (a mutation bypassed it, or the feed was vacuumed past this
    view's checkpoint) and raises rather than publishing garbage.
    Publishes the new state as the next immutable version and
    advances the ``(last_seq, version)`` checkpoint atomically-enough
    (see module docstring for the crash story).  Returns
    {version, last_seq, groups_changed}."""
    from .change_feed import latest_change_seq, read_change_feed
    from .maintenance import publish_versioned, read_version

    meta = _read_view_meta(state_root)
    group_cols = meta["group_cols"]
    sum_cols = meta["sum_cols"]
    head = latest_change_seq(table_path)
    if head <= meta["last_seq"]:
        return {
            "version": meta["version"],
            "last_seq": meta["last_seq"],
            "groups_changed": 0,
        }
    state = read_version(spark, state_root, meta["version"])
    feed = read_change_feed(
        spark, table_path,
        since_seq=meta["last_seq"], until_seq=head,
    )
    w = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), 1
    ).otherwise(-1)
    delta = _aggregate(feed, group_cols, sum_cols, weight=w)
    n_changed = delta.count()
    d = delta.select(
        *[F.col(c).alias(f"__d_{c}") for c in group_cols],
        F.col("__n").alias("__dn"),
        *[F.col(f"sum_{c}").alias(f"__dsum_{c}") for c in sum_cols],
    )
    cond = None
    for c in group_cols:
        eq = state[c].eqNullSafe(F.col(f"__d_{c}"))
        cond = eq if cond is None else cond & eq
    joined = state.join(d, cond, "full_outer")
    merged = joined.select(
        *[
            F.coalesce(state[c], F.col(f"__d_{c}")).alias(c)
            for c in group_cols
        ],
        (
            F.coalesce(F.col("__n"), F.lit(0))
            + F.coalesce(F.col("__dn"), F.lit(0))
        ).alias("__n"),
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.coalesce(F.col(f"__dsum_{c}"), F.lit(0))
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    bad = merged.filter(F.col("__n") < 0)
    if not bad.isEmpty():
        sample = [r.asDict() for r in bad.limit(3).collect()]
        raise ValueError(
            f"incremental view under {state_root} went NEGATIVE for "
            f"groups like {sample} — the feed is inconsistent with "
            "the recorded state (a mutation bypassed the feed, or "
            "the feed was vacuumed past this view's checkpoint); "
            "rebuild with init_view"
        )
    new_state = merged.filter(F.col("__n") > 0).select(
        *_state_cols(group_cols, sum_cols)
    )
    version = publish_versioned(new_state, state_root)
    _write_view_meta(
        state_root,
        dict(meta, last_seq=head, version=version),
    )
    return {
        "version": version,
        "last_seq": head,
        "groups_changed": int(n_changed),
    }


def maintain_view_stream(
    spark: SparkSession,
    table_path: str,
    state_root: str,
    checkpoint: str,
    **stream_opts,
):
    """Keep the aggregate state continuously fresh: a Structured
    Streaming query over the change feed whose micro-batches TRIGGER
    :func:`refresh_view` — the streaming materialized view.

    The stream is the wake-up signal, not the data path: each batch
    calls ``refresh_view``, which reads exactly ``(last_seq, head]``
    from the feed and advances its own (last_seq, version)
    checkpoint, so the view's exactly-once story is independent of
    the stream's (a replayed micro-batch finds ``head <= last_seq``
    and no-ops; a batch observing a half-committed window folds the
    committed prefix and the next batch folds the rest).  Returns the
    started ``StreamingQuery``; pass ``trigger`` kwargs through
    ``stream_opts`` (e.g. ``availableNow=True`` for catch-up runs,
    ``processingTime='1 minute'`` for a live view).

    Options are ROUTED, never silently dropped (round-8 ADVICE low:
    reader options applied to the writeStream are ignored by Spark):
    file-source knobs (``maxFilesPerTrigger`` etc.) go to the
    readStream, ``queryName`` to the writer, and an option neither
    side knows raises."""
    from .change_feed import stream_change_feed

    trigger = stream_opts.pop("trigger", {"availableNow": True})
    query_name = stream_opts.pop("queryName", None)
    source_opts = {
        k: stream_opts.pop(k)
        for k in list(stream_opts)
        if k in _SOURCE_OPTS
    }
    if stream_opts:
        raise ValueError(
            f"unknown stream options {sorted(stream_opts)} — file-"
            f"source options {sorted(_SOURCE_OPTS)} ride the "
            "readStream; the writer side takes only queryName / "
            "trigger (checkpointLocation is the positional arg)"
        )

    def _fold(_batch_df, _batch_id) -> None:
        refresh_view(spark, table_path, state_root)

    writer = (
        stream_change_feed(spark, table_path, **source_opts)
        .writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    return writer.trigger(**trigger).start()
