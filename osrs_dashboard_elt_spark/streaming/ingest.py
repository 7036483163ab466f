"""Structured Streaming ingest + parse (SURVEY.md §2.9 T1-T4).

The reference runs the ingest half as a cron micro-batch every 15
minutes (README.md:131-138): fetch new Discord messages since the
stored watermark minus an overlap window (src/1_fetch_data.py:36-55),
idempotently insert (:147-174), then regex-parse the new rows into
chat / clan_broadcasts / unparsed_logs (src/2_parse_engine.py).

That whole loop IS Structured Streaming's execution model, so here it
becomes one declarative pipeline:

- source: ``readStream`` file source (json/parquet drop-dir standing in
  for the Discord channel; a real deployment would register a custom
  streaming source against the webhook feed);
- late/duplicate handling (T2): ``withWatermark`` +
  ``dropDuplicatesWithinWatermark`` on the natural key
  (timestamp, raw_content) — the reference's overlap-refetch +
  INSERT OR IGNORE, with bounded state instead of a full-history
  uniqueness constraint;
- parse: the SAME compiled plan as batch (plans.build_parse_plan) run
  inside ``foreachBatch`` — one pass per micro-batch, three routed
  appends, each idempotent via ``sources.dedup_append`` so batch
  replays after a crash are no-ops (exactly-once effect on parquet);
- dead-letter (T3): unparsed rows append to their own table with a
  ``failure_reason``; a batch re-drive can re-run them through the
  parse plan later;
- offsets/watermarks (T4): the reference's ETL_state.json /
  sync_metadata files are subsumed by the streaming checkpoint dir.

Scale notes: watermark state is keyed by (timestamp, raw_content)
within the lateness horizon only; the parse plan is scan->project->
filter (no shuffle); each routed append writes one file per partition
per batch — at high volume, coalesce inside foreachBatch or compact
asynchronously.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..config import ParseConfig
from ..plans.parse_plan import build_parse_plan
from ..sources.parquet import dedup_append

RAW_LOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("timestamp", T.TimestampType()),
        T.StructField("raw_content", T.StringType()),
    ]
)


_CORRUPT_COL = "_corrupt_line"

# RAW_LOG_SCHEMA + the PERMISSIVE-mode capture column: a malformed
# JSON line lands with every declared field NULL and the raw line
# here, instead of disappearing as a silent all-null row
_RAW_WITH_CORRUPT = T.StructType(
    list(RAW_LOG_SCHEMA.fields) + [T.StructField(_CORRUPT_COL, T.StringType())]
)


def read_raw_stream(
    spark: SparkSession, path: str, fmt: str = "json", max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of raw log rows (S1's streaming analog).

    Malformed lines are captured, not dropped: use
    :func:`split_corrupt` to route them to the dead-letter table
    alongside unparsed-content rows.
    """
    reader = (
        spark.readStream.schema(_RAW_WITH_CORRUPT)
        .format(fmt)
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(well-formed rows with the capture column dropped, corrupt rows
    as (line,)) — corrupt = the capture column is set, or every
    declared field is NULL (a line like ``null`` parses to nothing)."""
    is_corrupt = F.col(_CORRUPT_COL).isNotNull() | (
        F.col("id").isNull()
        & F.col("timestamp").isNull()
        & F.col("raw_content").isNull()
    )
    good = raw.filter(~is_corrupt).drop(_CORRUPT_COL)
    bad = raw.filter(is_corrupt).select(F.col(_CORRUPT_COL).alias("line"))
    return good, bad


def with_late_data_dedup(raw: DataFrame, lateness: str = "30 minutes") -> DataFrame:
    """T2: tolerate re-delivered / late rows.  Watermark bounds the
    dedup state to the lateness horizon; duplicates inside it are
    dropped exactly like the reference's INSERT OR IGNORE."""
    return raw.withWatermark("timestamp", lateness).dropDuplicatesWithinWatermark(
        ["timestamp", "raw_content"]
    )


def start_parse_pipeline(
    raw_stream: DataFrame,
    cfg: ParseConfig,
    out_root: str,
    checkpoint_dir: str,
    available_now: bool = False,
    on_batch: Callable[[int], None] | None = None,
) -> StreamingQuery:
    """Run the compiled parse plan per micro-batch and route the three
    outputs to ``{out_root}/{chat,clan_broadcasts,unparsed_logs}``.

    Appends are idempotent (dedup_append on raw_log_id), so a batch
    replayed after a failure cannot double-write — the parquet-level
    equivalent of exactly-once.
    """

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        streams = build_parse_plan(batch_df, cfg)
        # ts_col window-prunes the existing-side anti-join scan: the
        # id is a content hash that includes the timestamp, so a
        # replayed duplicate always lands inside the batch's ts range
        dedup_append(
            spark, streams.chat, f"{out_root}/chat", ["raw_log_id"],
            ts_col="Timestamp",
        )
        dedup_append(
            spark,
            streams.broadcasts,
            f"{out_root}/clan_broadcasts",
            # multi-user explode makes raw_log_id non-unique: the
            # exploded Username completes the natural key
            ["raw_log_id", "Username"],
            ts_col="Timestamp",
        )
        dedup_append(
            spark, streams.unparsed, f"{out_root}/unparsed_logs",
            ["raw_log_id"], ts_col="timestamp",
        )
        # release the batch's persisted routing core: every micro-batch
        # builds a fresh plan (source offsets differ), so without this
        # one MEMORY_AND_DISK dataset leaks per batch
        streams.unpersist()
        if on_batch is not None:
            on_batch(batch_id)

    writer = (
        raw_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def retry_unparsed(
    spark: SparkSession, out_root: str, cfg: ParseConfig
) -> dict[str, int]:
    """T3 re-drive: re-parse the dead-letter table under a (possibly
    updated) config, append successes, drain them from the table
    (reference src/2_parse_engine.py:355-395: re-read unparsed ids,
    re-parse, INSERT OR IGNORE successes, DELETE drained rows).

    The dead-letter rows carry their raw content, so no bronze re-read
    is needed; appends reuse the idempotent ``dedup_append``, making
    the whole re-drive safe to re-run.  The shrunken dead-letter table
    is swapped in via stage-then-replace (local-FS rename; on a real
    cluster a Delta/Iceberg overwrite commit takes this seam).

    Returns ``{"retried": n, "recovered": n, "still_dead": n}``.
    """
    import os
    import shutil

    dead_path = f"{out_root}/unparsed_logs"
    try:
        dead = spark.read.parquet(dead_path)
    except Exception:
        return {"retried": 0, "recovered": 0, "still_dead": 0}
    # EAGER localCheckpoint, for two load-bearing reasons: (a) it
    # freezes the dead-letter rows BEFORE the directory is rmtree'd
    # below (a lazy lineage would recompute from deleted files), and
    # (b) it gives each re-drive a fresh plan identity — the parse
    # plan cache keys on semanticHash, and a plain re-read of the
    # SAME path hashes identically, which would serve a stale persisted
    # core computed over the PREVIOUS dead-letter contents (silently
    # dropping newly dead-lettered rows from the retry, then deleting
    # them in the swap).
    raw = dead.select(
        F.col("raw_log_id").alias("id"),
        F.col("timestamp"),
        F.col("raw_content"),
    ).localCheckpoint()
    streams = build_parse_plan(raw, cfg)
    n_retried = raw.count()
    dedup_append(
        spark, streams.chat, f"{out_root}/chat", ["raw_log_id"],
        ts_col="Timestamp",
    )
    dedup_append(
        spark,
        streams.broadcasts,
        f"{out_root}/clan_broadcasts",
        ["raw_log_id", "Username"],
        ts_col="Timestamp",
    )
    # rows that STILL fail stay dead-lettered (fresh failure_reason)
    staging = dead_path + "__staging"
    streams.unparsed.write.mode("overwrite").parquet(staging)
    n_still = spark.read.parquet(staging).count()
    shutil.rmtree(dead_path)
    os.replace(staging, dead_path)
    streams.unpersist()
    return {
        "retried": n_retried,
        "recovered": n_retried - n_still,
        "still_dead": n_still,
    }


def streaming_windowed_rollup(
    raw_events: DataFrame,
    freq: str = "6 hours",
    lateness: str = "30 minutes",
    ts_col: str = "timestamp",
    value_col: str | None = None,
) -> DataFrame:
    """T1's streaming analog: event-time tumbling-window rollup with a
    watermark for late data.  Batch parity (incl. the empty-bucket
    gap fill pandas ``resample`` emits) lives in operators.resample;
    a streaming sink emits only non-empty windows — gap fill belongs
    to the serving layer."""
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(F.col(value_col)).alias("total_value"))
    return (
        raw_events.withWatermark(ts_col, lateness)
        .groupBy(F.window(F.col(ts_col), freq).alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").alias("bucket_start"), *[F.col(c) for c in
                (["n_events"] + (["total_value"] if value_col else []))])
    )


def streaming_session_rollup(
    events: DataFrame,
    gap: str = "5 minutes",
    lateness: str = "30 minutes",
    ts_col: str = "timestamp",
    key_cols: list[str] | None = None,
) -> DataFrame:
    """W6's true streaming analog: event-time SESSION windows — a
    session closes after ``gap`` of inactivity per key (the reference's
    grouping-window is a batch approximation of this;
    src/3_transform_data.py:662-710).  Works identically on batch
    DataFrames (session_window is engine-native either way); in
    streaming, the watermark bounds session state.

    Returns (key..., session_start, session_end, n_events).
    """
    keys = key_cols or []
    win = F.session_window(F.col(ts_col), gap)
    grouped = (
        events.withWatermark(ts_col, lateness)
        if events.isStreaming
        else events
    ).groupBy(win.alias("w"), *keys)
    return grouped.agg(F.count(F.lit(1)).alias("n_events")).select(
        *keys,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )
