"""Benchmark harness: runs the headline query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints JSON lines of the shape

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

twice: first the FULL per-query record (also written to
``BENCH_QUERIES.json``), then — as the very last line — a compact
record (headline metric + 15 slowest queries) short enough that a
bounded tail capture of stdout always contains one complete,
parseable JSON line.

Each query is executed through the same code path the correctness gate
uses (``__spark_entry__.queries()``) and timed end-to-end including the
action (count): per query, one untimed warm run at the bench SF, then
``$SPARK_GRAFT_BENCH_REPS`` (default 1) timed runs with the minimum
recorded (steady-state protocol — see the note in ``main``).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# Host-noise calibration (round 13): this VM exhibits multi-minute
# interference bursts (identical code measured 0.40 s and 16.8 s
# minutes apart — OPTIMIZATION_r12.md "Host noise").  A fixed tiny
# reference job timed immediately before and after the suite gives
# every bench artifact a per-run noise normalizer: `host_factor` =
# min(ref_before, ref_after) / REF_NOMINAL_SEC, where the nominal is
# the min-of-many reference time measured on this host while idle
# (committed below; re-calibrate if the hardware changes).  A
# comparison between two runs should divide each run's seconds by its
# own host_factor before flagging regressions.  The job is pinned at
# 8 partitions so it measures per-core interference identically on
# the driver's 32-core and 8-core passes.
REF_NOMINAL_SEC = 0.14  # idle-host calibration, this round's protocol


def _host_ref_sec(spark) -> float:
    """Reference-job seconds under the calibration protocol: 3 warm
    runs (JIT/codegen) then min-of-5 timed runs of a 1e7-row local
    range aggregate (integer multiply/mod chain) — no I/O, no
    shuffle, so its time moves only with CPU/scheduler interference."""
    import time as _time

    def one() -> float:
        t0 = _time.time()
        spark.range(0, 10_000_000, 1, 8).selectExpr(
            "count(if(((id * 2654435761) % 1000003) % 7 = 0, 1, null)) as c"
        ).collect()
        return _time.time() - t0

    for _ in range(3):
        one()
    return min(one() for _ in range(5))

# Headline queries: the FULL oracle-checked set — BENCH and
# CORRECTNESS cover the same names, so every correctness row has a
# matching timing.
BENCH_QUERIES = [
    "q01_pricing_summary",
    "q03_top_revenue_orders",
    "q05_region_revenue",
    "q_filter_events",
    "q_report_detailed",
    "q_regex_extract_json",
    "q_leaderboard_periods",
    "q_grouping_sets_rollup",
    "q_topn_per_group",
    "q_dedup_keep_first",
    "q_resample_daily_gapfill",
    "q_cumulative_daily",
    "q_sessionize_gap",
    "q_near_best_band",
    "q_asof_join",
    "q_interval_join",
    "q_skeleton_left_join",
    "q_summary_stats",
    "q_explode_word_counts",
    "q_exact_dedup_docs",
    "q_minhash_lsh_pairs",
    "q_ngram_jaccard_pairs",
    "q_cosine_topk",
    "q_lsh_ann_topk",
    "q_ivf_ann_topk",
    "q_pq_ann_topk",
    "q_ivfpq_topk",
    "q_quality_probe",
    "q_jl_projection",
    "q_probe_calibration",
    "q_bloom_semijoin",
    "q_exact_quantiles",
    "q_text_quality_by_lang",
    "q_doc_fingerprint",
    "q_media_features",
    "q_media_frame_sample",
    "q_media_neardup",
    "q_crossmodal_dedup_clusters",
    "q_kmeans_centroids",
    "q_semantic_dedup",
    "q_parse_engine",
    "q_temporal_remap",
    "q_exclusion_rules",
    "q_duration_parse",
    "q_embedding_neardup",
    "q_report_timeseries_multi",
    "q_report_collection_log",
    "q_report_personal_bests",
    "q_report_recent_achievements",
    "q_incremental_append",
    "q_per_key_watermark",
    "q_hash_sample",
    "q_train_val_test_split",
    "q_leakage_safe_split",
    "q_length_buckets",
    "q_domain_mix_sample",
    "q_temperature_mix",
    "q_global_shuffle_order",
    "q_contamination_report",
    "q_decontaminate_by_lang",
    "q_rest_timeseries",
    "q_binned_interval_join",
    "q_salted_agg",
    "q_salted_join",
    "q_pii_redaction",
    "q_repetition_scores",
    "q_derived_union_counts",
    "q_language_id",
    "q_name_change_parse",
    "q_parse_game_mode",
    "q_pattern_grammar",
    "q_running_best_changelog",
    "q_running_best_changelog_tws",
    "q_stream_sessionize_timers",
    "q_set_except",
    "q_simhash_pairs",
    "q_streaming_windowed_rollup",
    "q_streaming_session_rollup",
    "q_doc_chunks",
    "q_pack_sequences",
    "q_packed_shards",
    "q_dedup_clusters",
    "q13_customer_order_dist",
    "q18_large_orders",
    "q_brand_supplier_counts",
    "q_rolling_range_window",
    "q_retention_cohorts",
    "q_unpivot_metrics",
    "q_pivot_event_values",
    "q_scd2_history",
    "q_outlier_zscore",
    "q_percentile_stats",
    "q_hll_distinct_users",
    "q_hll_user_overlap",
    "q_hll_rolling_distinct",
    "q_hll_rolling_at_rest",
    "q_min_cost_supplier",
    "q_waiting_orders",
    "q_data_quality_events",
    "q_weighted_sample",
    "q_histogram_quantiles",
    "q_funnel_conversion",
    "q_incremental_agg",
    "q_token_vocab",
    "q_bpe_merges",
    "q_bpe_encode",
    "q_stream_topk_entries",
    "q_stats_pruned_scan",
    "q_point_lookup_pruned",
    "q_pruned_in_list",
    "q_targeted_delete",
    "q_dv_delete",
    "q_expectations",
    "q_corpus_gate",
    "q_metric_drift",
    "q_topn_pruned",
    "q_duplicate_ngram_spans",
    "q_boilerplate_removal",
    "q_scd2_as_of",
    "q_stratified_fixed_k",
    "q_table_checksum",
    "q_cube_aggregate",
    "q04_order_priority",
    "q06_forecast_revenue",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_returned_items",
    "q12_shipping_delay",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_quantity_share_suppliers",
    "q22_idle_customers",
    "q_supplier_share",
    "q_window_functions",
    "q_fuzzy_name_match",
    "q_stream_interval_join",
    "q_cms_heavy_hitters",
    "q_cms_window_at_rest",
    "q_histogram_window_at_rest",
    "q_bm25_search",
    "q_hybrid_rrf_search",
    "q_ewma_by_user",
    "q_lm_perplexity",
    "q_unigram_kl_drift",
    "q_token_rarity",
    "q_cdc_merge",
    "q_item_copurchase",
    "q_copurchase_pagerank",
    "q_event_transitions",
    "q_targeted_upsert",
    "q_change_feed",
    "q_time_travel",
    "q_schema_evolution",
    "q_compact_table",
    "q_incremental_view",
    "q_ivm_segmented",
    "q_merge_distributed",
    "q_asof_lineage",
    "q_cdc_stream",
]


def main() -> None:
    from osrs_dashboard_elt_spark.session import get_spark
    from osrs_dashboard_elt_spark.suite import reset_memos
    import __spark_entry__ as entrymod

    spark = get_spark(
        app_name="osrs-elt-bench",
        master=f"local[{CPUS}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(int(CPUS), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    # Steady-state protocol (JMH-style): each query is warmed UNTIMED
    # at the BENCH SF immediately before its timed run.  The warm run
    # compiles the query's whole-stage-codegen units, spins the
    # Arrow/python-datasource workers and the streaming state-store
    # engine, and primes the parquet footers at the scale being
    # measured (warming at a smaller SF left ±1 s of
    # first-run-at-scale noise in the recorded numbers and produced
    # phantom round-over-round regressions).  One timed run after a
    # same-SF warm keeps the whole suite ~2x a cold pass — bounded
    # enough for an external runner's timeout; set
    # SPARK_GRAFT_BENCH_REPS>1 for a min-of-N steady-state estimate
    # when wall-clock budget allows.  Interleaving (rather than one
    # warm pass over the whole suite) keeps each query's compiled
    # classes resident in the codegen cache.
    reps = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    # Two timed runs ALWAYS, a third when they disagree: the same code
    # measured 0.55 s vs 1.52 s on one sub-second query across two
    # driver runs (scheduler/JIT noise), which read as a phantom 2.8x
    # regression.  min-of-2 kills most of that; when even the two
    # samples disagree by more than the ratio below, one more sample
    # resolves which of them was the outlier.  Reported value = min of
    # all samples (steady-state estimate — GC pauses and compilation
    # only ever ADD time).
    disagree = float(os.environ.get("SPARK_GRAFT_BENCH_DISAGREE", "1.5"))
    qs["q_summary_stats"](spark, SF_DIR).count()

    # Subset filter for controlled experiments (drift attribution,
    # A/B of session-growth effects): comma-separated names, or a
    # file path containing one name per line.  Unset = full suite.
    flt = os.environ.get("SPARK_GRAFT_BENCH_FILTER")
    only: set[str] | None = None
    if flt:
        if os.path.isfile(flt):
            with open(flt) as f:
                only = {ln.strip() for ln in f if ln.strip()}
        else:
            only = {s.strip() for s in flt.split(",") if s.strip()}

    ref_before = round(_host_ref_sec(spark), 3)
    timings: dict[str, float] = {}
    t_all = 0.0
    for name in BENCH_QUERIES:
        if name not in qs or (only is not None and name not in only):
            continue
        try:
            qs[name](spark, SF_DIR).count()  # warm, untimed
        except Exception:
            pass
        samples: list[float] = []
        for _ in range(reps):
            # Clear the result/artifact memos (trained models, built
            # filters/indexes/layouts) so EVERY timed rep pays its
            # query's full build — round 12's verdict flagged the
            # warm-run-populates-memo pattern as a timing blind spot
            # (training/index/bloom builds escaped the timed region).
            reset_memos()
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            samples.append(time.time() - t0)
        if max(samples) > disagree * min(samples):
            reset_memos()
            t0 = time.time()
            qs[name](spark, SF_DIR).count()
            samples.append(time.time() - t0)
        timings[name] = round(min(samples), 3)
        t_all += timings[name]
        # JMH-style forced GC BETWEEN benchmarks (untimed): Spark's
        # ContextCleaner releases localCheckpoint/broadcast/shuffle
        # blocks only when the driver GC collects their weak refs, so
        # a 141-query session otherwise accumulates dead blocks whose
        # memory pressure is charged to LATER queries (measured: the
        # unchanged 109-query subset ran ~10% slower inside the full
        # suite than alone).
        spark.sparkContext._jvm.System.gc()  # noqa: SLF001
    total = round(t_all, 3)
    ref_after = round(_host_ref_sec(spark), 3)
    host = {
        "host_ref_sec_before": ref_before,
        "host_ref_sec_after": ref_after,
        # min of the two probes: the least-interfered estimate of this
        # run's CPU tax.  ~1.0 on an idle host; divide this run's
        # seconds by it before comparing against another run.
        "host_factor": round(
            max(min(ref_before, ref_after), 1e-3) / REF_NOMINAL_SEC, 3
        ),
    }
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf else None
    full_line, compact_line = format_output(
        timings, total, sf_val, filtered=only is not None, host=host
    )
    # Full per-query record: archived to a file AND printed on an
    # early line (human/archive view).
    here = os.path.dirname(os.path.abspath(__file__))
    if only is None:
        # a FILTERED run must not overwrite the committed full-suite
        # artifact — it would silently corrupt round-over-round drift
        # tracking (the record carries no per-query coverage marker)
        try:
            with open(os.path.join(here, "BENCH_QUERIES.json"), "w") as f:
                f.write(full_line)
        except OSError:
            pass
    print(full_line, flush=True)
    # The driver captures a bounded TAIL of stdout; a single ~3.5 KB
    # line for 100+ queries can have its head cut, leaving nothing
    # parseable (round-3's BENCH artifact).  So the LAST line is a
    # compact record guaranteed to fit any reasonable tail buffer:
    # the headline metric plus only the slowest queries, with a
    # pointer to the full per-query file.
    print(compact_line, flush=True)


def format_output(
    timings: dict[str, float],
    total: float,
    sf_val: float | None,
    filtered: bool = False,
    host: dict | None = None,
) -> tuple[str, str]:
    """(full_json_line, compact_json_line) — the compact line carries
    the headline metric + the 15 slowest queries and stays well under
    2 KB no matter how large the suite grows.  ``host`` carries the
    noise-calibration fields (host_ref_sec_before/after, host_factor)
    emitted on BOTH lines."""
    host = host or {}
    full = json.dumps(
        {
            "metric": "suite_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf_val,
            **host,
            **({"filter": True} if filtered else {}),
        }
    )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    compact = json.dumps(
        {
            "metric": "suite_wall_clock",
            "value": total,
            "unit": "sec",
            "queries": slowest,
            "sf": sf_val,
            "n_queries": len(timings),
            "sec_per_query": round(total / max(len(timings), 1), 3),
            "queries_file": "BENCH_QUERIES.json",
            **host,
            **({"filter": True} if filtered else {}),
        },
        separators=(",", ":"),
    )
    return full, compact


if __name__ == "__main__":
    main()
