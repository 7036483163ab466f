"""Reusable dataflow operators (SURVEY.md §2 inventory, Spark-first)."""

from .asof import asof_join
from .baskets import copurchase_pairs
from .chunking import chunk_documents
from .components import connected_components, dedup_clusters
from .dedup_index import (
    probe_embedding_index,
    probe_minhash_index,
    write_embedding_index,
    write_minhash_index,
)
from .dedup import (
    dedup_keep_first,
    dedup_keep_first_asc,
    exact_dedup,
    minhash_lsh_pairs,
    minhash_params,
    minhash_signature,
    ngram_jaccard_pairs,
    shingles_col,
    simhash_col,
    simhash_pairs,
    token_hash32,
    tokens_col,
)
from .exclusions import (
    BlacklistEntry,
    ExclusionWindow,
    apply_exclusions,
    blacklist_predicate,
    contains_all_predicate,
    scrub_holder_arrays,
)
from .interval_join import binned_interval_join, interval_join
from .packing import pack_chunks, pack_summary
from .remap import MappingRule, apply_mapping, find_conflicts, remap_expr
from .resample import bucket_col, resample
from .skew import ensure_min_partitions, salted_agg, salted_join
from .sessionize import near_best_band, sessionize
from .similarity import (
    cosine,
    cosine_topk,
    dot,
    hyperplanes,
    ivf_ann_topk,
    ivf_ann_topk_at_rest,
    lsh_ann_topk,
    lsh_ann_topk_at_rest,
    write_ivf_index,
    write_lsh_index,
)
from .outliers import zscore_outliers
from .quality import check_constraints, quality_metrics, table_checksum
from .rolling import rolling_range_agg
from .sampling import stratified_fixed_k, weighted_sample, with_global_position
from .incremental import agg_state, finalize, hll_state, merge_hll_states, merge_states
from .sketches import (
    cms_heavy_hitters,
    count_min_registers,
    histogram_quantile,
    hll_distinct,
)
from .text_index import bm25_search_at_rest, write_inverted_index
from .tokenize import detokenize_expr, encode_word, tokenize
from .scd2 import scd2_as_of, scd2_compress
from .topn import top_n_per_group
from .zorder import column_ranges, write_zordered, zorder_key

__all__ = [
    "asof_join",
    "agg_state",
    "finalize",
    "hll_state",
    "merge_hll_states",
    "merge_states",
    "check_constraints",
    "histogram_quantile",
    "hll_distinct",
    "quality_metrics",
    "stratified_fixed_k",
    "table_checksum",
    "rolling_range_agg",
    "scd2_as_of",
    "scd2_compress",
    "weighted_sample",
    "zscore_outliers",
    "chunk_documents",
    "connected_components",
    "dedup_clusters",
    "pack_chunks",
    "pack_summary",
    "dedup_keep_first",
    "dedup_keep_first_asc",
    "exact_dedup",
    "minhash_lsh_pairs",
    "minhash_params",
    "minhash_signature",
    "ngram_jaccard_pairs",
    "shingles_col",
    "simhash_col",
    "simhash_pairs",
    "token_hash32",
    "tokens_col",
    "BlacklistEntry",
    "ExclusionWindow",
    "apply_exclusions",
    "blacklist_predicate",
    "contains_all_predicate",
    "scrub_holder_arrays",
    "binned_interval_join",
    "interval_join",
    "MappingRule",
    "apply_mapping",
    "find_conflicts",
    "remap_expr",
    "bucket_col",
    "ensure_min_partitions",
    "resample",
    "near_best_band",
    "salted_agg",
    "salted_join",
    "sessionize",
    "cosine",
    "cosine_topk",
    "dot",
    "hyperplanes",
    "lsh_ann_topk",
    "write_lsh_index",
    "write_ivf_index",
    "write_inverted_index",
    "bm25_search_at_rest",
    "cms_heavy_hitters",
    "count_min_registers",
    "lsh_ann_topk_at_rest",
    "ivf_ann_topk_at_rest",
    "ivf_ann_topk",
    "top_n_per_group",
    "column_ranges",
    "write_zordered",
    "zorder_key",
]
