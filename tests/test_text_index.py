"""Inverted index at rest (operators/text_index.py): the BM25 probe
must agree bit-for-bit with the flat q_bm25_search form and must
PARTITION-PRUNE — read only the query terms' posting shards."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.text_index import (
    bm25_search_at_rest,
    write_inverted_index,
)

SF_DIR = "/root/testdata/sf0.001"
TERMS = ["join", "scan", "stream"]
N_SHARDS = 16


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("inv") / "idx")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    write_inverted_index(docs, path, n_shards=N_SHARDS)
    return path


def test_at_rest_matches_flat_bm25(spark, index_path):
    from osrs_dashboard_elt_spark import suite

    flat = suite.QUERIES["q_bm25_search"](spark, SF_DIR).collect()
    at_rest = bm25_search_at_rest(
        spark, index_path, TERMS, k=20, n_shards=N_SHARDS
    ).collect()
    assert [(r.doc_id, r.bm25) for r in flat] == [
        (r.doc_id, r.bm25) for r in at_rest
    ]


def _scan_metrics(df) -> dict[str, int]:
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    out: dict[str, int] = {}
    for i in range(leaves.size()):
        leaf = leaves.apply(i)
        m = leaf.metrics()
        keys = m.keys().toList()
        for j in range(keys.size()):
            k = keys.apply(j)
            if k in ("numFiles", "numPartitions"):
                out[k] = out.get(k, 0) + int(m.apply(k).value())
    return out


def test_probe_partition_prunes(spark, index_path):
    probe = bm25_search_at_rest(
        spark, index_path, ["join"], k=5, n_shards=N_SHARDS
    )
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[[^\]]*shard[^\]]*\]", plan)
    assert pf, plan
    # isolate the postings scan (the probe's executed plan collapses
    # to an AdaptiveSparkPlan wrapper, hiding leaf metrics): a
    # one-term probe's shard predicate must list exactly one of the
    # on-disk shard partitions
    posts = spark.read.parquet(f"{index_path}/postings")
    n_shards_on_disk = posts.select("shard").distinct().count()
    assert n_shards_on_disk > 1
    import hashlib

    s = int(hashlib.md5(b"join").hexdigest()[:15], 16) % N_SHARDS
    pruned = posts.filter(F.col("shard") == s)
    pruned.collect()
    metrics = _scan_metrics(pruned)
    assert metrics["numPartitions"] == 1 < n_shards_on_disk, metrics


def test_empty_terms_rejected(spark, index_path):
    with pytest.raises(ValueError, match="at least one term"):
        bm25_search_at_rest(spark, index_path, [])


def test_probe_rejects_mismatched_shard_count(spark, index_path):
    with pytest.raises(ValueError, match="n_shards"):
        bm25_search_at_rest(spark, index_path, ["join"], n_shards=32)


def test_probe_lowercases_terms(spark, index_path):
    lo = bm25_search_at_rest(
        spark, index_path, ["join"], k=5, n_shards=N_SHARDS
    ).collect()
    hi = bm25_search_at_rest(
        spark, index_path, ["JOIN"], k=5, n_shards=N_SHARDS
    ).collect()
    assert [(r.doc_id, r.bm25) for r in lo] == [(r.doc_id, r.bm25) for r in hi]
    assert lo  # and it actually finds postings
