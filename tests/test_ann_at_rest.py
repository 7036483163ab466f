"""At-rest ANN index (operators/similarity.py write_lsh_index /
lsh_ann_topk_at_rest): the probe must PARTITION-PRUNE — read only the
query bucket's files — and agree exactly with the flat-table probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.operators.similarity import (
    hyperplanes,
    lsh_ann_topk,
    lsh_ann_topk_at_rest,
    query_bucket,
    write_lsh_index,
)

SF_DIR = "/root/testdata/sf0.001"
N_PLANES = 4
SEED = 42


def _query_vec(spark):
    row = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") == 7)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


def _index(spark, tmp_path_factory):
    path = str(tmp_path_factory.getbasetemp() / "lsh_index")
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    write_lsh_index(df, path, "embedding", n_planes=N_PLANES, seed=SEED)
    return path


def test_at_rest_matches_flat_probe(spark, tmp_path_factory):
    path = _index(spark, tmp_path_factory)
    q = _query_vec(spark)
    flat = lsh_ann_topk(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        "embedding", q, k=10, n_planes=N_PLANES, seed=SEED,
    ).collect()
    at_rest = lsh_ann_topk_at_rest(
        spark, path, q, k=10, n_planes=N_PLANES, seed=SEED
    ).collect()
    assert [(r.vec_id, r.score, r.bucket) for r in flat] == [
        (r.vec_id, r.score, r.bucket) for r in at_rest
    ]


def _scan_metrics(df) -> dict[str, int]:
    """Post-execution FileSourceScan metrics (numFiles/numPartitions)
    — inputFiles() is pre-pruning, so metrics are the real evidence."""
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


def test_probe_partition_prunes(spark, tmp_path_factory):
    path = _index(spark, tmp_path_factory)
    q = _query_vec(spark)
    probe = lsh_ann_topk_at_rest(spark, path, q, k=10, n_planes=N_PLANES, seed=SEED)
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the bucket predicate must be a PARTITION filter on the scan with
    # the query's literal bucket — not a post-scan row filter
    planes = hyperplanes(N_PLANES, len(q), SEED)
    qb = query_bucket(q, planes)
    import re

    pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert pf and f"= {qb}" in pf.group(0), plan

    # and the executed scan must list strictly fewer partitions than
    # the 2^n_planes that exist on disk
    n_buckets = (
        spark.read.parquet(path).select("bucket").distinct().count()
    )
    metrics = _scan_metrics(probe)
    assert metrics["numPartitions"] == 1 < n_buckets
    assert metrics["numFiles"] < n_buckets


def test_multi_probe_widens_recall(spark, tmp_path_factory):
    path = _index(spark, tmp_path_factory)
    q = _query_vec(spark)
    single = lsh_ann_topk_at_rest(
        spark, path, q, k=500, n_planes=N_PLANES, seed=SEED
    ).count()
    multi = lsh_ann_topk_at_rest(
        spark, path, q, k=500, n_planes=N_PLANES, seed=SEED, multi_probe=True
    ).count()
    assert multi > single  # 1-bit-flip probes add candidates
    # multi-probe still prunes: scans at most n_planes+1 partitions
    mp = lsh_ann_topk_at_rest(
        spark, path, q, k=5, n_planes=N_PLANES, seed=SEED, multi_probe=True
    )
    mp.collect()
    assert _scan_metrics(mp)["numPartitions"] <= N_PLANES + 1


# ---------------------------------------------------------------------------
# IVF at-rest: same contract, cell-partitioned layout
# ---------------------------------------------------------------------------


def _centroids(spark, n=4):
    import math

    rows = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .filter(F.col("vec_id") < n)
        .orderBy("vec_id")
        .collect()
    )
    out = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        out.append([x / nrm for x in v])
    return out


def _ivf_index(spark, tmp_path_factory, cents):
    from osrs_dashboard_elt_spark.operators.similarity import write_ivf_index

    path = str(tmp_path_factory.getbasetemp() / "ivf_index")
    df = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    write_ivf_index(df, path, "embedding", cents)
    return path


def test_ivf_at_rest_matches_flat_probe(spark, tmp_path_factory):
    from osrs_dashboard_elt_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_ann_topk_at_rest,
    )

    cents = _centroids(spark)
    path = _ivf_index(spark, tmp_path_factory, cents)
    q = _query_vec(spark)
    flat = ivf_ann_topk(
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet"),
        "embedding", q, cents, k=10, nprobe=2,
    ).collect()
    rest = ivf_ann_topk_at_rest(spark, path, q, cents, k=10, nprobe=2).collect()
    assert [(r.vec_id, r.score, r.cell) for r in rest] == [
        (r.vec_id, r.score, r.cell) for r in flat
    ]


def test_ivf_probe_partition_prunes(spark, tmp_path_factory):
    import re

    from osrs_dashboard_elt_spark.operators.similarity import ivf_ann_topk_at_rest

    cents = _centroids(spark)
    path = _ivf_index(spark, tmp_path_factory, cents)
    q = _query_vec(spark)
    probe = ivf_ann_topk_at_rest(spark, path, q, cents, k=10, nprobe=2)
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = re.search(r"PartitionFilters: \[[^\]]*\]", plan)
    assert pf and "cell" in pf.group(0), plan
    metrics = _scan_metrics(probe)
    assert metrics["numPartitions"] <= 2
