"""Scale probe: run the corpus-scale operator family at 1x/2x/4x the
sf0.1 data and report wall-time growth.

Replicas are PERTURBED so they are not near-duplicates of the
originals (every token is prefixed with the replica id; embeddings
get a deterministic per-replica rotation of their first component) —
otherwise an 8-way replicated corpus is one giant duplicate class and
every pair generator legitimately goes quadratic.  With distinct
replicas, a scale-correct operator should grow ~linearly in corpus
size (shuffles and scans dominate); a quadratic blow-up here means a
blocking/capping bug.

Usage: python scripts/scale_probe.py [max_factor]
Prints one JSON line per (operator, factor) and a final summary with
the t(max)/t(1) ratio per operator.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.1"


def replicate_docs(spark, base, k):
    parts = []
    for i in range(k):
        d = base
        if i > 0:
            d = d.select(
                (F.col("doc_id") + 1_000_000 * i).alias("doc_id"),
                F.regexp_replace(
                    "text", r"(\S+)", f"r{i}_$1"
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        parts.append(d)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()  # isolate build cost from probe cost


def replicate_emb(spark, base, k):
    parts = []
    for i in range(k):
        e = base
        if i > 0:
            e = e.select(
                (F.col("vec_id") + 1_000_000 * i).alias("vec_id"),
                F.expr(
                    "transform(embedding, (x, j) -> CAST(x + "
                    f"{0.37 * i}" + " * cos(j) AS FLOAT))"
                ).alias("embedding"),
                "label",
            )
        parts.append(e)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.localCheckpoint()


def main() -> None:
    max_factor = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    factors = [f for f in (1, 2, 4, 8) if f <= max_factor]
    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    from osrs_dashboard_elt_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
        simhash_pairs,
    )
    from osrs_dashboard_elt_spark.operators.similarity import (
        embedding_neardup_pairs,
    )
    from osrs_dashboard_elt_spark.operators.skew import ensure_min_partitions

    docs0 = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb0 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    ops = {
        "exact_dedup": lambda d, e: exact_dedup(d, ["text"], "doc_id"),
        "minhash_lsh": lambda d, e: minhash_lsh_pairs(
            d, "doc_id", "text", num_perm=16, bands=4, seed=42, shingle_n=3
        ),
        "ngram_jaccard": lambda d, e: ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.5
        ),
        "simhash": lambda d, e: simhash_pairs(
            d, "doc_id", "text", bits=48, max_hamming=3
        ),
        "embedding_neardup": lambda d, e: embedding_neardup_pairs(
            e,
            "vec_id",
            "embedding",
            threshold=0.25,
            n_planes=18,
            seed=42,
            bands=3,
            max_bucket_size=100,
        ),
    }

    times: dict[str, dict[int, float]] = {n: {} for n in ops}
    for k in factors:
        docs = ensure_min_partitions(replicate_docs(spark, docs0, k))
        emb = ensure_min_partitions(replicate_emb(spark, emb0, k))
        docs.count(), emb.count()  # materialize the checkpoint
        for name, fn in ops.items():
            fn(docs, emb).count()  # warm (codegen)
            t0 = time.time()
            rows = fn(docs, emb).count()
            dt = round(time.time() - t0, 2)
            times[name][k] = dt
            print(
                json.dumps(
                    {"op": name, "factor": k, "sec": dt, "rows": rows}
                ),
                flush=True,
            )
    top = factors[-1]
    summary = {
        name: {
            "t1": ts[1],
            f"t{top}": ts[top],
            "ratio": round(ts[top] / ts[1], 2) if ts[1] else None,
        }
        for name, ts in times.items()
    }
    print(json.dumps({"summary": summary, "max_factor": top}))


if __name__ == "__main__":
    main()
