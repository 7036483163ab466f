"""At-rest model registry for the trained artifacts.

The repo now trains four kinds of model in Spark — k-means centroids,
PQ codebooks, BPE merge lists, linear-probe weights — and every
consumer (IVF/PQ indexes, the tokenizer, the corpus-pipeline quality
gate) wants them across sessions: train nightly, serve everywhere.
This is the smallest registry that does that honestly on a cluster
filesystem:

- one appendable parquet table ``(name, version, seq, kind, payload,
  run_id)`` — readable by ANY Spark session, no driver-local pickle;
- ``version`` is the md5 of the canonical JSON payload, so identical
  re-trains are the SAME version and ``save_model`` is idempotent
  (the bit-replayable training upstream makes this meaningful: same
  data -> same floats -> same version);
- ``seq`` is a per-name monotonic counter assigned at save time, so
  "latest" is well-defined without wall clocks (determinism: the
  repo's no-hidden-nondeterminism rule extends to its metadata);
- payloads are JSON with ``repr``-faithful floats (Python ``json``
  round-trips IEEE doubles exactly), so a loaded model is
  bit-identical to the trained one — the oracles downstream keep
  holding.

Single-writer contract, same as the dedup index: concurrent saves of
the same name can race the seq read; route multi-writer setups
through one owner.  At 100 TB the registry is kilobytes — the scan
cost is one footer read; readers filter on (name) and the parquet
row-group stats prune the rest.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_SCHEMA = StructType(
    [
        StructField("name", StringType(), False),
        StructField("version", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload", StringType(), False),
        StructField("run_id", StringType(), True),
    ]
)


def _canonical(payload) -> str:
    # sort_keys + no whitespace: one byte form per logical payload —
    # the version hash must not depend on dict ordering
    return json.dumps(payload, sort_keys=True, separators=(",", ":"))


def model_version(payload) -> str:
    """Content-addressed version: md5 of the canonical JSON."""
    return hashlib.md5(_canonical(payload).encode()).hexdigest()


def _read(spark: SparkSession, path: str):
    # explicit-schema parquet reads defer path validation to action
    # time (no eager schema inference touches the path), so a missing
    # registry would surface as an AnalysisException deep inside the
    # caller's first collect — probe existence eagerly instead
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return spark.createDataFrame([], _SCHEMA)
    return spark.read.schema(_SCHEMA).parquet(path)


def save_model(
    spark: SparkSession,
    path: str,
    name: str,
    kind: str,
    payload,
    run_id: str | None = None,
) -> str:
    """Append one model row; returns its content version.  Idempotent:
    an existing (name, version) row short-circuits — re-running a
    deterministic training job never duplicates the registry."""
    version = model_version(payload)
    existing = (
        _read(spark, path)
        .filter((F.col("name") == name))
        .select("version", "seq")
        .collect()
    )
    if any(r["version"] == version for r in existing):
        return version
    seq = max((r["seq"] for r in existing), default=0) + 1
    spark.createDataFrame(
        [(name, version, seq, kind, _canonical(payload), run_id)], _SCHEMA
    ).write.mode("append").parquet(path)
    return version


def load_model(
    spark: SparkSession,
    path: str,
    name: str,
    version: str | None = None,
):
    """Load a payload by (name[, version]); default is the latest seq.
    Returns ``(payload, version)``.  Raises KeyError when absent."""
    rows = (
        _read(spark, path)
        .filter(F.col("name") == name)
        .select("version", "seq", "payload")
        .collect()
    )
    if version is not None:
        rows = [r for r in rows if r["version"] == version]
    if not rows:
        raise KeyError(f"registry has no model {name!r} (version={version!r})")
    best = max(rows, key=lambda r: r["seq"])
    return json.loads(best["payload"]), best["version"]


def list_models(spark: SparkSession, path: str):
    """(name, kind, n_versions, latest_version) — one row per name."""
    return (
        _read(spark, path)
        .groupBy("name", "kind")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.max_by("version", "seq").alias("latest_version"),
        )
    )
