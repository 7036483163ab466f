"""Batch embedding generation over ``mapInPandas`` (Arrow).

The real model call (sentence-transformer, CLIP, an internal
inference endpoint) is not available in this container, so the model
is injected and the default is a DETERMINISTIC fake: embedding[i] =
md5(doc_id | i) scaled to [-1, 1), unit-normalized.  What is real —
and what the tests pin — is the Spark-side plumbing a 100 TB embed
job needs:

- Arrow batches in and out (one pandas frame per batch, vectorized
  numpy inside; never row-at-a-time Python),
- only (id, text) crosses into Python; the embedding column comes
  back as ``array<float>`` ready for the ANN operators,
- partition-parallel: the model loads once per PYTHON WORKER (module
  state), not once per row or batch,
- deterministic output so re-runs, retries, and speculative tasks
  produce identical vectors (idempotent downstream writes).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

EMBED_SCHEMA = "doc_id long, embedding array<float>"


def fake_embed_batch(ids: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic stand-in model: rows are unit vectors derived
    from md5(doc_id, i).  Vectorized per batch."""
    import hashlib

    out = np.empty((len(ids), dim), dtype=np.float64)
    for r, doc_id in enumerate(ids):
        h = hashlib.md5(str(int(doc_id)).encode()).digest()
        # expand to dim floats: md5(doc_id||block) 16 bytes -> 4 floats
        vals = []
        block = 0
        while len(vals) < dim:
            hb = hashlib.md5(h + block.to_bytes(4, "big")).digest()
            for off in range(0, 16, 4):
                vals.append(int.from_bytes(hb[off : off + 4], "big"))
            block += 1
        v = np.array(vals[:dim], dtype=np.float64)
        v = v / 2**31 - 1.0  # [-1, 1)
        out[r] = v / np.linalg.norm(v)
    return out


def embed_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    dim: int = 64,
    model: Callable[[np.ndarray, int], np.ndarray] | None = None,
) -> DataFrame:
    """(id, ...) -> (doc_id, embedding array<float>): Arrow-batched
    map; ``model`` maps an id batch to a (n, dim) float array."""
    fn = model or fake_embed_batch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = fn(ids, dim)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "embedding": [
                        np.asarray(v, dtype=np.float32) for v in vecs
                    ],
                }
            )

    return docs.select(id_col).mapInPandas(run, schema=EMBED_SCHEMA)
