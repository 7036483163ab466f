"""Multimodal column processing (training-data pipeline extension).

The reference pipeline is text-only; a 100 TB training-data pipeline
carries images/audio/video alongside text.  Design:

- media is an opaque ``binary`` column plus a typed metadata struct
  (``MEDIA_SCHEMA``) — Spark shuffles/stores bytes opaquely and all
  pruning happens on the metadata columns, so a filter like
  ``media.media_type = 'image'`` never touches the blobs;
- decode / feature-extract / resize / frame-sample run as
  Arrow-batched pandas over ``mapInPandas`` — bytes cross the
  JVM<->Python boundary once per batch, not once per row;
- the actual codec work (PIL/libav) is NOT available in this
  container, so the codec call sites are stubbed: ``decode_image``
  raises ``NotImplementedError`` unless PIL is importable, and the
  deterministic fake format below stands in for tests.  The
  Spark-side plumbing — schema, batch shape, UDF signatures,
  partition balance — is real and tested.

Fake format (deterministic, so tests and oracles can recompute it):

    b"FMM1" | media_type(1 byte: I/A/V) | width:u16be | height:u16be
    | n_frames:u16be | payload (utf-8 text)

Scale notes: blobs skew partition sizes — ``attach_fake_media``'s
callers should repartition by a size-bucketed key before heavy UDF
stages (``repartitionByRange`` on ``media.n_bytes``); feature
extraction projects ONLY the columns it needs so Parquet never
deserializes blobs for metadata-only queries (columnar pruning is the
whole point of splitting bytes from metadata).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.skew import ensure_min_partitions

_MAGIC = b"FMM1"
_TYPE_CODES = {"image": b"I", "audio": b"A", "video": b"V"}
_CODE_TYPES = {v[0]: k for k, v in _TYPE_CODES.items()}

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
    ]
)


def encode_fake_media(media_type: str, width: int, height: int, n_frames: int, payload: bytes) -> bytes:
    """Driver/test helper: build one deterministic fake blob."""
    return _MAGIC + _TYPE_CODES[media_type] + struct.pack(">HHH", width, height, n_frames) + payload


def _decode_fake_header(blob: bytes) -> tuple[str, int, int, int]:
    if blob[:4] != _MAGIC:
        raise ValueError("not a FMM1 blob")
    mtype = _CODE_TYPES[blob[4]]
    width, height, n_frames = struct.unpack(">HHH", blob[5:11])
    return mtype, width, height, n_frames


def attach_fake_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic fake media blob per row, JVM-side
    (no Python), cycling media types by id.  Width/height/n_frames
    derive from the id so every downstream stage is reproducible."""
    mid = F.col(id_col)
    tcode = (
        F.when(mid % 3 == 0, F.lit("I"))
        .when(mid % 3 == 1, F.lit("A"))
        .otherwise(F.lit("V"))
    )
    w = (mid % 64 + 1).cast("int")
    h = (mid % 48 + 1).cast("int")
    nf = (mid % 30 + 1).cast("int")

    def u16be(c: Column) -> Column:
        # int -> 2 big-endian bytes (ANSI mode forbids int->binary cast)
        return F.unhex(F.lpad(F.hex(c.cast("long")), 4, "0"))

    blob = F.concat(
        F.lit(_MAGIC),
        F.encode(tcode, "utf-8"),
        u16be(w),
        u16be(h),
        u16be(nf),
        F.encode(F.col(text_col), "utf-8"),
    )
    meta = F.struct(
        F.when(mid % 3 == 0, "image").when(mid % 3 == 1, "audio").otherwise("video").alias("media_type"),
        F.length(blob).cast("long").alias("n_bytes"),
        w.alias("width"),
        h.alias("height"),
        nf.alias("n_frames"),
    )
    return df.withColumn("media_blob", blob).withColumn("media", meta)


def extract_media_features(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "media_blob",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Decode headers + payload stats from the blobs with ONE
    Arrow-batched pass (``mapInPandas``).  Projects only (id, blob)
    so the scan prunes every other column.

    ``min_parallelism``: opt-in parallelism floor (see
    ``operators.ensure_min_partitions``) for REAL codecs where decode
    is 10ms+/blob and a single-split input would serialize it on one
    core.  Off by default: the floor's repartition shuffles every blob,
    which costs more than this header-only decode (measured 0.55s ->
    2.9s at sf0.1), and is a no-op at scale where the corpus already
    arrives as many splits."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                mtype, w, h, nf = _decode_fake_header(b)
                # byte stats vectorized: a Python sum() over bytes is
                # ~50x slower per blob and this is the per-row hot loop
                byte_sum = int(np.frombuffer(b, dtype=np.uint8, offset=11).sum())
                rows.append((int(doc_id), mtype, len(b), w, h, nf, byte_sum))
            yield pd.DataFrame(
                rows, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields]
            )

    staged = df.select(id_col, blob_col)
    if min_parallelism is not None:
        staged = ensure_min_partitions(staged, target=min_parallelism)
    return staged.mapInPandas(gen, MEDIA_FEATURE_SCHEMA)


# dHash geometry: the decoded image is block-averaged to an 8x8 grid
# and each row's 7 adjacent-cell comparisons contribute one bit ->
# 56-bit fingerprint (fits a signed long with headroom, and 56 splits
# evenly into the 4 pigeonhole chunks of a hamming-3 blocked join).
PHASH_GRID = 8
PHASH_BITS = PHASH_GRID * (PHASH_GRID - 1)


def perceptual_hash(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "media_blob",
) -> DataFrame:
    """(id, phash) dHash fingerprints over the Arrow decode path.

    Real pipeline: decode the image, grayscale, block-average to an
    ``(GRID x GRID)`` grid, set bit (r, c) iff cell(r, c) < cell(r,
    c+1) — the classic difference hash, robust to rescaling and
    recompression because block means survive both.  With no codec in
    the container, the deterministic stand-in treats the FMM1 payload
    as the 1-D pixel stream: the grid cells are the block sums of the
    payload bytes (``numpy`` slice sums — the same vectorized shape a
    real grayscale downsample produces), so the fingerprint is a pure
    function of the synthetic pixels and an external SQL oracle can
    recompute it byte-for-byte.

    One Arrow-batched pass, no shuffle; projects (id, blob) only."""
    import numpy as np

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )
    g = PHASH_GRID

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = np.frombuffer(bytes(blob), dtype=np.uint8, offset=11)
                n = len(b)
                bounds = [n * k // (g * g) for k in range(g * g + 1)]
                cells = [
                    int(b[bounds[k]:bounds[k + 1]].sum())
                    for k in range(g * g)
                ]
                ph = 0
                for r in range(g):
                    for c in range(g - 1):
                        if cells[r * g + c] < cells[r * g + c + 1]:
                            ph |= 1 << (r * (g - 1) + c)
                ids.append(int(doc_id))
                hashes.append(ph)
            yield pd.DataFrame({"id": ids, "phash": hashes})

    return df.select(id_col, blob_col).mapInPandas(gen, out_schema)


def media_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    blob_col: str = "media_blob",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) perceptual near-duplicate pairs among the
    media blobs: dHash fingerprints (one Arrow decode pass) into the
    SAME pigeonhole-blocked hamming join the SimHash text path uses
    (operators/dedup.py::hamming_blocked_pairs) — lossless for the
    radius, candidates bounded by chunk buckets, optional hot-bucket
    cap.  At 100 TB the join moves (id, 56-bit fp) rows only; blobs
    are read once by the fingerprint pass and never shuffled."""
    from ..operators.dedup import hamming_blocked_pairs

    fps = (
        perceptual_hash(df, id_col, blob_col)
        .withColumnRenamed("phash", "fp")
        .localCheckpoint(eager=False)
    )
    return hamming_blocked_pairs(
        fps, PHASH_BITS, max_hamming, max_bucket_size
    )


def decode_image(blob: bytes):
    """Decode an image blob to an array.  Real codec (PIL) is not in
    this container — the call site and signature are the contract."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires PIL; container ships none — "
            "plumbing is exercised via the FMM1 fake format instead"
        ) from exc
    import io

    return Image.open(io.BytesIO(blob))  # pragma: no cover


def resize_images(
    df: DataFrame,
    max_side: int,
    id_col: str = "doc_id",
    blob_col: str = "media_blob",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Resize pass over image blobs (``mapInPandas``).  With no codec
    in the container, the fake format 'resizes' by clamping the header
    dims (aspect-preserving) and keeping the payload — the batch
    shape, schema, and byte round-trip are the real thing."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("media_blob", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs, ws, hs = [], [], [], []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                b = bytes(blob)
                mtype, w, h, nf = _decode_fake_header(b)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                ids.append(int(doc_id))
                blobs.append(encode_fake_media(mtype, nw, nh, nf, b[11:]))
                ws.append(nw)
                hs.append(nh)
            yield pd.DataFrame(
                {id_col: ids, "media_blob": blobs, "width": ws, "height": hs}
            )

    staged = df.select(id_col, blob_col)
    if min_parallelism is not None:
        # real resize is CPU-bound per blob — opt-in floor, same
        # trade-off as extract_media_features
        staged = ensure_min_partitions(staged, target=min_parallelism)
    return staged.mapInPandas(gen, out_schema)


def sample_frames(
    df: DataFrame,
    every_nth: int,
    id_col: str = "doc_id",
    meta_col: str = "media",
) -> DataFrame:
    """Frame sampling plan for video rows: JVM-side ``sequence`` +
    ``explode`` computes the sampled frame indices from metadata
    WITHOUT touching blobs; the per-frame decode would be one more
    ``mapInPandas`` over (blob, frame_idx) pairs."""
    # n_frames >= 1 guard: MEDIA_SCHEMA can carry 0 for a corrupt/empty
    # video, and sequence(0, -1, step) throws 'Illegal sequence
    # boundaries' in the executor — such rows emit NO frames instead
    # of killing the job
    vids = df.filter(
        (F.col(f"{meta_col}.media_type") == "video")
        & (F.col(f"{meta_col}.n_frames") >= 1)
    )
    idxs = F.sequence(
        F.lit(0), F.col(f"{meta_col}.n_frames") - 1, F.lit(every_nth)
    )
    return vids.select(
        F.col(id_col),
        F.col(f"{meta_col}.n_frames").alias("n_frames"),
        F.explode(idxs).alias("frame_idx"),
    )
