"""Deduplication family for large-scale document pipelines.

Generalizes the reference's key-subset dedup (O5,
src/3_transform_data.py:424-431) and idempotent-append dedup (S4,
src/1_fetch_data.py:147-174) to the operators a training-data pipeline
needs at 100 TB: exact, MinHash+LSH, SimHash, and n-gram Jaccard
near-dup detection.

Determinism contract: every hash used here is derived from md5 (first 8
hex chars -> unsigned 32-bit int), and all permutation parameters come
from a seeded RNG exposed via ``minhash_params`` — so an external SQL
oracle (DuckDB) can reproduce results bit-for-bit.  Spark's builtin
``hash``/``xxhash64`` are NOT used for cross-engine-checkable results.

Scale shapes:
- exact dedup: single hash aggregate on the dedup key (map-side
  partial on a digest, never shuffles full text if keyed on md5).
- MinHash/LSH: signatures are per-row column expressions (no shuffle);
  banding turns all-pairs into an equi-join on (band, band-key) — the
  only shuffle, sized by candidate collisions, with frequent-bucket
  capping available for adversarial skew.
- n-gram Jaccard: inverted-index self-join on shingles; optional
  ``max_doc_freq`` drops stop-shingles (the skew killer at scale).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Prime just above 2**32: (a*h + b) % P stays within int64 for
# 32-bit h and a,b < P — identical arithmetic in Spark and DuckDB.
MINHASH_P = 4294967311


def token_hash32(col: Column) -> Column:
    """Unsigned 32-bit token hash: first 8 hex chars of md5.

    DuckDB equivalent: ``('0x' || substr(md5(t), 1, 8))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the universal hash family
    ``(a*h + b) % P``; inline the same literals into the SQL oracle.

    a, b < 2^31 so that a*h + b < 2^63 for 32-bit token hashes —
    int64-safe in both Spark (ANSI overflow checks) and DuckDB."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, 2**31), rng.randrange(0, 2**31))
        for _ in range(num_perm)
    ]


def tokens_col(text: str | Column, lowercase: bool = True) -> Column:
    """Whitespace tokenization -> distinct token array."""
    c = F.col(text) if isinstance(text, str) else text
    if lowercase:
        c = F.lower(c)
    return F.array_distinct(
        F.filter(F.split(c, r"\s+"), lambda t: t != F.lit(""))
    )


def shingles_col(text: str | Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined, lowercased) of a text
    column."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(F.lower(c), r"\s+"), lambda t: t != F.lit(""))
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i, n)))
    )


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str, keep: str = "min"
) -> DataFrame:
    """Exact duplicate groups: one row per distinct key with the
    canonical (min/max) id and the duplicate count."""
    agg_id = F.min(id_col) if keep == "min" else F.max(id_col)
    return df.groupBy(*key_cols).agg(
        agg_id.alias("canonical_" + id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def dedup_keep_first(
    df: DataFrame, key_cols: list[str], order_cols: list[Column]
) -> DataFrame:
    """Deterministic dropDuplicates: keep the first row of each key
    group under ``order_cols`` (reference O5 keeps first occurrence;
    Spark's dropDuplicates keeps an arbitrary row — a window makes it
    reproducible)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def minhash_signature(
    tokens: Column, num_perm: int = 16, seed: int = 42
) -> list[Column]:
    """MinHash signature as ``num_perm`` column expressions over a
    distinct-token array — computed scan-side, no shuffle."""
    th = F.transform(tokens, token_hash32)
    sig = []
    for a, b in minhash_params(num_perm, seed):
        sig.append(
            F.array_min(
                F.transform(th, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_P))
            )
        )
    return sig


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 42,
    verify_threshold: float | None = None,
    shingle_n: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding.

    Returns distinct (id_a < id_b) pairs sharing at least one LSH band.
    With ``verify_threshold`` the candidates are verified with exact
    token-set Jaccard and filtered.  ``shingle_n`` switches the token
    set from words to n-word shingles.
    """
    rows = num_perm // bands
    toks = (
        shingles_col(text_col, shingle_n) if shingle_n else tokens_col(text_col)
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    sig = minhash_signature(F.col("toks"), num_perm, seed)
    banded = base.select(
        "id",
        "toks",
        *[
            F.concat_ws("_", *[c.cast("string") for c in sig[b * rows : (b + 1) * rows]]).alias(
                f"band{b}"
            )
            for b in range(bands)
        ],
    )
    pair_frames = []
    for b in range(bands):
        l = banded.select(
            F.col("id").alias("id_a"),
            F.col("toks").alias("toks_a"),
            F.col(f"band{b}").alias("bk"),
        )
        r = banded.select(
            F.col("id").alias("id_b"),
            F.col("toks").alias("toks_b"),
            F.col(f"band{b}").alias("bk"),
        )
        pair_frames.append(
            l.join(r, "bk").filter(F.col("id_a") < F.col("id_b")).drop("bk")
        )
    pairs = pair_frames[0]
    for p in pair_frames[1:]:
        pairs = pairs.unionByName(p)
    pairs = pairs.dropDuplicates(["id_a", "id_b"])
    if verify_threshold is None:
        return pairs.select("id_a", "id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = inter.cast("double") / union.cast("double")
    # Filter on the RAW quotient (bit-identical across engines), then
    # decimal-cast-round for the reported score.
    return (
        pairs.withColumn("__jac", jac)
        .filter(F.col("__jac") >= verify_threshold)
        .select(
            "id_a",
            "id_b",
            F.col("__jac").cast("decimal(28,6)").cast("double").alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index join.

    shingle -> posting list self-join counts common shingles per pair;
    Jaccard from inclusion-exclusion.  ``max_doc_freq`` drops shingles
    occurring in more than N docs (stop-shingle skew guard; changes
    recall, documented)."""
    sh = df.select(
        F.col(id_col).alias("id"), shingles_col(text_col, n).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    posts = sh.select("id", F.explode("sh").alias("shingle"))
    if max_doc_freq is not None:
        keep = (
            posts.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("shingle")
        )
        posts = posts.join(keep, "shingle")
    common = (
        posts.alias("a")
        .join(posts.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "sh_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "sh_b"), "id_b")
        .withColumn(
            "__jac",
            F.col("common").cast("double")
            / (F.col("sh_a") + F.col("sh_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("__jac") >= threshold)
    )
    return out.select(
        "id_a",
        "id_b",
        F.col("__jac").cast("decimal(28,6)").cast("double").alias("jaccard"),
    )


def simhash_col(tokens: Column, bits: int = 32) -> Column:
    """SimHash fingerprint of a distinct-token array as a column
    expression (no shuffle): per bit, sum +1/-1 over token hashes; the
    fingerprint sets bits with positive sums."""
    th = F.transform(tokens, token_hash32)
    fp = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        fp = fp + F.when(vote > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0))
    return fp


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= ``max_hamming``.

    Pigeonhole blocking: split the fingerprint into ``max_hamming + 1``
    chunks; any pair within distance k agrees on >= 1 chunk -> equi-join
    on (chunk_idx, chunk_value), verify with bit_count(xor)."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    base = df.select(
        F.col(id_col).alias("id"),
        simhash_col(tokens_col(text_col), bits).alias("fp"),
    )
    chunks = base.select(
        "id",
        "fp",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("fp"), i * chunk_bits)
                        .bitwiseAND(F.lit((1 << chunk_bits) - 1))
                        .alias("cv"),
                    )
                    for i in range(n_chunks)
                ]
            )
        ).alias("c"),
    ).select("id", "fp", "c.ci", "c.cv")
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["ci", "cv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
