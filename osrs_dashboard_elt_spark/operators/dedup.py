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
- n-gram Jaccard: inverted-index self-join on shingles;
  ``max_doc_freq`` (ON by default) drops stop-shingles (the skew
  killer at scale) via a broadcast hot-list pre-filter.
- hot-bucket guards: every blocking join (LSH bands, SimHash chunks,
  shingle postings) can cap its bucket size — a degenerate bucket of
  m rows emits O(m^2) candidates, so one hot key (empty docs, a stop
  shingle, an adversarial corpus) otherwise dominates the whole job.
  Dropping a bucket trades recall for a hard bound; the guards are
  implemented as a broadcast anti-join against the (tiny) hot-key
  aggregate so no reducer ever materializes the hot bucket.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



def _drop_hot_keys(
    posts: DataFrame, key_cols: list[str], max_size: int
) -> DataFrame:
    """Remove all rows of keys occurring more than ``max_size`` times.

    The hot-key list is a full aggregate of ``posts`` but its OUTPUT is
    tiny (only keys above the cap), so it broadcasts; the anti-join
    then filters map-side.  This costs a second evaluation of the
    ``posts`` lineage — the price of never shuffling a hot bucket to a
    single reducer."""
    hot = (
        posts.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") > max_size)
        .select(*key_cols)
    )
    return posts.join(F.broadcast(hot), key_cols, "left_anti")

# Prime just above 2**32: (a*h + b) % P stays within int64 for
# 32-bit h and a,b < P — identical arithmetic in Spark and DuckDB.
MINHASH_P = 4294967311


def token_hash32(col: Column) -> Column:
    """Unsigned 32-bit token hash: first 8 hex chars of md5.

    DuckDB equivalent: ``('0x' || substr(md5(t), 1, 8))::BIGINT``.
    """
    return token_hash(col, 32)


def token_hash(col: Column, bits: int) -> Column:
    """Unsigned ``bits``-wide token hash (first bits/4 hex chars of
    md5; bits must be a multiple of 4, <= 60 to stay in int64).

    DuckDB: ``('0x' || substr(md5(t), 1, bits//4))::BIGINT``.
    """
    if bits % 4 or not 0 < bits <= 60:
        raise ValueError("bits must be a multiple of 4 in (0, 60]")
    return F.conv(F.substring(F.md5(col), 1, bits // 4), 16, 10).cast("long")


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
    column, as a single codegen-friendly expression (one
    ``regexp_extract_all`` of zero-width token-boundary matches — see
    ``with_shingles`` for the rationale and the measured 5x win over
    the higher-order-function form)."""
    c = F.col(text) if isinstance(text, str) else text
    norm = F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")
    pat = r"(?<=^| )(?=(" + " ".join([r"[^ ]+"] * n) + r"))"
    return F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1))


def with_shingles(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int | None = 3,
    out: str = "toks",
) -> DataFrame:
    """(id, distinct token/shingle array).

    ``n=None`` -> word tokens (split + filter, distinct, original
    order preserved — fingerprinting depends on order).

    n-word shingles are extracted with ONE ``regexp_extract_all`` over
    a whitespace-normalized copy of the text: a zero-width
    ``(?<=^| )(?=(tok tok .. tok))`` match at every token boundary
    captures the overlapping n-grams directly.  This stays entirely
    inside whole-stage codegen; the earlier higher-order-function form
    (``transform(sequence(...), slice+concat_ws)``) was evaluated
    interpreted per element and measured 5x slower at sf0.1 (3.6s ->
    0.7s for the exploded shingle stream), and crashed on <n-word
    documents (``sequence(1,0)`` -> [1,0] -> ``slice(_, 0, n)``).
    Result sets are identical (verified doc-by-doc at sf0.01).

    NOTE: rows with empty arrays are NOT filtered here — downstream
    ``explode`` drops empty arrays anyway; callers needing the filter
    should apply it after a shuffle boundary.
    """
    if n is None:
        words = F.filter(
            F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
        )
        staged = df.select(F.col(id_col).alias("id"), words.alias("__words"))
        return staged.select(
            "id", F.array_distinct(F.col("__words")).alias(out)
        )
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    pat = r"(?<=^| )(?=(" + " ".join([r"[^ ]+"] * n) + r"))"
    toks = F.array_distinct(F.regexp_extract_all(norm, F.lit(pat), 1))
    return df.select(F.col(id_col).alias("id"), toks.alias(out))


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
    reproducible).  Handles arbitrary asc/desc order columns; for
    all-ascending orders prefer ``dedup_keep_first_asc`` (hash
    aggregate with map-side combine instead of shuffle+sort)."""
    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_keep_first_asc(
    df: DataFrame, key_cols: list[str], order_cols: list[str | Column]
) -> DataFrame:
    """Keep the first row per key under ASCENDING ``order_cols`` as a
    single hash aggregate: ``min(struct(order..., payload...))`` is
    lexicographic, so the group minimum IS the first row.  Unlike the
    window form this never sorts and combines map-side — the shuffle
    carries one partial row per (partition, key) instead of every row.
    Output column order matches the input."""
    payload = [c for c in df.columns if c not in key_cols]
    ordered = [
        (F.col(c) if isinstance(c, str) else c).alias(f"__k{i}")
        for i, c in enumerate(order_cols)
    ]
    s = F.min(
        F.struct(*ordered, *[F.col(c).alias(f"__p_{c}") for c in payload])
    ).alias("__s")
    agged = df.groupBy(*key_cols).agg(s)
    return agged.select(
        *[
            F.col(f"__s.__p_{c}").alias(c) if c in payload else F.col(c)
            for c in df.columns
        ]
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


def minhash_band_posts(
    base: DataFrame,
    num_perm: int,
    bands: int,
    seed: int,
) -> DataFrame:
    """(id, bi, bk) band-posting table from a shingled frame
    (:func:`with_shingles` output).  The shared core of the batch
    self-join (:func:`minhash_lsh_pairs`) and the at-rest incremental
    index (:func:`write_minhash_index` / :func:`probe_minhash_index`).

    Signatures via explode + hash-aggregate, not per-row array
    lambdas: one md5 per (doc, token) posting, then num_perm
    fully-codegen'd MIN aggregates with map-side partial combine.
    (Higher-order-function lambdas run interpreted and re-evaluate
    their body per element — the aggregate shape stays inside
    whole-stage codegen and shuffles only (id, 16 longs).)
    explode_outer, not explode: InferFiltersFromGenerate synthesizes
    a size(..)>0 filter below the projection for inner explode,
    re-inlining the whole (quadratic) shingle expression into the
    Filter node.  The outer variant skips the rule; the cheap
    isNotNull on the GENERATED attribute restores inner semantics.
    The banding is ONE explode into (id, band_idx, band_key) — never
    one pass per band; token arrays never reach the posting table.
    """
    if bands <= 0 or num_perm % bands != 0:
        # guard here, not only in minhash_lsh_pairs: the at-rest index
        # writer/prober call this directly, and bands > num_perm makes
        # every band key EMPTY (all docs collide -> the probe join
        # degenerates into an all-pairs cross join) while a
        # non-dividing bands silently drops trailing signature
        # components (changed recall, no warning)
        raise ValueError(
            f"bands ({bands}) must evenly divide num_perm ({num_perm})"
        )
    rows = num_perm // bands
    tok_posts = (
        base.select("id", F.explode_outer("toks").alias("tok"))
        .filter(F.col("tok").isNotNull())
        .select("id", token_hash32(F.col("tok")).alias("h"))
    )
    sig = tok_posts.groupBy("id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"s{i}")
            for i, (a, b) in enumerate(minhash_params(num_perm, seed))
        ]
    )
    return sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("bi"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"s{b * rows + r}").cast("string")
                                for r in range(rows)
                            ],
                        ).alias("bk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("c"),
    ).select("id", "c.bi", "c.bk")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    seed: int = 42,
    verify_threshold: float | None = None,
    shingle_n: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash banding.

    Returns distinct (id_a < id_b) pairs sharing at least one LSH band.
    With ``verify_threshold`` the candidates are verified with exact
    token-set Jaccard and filtered.  ``shingle_n`` switches the token
    set from words to n-word shingles.

    ``max_bucket_size`` drops band buckets holding more than N docs
    before the self-join (candidate output per bucket is O(N^2); a
    bucket of exact-identical signatures — usually exact duplicates
    that belong in ``exact_dedup`` upstream — otherwise floods the
    join).  Dropping loses those buckets' recall; None = uncapped.
    """
    base = with_shingles(df, id_col, text_col, shingle_n)
    # bands/num_perm validated inside minhash_band_posts (shared with
    # the at-rest index entry points)
    posts = minhash_band_posts(base, num_perm, bands, seed)
    if max_bucket_size is not None:
        posts = _drop_hot_keys(posts, ["bi", "bk"], max_bucket_size)
    pairs = (
        posts.alias("a")
        .join(posts.alias("b"), ["bi", "bk"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if verify_threshold is None:
        return pairs
    # Exact-Jaccard verification only for surviving candidates: join
    # the (small) pair set back to the token arrays instead of
    # dragging the arrays through the LSH join.
    ta = base.select(F.col("id").alias("id_a"), F.col("toks").alias("toks_a"))
    tb = base.select(F.col("id").alias("id_b"), F.col("toks").alias("toks_b"))
    verified = pairs.join(ta, "id_a").join(tb, "id_b")
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    union = F.size("toks_a") + F.size("toks_b") - inter
    jac = inter.cast("double") / union.cast("double")
    # Filter on the RAW quotient (bit-identical across engines), then
    # decimal-cast-round for the reported score.
    return (
        verified.withColumn("__jac", jac)
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
    max_doc_freq: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via an inverted index,
    single-scan shape: each posting carries its document's shingle
    count, postings group by shingle into a sorted (id, n_sh) array,
    and the i<j pairs are generated from that array directly — one
    documents scan, two shuffles (by shingle, by pair), zero joins.
    (The textbook posting-list SELF-join tokenizes the corpus once per
    join side and needs two more joins to attach sizes.)

    ``max_doc_freq`` (default 1000) drops shingles occurring in more
    than N docs — the stop-shingle guard: one shingle shared by d docs
    would otherwise build a d(d-1)/2-struct pair array in a SINGLE
    reducer row (executor OOM at scale) while contributing only
    near-zero-Jaccard pairs.  Applied as a broadcast hot-shingle
    pre-filter BEFORE the groupBy, so the hot posting array is never
    materialized; costs one extra (cheap, aggregate-only) pass over
    the postings.

    SEMANTICS under the guard: dropped shingles leave the intersection
    count but STAY in the size denominators, so the reported score is
    a LOWER BOUND of the true Jaccard — a pair whose overlap includes
    hot shingles scores lower than its exact value (and a pair whose
    entire overlap is hot is missed).  With the default cap the bias
    is bounded by (hot shingles in the overlap)/union; corpora where
    near-dup overlap concentrates in ubiquitous shingles should raise
    the cap or disable the guard (``None`` -> exact Jaccard) and rely
    on the pair-side cap instead."""
    sh = with_shingles(df, id_col, text_col, n, out="sh")
    # explode_outer + isNotNull: see minhash_lsh_pairs — avoids the
    # InferFiltersFromGenerate re-inlining of the shingle expression
    posts = sh.select(
        "id", F.size("sh").alias("n_sh"), F.explode_outer("sh").alias("shingle")
    ).filter(F.col("shingle").isNotNull())
    if max_doc_freq is not None:
        posts = _drop_hot_keys(posts, ["shingle"], max_doc_freq)
    # shingle arrays are distinct per doc -> (shingle, id) unique, so
    # collect_list needs no dedup; array_sort orders structs by id
    # (first field), giving id_a < id_b for free in the i<j generation
    grouped = posts.groupBy("shingle").agg(
        F.array_sort(F.collect_list(F.struct("id", "n_sh"))).alias("ids")
    )
    # all (i, j>i) pairs of the posting array; slice is 1-based, i is
    # 0-based -> elements strictly after i start at position i+2.
    # "ids" is a real attribute, so the lambda reads it, not a
    # re-evaluated expression (see with_shingles PERF notes).
    pair_arr = F.flatten(
        F.transform(
            "ids",
            lambda x, i: F.transform(
                F.slice("ids", i + F.lit(2), F.size("ids")),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    ex = (
        grouped.select(F.explode_outer(pair_arr).alias("p"))
        .filter(F.col("p").isNotNull())
        .select(
            F.col("p.a.id").alias("id_a"),
            F.col("p.b.id").alias("id_b"),
            F.col("p.a.n_sh").alias("sh_a"),
            F.col("p.b.n_sh").alias("sh_b"),
        )
    )
    # sh_a/sh_b are functionally dependent on the ids; grouping on
    # them keeps the sizes without any join back
    common = ex.groupBy("id_a", "id_b", "sh_a", "sh_b").agg(
        F.count(F.lit(1)).alias("common")
    )
    jac = F.col("common").cast("double") / (
        F.col("sh_a") + F.col("sh_b") - F.col("common")
    ).cast("double")
    return (
        common.withColumn("__jac", jac)
        .filter(F.col("__jac") >= threshold)
        .select(
            "id_a",
            "id_b",
            F.col("__jac").cast("decimal(28,6)").cast("double").alias("jaccard"),
        )
    )


def simhash_from_hashes(th: Column, bits: int = 32) -> Column:
    """SimHash fingerprint from a pre-hashed token array.  ``th``
    should be a plain attribute — each of the ``bits`` vote aggregates
    walks the array once, so an inlined hash expression would be
    re-evaluated ``bits`` times."""
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


def simhash_col(tokens: Column, bits: int = 32) -> Column:
    """SimHash fingerprint of a distinct-token array as a column
    expression (no shuffle): per bit, sum +1/-1 over token hashes; the
    fingerprint sets bits with positive sums."""
    return simhash_from_hashes(F.transform(tokens, token_hash32), bits)


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    max_hamming: int = 3,
    drop_empty: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash hamming distance <= ``max_hamming``.

    Pigeonhole blocking: split the fingerprint into ``max_hamming + 1``
    chunks; any pair within distance k agrees on >= 1 chunk -> equi-join
    on (chunk_idx, chunk_value), verify with bit_count(xor).

    ``drop_empty`` (default True) routes zero-token docs OUT of the
    blocking join: every empty doc hashes to fp=0, so e empty docs
    form one degenerate bucket emitting e(e-1)/2 candidates per chunk.
    Empty docs are trivially exact duplicates of each other — that's
    ``exact_dedup``'s job, not a similarity join's.

    ``max_bucket_size`` additionally caps any (chunk, value) bucket
    (broadcast hot-list anti-join, recall trade documented at
    module level); None = uncapped.  NOTE: at billions of docs a
    32-bit fingerprint's 8-bit chunks only take 256 values — use
    bits=48 (the suite's setting) or bits=60 (the md5-hash ceiling:
    the token hash must cover the fingerprint width and stay inside
    a signed int64, so 60 is the maximum)."""
    base = simhash_fingerprints(
        df, id_col, text_col, bits, drop_empty=drop_empty
    ).localCheckpoint(eager=False)
    # ^ materialize the (tiny: id, fp) table once: the chunk self-join
    # and hot-key guard would otherwise re-run the explode+aggregate
    # lineage per reference
    return hamming_blocked_pairs(base, bits, max_hamming, max_bucket_size)


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int,
    drop_empty: bool = True,
    packed: bool = True,
) -> DataFrame:
    """(id, fp) SimHash fingerprints via explode + integer SUM
    aggregates — the same posting-table shape as the MinHash
    signatures, fully inside whole-stage codegen with map-side partial
    combine.  (The array-fold form ``simhash_from_hashes`` walks the
    token array once per bit in an INTERPRETED lambda — measured ~10s
    at sf0.1 vs sub-second for this shape.)  The vote is pure integer
    arithmetic — bit b set iff 2*count(bit set) > n_tokens, i.e.
    set-votes outnumber clear-votes — so it is order-independent and
    engine-exact.  Empty docs (explode_outer null) produce null sums
    -> no bits set -> fp = 0, matching the fold semantics.  The hash
    width MUST cover the fingerprint width: with a narrower hash the
    high fingerprint bits are never set, the chunk covering them
    becomes one universal bucket, and blocking degenerates to an
    all-pairs join.

    ``packed=True`` (default) counts THREE bits per aggregate in
    21-bit lanes of one long instead of one SUM per bit (48
    accumulators and 48 shift+mask expressions per token row at the
    suite's width): the 3-bit group ``(h >> 3g) & 7`` is spread to
    lane offsets 0/21/42 by a multiply-and-mask (``v * (1 + 2^20 +
    2^40)`` places bit j of v at position 21*j; the mask keeps
    exactly those three positions), and SUM accumulates the three
    per-bit counts carry-free — ceil(bits/3) aggregates with the
    IDENTICAL integer counts decoded from the lanes.  Exact while
    every doc has fewer than 2^21 tokens (the lane capacity: a lane
    count below 2^21 cannot carry into the next, and the top lane
    stays below 2^63); a doc at or past the bound fails LOUDLY via a
    raise_error guard on the token count rather than silently
    mis-voting.  ``packed=False`` keeps the one-SUM-per-bit reference
    form; bit-equivalence of the two is pinned by
    tests/test_dedup_guards.py::test_simhash_packed_lanes_match_per_bit_form."""
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(text_col).alias("toks")
    )
    if drop_empty:
        # post-projection filter on the staged attribute (pushing it
        # into the scan would re-inline the tokenization expression)
        toks = toks.filter(F.size("toks") > 0)
    posts = toks.select("id", F.explode_outer("toks").alias("tok")).select(
        "id", token_hash(F.col("tok"), bits).alias("h")
    )
    if not packed:
        agg = posts.groupBy("id").agg(
            F.count(F.col("h")).alias("__n"),
            *[
                F.sum(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))
                ).alias(f"__c{b}")
                for b in range(bits)
            ],
        )
        fp = F.lit(0).cast("long")
        for b in range(bits):
            fp = fp + F.when(
                F.lit(2) * F.col(f"__c{b}") > F.col("__n"),
                F.lit(2**b).cast("long"),
            ).otherwise(F.lit(0))
        return agg.select("id", fp.alias("fp"))
    spread = 1 + (1 << 20) + (1 << 40)
    lanes = 1 + (1 << 21) + (1 << 42)
    lane_mask = (1 << 21) - 1
    n_groups = (bits + 2) // 3
    agg = posts.groupBy("id").agg(
        F.count(F.col("h")).alias("__n"),
        *[
            F.sum(
                (
                    F.shiftright(F.col("h"), 3 * g).bitwiseAND(F.lit(7))
                    * F.lit(spread)
                ).bitwiseAND(F.lit(lanes))
            ).alias(f"__s{g}")
            for g in range(n_groups)
        ],
    )
    fp = F.lit(0).cast("long")
    for b in range(bits):
        g, lane = divmod(b, 3)
        c_b = F.shiftright(F.col(f"__s{g}"), 21 * lane).bitwiseAND(
            F.lit(lane_mask)
        )
        fp = fp + F.when(
            F.lit(2) * c_b > F.col("__n"), F.lit(2**b).cast("long")
        ).otherwise(F.lit(0))
    # loud guard: a token count at or past the lane capacity could
    # have carried between lanes — refuse rather than mis-vote (no
    # realistic doc holds 2M+ tokens; the guard states the bound, it
    # is not a branch the data ever takes)
    fp = F.when(
        F.col("__n") >= F.lit(1 << 21),
        F.raise_error(
            F.lit(
                "simhash fingerprint: document exceeds the 2^21-token "
                "packed-vote capacity; split the document or use "
                "packed=False"
            )
        ).cast("long"),
    ).otherwise(fp)
    return agg.select("id", fp.alias("fp"))


def hamming_blocked_pairs(
    base: DataFrame,
    bits: int,
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with fingerprint hamming distance
    <= ``max_hamming`` from an (id, fp) table — the pigeonhole-blocked
    self-join shared by SimHash text near-dup and the multimodal
    perceptual-hash near-dup (any fingerprint family with a hamming
    radius blocks identically).  LOSSLESS for the radius: a pair
    within distance k must agree on >= 1 of the k+1 chunks, so the
    equi-join candidates are a superset of the answer and the
    bit_count verify is exact.  ``fp`` must fit in a signed long with
    ``bits`` <= 62 (shiftright sign-extension would corrupt chunks).
    ``base`` should be cheap to re-reference (checkpoint upstream if
    its lineage is heavy)."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
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
    if max_bucket_size is not None:
        chunks = _drop_hot_keys(chunks, ["ci", "cv"], max_bucket_size)
    # Two map-side filters replace a dedup shuffle entirely:
    # - verify (bit_count) BEFORE deduplicating — cheap expression on
    #   the join output, dropping spurious candidates immediately;
    # - FIRST-MATCH-CHUNK emission (uncapped only): a pair sharing k
    #   chunks would surface k times, so keep it only where every
    #   EARLIER chunk differs (a bitwise check on the two fingerprints
    #   we already carry).  Each qualifying pair is emitted exactly
    #   once, which is what dropDuplicates produced — minus its shuffle
    #   of the multiplicity-duplicated candidate set.  With a bucket
    #   cap this rule is unsound (the first matching chunk's bucket may
    #   have been dropped, and the pair should still surface via a
    #   later surviving chunk), so the capped path keeps the dedup.
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    cand = (
        chunks.alias("a")
        .join(chunks.alias("b"), ["ci", "cv"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
            F.col("ci"),
        )
        .withColumn("hamming", ham)
        .filter(ham <= max_hamming)
    )
    if max_bucket_size is None:
        mask = (1 << chunk_bits) - 1

        def _chunk(col: str, j: int) -> Column:
            return F.shiftright(F.col(col), j * chunk_bits).bitwiseAND(F.lit(mask))

        first_match = F.lit(True)
        for j in range(n_chunks - 1):
            first_match = first_match & (
                (F.col("ci") <= j) | (_chunk("fp_a", j) != _chunk("fp_b", j))
            )
        cand = cand.filter(first_match)
    else:
        cand = cand.dropDuplicates(["id_a", "id_b"])
    return cand.select("id_a", "id_b", "hamming")


def duplicate_ngram_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    min_docs: int = 2,
    hash_first: bool = False,
) -> DataFrame:
    """(span, n_docs) for every n-token span occurring in >=
    ``min_docs`` DISTINCT documents — the fixed-width n-gram form of
    Lee et al.'s dedup-for-memorization substring detection.

    Two physical shapes, same result (equality pinned in
    tests/test_dedup_guards.py):

    - ``hash_first=False`` (default): generate -> per-doc distinct ->
      count, shuffling the span STRINGS.  One pass over the corpus;
      fastest when the cluster is CPU-bound (span generation is the
      dominant cost at small scale — measured 1.1 s vs 1.5 s at
      sf0.1 on local[32]).
    - ``hash_first=True``: the 100 TB shape.  The distinct+count runs
      on ``xxhash64(span)`` so both shuffles carry 8-byte ints
      (~6x fewer shuffle bytes than ~50-byte spans); only the hashes
      with ``n_docs >= min_docs`` are rehydrated to text by a second
      generation pass + an equi-join on the hash.  The matched set is
      usually small (AQE broadcasts it at runtime when it is), but it
      is NOT bounded — a heavily duplicated corpus can match a large
      fraction of all spans — so the join is left to the optimizer
      rather than force-broadcast, and degrades to a shuffle join of
      8-byte keys instead of a driver OOM.  Pays one extra corpus
      scan to keep strings out of the counting Exchanges; wins when
      shuffle I/O, not CPU, is the bottleneck.  (64-bit collisions merge two spans' counts with
      probability ~m^2/2^65 — negligible below trillions of distinct
      spans; use the default form if exactness under adversarial
      inputs matters more than shuffle bytes.)
    """
    ws = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != F.lit("")
    )

    def spans() -> DataFrame:
        return (
            df.select(F.col(id_col).alias("id"), ws.alias("ws"))
            .filter(F.size("ws") >= n)
            .select(
                "id",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - F.lit(n - 1)),
                        lambda i: F.array_join(F.slice("ws", i, n), " "),
                    )
                ).alias("span"),
            )
        )

    if not hash_first:
        return (
            spans()
            .distinct()
            .groupBy("span")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs)
        )
    per_doc = spans().select("id", F.xxhash64("span").alias("h")).distinct()
    counts = (
        per_doc.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )
    return (
        spans()
        .select(F.xxhash64("span").alias("h"), "span")
        .join(counts, "h")
        .dropDuplicates(["h"])
        .select("span", "n_docs")
    )
