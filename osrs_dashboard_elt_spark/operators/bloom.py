"""Bloom-filter semi-join prefilter.

The 100 TB join reducer: when the probe side is huge and the build
side's KEY SET is too big to broadcast as a literal IN-list but its
BLOOM is kilobytes, broadcast the bloom and let the scan drop
non-matches before the shuffle.  Spark's own runtime-filter feature
(`spark.sql.optimizer.runtime.bloomFilter.enabled`) injects the same
shape automatically for some plans; this explicit form works on ANY
pair of frames, persists (a bloom is just an array of longs — save
it in the model registry for reuse across jobs), and composes with
the exact confirm join so results never change.

Construction is pure column algebra on xxhash64 — NATIVE and
vectorized, unlike the md5-string chain the sketch oracles use,
because nothing here needs cross-engine replay: the bloom is
correctness-transparent (the oracle is the plain semi-join), it only
needs to be deterministic within Spark, which xxhash64 is.  Measured
8.5 s -> 0.6 s over 600k keys on a 3-split scan vs the md5 form:

- k bit positions per key from TWO xxhash64 seeds
  (Kirsch-Mitzenmacher double hashing, ``pos_j = (h1 + j*h2) % m``);
- build: explode keys x k, map bit -> (word, mask), one ``bit_or``
  groupBy (map-side combined, at most m_bits/64 rows out);
- probe: the word array rides in as ONE literal/broadcast row; a
  key passes iff ALL k masked words are set — a scan-side predicate,
  no join, no shuffle;
- correctness: a bloom has NO false negatives, so
  ``prefilter -> exact semi-join`` equals the plain semi-join row
  for row (the suite oracle is the plain semi-join).

Sizing: FP rate ~ (1 - e^{-k*n/m})^k; the classic optimum is
``k = m/n * ln 2``.  At m = 2^20 bits (128 KiB broadcast) and
n = 100k keys, k=7 gives ~0.8% FPs — the confirm join then touches
1% of the probe side instead of 100%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# the build/probe seed pair: ONE definition — diverging call sites
# would compute unrelated positions and silently empty every result
_SEED1, _SEED2 = 42, 4243


def _hash_sql(key_expr: str, seed: int) -> str:
    """One 62-bit non-negative hash of the key as SQL text — build
    and probe share this exact formula.  xxhash64 is Spark-NATIVE
    (codegen): the bloom never crosses engines, so the md5-string
    discipline the sketch oracles need would be pure overhead here
    (measured 14x on the probe scan).  The key is CAST to STRING
    first — xxhash64 hashes INT and BIGINT differently, so without
    the normalization a dim table keyed int against a fact table
    keyed bigint would produce FALSE NEGATIVES (breaking the
    operator's core contract).  The UNSIGNED shift clears the sign
    bit (plain SHIFTRIGHT sign-extends a negative hash) so the
    position arithmetic below stays non-negative."""
    return (
        f"SHIFTRIGHTUNSIGNED(XXHASH64(CAST({key_expr} AS STRING),"
        f" {seed}), 2)"
    )


def _positions_from(h1: str, h2: str, k: int, m_bits: int) -> list[str]:
    """Kirsch-Mitzenmacher double hashing: ``pos_j = (h1 + j*h2) %
    m`` gives k independent-enough positions from TWO hashes — the
    hash is the per-row cost that matters, so k positions cost 2
    hashes, not k.  ``h2`` is forced odd so it cycles the whole
    table.  Max magnitude: h1 + (k-1)*h2 < 2^62 + 7*2^62 < 2^63 for
    k <= 8... with 62-bit inputs that bound needs the shift in
    ``_hash_sql``: h1 + 7*h2 <= 8 * 2^62 = 2^65 would overflow, so
    positions reduce each term: PMOD(PMOD(h1,m) + j*PMOD(h2,m), m)
    keeps every intermediate < 8*m << 2^63."""
    if k > 8:
        raise ValueError("k > 8 risks 64-bit overflow in h1 + j*h2")
    h2odd = f"(PMOD({h2}, {m_bits}) | 1L)"
    return [
        f"PMOD(PMOD({h1}, {m_bits}) + {j} * {h2odd}, {m_bits})"
        for j in range(k)
    ]


def auto_m_bits(n_keys: int, bits_per_key: int = 10) -> int:
    """Power-of-two sizing: >= bits_per_key per key (k=7 at 10
    bits/key gives ~1% FPs), min 2^10.  An undersized bloom
    SATURATES — every bit set, every probe row passes, and the
    prefilter silently degrades to a full scan (measured: 99.8%
    pass-through at 30k keys in 2^14 bits)."""
    m = 1 << 10
    while m < n_keys * bits_per_key:
        m <<= 1
    return m


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int | None = None, k: int = 7
) -> list[int]:
    """Build the filter over ``df[key_col]``: returns the word array
    (``m_bits/64`` longs, driver-side — kilobytes).  One explode +
    one map-side-combined ``bit_or`` aggregate; the exchange carries
    at most ``m_bits/64`` rows per upstream partition.
    ``m_bits=None`` sizes automatically from a count of the build
    side (one cheap aggregate on the SMALL side).  NULL keys are
    dropped — a plain semi-join ignores them, and a NULL hash
    position would otherwise crash the word assembly."""
    df = df.filter(F.col(key_col).isNotNull())
    if m_bits is None:
        m_bits = auto_m_bits(df.count())
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    h1 = _hash_sql(key_col, _SEED1)
    h2 = _hash_sql(key_col, _SEED2)
    pos = F.explode(
        F.expr(
            "ARRAY(" + ", ".join(_positions_from("__h1", "__h2", k, m_bits)) + ")"
        )
    ).alias("__pos")
    hashed = df.select(
        F.expr(h1).alias("__h1"), F.expr(h2).alias("__h2")
    )
    words = (
        hashed.select(pos)
        .select(
            F.expr("CAST(__pos DIV 64 AS INT)").alias("__word"),
            F.expr("SHIFTLEFT(1L, CAST(__pos % 64 AS INT))").alias("__mask"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
        .collect()
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r["__word"]] = r["__bits"]
    return out


def bloom_prefilter(
    df: DataFrame, key_col: str, words: list[int], k: int
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the built filter.  A key
    passes iff every hashed bit is set.  No false negatives, tunable
    false positives.

    Physical shape (four forms measured over 600k rows):

    - ADOPTED: the words ride as ONE ``F.lit(bytes)`` Column object
      (little-endian packed; one byte extracted per position) shared
      by the k membership terms — no SQL parsing, the literal never
      enters a row, per-row cost is k byte lookups (1.2 s);
    - NOT a CreateArray-of-literals projected column: rebuilds the
      m/64-element array per row (7 s);
    - NOT a broadcast single-row frame: the join writes the whole
      word array into every output UnsafeRow (12 s);
    - NOT an ``X'...'`` hex literal in SQL text: k copies of the
      blob re-PARSE on every call (26 s in the scale probe).

    The two hashes and the k positions are WRITTEN as separate
    projections, but deterministic-filter pushdown inlines the alias
    definitions into every conjunct anyway, so the executed plan
    re-evaluates the hash per reference (~4k textual occurrences per
    row — PLANS.md shows it); xxhash64 is cheap enough that this and
    the input split count stopped mattering (the md5 ancestor paid
    5.5 s on a 3-split scan for the same work xxhash64 does in
    ~0.3 s).  NULL keys are dropped — xxhash64(NULL) is a non-null
    constant, so without the filter every NULL-key row would share
    one position set and pass or fail together (the md5 form
    propagated NULL and dropped them implicitly)."""
    m_bits = len(words) * 64
    blob = b"".join(
        int(w % (1 << 64)).to_bytes(8, "little") for w in words
    )
    lit = F.lit(blob)
    pcols = [f"__bp{j}" for j in range(k)]
    hashed = df.filter(F.col(key_col).isNotNull()).select(
        "*",
        F.expr(_hash_sql(key_col, _SEED1)).alias("__h1"),
        F.expr(_hash_sql(key_col, _SEED2)).alias("__h2"),
    )
    proj = hashed.select(
        "*",
        *[
            F.expr(p).alias(c)
            for p, c in zip(
                _positions_from("__h1", "__h2", k, m_bits), pcols
            )
        ],
    )
    cond = F.lit(True)
    for p in pcols:
        byte = F.substring(
            lit, (F.col(p) / F.lit(8)).cast("int") + 1, F.lit(1)
        )
        val = F.conv(F.hex(byte), 16, 10).cast("int")
        mask = F.expr(f"SHIFTLEFT(1, CAST({p} % 8 AS INT))")
        cond = cond & (val.bitwiseAND(mask) != 0)
    return proj.filter(cond).drop("__h1", "__h2", *pcols)


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int | None = None,
    k: int = 7,
    words: list[int] | None = None,
) -> DataFrame:
    """``big`` semi-joined to ``small`` on ``key``, bloom-prefiltered:
    the scan drops ~(1-FP) of the non-matching probe rows before the
    exact semi-join confirms the survivors — identical output to the
    plain semi-join, a fraction of the shuffle.  Pass prebuilt
    ``words`` (a memoized or registry-loaded filter) to skip the
    build aggregates; the composition stays in ONE place either
    way."""
    if words is None:
        words = bloom_build(small, key, m_bits=m_bits, k=k)
    pre = bloom_prefilter(big, key, words, k)
    # no .distinct() on the build side: left_semi already
    # deduplicates, and the distinct costs an extra Exchange + two
    # HashAggregates for an identical result
    return pre.join(small.select(key), key, "left_semi")
