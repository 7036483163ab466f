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

Construction is pure column algebra on md5 (the sketches.py
discipline — deterministic in any engine):

- ``k`` bit positions per key: ``md5(j ':' key)`` -> 60-bit int ->
  ``% m_bits`` — independent-enough hashes, reproducible everywhere;
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

_HASH_HEX = 15  # 60-bit ints, same as the HLL/CMS hash discipline


def _positions(value: Column, k: int, m_bits: int) -> list[Column]:
    """k deterministic bit positions for a key."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{j}:"), value.cast("string"))),
                1,
                _HASH_HEX,
            ),
            16,
            10,
        ).cast("long")
        % m_bits
        for j in range(k)
    ]


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 1 << 16, k: int = 7
) -> list[int]:
    """Build the filter over ``df[key_col]``: returns the word array
    (``m_bits/64`` longs, driver-side — kilobytes).  One explode +
    one map-side-combined ``bit_or`` aggregate; the exchange carries
    at most ``m_bits/64`` rows per upstream partition."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(
        F.array(*_positions(F.col(key_col), k, m_bits))
    ).alias("__pos")
    words = (
        df.select(pos)
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


def _pos_sql(key_expr: str, j: int, m_bits: int) -> str:
    """SQL text of hash ``j``'s bit position — the exact formula
    ``_positions`` builds as Columns, so build and probe agree."""
    return (
        f"(CAST(CONV(SUBSTRING(MD5(CONCAT('{j}:', "
        f"CAST({key_expr} AS STRING))), 1, {_HASH_HEX}), 16, 10) "
        f"AS BIGINT) % {m_bits})"
    )


def bloom_prefilter(
    df: DataFrame, key_col: str, words: list[int], k: int
) -> DataFrame:
    """Rows of ``df`` whose key MIGHT be in the built filter.  The
    word array rides as ONE projected literal column (kilobytes — the
    broadcast analog; projected once so the k membership terms share
    it instead of inlining it k times); a key passes iff every hashed
    bit is set.  Scan-side predicate — no join, no shuffle.  No false
    negatives, tunable false positives."""
    m_bits = len(words) * 64
    arr = "ARRAY(" + ", ".join(f"{w}L" for w in words) + ")"
    terms = []
    for j in range(k):
        pos = _pos_sql(key_col, j, m_bits)
        terms.append(
            f"(element_at(__bw, CAST({pos} DIV 64 AS INT) + 1)"
            f" & SHIFTLEFT(1L, CAST({pos} % 64 AS INT))) != 0"
        )
    return (
        df.withColumn("__bw", F.expr(arr))
        .filter(F.expr(" AND ".join(terms)))
        .drop("__bw")
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 16,
    k: int = 7,
) -> DataFrame:
    """``big`` semi-joined to ``small`` on ``key``, bloom-prefiltered:
    the scan drops ~(1-FP) of the non-matching probe rows before the
    exact semi-join confirms the survivors — identical output to the
    plain semi-join, a fraction of the shuffle."""
    words = bloom_build(small, key, m_bits=m_bits, k=k)
    pre = bloom_prefilter(big, key, words, k)
    return pre.join(small.select(key).distinct(), key, "left_semi")
