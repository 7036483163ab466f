"""Z-order (Morton) clustering for multi-dimensional data skipping.

A table sorted on one column skips row groups/files only for
predicates on THAT column.  Interleaving the bits of several
bucketized columns into one Morton key and range-sorting the write on
it clusters the data so that every participating column's min/max
file statistics stay tight — a box predicate on ANY subset of the
columns prunes most files (the Delta/Iceberg ``OPTIMIZE ZORDER``
technique, re-expressed as plain Spark expressions + a range-
partitioned write; no table format required).

All of it is codegen arithmetic: bucketize each column to ``bits``
levels by a linear min-max scale (ranges from one tiny agg or caller
stats), interleave with shift/or terms, then
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` so each
output file owns a contiguous z-range.  Cost at 100 TB: exactly one
range shuffle of the table — the same price as any total sort, paid
once at write time.

Evidence in ``tests/test_zorder.py``: for a query box selective in a
NON-leading dimension, the z-ordered layout leaves strictly fewer
candidate files (by parquet footer min/max) than a lexicographically
sorted one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[str],
    ranges: dict[str, tuple[float, float]],
    bits: int = 8,
) -> Column:
    """Morton key column: each column scaled to ``[0, 2^bits)`` by its
    (min, max) range, bits interleaved round-robin (column 0 owns the
    most significant position of each round).  ``len(cols) * bits``
    must fit in a signed 64-bit key."""
    if len(cols) * bits > 62:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a 63-bit key")
    n = len(cols)
    levels = (1 << bits) - 1
    bucketed: list[Column] = []
    for c in cols:
        lo, hi = ranges[c]
        if lo is None or hi is None:
            # all-NULL column (column_ranges returns None bounds):
            # nothing to cluster on — constant bucket.
            bucketed.append(F.lit(0).cast("long"))
            continue
        span = float(hi) - float(lo)
        if span <= 0:
            bucketed.append(F.lit(0).cast("long"))
            continue
        scaled = (F.col(c).cast("double") - float(lo)) / span * levels
        b = F.least(
            F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(levels)
        )
        # NULL values get bucket 0 (the nulls-first range) instead of
        # nulling the whole interleaved key via bitwiseOR(NULL) —
        # which would collapse EVERY null-bearing row into one
        # partition regardless of its other columns' values.
        bucketed.append(F.coalesce(b, F.lit(0).cast("long")))
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(bucketed):
            # bit i of column j lands at interleaved position
            # i*n + (n-1-j): higher i = more significant round
            pos = i * n + (n - 1 - j)
            z = z.bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), pos))
    return z


def column_ranges(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """(min, max) per column in ONE aggregate scan."""
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")).alias(f"__lo_{c}"),
                 F.max(F.col(c).cast("double")).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    return {c: (row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols}


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
    ranges: dict[str, tuple[float, float]] | None = None,
    stats_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    bloom_bits: int = 1 << 20,
) -> None:
    """Write ``df`` clustered on the Morton key of ``cols`` into
    ``n_files`` contiguous z-range files (key column dropped from the
    output — it is derivable).  ``stats_cols`` additionally records a
    per-file min/max manifest (``sources/stats_manifest.py``) so
    selective readers prune files at PLANNING time — the natural
    companion: z-ordering is what makes those per-file ranges tight."""
    if ranges is None:
        ranges = column_ranges(df, cols)
    keyed = df.withColumn("__z", zorder_key(cols, ranges, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
    if stats_cols:
        from ..sources.stats_manifest import write_stats_manifest

        # bloom_cols serve point lookups on keys NOT in the z-order
        # (uniformly spread across files, so min/max prune nothing)
        write_stats_manifest(
            df.sparkSession, path, stats_cols,
            bloom_cols=bloom_cols, bloom_bits=bloom_bits,
        )
