"""Group-wise z-score outlier detection with exact-decimal moments.

Built-in ``stddev_samp`` is a streaming fold whose result depends on
partition/merge order at the last ulp — fine for analytics, wrong for
a cross-engine-reproducible pipeline gate.  This operator computes the
group moments from *exact* decimal sums (sum, sum of squares) so the
derived mean/variance doubles are bit-identical regardless of
partitioning, engine, or AQE decisions:

    var = (ssq - s^2 / n) / (n - 1)     on exact decimal s, ssq

The per-row z-score then flows from identical doubles through
identical IEEE arithmetic — the expression trees here are written to
match the SQL oracle shape operation-for-operation.  Shape at scale:
one partial-aggregated groupBy for the moments (tiny result),
broadcast back onto the fact rows — the facts are scanned twice but
never shuffled.

The default decimal width is (18,6): its square (36-ish precision,
scale 12) stays inside both Spark's and DuckDB's 38-digit decimal
cap; a (28,6) square would overflow DuckDB's multiply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_outliers(
    df: DataFrame,
    key: str | list[str],
    value_col: str,
    threshold: float = 2.5,
    decimal_type: str = "decimal(18,6)",
    z_col: str = "z",
) -> DataFrame:
    """Rows whose |z| exceeds ``threshold`` within their group, with
    the group mean/stddev and the z-score appended.

    Groups with fewer than 2 rows (undefined sample stddev) and
    zero-variance groups produce no outliers.
    """
    keys = [key] if isinstance(key, str) else list(key)
    dec = F.col(value_col).cast(decimal_type)
    moments = df.groupBy(*keys).agg(
        F.sum(dec).cast("double").alias("_s"),
        F.sum(dec * dec).cast("double").alias("_ssq"),
        F.count(F.lit(1)).alias("_n"),
    )
    # all double arithmetic below mirrors the oracle SQL shape exactly:
    # (ssq - s*s/n) / (n-1), evaluated left-to-right in IEEE doubles
    moments = (
        moments.filter(F.col("_n") >= 2)
        .withColumn("_mean", F.col("_s") / F.col("_n"))
        .withColumn(
            "_var",
            (F.col("_ssq") - F.col("_s") * F.col("_s") / F.col("_n"))
            / (F.col("_n") - 1),
        )
        .filter(F.col("_var") > 0)
        .select(*keys, "_mean", F.sqrt("_var").alias("_sd"))
    )
    return (
        df.join(F.broadcast(moments), keys)
        .withColumn(z_col, (F.col(value_col) - F.col("_mean")) / F.col("_sd"))
        .filter(F.abs(F.col(z_col)) > threshold)
        .withColumnRenamed("_mean", "group_mean")
        .withColumnRenamed("_sd", "group_sd")
    )
