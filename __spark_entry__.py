"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``osrs_dashboard_elt_spark`` package; this
module only adapts it to the driver contract.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from osrs_dashboard_elt_spark import suite

SMOKE_SF_DIR = "/root/testdata/sf0.001"
# The two ANN oracles embed the query vector read from this dir; the
# env override lets scripts/verify_local.py probe other scale factors
# with a matching oracle.  The driver sets no env -> sf0.01 default.
ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the single-pass multi-period
    leaderboard (conditional aggregation) over the events table."""
    return suite.flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return suite.build_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents.  The LSH-ANN oracle embeds the query vector
    read from the oracle-scale parquet via DuckDB; on any failure that
    entry is omitted (rows-only check)."""
    return suite.build_oracles(ORACLE_SF_DIR)
