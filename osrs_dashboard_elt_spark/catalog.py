"""SQL front door: register the warehouse as named views.

Reference users talk to their data in SQL (SQLite behind pandas —
``shared_utils.get_db_engine``, dashboard queries).  The switch-over
story needs the same front door: after ``register_tables`` every
table is a named view and ``spark.sql("SELECT ...")`` runs any ad-hoc
query through the SAME Catalyst planner and scan paths the operator
library uses — pushdown, broadcast, AQE included.  Nothing is
copied; a view over parquet is metadata only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

STANDARD_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = STANDARD_TABLES,
    prefix: str = "",
) -> list[str]:
    """Register each ``{sf_dir}/{name}.parquet`` as a temp view named
    ``{prefix}{name}``.  Missing files are skipped; the registered
    names are returned.  Uses the suite's reader (timestamp
    normalization included) so SQL and DataFrame queries see
    identical schemas."""
    from . import suite

    done = []
    for name in tables:
        if not os.path.exists(f"{sf_dir}/{name}.parquet"):
            continue
        view = f"{prefix}{name}"
        suite._t(spark, sf_dir, name).createOrReplaceTempView(view)
        done.append(view)
    return done


def register_outputs(
    spark: SparkSession, out_dir: str, prefix: str = "gold_"
) -> list[str]:
    """Register each parquet directory under a pipeline output root
    (e.g. the corpus splits or report tables) as ``{prefix}{name}``."""
    done = []
    if not os.path.isdir(out_dir):
        return done
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        try:
            df: DataFrame = spark.read.parquet(path)
        except Exception:
            continue
        view = f"{prefix}{name}"
        df.createOrReplaceTempView(view)
        done.append(view)
    return done
