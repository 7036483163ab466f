"""SQL front door: registered views answer ad-hoc SQL identically to
the DataFrame forms, through the same planner."""

from __future__ import annotations

from pyspark.sql import functions as F

from osrs_dashboard_elt_spark.catalog import register_outputs, register_tables

SF = "/root/testdata/sf0.001"


def test_register_and_query(spark):
    views = register_tables(spark, SF)
    assert {"lineitem", "orders", "events"} <= set(views)
    sql_rows = spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        GROUP BY o_orderpriority
        """
    ).collect()
    orders = spark.table("orders").filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    )
    df_rows = (
        orders.join(
            spark.table("lineitem"),
            orders.o_orderkey == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert sorted(map(tuple, sql_rows)) == sorted(map(tuple, df_rows))


def test_sql_sees_normalized_timestamps(spark):
    register_tables(spark, SF)
    # the events nanos column reads as a usable TIMESTAMP through SQL
    row = spark.sql("SELECT MIN(ts) AS lo FROM events").collect()[0]
    assert row.lo.year == 2024


def test_register_outputs(spark, tmp_path):
    spark.range(3).write.parquet(str(tmp_path / "mytable"))
    (tmp_path / "not_parquet").mkdir()
    views = register_outputs(spark, str(tmp_path))
    assert views == ["gold_mytable"]
    assert spark.sql("SELECT COUNT(*) AS n FROM gold_mytable").collect()[0].n == 3
