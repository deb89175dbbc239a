"""Bucketed-table co-located join: the 100 TB pattern for repeated
joins on the same key — pay the shuffle once at write time, then every
join on the bucket key is Exchange-free (SURVEY.md §4.3).

The test writes orders and lineitem bucketed by the join key into the
session warehouse, joins them, and asserts the physical plan contains
NO shuffle on either side of the join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_inreach_spark.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    for name, df, key in [("b_orders", o, "o_orderkey"), ("b_lineitem", li, "l_orderkey")]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield "b_orders", "b_lineitem"
    for name in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders, lineitem = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = (
            spark.table(orders)
            .join(
                spark.table(lineitem),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located: the join consumes bucketed scans directly — no
        # Exchange between the join and either parquet scan
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert joined.count() > 0
    finally:
        # conf.get returns None when the conf was never set, so a
        # conditional restore would LEAK -1 into the shared session
        # and flip later plan-shape tests to SortMergeJoin
        if prev is not None:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        else:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_has_no_exchange(spark, bucketed_tables):
    orders, _ = bucketed_tables
    agg = spark.table(orders).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # bucket layout satisfies the aggregation's distribution too
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert agg.count() > 0
