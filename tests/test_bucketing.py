import pytest
from pyspark.sql import functions as F
from featurebase_spark.operators.bucketing import bucketed_join, join_has_no_shuffle, write_bucketed

def test_bucketed_join_no_exchange(spark, tables):
    orders = tables["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = tables["lineitem"].select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "fbb_orders", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    write_bucketed(lineitem, "fbb_lineitem", ["o_orderkey"], 8, sort_by=["o_orderkey"])
    # force SortMergeJoin so the test proves the bucket-aligned scan path
    # (a broadcast would trivially avoid the shuffle for this small dim)
    j = spark.table("fbb_orders").hint("merge").join(
        spark.table("fbb_lineitem"), ["o_orderkey"]
    )
    assert join_has_no_shuffle(j), "bucketed join must not shuffle either side"
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in plan and "SortMergeJoin" in plan
    j = bucketed_join(spark, "fbb_orders", "fbb_lineitem", ["o_orderkey"])
    got = j.count()
    exp = orders.join(lineitem, "o_orderkey").count()
    assert got == exp
    spark.sql("DROP TABLE IF EXISTS fbb_orders")
    spark.sql("DROP TABLE IF EXISTS fbb_lineitem")
