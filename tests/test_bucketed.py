"""Bucketed-layout contract: a join between two tables bucketed on the
join key plans with ZERO exchanges (the pre-paid shuffle), produces the
same rows as the plain join, and the unbucketed twin really does pay
the two exchanges the layout removes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from timedf_spark.sources.bucketed import read_table, write_bucketed
from timedf_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        "o_orderkey",
        buckets=8,
    )
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _joined(spark, t1, t2):
    return (
        read_table(spark, t1)
        .join(read_table(spark, t2), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def test_bucketed_join_plans_zero_exchanges(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = _joined(spark, t1, t2)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    # join exchange-free on BOTH sides; the groupBy on a different key
    # is the only exchange left
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "SortMergeJoin" in plan


def test_unbucketed_twin_pays_the_exchanges(spark):
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = (
            orders.join(li, "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString().split(
            "== Initial Plan =="
        )[0]
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert plan.count("Exchange hashpartitioning") >= 3  # 2 join + 1 agg


def test_bucketed_join_rows_equal_plain_join(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    got = sorted(map(tuple, _joined(spark, t1, t2).collect()))
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
    )
    want = sorted(
        map(
            tuple,
            orders.join(li, "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect(),
        )
    )
    assert got == want
