"""Lakehouse maintenance queries: CDC merge (MERGE INTO shape).

The change batch is derived deterministically from the orders table
itself (key mod 7 selects deletes / updates / inserts), so the oracle can
reconstruct the identical batch and the merged snapshot is exactly
comparable. The update payload multiplies o_totalprice by 1.1 — one IEEE
multiplication on identical inputs, bit-equal across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.merge import merge_changes
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_PAYLOAD = ["o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
_INSERT_SHIFT = 10_000_000


def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    deletes = orders.filter("o_orderkey % 7 = 0").select(
        "o_orderkey", *_PAYLOAD, F.lit("D").alias("op")
    )
    updates = (
        orders.filter("o_orderkey % 7 = 1")
        .withColumn("o_totalprice", F.expr("o_totalprice * 1.1"))
        .select("o_orderkey", *_PAYLOAD, F.lit("U").alias("op"))
    )
    inserts = (
        orders.filter("o_orderkey % 7 = 2")
        .withColumn("o_orderkey", F.expr(f"o_orderkey + {_INSERT_SHIFT}"))
        .select("o_orderkey", *_PAYLOAD, F.lit("I").alias("op"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return merge_changes(orders, changes, "o_orderkey")


CDC_MERGE_ORACLE = f"""
WITH u AS (
  SELECT o_orderkey, o_totalprice * 1.1 AS new_price
  FROM orders WHERE o_orderkey % 7 = 1
),
kept AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_orderstatus,
         coalesce(u.new_price, o.o_totalprice) AS o_totalprice,
         o.o_orderdate, o.o_orderpriority
  FROM orders o LEFT JOIN u ON o.o_orderkey = u.o_orderkey
  WHERE o.o_orderkey % 7 <> 0
),
ins AS (
  SELECT o_orderkey + {_INSERT_SHIFT} AS o_orderkey, o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 2
)
SELECT * FROM kept UNION ALL SELECT * FROM ins
"""


SUITE = {
    "cdc_merge_orders": QuerySpec(
        "cdc_merge_orders",
        cdc_merge_orders,
        CDC_MERGE_ORACLE,
        "CDC merge (MERGE INTO shape): one key join + union, snapshot never shuffles for broadcast batches",
    ),
}
