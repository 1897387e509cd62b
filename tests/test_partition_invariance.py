"""Partition-invariance: the distributed-correctness property.

A result that changes when the SAME data arrives in different
partitionings is a cluster bug waiting for production data placement
to expose it. Every operator here is run twice on adversarially
different partitionings (1 vs 13 — skewed, coprime with nothing) and
must return identical rows. These complement the DuckDB oracle, which
runs Spark's plan only once per layout.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timedf_spark.sources import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _invariant(build, spark, sf_dir, table: str):
    """build(frame) must give identical results for 1 vs 13 partitions."""
    base = load_table(spark, sf_dir, table)
    a = _rows(build(base.repartition(1)))
    b = _rows(build(base.repartition(13)))
    assert a == b


def test_skyline_partition_invariant(spark, sf_dir):
    from timedf_spark.operators.skyline import skyline_2d

    _invariant(
        lambda df: skyline_2d(df, "p_retailprice", "p_size"),
        spark, sf_dir, "part",
    )


def test_linkpred_partition_invariant(spark, sf_dir):
    from timedf_spark.operators.linkpred import resource_allocation_pairs

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_custkey", "l_suppkey"
    )
    a = _rows(resource_allocation_pairs(edges.repartition(1), "o_custkey", "l_suppkey"))
    b = _rows(resource_allocation_pairs(edges.repartition(13), "o_custkey", "l_suppkey"))
    assert a == b


def test_label_propagation_partition_invariant(spark, sf_dir):
    from timedf_spark.operators.labelprop import label_propagation

    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.col("o_custkey").alias("a"), F.col("l_suppkey").alias("b"))
        .limit(2000)
    )
    a = _rows(label_propagation(supp, pairs.repartition(1), iters=3))
    b = _rows(label_propagation(supp, pairs.repartition(13), iters=3))
    assert a == b


def test_bfs_partition_invariant(spark, sf_dir):
    from timedf_spark.operators.bfs import multi_source_bfs

    supp = load_table(spark, sf_dir, "supplier")
    nodes = supp.select(F.col("s_suppkey").alias("node"))
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    edges = li.select(
        F.col("l_suppkey").alias("src"), (F.col("l_partkey") % 100).alias("dst")
    )
    seeds = supp.where(F.col("s_nationkey") == 3).select(
        F.col("s_suppkey").alias("node")
    )
    a = _rows(multi_source_bfs(nodes, edges.repartition(1), seeds, max_hops=2))
    b = _rows(multi_source_bfs(nodes, edges.repartition(13), seeds, max_hops=2))
    assert a == b


def test_new_queries_partition_agnostic_via_shuffle_partitions(spark, sf_dir):
    """Whole queries re-run under a different shuffle-partition count:
    windows, aggregates and truncating divisions must not see layout."""
    from timedf_spark.queries.round11 import cusum_changepoint, ewma_user_trend
    from timedf_spark.queries.round15 import nation_spend_gini

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("7", "29"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            results[n] = [
                _rows(q(spark, sf_dir))
                for q in (ewma_user_trend, cusum_changepoint, nation_spend_gini)
            ]
        assert results["7"] == results["29"]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
