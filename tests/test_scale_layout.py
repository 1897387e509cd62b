"""Scale-layout operators: bucketed co-located joins (shuffle moved to
write time) and salted joins (explicit skew mitigation). These are the
100 TB layout decisions the query layer builds on; the assertions check
the *plans* (no exchange on bucketed joins; salt spreading) as well as
result equivalence.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timedf_spark.operators.skew import salt_col, salted_join
from timedf_spark.sources import load_table
from timedf_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # warehouse dir is a static conf; tables land in the session default
    # and are dropped (incl. data) on teardown
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", 8, sort_col="o_orderkey")
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", 8, sort_col="o_orderkey")
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b PURGE")
    spark.sql("DROP TABLE IF EXISTS lineitem_b PURGE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    """Same-bucketed tables joined on the bucket key: the executed plan
    must contain ZERO Exchange nodes — the write-time bucketing satisfies
    the join's distribution requirement."""
    left, right = bucketed_tables
    # disable auto-broadcast so the test exercises the co-located path,
    # not a broadcast fallback
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, "o_orderkey")
        joined.collect()
        plan = (
            joined._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "o_orderkey").count()
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    want = lineitem.join(
        orders, lineitem.l_orderkey == orders.o_orderkey
    ).count()
    assert got == want


def test_bucketed_groupby_on_bucket_key_has_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also skips its exchange."""
    _, right = bucketed_tables
    agg = spark.table(right).groupBy("o_orderkey").agg(F.count(F.lit(1)).alias("n"))
    agg.collect()
    plan = (
        agg._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert "Exchange" not in plan, plan


def test_salted_join_matches_plain_join(spark, sf_dir):
    """Salting must be a pure execution-strategy change: identical rows to
    the un-salted join, with the hot key spread over many salts."""
    orders = load_table(spark, sf_dir, "orders")
    # manufacture skew: half the fact rows collapse onto one hot key
    hot = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).otherwise(F.col("o_custkey")),
    )
    dim = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    plain = hot.join(dim, "o_custkey")
    salted = salted_join(hot, dim, "o_custkey", n_salts=8)
    assert sorted(salted.columns) == sorted(plain.columns)
    assert salted.count() == plain.count()
    got = {
        (r["o_custkey"], r["n"])
        for r in salted.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want = {
        (r["o_custkey"], r["n"])
        for r in plain.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


def test_salt_spreads_hot_key(spark, sf_dir):
    """The hot key's rows must actually occupy many distinct salt values
    (≥ half of n_salts on this data volume)."""
    orders = load_table(spark, sf_dir, "orders")
    hot = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).otherwise(F.col("o_custkey")),
    )
    n_salts = 8
    salts = (
        hot.withColumn("_salt", salt_col(hot, n_salts))
        .filter(F.col("o_custkey") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert salts >= n_salts // 2, salts


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    """Writing a fact table partitioned by a coarse time key (year) makes
    year-filtered scans read only matching directories: the filter must
    appear as a PartitionFilter (metadata-level pruning, zero data read
    from other years), not just a row-level PushedFilter."""
    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_by_year")
    orders.withColumn("o_year", F.year("o_orderdate")).write.partitionBy(
        "o_year"
    ).parquet(path)

    filtered = spark.read.parquet(path).filter(F.col("o_year") == 1995)
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    scan = plan[plan.index("Scan parquet") :]
    pf = scan.split("PartitionFilters:")[1].splitlines()[0]
    assert "o_year" in pf, pf
    # and the pruned read returns exactly the year's rows
    want = orders.filter(F.year("o_orderdate") == 1995).count()
    assert filtered.count() == want
