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


def test_null_split_left_join_matches_plain_left_join(spark, sf_dir):
    """null_split_left_join is a pure plan rewrite: row-identical to the
    plain left join (null keys null-extended, unmatched non-null keys
    null-extended, matched keys enriched), while the join branch's scan
    filters nulls BEFORE the exchange."""
    from timedf_spark.operators.skew import null_split_left_join

    ev = load_table(spark, sf_dir, "events").select(
        # error events unattributed (NULL) + an out-of-range stratum that
        # is non-null but matches no customer
        F.when(F.col("event_type") == "error", F.lit(None))
        .when(F.col("event_type") == "view", F.col("user_id") + 1_000_000)
        .otherwise(F.col("user_id"))
        .alias("cust_id"),
        "event_id",
        "value",
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("cust_id"), "c_mktsegment"
    )
    split = null_split_left_join(ev, cust, "cust_id")
    plain = ev.join(cust, "cust_id", "left")
    assert sorted(split.columns) == sorted(plain.columns)
    cols = sorted(split.columns)
    from collections import Counter

    a = Counter(tuple(r) for r in split.select(*cols).collect())
    b = Counter(tuple(r) for r in plain.select(*cols).collect())
    assert a == b
    # every stratum is present: matched, non-null-unmatched, null
    rows = split.collect()
    assert any(r["cust_id"] is None and r["c_mktsegment"] is None for r in rows)
    assert any(r["cust_id"] is not None and r["c_mktsegment"] is None for r in rows)
    assert any(r["c_mktsegment"] is not None for r in rows)

    # the join subtree must see only non-null keys (the whole point):
    # the split plan carries an isnotnull filter on the joined branch,
    # which Catalyst can never add to a plain outer join (discriminative:
    # the plain plan has none)
    # (projection collapse inlines the cust_id alias into its CASE expr)
    split_plan = split._jdf.queryExecution().executedPlan().toString()
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(CASE WHEN" in split_plan, split_plan  # join branch
    assert "isnull(CASE WHEN" in split_plan, split_plan  # null branch
    assert "isnotnull(CASE WHEN" not in plain_plan, plain_plan


def test_zorder_layout_prunes_both_columns(spark, tmp_path):
    """Z-order vs linear sort, measured from real parquet footer min/max
    (the stats any engine's scan pruning uses): a range predicate on the
    SECOND column overlaps a small fraction of z-ordered files but every
    linearly-sorted file; the first column stays prunable under z-order
    too (looser than its own linear sort — the 2-D trade). Values survive
    the rewrite exactly. Measured at sf0.01: suppkey 5/16 vs 16/16,
    partkey 6/16 vs 1/16."""
    import glob

    import pyarrow.parquet as pq

    from timedf_spark.sources.zorder import write_zordered

    li = load_table(spark, "/root/testdata/sf0.01", "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], n_files=16)
    (
        li.repartitionByRange(16, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    def file_ranges(path, col):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mn = mx = None
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                for i in range(g.num_columns):
                    cc = g.column(i)
                    if cc.path_in_schema == col and cc.statistics:
                        s = cc.statistics
                        mn = s.min if mn is None else min(mn, s.min)
                        mx = s.max if mx is None else max(mx, s.max)
            out.append((mn, mx))
        return out

    def overlapping(path, col, lo, hi):
        rs = file_ranges(path, col)
        assert len(rs) == 16, (path, len(rs))
        return sum(1 for mn, mx in rs if not (mx < lo or mn > hi))

    # second column: z-order prunes, linear can't
    assert overlapping(zpath, "l_suppkey", 50, 55) <= 8
    assert overlapping(lpath, "l_suppkey", 50, 55) == 16
    # first column: still prunable under z-order
    assert overlapping(zpath, "l_partkey", 1000, 1100) <= 10

    # layout-only: the row multiset is untouched
    a = spark.read.parquet(zpath).groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q"),
        F.sum(F.col("l_orderkey") * F.col("l_suppkey")).alias("chk"),
    ).collect()
    b = li.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l_quantity").alias("q"),
        F.sum(F.col("l_orderkey") * F.col("l_suppkey")).alias("chk"),
    ).collect()
    assert a == b


def test_runtime_bloom_filter_semi_join_reduction(spark, sf_dir):
    """The 100 TB fact⋈filtered-dim shape: Spark's runtime bloom filter
    (on in session.py via spark.sql.optimizer.runtime.bloomFilter.enabled)
    builds a filter from the selective side and prunes the fact scan's
    shuffle input. Local testdata never crosses the 10 GiB application-
    side threshold, so this test lowers it to prove the reduction
    engages on our join shape — and that results are unchanged."""
    from timedf_spark.sources import load_table

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }

    def run():
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        rows = {(r["o_orderpriority"], r["n"]) for r in j.collect()}
        return rows, j._jdf.queryExecution().executedPlan().toString()

    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain_rows, plain_plan = run()
        assert "bloom_filter_agg" not in plain_plan  # above threshold: off
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        bloom_rows, bloom_plan = run()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    assert "bloom_filter_agg" in bloom_plan, bloom_plan
    assert "might_contain" in bloom_plan, bloom_plan
    assert bloom_rows == plain_rows and bloom_rows
