"""Partitioned-write layout: the other standard warehouse lever beside
bucketing (tests/test_bucketed.py). A table written partitionBy(key)
must answer an equality/range predicate on the key by PRUNING whole
partition directories at plan time — the scan reads only matching
partitions, which at 100 TB is the difference between touching one
month and touching ten years."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from timedf_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    out = str(tmp_path / "orders_by_year")
    orders.write.mode("overwrite").partitionBy("order_year").parquet(out)
    years = sorted(
        int(d.split("=")[1])
        for d in os.listdir(out)
        if d.startswith("order_year=")
    )
    assert len(years) >= 3  # the pruning claim needs >1 partition

    df = spark.read.parquet(out).filter(F.col("order_year") == years[0])
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # the partition predicate must appear as a PartitionFilters entry on
    # the scan, not a post-scan Filter
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "order_year" in pf, plan

    # and the pruned scan must actually READ fewer files than the full
    # table: input_file_name() observes execution, unlike inputFiles()
    # which lists the relation pre-pruning
    full_files = (
        spark.read.parquet(out).select(F.input_file_name()).distinct().count()
    )
    pruned_files = df.select(F.input_file_name()).distinct().count()
    assert 0 < pruned_files < full_files

    # semantics unchanged by the layout
    assert df.count() == orders.filter(F.col("order_year") == years[0]).count()
