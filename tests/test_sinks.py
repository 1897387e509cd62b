"""Partitioned parquet sink (sources/sinks.py) — the engine's durable
result sink (reference persists results to SQL, report/benchmark_db.py;
a Spark engine's bulk sink is prunable directory-partitioned parquet).

Three properties matter at 100 TB:
1. small-files: repartition-before-write co-locates each partition value
   into one shuffle partition → ~one file per directory, not one file per
   (write-task × partition-value).
2. pruning: a predicate on the partition column is a PartitionFilter
   (directory-level, zero data read elsewhere).
3. fidelity: values and the partition column survive the round trip.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from timedf_spark.sources.readers import load_table
from timedf_spark.sources.sinks import read_partitioned, write_partitioned


def test_sink_one_file_per_partition_dir(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = str(tmp_path / "docs_by_lang")
    write_partitioned(docs, path, ["lang"])
    dirs = [d for d in glob.glob(os.path.join(path, "lang=*")) if os.path.isdir(d)]
    assert dirs, "no partition directories written"
    for d in dirs:
        files = glob.glob(os.path.join(d, "*.parquet"))
        # naive write: one file per (task, value) — 32 tasks would leave
        # up to 32 files here; repartition(lang) leaves exactly one.
        assert len(files) == 1, (d, len(files))


def test_sink_round_trip_and_pruning(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    path = str(tmp_path / "docs_rt")
    write_partitioned(docs, path, ["lang"])

    back = read_partitioned(spark, path)
    assert back.count() == docs.count()
    # partition column survives with its values (parquet dir-encoding)
    langs = {r["lang"] for r in back.select("lang").distinct().collect()}
    assert langs == {r["lang"] for r in docs.select("lang").distinct().collect()}

    one_lang = sorted(langs)[0]
    filtered = back.filter(F.col("lang") == one_lang)
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    scan = plan[plan.index("Scan parquet") :]
    pf = scan.split("PartitionFilters:")[1].splitlines()[0]
    assert "lang" in pf, pf
    assert filtered.count() == docs.filter(F.col("lang") == one_lang).count()


def test_sink_max_records_per_file_splits_hot_partition(spark, tmp_path):
    df = spark.range(10_000).withColumn("part", F.lit("hot"))
    path = str(tmp_path / "hot")
    write_partitioned(df, path, ["part"], max_records_per_file=2_500)
    files = glob.glob(os.path.join(path, "part=hot", "*.parquet"))
    assert len(files) == 4, files


def test_format_generic_sink_roundtrips(spark, sf_dir, tmp_path):
    """write_table/read_table: every supported format round-trips values
    and schema; ORC additionally pushes filters into the scan like
    parquet (footer-stats formats), while csv/json are interchange-only."""
    from timedf_spark.sources.sinks import read_table, write_table

    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    want = sorted(tuple(r) for r in src.collect())
    for fmt in ("parquet", "orc", "json", "csv"):
        path = str(tmp_path / f"t_{fmt}")
        write_table(src, path, fmt)
        back = read_table(spark, path, fmt, schema=src.schema)
        got = sorted(tuple(r) for r in back.select(*src.columns).collect())
        assert got == want, fmt

    # ORC pushdown parity with parquet
    orc = read_table(spark, str(tmp_path / "t_orc"), "orc", schema=src.schema)
    filtered = orc.filter(F.col("o_orderkey") == 42)
    plan = filtered._sc._jvm.PythonSQLUtils.explainString(
        filtered._jdf.queryExecution(), "formatted"
    )
    scan = plan[plan.index("Scan orc") :]
    assert "PushedFilters: [" in scan and "o_orderkey" in scan.split("PushedFilters")[1][:200]


def test_additive_schema_evolution_across_partitions(spark, tmp_path):
    """Daily-ingest evolution: a partition written before a column
    existed must read back NULL-extended under merge_schema=True, with
    full typed values where the column exists — and partition pruning
    must still reach the scan."""
    path = str(tmp_path / "evolved")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, val string").withColumn(
        "day", F.lit(1)
    )
    write_partitioned(v1, path, ["day"], mode="overwrite")
    v2 = spark.createDataFrame(
        [(3, "c", 0.5), (4, "d", 0.7)], "id long, val string, score double"
    ).withColumn("day", F.lit(2))
    write_partitioned(v2, path, ["day"], mode="append")

    merged = read_partitioned(spark, path, merge_schema=True)
    assert set(merged.columns) == {"id", "val", "score", "day"}
    rows = {r["id"]: (r["score"], r["day"]) for r in merged.collect()}
    assert rows[1] == (None, 1) and rows[3] == (0.5, 2)
    # old-partition rows are NULL, not 0/garbage
    assert merged.filter(F.col("score").isNull()).count() == 2
    # pruning still applies with merged schemas
    plan = merged.filter(F.col("day") == 2)._jdf.queryExecution().executedPlan().toString()
    assert "day = 2" in plan or "day#" in plan
    assert merged.filter(F.col("day") == 2).count() == 2
