"""Partitioned parquet sink + pruned read-back.

The reference persists results to a SQL database (timedf/report/report.py,
A9/A10 in SURVEY.md §2); a Spark-native engine's durable sink is
directory-partitioned parquet — the layout every downstream scan can prune.

Scale design:
- ``repartition(partition_cols)`` BEFORE the write: without it, every one
  of N write tasks emits a file into every one of P partition directories
  (N×P small files — the classic small-files explosion); with it, rows for
  a partition value co-locate so each directory gets ~one file per shuffle
  partition that actually holds its key. AQE coalescing shrinks the tail.
- ``maxRecordsPerFile`` caps single-file size for hot partition values
  (skewed partition columns produce few-but-huge files otherwise), keeping
  downstream scan splits balanced without a second job.
- read-back relies on partition PRUNING, not filtering: a predicate on the
  partition column eliminates directories at planning time — the pruned
  data is never listed, opened, or read. tests/test_sinks.py asserts the
  pruned plan reads strictly fewer files and that the partition column
  survives the round-trip with its values intact.

Partition-column choice at 100 TB: low-cardinality, coarse (lang, date,
source shard) — one directory per value; a high-cardinality partition key
degenerates into one-file-per-row (use bucketing, sources/bucketing.py,
for join-key layouts instead).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_partitioned", "read_partitioned", "write_table", "read_table"]

# columnar formats with footer statistics usable for scan pruning; json/csv
# are interchange-only (no stats, row-oriented — document the cost)
_FORMATS = ("parquet", "orc", "json", "csv")


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
    max_records_per_file: int = 1_000_000,
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``."""
    (
        df.repartition(*partition_cols)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str, merge_schema: bool = False) -> DataFrame:
    """Read a partitioned sink back; partition-column predicates prune.

    ``merge_schema=True`` handles ADDITIVE schema evolution across
    partitions (a daily-ingest layout where new columns appear over
    time): Spark unions the per-file footers and NULL-extends files
    written before a column existed. Off by default — merging reads
    every file's footer up front, which at 100 TB is a driver-side
    metadata storm to opt into knowingly, and ingest jobs should instead
    pin the current schema. Type WIDENING (int→long etc.) is NOT merged
    by parquet — that is a rewrite (or a read-schema cast), by design."""
    return spark.read.option("mergeSchema", str(merge_schema).lower()).parquet(path)


def write_table(df: DataFrame, path: str, fmt: str = "parquet", **options) -> None:
    """Format-generic sink (parquet/orc columnar; json/csv interchange).
    ORC carries the same footer min/max stats + predicate pushdown as
    parquet (both prune row groups/stripes); json/csv exist for interop
    with non-columnar consumers — a scan of them reads every byte, so
    they are for handoff, not for the lakehouse layout."""
    assert fmt in _FORMATS, f"unsupported format {fmt!r}"
    w = df.write.mode("overwrite").format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    for k, v in options.items():
        w = w.option(k, v)
    w.save(path)


def read_table(spark: SparkSession, path: str, fmt: str = "parquet", schema=None, **options) -> DataFrame:
    """Read a :func:`write_table` sink back. csv/json require ``schema``
    for type fidelity (inference is a second full scan AND can drift)."""
    assert fmt in _FORMATS, f"unsupported format {fmt!r}"
    r = spark.read.format(fmt)
    if fmt == "csv":
        options.setdefault("header", "true")
    if schema is not None:
        r = r.schema(schema)
    for k, v in options.items():
        r = r.option(k, v)
    return r.load(path)
