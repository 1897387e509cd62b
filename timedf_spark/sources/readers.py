"""Sources: explicit-schema scans, multi-file ingest, materialization triggers.

Reference surface covered (SURVEY.md §2.A):
  A1/A2 — CSV scan with explicit schema, no header, gzip
          (timedf/benchmark_utils.py:25-74): Spark reads gzip CSV natively
          and `schema=` skips inference, the reference's deliberate choice.
  A4    — multi-file UNION ALL ingest (ny_taxi.py:281-305): one multi-path
          scan, NOT a loop of per-file reads — a single scan parallelizes
          across all files' splits and keeps one lineage node for Catalyst.
  A5    — eager-load trigger (timedf/backend.py:57-66): Spark is lazy; a
          timed "load" stage must end with an action. ``trigger`` is the
          standardized barrier (noop-format write: runs every task, collects
          nothing to the driver — unlike count() it cannot be optimized into
          a metadata-only scan).
  A12   — synthetic in-memory source.

At 100 TB these helpers matter because: explicit schemas avoid a full
inference pass over the data; multi-path scans give Spark the full file
list for split planning; and Parquet (`load_table`) carries min/max stats
so Catalyst prunes row groups on pushed filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

__all__ = ["read_csv", "read_jsonl", "union_ingest", "load_table", "load_tables", "trigger"]

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_csv(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType,
    *,
    header: bool = False,
    timestamp_format: str | None = None,
) -> DataFrame:
    """CSV scan with a mandated explicit schema (ref: benchmark_utils.py:25-46).

    Schema inference is banned by design — the reference always declares
    dtypes, and at scale inference costs a full extra pass. gzip/bzip2 are
    decompressed natively by Spark based on file extension.
    """
    reader = spark.read.schema(schema).option("header", str(header).lower())
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.csv(paths if isinstance(paths, list) else [paths])


def read_jsonl(
    spark: SparkSession,
    paths: str | list[str],
    schema: StructType,
    *,
    timestamp_format: str | None = None,
) -> DataFrame:
    """JSON-Lines scan with a mandated explicit schema — the de-facto
    interchange format for LLM corpora (one document object per line).

    Same stance as read_csv: no inference (at 100 TB, inference is a full
    extra pass over every gzip member), native gzip/bzip2/zstd by
    extension, unparseable lines land in a ``_corrupt_record`` column
    instead of killing the job when the schema declares one (PERMISSIVE
    mode is Spark's default); splittable when uncompressed or zstd-framed.
    """
    reader = spark.read.schema(schema)
    if timestamp_format:
        reader = reader.option("timestampFormat", timestamp_format)
    return reader.json(paths if isinstance(paths, list) else [paths])


def union_ingest(dfs: list[DataFrame]) -> DataFrame:
    """UNION ALL by column name (ref: pd.concat(ignore_index=True), ny_taxi.py:305).

    Prefer passing all paths to one ``read_csv`` call when files share a
    schema — a single scan beats N scans + N-1 unions. This helper is for
    the heterogeneous-schema case (ny_taxi_ml's per-year schemas) after
    per-file normalization, and tolerates missing columns by filling NULL.
    """
    if not dfs:
        raise ValueError("union_ingest needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan of one driver-generated testdata table (TESTDATA.md).

    The events table stores ns-precision timestamps, which Spark's Parquet
    reader cannot type natively; with spark.sql.legacy.parquet.nanosAsLong
    (set by the session factory) `ts` arrives as epoch-ns long and is
    converted here to Spark's µs timestamp via exact integer division (the
    driver's data is µs-aligned, so no precision is lost; a float division
    would corrupt ns-magnitude int64s past 2^53).
    """
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
        elif ts_type == "timestamp_ntz":
            # Parquet µs timestamps without a UTC flag arrive as
            # TIMESTAMP_NTZ; event-time operators (withWatermark) require
            # TIMESTAMP. The cast is value-preserving ONLY under a UTC
            # session tz — any other tz would silently shift every event
            # time and desynchronize from the DuckDB oracle, so fail fast
            # on a misconfigured session instead of drifting.
            tz = spark.conf.get("spark.sql.session.timeZone")
            if tz != "UTC":
                raise RuntimeError(
                    "events.ts is TIMESTAMP_NTZ: converting to TIMESTAMP "
                    f"requires spark.sql.session.timeZone=UTC, got {tz!r} — "
                    "build the session via timedf_spark.session.get_spark or "
                    "set the conf before loading events"
                )
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def fan_out(df: DataFrame, multiplier: int = 1, min_bytes: int = 0) -> DataFrame:
    """Scan-parallelism guard for per-row-CPU-heavy pipelines (shingling,
    regex, hashing, vector math).

    Parquet cannot split a file below row-group granularity, so a table
    written as a single row group scans as ONE task no matter how many
    cores the cluster has — the whole downstream projection then runs
    serially. When the scan yields fewer partitions than the session's
    parallelism, add one bounded round-robin repartition so the expensive
    per-row stage uses every core. At production scale (splits >> cores)
    the condition is false and this is a no-op — it never adds a shuffle
    to a full-size scan. Only worth it when downstream per-row CPU exceeds
    the cost of cycling the rows through one exchange: measured 3-5x on
    shingle/regex/md5 projection pipelines, but a net LOSS on plain
    columnar aggregations (map-side combine shuffles less than the fan-out
    would) AND on join/iteration-dominated pipelines (ANN candidate joins,
    connected-components rounds), where downstream exchanges re-partition
    anyway and the extra stage is pure overhead — both measured, both
    reverted. Apply per call site with a measurement, not globally.

    ``min_bytes`` (r08/r09): under-split is only worth FIXING when the
    serial work is material — for a few-MB scan the repartition can cost
    more than the serialism (A/B-measured at sf0.1 on the jaccard and
    minhash pipelines: fan_out LOST 0.3-1.6 s per query there, while at
    100x the same single-row-group scan serialized ~2 min of shingling
    onto one core). Plan-stats size below the floor → no-op, so the
    guard engages exactly where it pays. The floor is OPT-IN per call
    site (default 0 = always fan out below parallelism): r08 shipped
    24 MB as the default and the per-row-CPU pipelines that fan-out was
    originally measured 3-5x on silently lost it at sf0.1 (~+9 s across
    seven queries, join_size_sketch 4.41 -> 8.09 s — VERDICT r08 item 1).
    Pass ``min_bytes=24 << 20`` only at sites whose A/B showed the
    repartition losing on small scans (dedup jaccard/minhash entry
    points).
    """
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if min_bytes > 0:
        try:
            size = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
            if size < min_bytes:
                return df
        except Exception:  # noqa: BLE001 — stats unavailable: fall through
            pass
    # Partition count from the planned physical scan — NOT df.rdd, which
    # converts the whole plan to an RDD (forcing a second physical planning
    # pass + Python<->JVM round trips) on every call.
    try:
        n_parts = df._jdf.queryExecution().executedPlan().outputPartitioning().numPartitions()
    except Exception:  # noqa: BLE001 — unknown partitioning: fall back to RDD view
        n_parts = df.rdd.getNumPartitions()
    if n_parts >= target:
        return df
    return df.repartition(target)


def trigger(df: DataFrame) -> None:
    """Materialization barrier for timed stages (ref: backend.py:57-76,
    modin_utils.py:120-161 — the reference drains partition futures; we run
    every task via a noop sink so the stage's wall-clock includes all work).
    """
    df.write.format("noop").mode("overwrite").save()


def synthetic_frame(spark: SparkSession, n_rows: int, n_cols: int, seed: int = 42) -> DataFrame:
    """Distributed synthetic source (ref: example_benchmark/benchmark_content.py:42
    builds a random pandas frame driver-side; we generate executor-side so it
    scales to any n_rows)."""
    cols = [(F.rand(seed + i) * 100).cast("long").alias(f"c{i}") for i in range(n_cols)]
    return spark.range(n_rows).select(*cols)
