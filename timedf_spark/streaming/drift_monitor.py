"""Streaming distribution-drift monitor: a mergeable bucket-count
store plus a frozen reference profile, emitting one exact TVD reading
per micro-batch.

The batch twin is ``queries/round18.price_drift_tvd``: same fixed
buckets, same scaled-share arithmetic. Here the "late" side is the
LIVE stream — per batch the store folds the batch's bucket counts
(integer addition at bucket grain, the rollup-store rule: exact,
version-guarded because addition is not idempotent) and one
bucket-grain join against the frozen reference computes

    tvd_bp = ½ · Σ_b |cur_b·SCALE DIV N_cur − ref_b·SCALE DIV N_ref|

which is appended to an idempotent per-batch alert log (directory per
batch id — redelivery overwrites with identical content). This is the
train/serve-skew alarm an ML-ops pipeline runs next to ingestion: the
reference never rescans, each batch costs one batch-sized aggregate +
one bucket-grain merge, and the TVD read touches only bucket-grain
frames.

Reference parity: none (intel-ai/timedf has no streaming surface).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = [
    "seed_drift_monitor",
    "apply_drift_batch",
    "drift_sink",
    "read_drift_log",
    "current_tvd_bp",
]

_SCALE = 10_000
_STORE_SCHEMA = "bucket long, n long"
_LOG_SCHEMA = "batch_id long, tvd_bp long, n_current long"


def seed_drift_monitor(spark: SparkSession, path: str, reference: DataFrame) -> None:
    """Freeze the reference (bucket, n) profile and publish an empty
    current store (version -1)."""
    reference.select(
        F.col(reference.columns[0]).cast("long").alias("bucket"),
        F.col(reference.columns[1]).cast("long").alias("n"),
    ).write.mode("overwrite").parquet(os.path.join(path, "reference"))
    empty = spark.createDataFrame([], _STORE_SCHEMA)
    empty.write.mode("overwrite").parquet(os.path.join(path, "v=-1"))
    _publish(path, -1)


def _read_store(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published drift store at {path}")
    return spark.read.schema(_STORE_SCHEMA).parquet(os.path.join(path, f"v={v}"))


def current_tvd_bp(spark: SparkSession, path: str) -> DataFrame:
    """1-row (tvd_bp, n_current) between the published store and the
    frozen reference — bucket-grain frames only."""
    cur = _read_store(spark, path)
    ref = spark.read.schema(_STORE_SCHEMA.replace("n long", "n long")).parquet(
        os.path.join(path, "reference")
    ).withColumnRenamed("n", "n_ref")
    tot = cur.agg(F.sum("n").alias("_tc")).collect()[0]["_tc"] or 0
    tot_ref = ref.agg(F.sum("n_ref").alias("_tr")).collect()[0]["_tr"] or 0
    if tot == 0 or tot_ref == 0:
        return spark.createDataFrame([(None, tot)], "tvd_bp long, n_current long")
    joined = cur.join(ref, "bucket", "full_outer").select(
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
    )
    return joined.agg(
        (
            F.sum(
                F.abs(
                    F.expr(f"n * {_SCALE} DIV {tot}")
                    - F.expr(f"n_ref * {_SCALE} DIV {tot_ref}")
                )
            )
            / F.lit(2)
        )
        .cast("long")
        .alias("tvd_bp"),
        F.lit(tot).alias("n_current"),
    )


def apply_drift_batch(batch: DataFrame, batch_id: int, path: str) -> None:
    """One foreachBatch body. ``batch`` must carry a ``bucket`` column
    (caller maps raw rows — see round18's fixed-width price buckets).
    Folds counts, publishes version ``batch_id``, appends the TVD
    reading to the alert log idempotently."""
    spark = batch.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        # Redelivery: re-adding would double-count. But a crash between
        # _publish() and the log write loses the batch's TVD reading —
        # when this exact batch is the published version and its log
        # directory is missing, recompute it from the published store
        # (store state == post-batch state, so the reading is identical)
        # before returning. Older batch ids can't be recomputed from the
        # advanced store and don't recur under Structured Streaming's
        # sequential replay, so they are left alone.
        # Gate on the _SUCCESS marker, not the directory: a crash DURING
        # the original log write leaves a partial dir (no _SUCCESS) that
        # an isdir check would treat as present, blocking the repair and
        # leaving read_drift_log on a corrupt batch dir. The rewrite
        # below is mode("overwrite"), so repairing a partial dir is safe.
        log_dir = os.path.join(path, "log", f"batch={batch_id}")
        if cur == batch_id and not os.path.exists(
            os.path.join(log_dir, "_SUCCESS")
        ):
            current_tvd_bp(spark, path).select(
                F.lit(batch_id).cast("long").alias("batch_id"),
                "tvd_bp",
                "n_current",
            ).write.mode("overwrite").parquet(log_dir)
        return
    delta = batch.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n")
    )
    merged = (
        _read_store(spark, path).withColumnRenamed("n", "_old")
        .join(delta.withColumnRenamed("n", "_new"), "bucket", "full_outer")
        .select(
            "bucket",
            (F.coalesce("_old", F.lit(0)) + F.coalesce("_new", F.lit(0))).alias("n"),
        )
    )
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    reading = current_tvd_bp(spark, path).select(
        F.lit(batch_id).cast("long").alias("batch_id"), "tvd_bp", "n_current"
    )
    # idempotent append: one directory per batch id, overwrite-safe
    reading.write.mode("overwrite").parquet(
        os.path.join(path, "log", f"batch={batch_id}")
    )
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def read_drift_log(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.read.schema("tvd_bp long, n_current long")
        .option("basePath", os.path.join(path, "log"))
        .parquet(os.path.join(path, "log", "batch=*"))
        .withColumn("batch_id", F.col("batch").cast("long"))
        .drop("batch")
        if os.path.isdir(os.path.join(path, "log"))
        else spark.createDataFrame([], _LOG_SCHEMA)
    )


def drift_sink(stream: DataFrame, path: str, checkpoint: str):
    """foreachBatch writer: the stream must already carry ``bucket``."""
    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(lambda b, i: apply_drift_batch(b, i, path))
    )
