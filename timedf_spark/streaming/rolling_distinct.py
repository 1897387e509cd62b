"""Streaming rolling-distinct: a live day-sketch store from an event
stream, answering trailing-window distinct counts with no fact re-read.

The batch form (``functions/sketches.rolling_distinct_estimate``) scans
the fact once per report. The streaming form removes even that: each
micro-batch folds into per-day HLL sketches and MERGES them into a
persistent day-sketch store (KBs per day), versioned with the same
atomic-manifest publish protocol as ``streaming/cdc_apply.py``. Readers
answer "distinct actives over the trailing N days" from the sketch
store alone — the fact rows are touched exactly once, at ingest.

Convergence under at-least-once replay: a replayed batch whose version
is already published is a no-op; a replayed batch re-merging into the
pre-publish store is IDEMPOTENT even at the register level — HLL union
takes per-register maxima, so folding the same items twice changes
nothing (strictly stronger than the CDC merge, which needs the
version guard for correctness; here the guard only saves work).

At 100 TB: the store is day-grain regardless of event volume; each
micro-batch's merge cost is O(touched days), and the watermark-free
design means arbitrarily late events still land in their correct day
sketch — lateness shifts WHICH sketch absorbs the row, never drops it.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.sketches import daily_sketches, rolling_from_daily
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = [
    "seed_sketch_store",
    "apply_sketch_batch",
    "rolling_distinct_sink",
    "read_rolling_estimates",
]


def seed_sketch_store(spark: SparkSession, path: str) -> None:
    """Publish an empty day-sketch store (version -1)."""
    empty = spark.createDataFrame([], "day date, sketch binary")
    empty.write.mode("overwrite").parquet(os.path.join(path, "v=-1"))
    _publish(path, -1)


def _read_store(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published sketch store at {path}")
    return spark.read.schema("day date, sketch binary").parquet(
        os.path.join(path, f"v={v}")
    )


def apply_sketch_batch(
    batch: DataFrame, batch_id: int, path: str, ts_col: str, id_col: str
) -> None:
    """One foreachBatch body: fold this batch's per-day sketches into the
    published store and publish as version ``batch_id``."""
    spark = batch.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # replayed, already published — converged
    fresh = daily_sketches(batch, ts_col, id_col)
    merged = (
        _read_store(spark, path)
        .unionByName(fresh)
        .groupBy("day")
        .agg(F.hll_union_agg("sketch").alias("sketch"))
    )
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def rolling_distinct_sink(
    stream: DataFrame, path: str, checkpoint: str, ts_col: str, id_col: str
):
    """DataStreamWriter maintaining the day-sketch store at ``path``
    (caller picks the trigger and calls .start())."""
    return stream.writeStream.foreachBatch(
        lambda df, bid: apply_sketch_batch(df, bid, path, ts_col, id_col)
    ).option("checkpointLocation", checkpoint)


def read_rolling_estimates(
    spark: SparkSession, path: str, window_days: int = 7
) -> DataFrame:
    """(day, estimate) trailing-window distinct counts from the store —
    no fact access, any window size, computed on day-grain rows only."""
    return rolling_from_daily(_read_store(spark, path), window_days)
