"""Streaming Misra-Gries heavy-hitter maintenance: an item stream keeps
a k-counter MG summary current with NO history rescan.

Per micro-batch: exact per-item counts of JUST the batch (a batch-sized
aggregation), folded into the published summary via
``operators/summaries.mg_merge`` (add counters, threshold-reduce to at
most k — the PODS'12 mergeable-summaries rule), published under the
atomic-manifest protocol of ``streaming/cdc_apply.py``.

Guarantee maintained across any prefix of batches: every estimate
undercounts (est <= true) and the undercount is bounded by
``n_total_so_far / (k+1)`` — so every true heavy hitter with frequency
above that bound is present in the summary. Pinned against the exact
counts in tests.

Relation to ``streaming/heavy_hitters.py`` (the other MG surface):
that module keeps per-bucket summaries in Spark's in-memory state store
(``applyInPandasWithState``) — lowest latency, but state dies with the
query. THIS module is the persisted-store variant of the same sketch:
the summary lives in versioned parquet under the atomic-manifest
protocol, survives restarts and engine upgrades, is readable by any
batch consumer mid-stream, and merges by the explicit PODS'12 rule —
the same store-vs-state split as rollup_apply vs stateful.py.

The replay guard is correctness-bearing (same as the rollup store):
merging a redelivered batch twice would double-count. Batch ids are
totally ordered and the manifest survives restarts, so an
at-least-once redelivery of batch N <= published version is a no-op.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.summaries import mg_merge
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = ["seed_mg_store", "apply_mg_batch", "mg_sink", "read_mg"]

_SCHEMA = "item string, est_count long"


def seed_mg_store(spark: SparkSession, path: str) -> None:
    """Publish an empty MG summary (version -1)."""
    empty = spark.createDataFrame([], _SCHEMA)
    empty.write.mode("overwrite").parquet(os.path.join(path, "v=-1"))
    _publish(path, -1)


def read_mg(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published MG store at {path}")
    return spark.read.schema(_SCHEMA).parquet(os.path.join(path, f"v={v}"))


def apply_mg_batch(
    batch: DataFrame, batch_id: int, path: str, item_col: str, k: int
) -> None:
    """One foreachBatch body over a frame with an ``item_col`` column
    (the caller pre-explodes composite rows into items)."""
    spark = batch.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # redelivered batch: merging again would double-count
    delta = (
        batch.select(F.col(item_col).alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    merged = mg_merge(read_mg(spark, path), delta, k)
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def mg_sink(stream: DataFrame, path: str, checkpoint: str, item_col: str, k: int):
    """DataStreamWriter maintaining the MG store (caller picks the
    trigger and calls .start())."""
    return stream.writeStream.foreachBatch(
        lambda df, bid: apply_mg_batch(df, bid, path, item_col, k)
    ).option("checkpointLocation", checkpoint)
