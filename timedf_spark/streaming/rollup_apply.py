"""Streaming exact rollup maintenance: a fact stream keeps a grouped
aggregate store current, bit-for-bit equal to a full recompute.

Per micro-batch: aggregate JUST the batch into the mergeable
representation (``operators/rollup.quantized_rollup``), merge with the
published store (plain integer addition at aggregate grain), publish a
new version under the atomic-manifest protocol of
``streaming/cdc_apply.py``. The store never rescans history; each batch
costs one batch-sized aggregation + one aggregate-grain join.

Unlike the sketch store (tolerance) this maintenance is EXACT: counts
and integer quantized sums are associative, so the store after any
replay-converged prefix of batches equals one aggregation of all rows
seen — pinned against the batch recompute in tests.

NOTE the replay guard is CORRECTNESS-bearing here (not just a work
saver): merging the same batch twice would double-count. foreachBatch
batch ids are totally ordered and the manifest survives restarts, so
an at-least-once redelivery of batch N ≤ published version is a no-op,
and a crash before publish re-merges into the pre-publish store — the
same convergence argument as the CDC snapshot sink.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.operators.rollup import merge_rollups, quantized_rollup
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = ["seed_rollup_store", "apply_rollup_batch", "rollup_sink", "read_rollup"]


def _schema(keys_ddl: str) -> str:
    return f"{keys_ddl}, n_rows long, sum_q long"


def seed_rollup_store(spark: SparkSession, path: str, keys_ddl: str) -> None:
    """Publish an empty rollup store (version -1). ``keys_ddl`` is the
    DDL of the key columns, e.g. ``"day date"``."""
    empty = spark.createDataFrame([], _schema(keys_ddl))
    empty.write.mode("overwrite").parquet(os.path.join(path, "v=-1"))
    _publish(path, -1)


def read_rollup(spark: SparkSession, path: str, keys_ddl: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published rollup store at {path}")
    return spark.read.schema(_schema(keys_ddl)).parquet(os.path.join(path, f"v={v}"))


def apply_rollup_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    keys: list[str],
    keys_ddl: str,
    value_col: str,
) -> None:
    """One foreachBatch body: fold this batch into the published rollup
    and publish as version ``batch_id``."""
    spark = batch.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # redelivered batch: merging again would double-count
    delta = quantized_rollup(batch, keys, value_col)
    merged = merge_rollups(read_rollup(spark, path, keys_ddl), delta, keys)
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def rollup_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    keys: list[str],
    keys_ddl: str,
    value_col: str,
):
    """DataStreamWriter maintaining the rollup store at ``path`` (caller
    picks the trigger and calls .start())."""
    return stream.writeStream.foreachBatch(
        lambda df, bid: apply_rollup_batch(df, bid, path, keys, keys_ddl, value_col)
    ).option("checkpointLocation", checkpoint)
