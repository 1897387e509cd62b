"""Streaming OLS-trend maintenance over a persisted statistics store.

The five sufficient statistics of per-group OLS (n, Σx, Σy, Σxy, Σx² —
``operators/trend.py``) are mergeable by group-wise ADDITION, so a
micro-batch stream keeps every group's regression current with no
history rescan: per batch, aggregate JUST the batch's statistics and
fold them into the published store; the slope is a pure function of
the state, derived at read time by the exact integer arithmetic the
batch operator uses. Store after any batch prefix == one-shot
statistics of those batches' union, bit-exact (the CMS-store class of
guarantee; pinned in tests). Addition is not idempotent → rollup-store
replay guard.

Scale posture: the store is one row per group; per batch, one
batch-sized aggregation and a group-count-sized merge.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.trend import slopes_from_stats, sufficient_stats
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = [
    "seed_trend_store",
    "read_trend_stats",
    "apply_trend_batch",
    "trend_sink",
    "derive_slopes",
]

_STAT_COLS = ["n", "sx", "sy", "sxy", "sxx"]


def _merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    return (
        a.unionByName(b)
        .groupBy(*group_cols)
        .agg(*[F.sum(c).alias(c) for c in _STAT_COLS])
    )


def seed_trend_store(stats: DataFrame, path: str, version: int = 0) -> None:
    stats.write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    _publish(path, version)


def read_trend_stats(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published trend store at {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def apply_trend_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    group_cols: list[str],
    x_col: str,
    y_col: str,
) -> None:
    """One foreachBatch body: fold the batch's statistics into the store."""
    spark = batch.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # redelivered batch: adding again would double-count
    delta = sufficient_stats(batch, group_cols, x_col, y_col)
    merged = _merge(read_trend_stats(spark, path), delta, group_cols)
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def trend_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    group_cols: list[str],
    x_col: str,
    y_col: str,
):
    """DataStreamWriter maintaining the trend store (caller picks the
    trigger and calls .start())."""
    return stream.writeStream.foreachBatch(
        lambda df, bid: apply_trend_batch(df, bid, path, group_cols, x_col, y_col)
    ).option("checkpointLocation", checkpoint)


def derive_slopes(
    stats: DataFrame, group_cols: list[str], scale: int = 10_000
) -> DataFrame:
    """(group..., n, slope_num, slope_den, slope_scaled) from stored
    statistics — the operators/trend.py finisher, re-exported so store
    readers need only this module."""
    return slopes_from_stats(stats, group_cols, scale)
