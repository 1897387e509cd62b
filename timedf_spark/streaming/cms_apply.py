"""Streaming count-min sketch maintenance over a persisted store.

Per micro-batch: sketch JUST the batch (a batch-sized aggregation into
at most d*w cells), fold into the published sketch by cell-wise
addition (``operators/cms.cms_merge``), publish under the
atomic-manifest protocol of ``streaming/cdc_apply.py``.

Because CMS merge is exact addition, the store after any prefix of
batches is BIT-IDENTICAL to the one-shot sketch of those batches'
union — pinned by test (an equality guarantee; the MG store only gets
a bound). Addition is not idempotent, so the same replay guard as the
rollup store applies: a redelivered batch id <= published version is a
no-op.

Scale posture: the store is at most d*w rows regardless of history;
per batch, one batch scan + a d*w-row merge.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.operators.cms import cms_build, cms_merge
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = ["seed_cms_store", "apply_cms_batch", "cms_sink", "read_cms"]

_SCHEMA = "r int, c bigint, cnt long"


def seed_cms_store(spark: SparkSession, path: str) -> None:
    """Publish an empty sketch (version -1)."""
    empty = spark.createDataFrame([], _SCHEMA)
    empty.write.mode("overwrite").parquet(os.path.join(path, "v=-1"))
    _publish(path, -1)


def read_cms(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published CMS store at {path}")
    return spark.read.schema(_SCHEMA).parquet(os.path.join(path, f"v={v}"))


def apply_cms_batch(
    batch: DataFrame, batch_id: int, path: str, item_col: str, d: int, w: int
) -> None:
    """One foreachBatch body over a frame with an ``item_col`` column."""
    spark = batch.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # redelivered batch: adding again would double-count
    delta = cms_build(batch, item_col, d, w)
    merged = cms_merge(read_cms(spark, path), delta)
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def cms_sink(
    stream: DataFrame, path: str, checkpoint: str, item_col: str, d: int, w: int
):
    """DataStreamWriter maintaining the CMS store (caller picks the
    trigger and calls .start())."""
    return stream.writeStream.foreachBatch(
        lambda df, bid: apply_cms_batch(df, bid, path, item_col, d, w)
    ).option("checkpointLocation", checkpoint)
