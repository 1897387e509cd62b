"""Streaming k-means assignment against a persisted centroid store.

The production split every large-scale clustering deployment uses:
FITTING is periodic and batch (``operators/kmeans.lloyd_centroids`` over
the corpus, an offline job), ASSIGNMENT is continuous (every arriving
vector classified against the last published fit — a broadcast of k
rows onto the micro-batch, no corpus rescan, no shuffle of anything but
the batch itself).

The centroid store is a versioned parquet table under the same
atomic-manifest protocol as the CDC/rollup/MG stores
(``streaming/cdc_apply.py``): ``publish_centroids`` writes the k-row
integer centroid table and flips the manifest, so a refit mid-stream is
picked up by the NEXT micro-batch atomically (a batch reads one
consistent version end-to-end, never a torn mix).

Per-batch output goes to ``out/batch=N`` with overwrite — an
at-least-once redelivery of batch N rewrites byte-identical content
(assignment is deterministic integer arithmetic), so the sink is
idempotent without a dedup pass.

Equality pin (tests/test_round9.py): the streaming probe path produces
bit-identical assignments to ``assign_to_centroids`` run as one batch —
same integer argmin, same tie-break.

Scale posture: per batch, one k-row broadcast + one map-side argmin
aggregate keyed by vec_id; cost is O(batch x k x dim) with nothing
proportional to the corpus. The store holds k x dim bigints.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.kmeans import assign_to_centroids
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = [
    "publish_centroids",
    "read_centroids",
    "assign_batch",
    "kmeans_assign_sink",
]

_SCHEMA = "cid int, c array<bigint>"


def publish_centroids(centroids: DataFrame, path: str, version: int = 0) -> None:
    """Publish a (cid, c) centroid table (from ``lloyd_centroids``) as
    store version ``version``. Re-publishing with a higher version is the
    refit path; readers switch at their next batch boundary."""
    # cid is int at init (row_number) but bigint after an update round
    # (mk % k) — normalize so the store schema is stable across refits
    centroids.select(
        F.col("cid").cast("int").alias("cid"), "c"
    ).write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    _publish(path, version)


def read_centroids(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published centroid store at {path}")
    return spark.read.schema(_SCHEMA).parquet(os.path.join(path, f"v={v}"))


def assign_batch(
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    out_path: str,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """One foreachBatch body: classify the batch against the current
    store version, write ``out/batch=N`` (overwrite = idempotent)."""
    spark = batch.sparkSession
    cent = read_centroids(spark, store_path)
    assigned = assign_to_centroids(batch, cent, k, vec_col=vec_col, id_col=id_col)
    assigned.write.mode("overwrite").parquet(
        os.path.join(out_path, f"batch={batch_id}")
    )


def kmeans_assign_sink(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """DataStreamWriter assigning every micro-batch against the store
    (caller picks the trigger and calls .start())."""
    return stream.writeStream.foreachBatch(
        lambda df, bid: assign_batch(
            df, bid, store_path, out_path, k, vec_col=vec_col, id_col=id_col
        )
    ).option("checkpointLocation", checkpoint)
