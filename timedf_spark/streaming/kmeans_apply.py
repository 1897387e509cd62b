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

Two stores live here:

- the CENTROID store (below) — frozen fit, assignment-only; refit is a
  new version.
- the STATS store — mini-batch k-means maintenance in exact-accumulation
  form: state is the (cid, i, s, n) sufficient statistics, mergeable by
  addition like the rollup/CMS stores; centroids are DERIVED by the
  exact floor-division mean, so seeding with ``assignment_stats``
  against round-T centroids derives exactly round T+1 (pinned against
  the oracle-checked Lloyd fit). Batches then shift the running mean
  with no corpus rescans.

Scale posture: per batch, one k-row broadcast + one map-side argmin
aggregate keyed by vec_id; cost is O(batch x k x dim) with nothing
proportional to the corpus. The store holds k x dim bigints.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.kmeans import (
    assign_to_centroids,
    assignment_stats,
    centroids_from_stats,
)
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = [
    "publish_centroids",
    "read_centroids",
    "assign_batch",
    "kmeans_assign_sink",
    "seed_stats_store",
    "read_stats",
    "apply_stats_batch",
    "kmeans_stats_sink",
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


_STATS_SCHEMA = "cid bigint, i int, s bigint, n bigint"


def seed_stats_store(stats: DataFrame, path: str, version: int = 0) -> None:
    """Publish (cid, i, s, n) sufficient statistics (from
    ``operators/kmeans.assignment_stats`` over the fitting corpus) as
    store version ``version``. Deriving centroids from the seed yields
    exactly the NEXT Lloyd round's centroids — the store starts where
    the offline fit left off."""
    stats.selectExpr(
        "cast(cid as bigint) cid", "cast(i as int) i",
        "cast(s as bigint) s", "cast(n as bigint) n",
    ).write.mode("overwrite").parquet(os.path.join(path, f"v={version}"))
    _publish(path, version)


def read_stats(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published k-means stats store at {path}")
    return spark.read.schema(_STATS_SCHEMA).parquet(os.path.join(path, f"v={v}"))


def apply_stats_batch(
    batch: DataFrame,
    batch_id: int,
    path: str,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Mini-batch k-means maintenance, exact-accumulation form: assign
    the batch against the centroids DERIVED from the current statistics,
    then fold the batch's (cid, i)-wise sums and counts into the store
    by addition (mergeable — the CMS/rollup rule). Semantics: a running
    mean over all history, each batch classified by the centroids of its
    time; a periodic offline refit re-seeds the store. Addition is not
    idempotent, so the rollup-store replay guard applies."""
    spark = batch.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # redelivered batch: adding again would double-count
    stats = read_stats(spark, path)
    cent = centroids_from_stats(stats)
    delta = assignment_stats(batch, cent, k, vec_col=vec_col, id_col=id_col)
    merged = (
        stats.unionByName(delta.selectExpr(
            "cast(cid as bigint) cid", "cast(i as int) i",
            "cast(s as bigint) s", "cast(n as bigint) n",
        ))
        .groupBy("cid", "i")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    merged.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def kmeans_stats_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """DataStreamWriter maintaining the stats store (caller picks the
    trigger and calls .start())."""
    return stream.writeStream.foreachBatch(
        lambda df, bid: apply_stats_batch(
            df, bid, path, k, vec_col=vec_col, id_col=id_col
        )
    ).option("checkpointLocation", checkpoint)


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
