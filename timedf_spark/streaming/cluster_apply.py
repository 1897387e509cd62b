"""Streaming dedup-cluster maintenance: an edge stream maintains the
(vertex, component) assignment table.

Composition of two audited pieces: the versioned-snapshot foreachBatch
protocol (``streaming/cdc_apply.py`` — write-beside, atomic manifest
publish, replay-converging) applied to
``operators/cluster.py::incremental_components`` (fold a batch of new
near-dup edges; only touched components re-cluster). This is the shape a
continuously-ingesting corpus actually runs: the near-dup tier emits
candidate pairs per ingest batch (``dedup.incremental_near_dup_pairs``),
and the cluster table — which downstream keeper selection reads — must
stay current without re-clustering 100 TB nightly.

Replay safety: a re-delivered batch id ≤ the published version is a
no-op (the published assignment already contains those edges — folding
the same edges twice is idempotent anyway, since connectivity is
monotone, but skipping avoids the wasted rewrite).

New vertices appear automatically: ``incremental_components`` treats an
endpoint absent from the assignment as its own fresh component.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.operators.cluster import incremental_components
from timedf_spark.streaming.cdc_apply import _current_version, _publish

__all__ = ["seed_assignments", "read_assignments", "cluster_apply_sink"]


def seed_assignments(base: DataFrame, path: str) -> None:
    """Publish the initial (vertex, component) table as version -1."""
    base.select("vertex", "component").write.mode("overwrite").parquet(
        os.path.join(path, "v=-1")
    )
    _publish(path, -1)


def read_assignments(spark: SparkSession, path: str) -> DataFrame:
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published assignments at {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def apply_edge_batch(edges: DataFrame, batch_id: int, path: str) -> None:
    """One foreachBatch body: fold this batch's (src, dst) edges into the
    published assignment table and publish as version ``batch_id``."""
    spark = edges.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # replayed batch: already folded
    asg = read_assignments(spark, path)
    nxt = incremental_components(asg.select("vertex", "component"), edges)
    nxt.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def cluster_apply_sink(edge_stream: DataFrame, path: str, checkpoint: str):
    """DataStreamWriter maintaining the assignment table at ``path`` from
    a (src, dst) edge stream (caller picks trigger and calls .start())."""
    return edge_stream.writeStream.foreachBatch(
        lambda df, bid: apply_edge_batch(df, bid, path)
    ).option("checkpointLocation", checkpoint)
