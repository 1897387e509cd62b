"""Streaming CDC apply: a change stream maintains a queryable snapshot.

The streaming closure of the lakehouse loop: ``operators/merge.py``
applies ONE I/U/D batch; this module runs it per micro-batch inside
``foreachBatch``, versioning each result snapshot by ``batch_id`` with an
atomically published manifest — the same write-beside/publish/cleanup
protocol as ``streaming/compaction.py``, so a crashed or replayed batch
can never tear the snapshot readers see.

Per micro-batch:
1. read the current published snapshot (or the seeded base);
2. ``merge_changes`` (one key join + union — no full rewrite logic
   beyond the snapshot's size, which is the floor for any
   copy-on-write table without deletion vectors);
3. write ``snap/v=<batch_id>`` beside the live version;
4. atomically publish the manifest; best-effort delete the old version.

At-least-once replay converges: re-running batch N re-reads the
snapshot the manifest names (version N-1 — publish happens after the
write), re-merges the same changes, and overwrites ``v=N`` in place.

Ordering: foreachBatch micro-batches are totally ordered per query, so
CDC batches apply in arrival order — the semantics of every log-driven
materialization. At 100 TB the rewrite-per-batch cost says: batch the
trigger minutes apart and compact the change stream first (the
``event_bucket_dedup`` shape), or move to a merge-on-read format; the
protocol here is the copy-on-write baseline those optimize.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.operators.merge import merge_changes

__all__ = ["seed_snapshot", "read_snapshot", "cdc_apply_sink"]

_MANIFEST = "_snapshot_manifest.json"


def _publish(path: str, version: int) -> None:
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, _MANIFEST))


def _current_version(path: str) -> int | None:
    try:
        with open(os.path.join(path, _MANIFEST)) as f:
            return int(json.load(f)["version"])
    except (OSError, ValueError, KeyError):
        return None


def seed_snapshot(base: DataFrame, path: str) -> None:
    """Write the initial snapshot as version -1 and publish it."""
    base.write.mode("overwrite").parquet(os.path.join(path, "v=-1"))
    _publish(path, -1)


def read_snapshot(spark: SparkSession, path: str) -> DataFrame:
    """The currently published snapshot version."""
    v = _current_version(path)
    if v is None:
        raise FileNotFoundError(f"no published snapshot at {path}")
    return spark.read.parquet(os.path.join(path, f"v={v}"))


def apply_batch(
    changes: DataFrame, batch_id: int, path: str, key: str
) -> None:
    """One foreachBatch body: merge this batch into the published
    snapshot and publish the result as version ``batch_id``."""
    spark = changes.sparkSession
    cur = _current_version(path)
    if cur is not None and cur >= batch_id:
        return  # replay of an already-published batch: converged already
    snap = read_snapshot(spark, path)
    nxt = merge_changes(snap, changes, key)
    nxt.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
    _publish(path, batch_id)
    if cur is not None:  # best-effort: old version is unreferenced now
        shutil.rmtree(os.path.join(path, f"v={cur}"), ignore_errors=True)


def cdc_apply_sink(changes_stream: DataFrame, path: str, checkpoint: str, key: str):
    """DataStreamWriter maintaining the snapshot at ``path`` from an
    I/U/D change stream (caller picks trigger and calls .start())."""
    return changes_stream.writeStream.foreachBatch(
        lambda df, bid: apply_batch(df, bid, path, key)
    ).option("checkpointLocation", checkpoint)
