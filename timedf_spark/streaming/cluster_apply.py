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

import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from timedf_spark.operators.cluster import incremental_components
from timedf_spark.streaming.cdc_apply import _MANIFEST, _current_version, _publish

__all__ = [
    "seed_assignments",
    "read_assignments",
    "fold_edges_delta",
    "cluster_apply_sink",
]

# Delta-assignment protocol (r10): folding a batch used to REWRITE the
# whole (vertex, component) table per batch — the last O(store) write in
# the ingest loop (store-growth shakeout: 5M-row assignment rewritten
# for every 500-doc batch). Now each batch writes only its DELTA (the
# relabelled affected rows + new singletons) at v=batch_id over a full
# BASE snapshot at v=base; the manifest carries {"version", "base"}.
# Reads resolve latest-version-wins per vertex; every _COMPACT_EVERY
# versions the fold writes a full resolved snapshot instead (amortized
# O(store / _COMPACT_EVERY) per batch) and drops the old base + deltas.
# Legacy manifests (no "base" key) mean base == version — exactly the
# old full-snapshot layout, which reads and upgrades transparently.
#
# Read-amplification curve (r11, tools/delta_read_curve.py over a
# 5M-vertex store, 500-edge folds, SCALE_SHAKEOUT.json
# "delta_read_amplification"): full read_assignments medians 0.53 s at
# k=0 deltas, then 2.60 / 1.85 / 2.24 s at k=4/8/15 — a ~4x STEP the
# moment any delta exists (the latest-version-wins resolve adds a
# per-vertex max-version aggregate over base+deltas), roughly FLAT in k
# between compactions. Consequence: lowering _COMPACT_EVERY would not
# cheapen delta-present reads (the step, not the delta count, is the
# cost) and compacting every batch is exactly the O(store) write this
# protocol removed — 16 stands. Read-heavy consumers should read right
# after a compaction boundary or call compact() themselves.
_COMPACT_EVERY = int(os.environ.get("SPARK_GRAFT_ASSIGN_COMPACT_EVERY", "16"))


def _manifest_state(path: str) -> tuple[int | None, int | None]:
    """(version, base) from the manifest; base defaults to version
    (legacy full-snapshot layout)."""
    try:
        with open(os.path.join(path, _MANIFEST)) as f:
            d = json.load(f)
        v = int(d["version"])
        return v, int(d.get("base", v))
    except (OSError, ValueError, KeyError):
        return None, None


def _publish_versioned(path: str, version: int, base: int) -> None:
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version, "base": base}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, _MANIFEST))


def seed_assignments(base: DataFrame, path: str) -> None:
    """Publish the initial (vertex, component) table as version -1."""
    base.select("vertex", "component").write.mode("overwrite").parquet(
        os.path.join(path, "v=-1")
    )
    _publish(path, -1)


def _version_dirs(path: str, version: int, base: int) -> list[int]:
    """Published version dirs to read: the base plus every existing delta
    in (base, version]. Driven by the MANIFEST range, never by directory
    globbing — an unpublished crash-window dir is invisible."""
    out = [base]
    for k in range(base + 1, version + 1):
        if os.path.isdir(os.path.join(path, f"v={k}")):
            out.append(k)
    return out


def _rows_any_version(spark: SparkSession, path: str) -> DataFrame:
    """base ∪ delta rows with their version — UNRESOLVED (a vertex may
    carry stale rows from older versions). Presence checks and
    affected-membership pulls are exact on this multiset (assignment is
    monotone: stale rows are still true connectivity facts)."""
    v, base = _manifest_state(path)
    if v is None:
        raise FileNotFoundError(f"no published assignments at {path}")
    parts = [
        spark.read.parquet(os.path.join(path, f"v={k}"))
        .select("vertex", "component")
        .withColumn("_ver", F.lit(k))
        for k in _version_dirs(path, v, base)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def read_assignments(spark: SparkSession, path: str) -> DataFrame:
    """The current (vertex, component) table: latest-version-wins over
    base + deltas. One shuffle on vertex when deltas exist; a pure
    snapshot (legacy, or right after compaction) reads directly."""
    v, base = _manifest_state(path)
    if v is None:
        raise FileNotFoundError(f"no published assignments at {path}")
    if base == v or not _version_dirs(path, v, base)[1:]:
        return spark.read.parquet(os.path.join(path, f"v={base}")).select(
            "vertex", "component"
        )
    rows = _rows_any_version(spark, path)
    w = Window.partitionBy("vertex").orderBy(F.desc("_ver"))
    return (
        rows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vertex", "component")
    )


def fold_edges_delta(
    spark: SparkSession,
    path: str,
    batch_id: int,
    edges: DataFrame,
    singles: DataFrame | None = None,
) -> None:
    """Fold one batch of edges (plus optional pre-computed new-vertex
    ``singles``) into the versioned assignment store: write the DELTA
    (or, every _COMPACT_EVERY versions, a compacted full snapshot) at
    v=batch_id and publish. Crash-safe in the standard write-then-publish
    way: an unpublished dir is invisible to reads and overwritten on
    replay. One bounded leak corner: a crash between a compaction's
    publish and its pre-base cleanup leaves <= _COMPACT_EVERY orphan
    dirs below the new base — reads never touch them (version listing is
    manifest-driven), they are dead disk only."""
    cur, base = _manifest_state(path)
    if cur is not None and cur >= batch_id:
        return  # replayed batch: already folded
    rows = _rows_any_version(spark, path).select("vertex", "component")
    inp = rows if singles is None else rows.unionByName(singles)
    delta = incremental_components(inp, edges, delta_only=True)
    if singles is not None:
        # a new vertex with no edge is absent from the affected solve;
        # one with an edge appears in BOTH frames — min(component)
        # resolves to the solve's label (merges go toward the min)
        delta = delta.unionByName(singles)
    delta = delta.groupBy("vertex").agg(F.min("component").alias("component"))
    compact = base is not None and (batch_id - base) >= _COMPACT_EVERY
    if compact:
        # full resolved snapshot: current rows overlaid with this delta
        w = Window.partitionBy("vertex").orderBy(F.desc("_ver"))
        full = (
            _rows_any_version(spark, path)
            .unionByName(delta.withColumn("_ver", F.lit(batch_id)))
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("vertex", "component")
        )
        full.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
        _publish_versioned(path, batch_id, batch_id)
        for k in range(base, batch_id):
            shutil.rmtree(os.path.join(path, f"v={k}"), ignore_errors=True)
    else:
        delta.write.mode("overwrite").parquet(os.path.join(path, f"v={batch_id}"))
        _publish_versioned(path, batch_id, base if base is not None else batch_id)


def apply_edge_batch(edges: DataFrame, batch_id: int, path: str) -> None:
    """One foreachBatch body: fold this batch's (src, dst) edges into the
    published assignment table and publish as version ``batch_id``
    (delta protocol — see fold_edges_delta)."""
    fold_edges_delta(edges.sparkSession, path, batch_id, edges)


def cluster_apply_sink(edge_stream: DataFrame, path: str, checkpoint: str):
    """DataStreamWriter maintaining the assignment table at ``path`` from
    a (src, dst) edge stream (caller picks trigger and calls .start())."""
    return edge_stream.writeStream.foreachBatch(
        lambda df, bid: apply_edge_batch(df, bid, path)
    ).option("checkpointLocation", checkpoint)
