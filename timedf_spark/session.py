"""SparkSession factory with scale-oriented configuration profiles.

Replaces the reference's backend-selection layer (timedf/backend.py:14-21,
timedf/backends/__init__.py:9-19, timedf/backends/modin_utils.py:9-87):
where timedf rebinds a module-global ``pd`` to a chosen pandas
implementation, we have exactly one engine and the "backend" axis becomes a
named Spark conf profile.

Profiles are designed so the same logical plans run on local[32] for tests
and on a 1000-executor cluster for 100 TB: nothing here assumes single-node
(no ``collect``-based logic, no driver-side state); only master/memory
differ between profiles.
"""

from __future__ import annotations

import os
from typing import Any

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark", "PROFILES"]

# Baseline confs shared by every profile. These are the knobs that matter at
# 100 TB and are harmless at sf0.001:
#  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
#    dynamic join-strategy demotion (sort-merge -> broadcast when a side
#    turns out small). This is what makes one logical plan survive a 1000x
#    scale-up without retuning.
#  - Arrow on: every pandas_udf / mapInPandas / toPandas crossing is
#    vectorized batch transfer, not pickled rows.
#  - 128 MiB scan partitions: standard cluster sizing; at 100 TB this yields
#    ~800k scan tasks, which Spark handles, and keeps per-task memory flat.
_COMMON: dict[str, Any] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # IN predicates up to this many literals push to parquet as the real
    # set (above it Spark degrades them to a [min, max] range, useless
    # for scattered keys). The streaming store probes prune corpus-sized
    # scans with bounded literal id sets (operators/dedup.py::
    # _materialized_candidates cap 8192, similarity.py cell prune) whose
    # row-group skipping only works when the SET reaches the reader;
    # default is 10.
    "spark.sql.parquet.pushdown.inFilterThreshold": "8192",
    "spark.sql.session.timeZone": "UTC",
    # Structured Streaming state store: RocksDB scales past JVM-heap state.
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    ),
    # 32 fits this box's 32 threads at test SFs; SPARK_GRAFT_SHUFFLE_PARTITIONS
    # overrides it for outsized local runs (the 1000x graph shakeout OOMed at
    # 32: 600M edge rows / 32 reduce partitions × 32 concurrent BytesToBytesMap
    # builds exhausted unified memory — partition sizing, not operator shape;
    # AQE coalesces the small stages back down either way).
    "spark.sql.shuffle.partitions": os.environ.get(
        "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
    ),
    # Parquet INT64 TIMESTAMP(NANOS) (the events table) is otherwise an
    # illegal type for Spark's reader; read as epoch-ns long and convert in
    # the loader (sources/readers.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
}

# Named profiles = the reference's "-backend" axis mapped to Spark conf.
PROFILES: dict[str, dict[str, Any]] = {
    # Local test/bench profile (the only one runnable in this container).
    "local": {
        **_COMMON,
    },
    # Cluster profile: same plans, cluster-scale shuffle parallelism. At
    # 100 TB with ~1000 executors you want shuffle partitions ~= 2-3x total
    # cores and AQE coalescing to shrink the small stages back down.
    "cluster": {
        **_COMMON,
        "spark.sql.shuffle.partitions": "4000",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(128 * 1024 * 1024),
        "spark.dynamicAllocation.enabled": "true",
        "spark.shuffle.service.enabled": "true",
    },
}


def get_spark(
    profile: str = "local",
    app_name: str = "timedf_spark",
    extra_conf: dict[str, Any] | None = None,
) -> SparkSession:
    """Build (or fetch the active) SparkSession under a named profile.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores),
    mirroring the reference's MODIN_CPUS / POLARS_MAX_THREADS knobs
    (timedf/backends/modin_utils.py:24-27).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    if profile == "local":
        builder = builder.master(f"local[{cpus}]")
    for k, v in _resolve_conf(profile, extra_conf).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def _resolve_conf(
    profile: str, extra_conf: dict[str, Any] | None = None
) -> dict[str, Any]:
    """The full conf map ``get_spark`` applies for a profile.

    Reliable-checkpoint GC (ADVICE r08): when SPARK_GRAFT_CHECKPOINT_DIR
    routes iterative operators to disk checkpoints (operators/cluster.py::
    _checkpoint), the files are only reclaimed by the ContextCleaner if
    cleanCheckpoints is on — otherwise EVERY entry point (bench, CLI,
    tests) accumulates checkpoint files for the whole session and a long
    multi-query run can fill the disk. Must be set before the SparkContext
    starts (the cleaner reads it once at startup), hence here and not at
    the first setCheckpointDir call.
    """
    conf = dict(PROFILES[profile])
    if os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR"):
        conf.setdefault("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    if extra_conf:
        conf.update(extra_conf)
    return conf


def stop_spark() -> None:
    """Stop the active session if any (test teardown)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
