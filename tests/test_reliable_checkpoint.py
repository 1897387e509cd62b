"""SPARK_GRAFT_CHECKPOINT_DIR: the reliable (disk-file) checkpoint path
for iterative operators must produce results identical to the default
localCheckpoint path, write actual checkpoint files, and strip planner
metadata the same way (the r06 blowup class is storage-independent)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from timedf_spark.operators.cluster import _checkpoint, connected_components

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_reliable_checkpoint_writes_files_and_matches_local(spark, tmp_path):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    base, ids = _checkpoint(df)
    want = sorted(map(tuple, base.collect()))
    os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = str(tmp_path / "ck")
    try:
        out, out_ids = _checkpoint(df)
        assert out_ids == set()  # nothing pinned in the block manager
        assert sorted(map(tuple, out.collect())) == want
        assert glob.glob(str(tmp_path / "ck" / "**" / "*"), recursive=True)
    finally:
        os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)


def test_connected_components_identical_under_reliable_checkpoint(
    spark, tmp_path
):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (3, 4)],
        ["src", "dst"],
    )
    # force the distributed rounds (not the driver union-find fast path)
    os.environ["SPARK_GRAFT_GRAPH_DRIVER_PATH"] = "0"
    try:
        want = sorted(
            map(tuple, connected_components(None, edges).collect())
        )
        os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = str(tmp_path / "ck2")
        got = sorted(
            map(tuple, connected_components(None, edges).collect())
        )
        assert got == want
        comp = dict(got)
        assert comp[4] == 1 and comp[11] == 10 and comp[22] == 20
    finally:
        os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
        os.environ.pop("SPARK_GRAFT_GRAPH_DRIVER_PATH", None)