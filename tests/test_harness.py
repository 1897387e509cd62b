"""Harness tests: workload runner, results DB round-trip, CLI (capability
parity with timedf/report/test_benchmark_db.py:10-40 + CI smoke run)."""

from __future__ import annotations

import json
import subprocess
import sys

from timedf_spark.benchmark import REGISTRY, run_workload
from timedf_spark.report.db import BenchmarkDb
from timedf_spark.report.host import MemoryTracker, host_params


def test_workload_runner_measures_all_stages(spark, sf_dir):
    res = run_workload(spark, REGISTRY["ny_taxi"], sf_dir)
    names = set(res.measurements)
    assert "total" in names
    assert "total.load_data" in names
    assert {"total.taxi_q1", "total.taxi_q2", "total.taxi_q3", "total.taxi_q4"} <= names
    stage_sum = sum(v for k, v in res.measurements.items() if k != "total")
    assert res.measurements["total"] >= stage_sum - 1e-3


def test_db_roundtrip(spark, sf_dir):
    db = BenchmarkDb()
    res = run_workload(spark, REGISTRY["plasticc"], sf_dir)
    for it in range(2):
        res.iteration = it
        db.report(res, run_id="r1", host_params=host_params())
    rows = db.load_measurements("r1")
    assert len(rows) == 2 * len(res.measurements)
    agg = db.aggregate("r1", "median")
    assert ("plasticc", "total") in agg
    db.close()


def test_memory_tracker():
    t = MemoryTracker(interval_s=0.001)
    t.start()
    _ = [bytearray(10_000_000) for _ in range(20)]
    peak = t.stop()
    assert peak > 0


def test_cli_smoke(sf_dir, tmp_path):
    """End-to-end CLI run, mirroring the reference CI smoke
    (.github/workflows/build.yml: benchmark-run example -iterations 3)."""
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "timedf_spark.cli",
            "ny_taxi_ml",
            "-data_file",
            sf_dir,
            "-iterations",
            "2",
            "-db_file",
            str(tmp_path / "r.sqlite"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [json.loads(line) for line in out.stdout.splitlines() if line.startswith("{")]
    iters = [l for l in lines if "iteration" in l]
    assert len(iters) == 2
    assert all("total" in l for l in iters)
    assert any("max_memory_mb" in l for l in lines)
    assert any("median" in l for l in lines)
