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


def test_report_from_results_db(tmp_path):
    """A11/L8: the report generator renders the reference's structure —
    per-benchmark sheet, hidden constant-config rows, per-stage bar
    charts, HostInfo — from a real results DB, as a REAL .xlsx via the
    in-repo OOXML writer (xlsxwriter is absent in this container)."""
    import xml.etree.ElementTree as ET
    import zipfile

    from timedf_spark.benchmark import BenchmarkResult
    from timedf_spark.report.xlsx_report import build_report, collect_report_data

    db = BenchmarkDb(str(tmp_path / "res.sqlite"))
    for backend, t1 in [("local", 1.5), ("local32", 0.5)]:
        res = BenchmarkResult(
            workload="ny_taxi",
            sf_dir="/root/testdata/sf0.001",
            iteration=0,
            measurements={"Query1": t1, "Query2": 2 * t1, "total": 3 * t1},
            params={"sf": "0.001", "threads": backend},  # sf constant, threads varies
        )
        db.report(res, run_id=f"run_{backend}", backend=backend, host_params={"os": "linux"})

    data = collect_report_data(db, agg="median")
    entry = data["benchmarks"]["ny_taxi"]
    assert sorted(entry["backends"]) == ["local", "local32"]
    assert "sf" in entry["hidden_param_rows"]  # constant across backends → hidden
    assert "threads" in entry["visible_param_rows"]
    assert entry["backends"]["local"]["Query1"] == 1.5

    out = build_report(db, str(tmp_path / "report.xlsx"))
    assert out.endswith(".xlsx")
    with zipfile.ZipFile(out) as z:
        names = set(z.namelist())
        # required package parts
        for part in (
            "[Content_Types].xml",
            "_rels/.rels",
            "xl/workbook.xml",
            "xl/_rels/workbook.xml.rels",
            "xl/styles.xml",
            "xl/worksheets/sheet1.xml",
        ):
            assert part in names, part
        # every part is well-formed XML
        for n in names:
            ET.fromstring(z.read(n))
        # 3 stages → 3 chart parts wired through a drawing
        charts = [n for n in names if n.startswith("xl/charts/chart")]
        assert len(charts) == 3, charts
        assert "xl/drawings/drawing1.xml" in names
        sheet1 = z.read("xl/worksheets/sheet1.xml").decode()
        assert 'hidden="1"' in sheet1  # constant config row hidden
        assert "Query1" in sheet1 and "local32" in sheet1
        chart1 = z.read(charts[0]).decode()
        assert "barChart" in chart1 and "ny_taxi" in chart1  # series refs sheet
        # HostInfo sheet exists and carries the host row
        wb = z.read("xl/workbook.xml").decode()
        assert "HostInfo" in wb
    # HTML twin still renders on request
    html_out = build_report(db, str(tmp_path / "report.html"))
    text = open(html_out).read()
    assert "ny_taxi" in text and "Query1" in text and "HostInfo" in text
    db.close()


def test_report_cli(tmp_path):
    from timedf_spark.benchmark import BenchmarkResult
    from timedf_spark.report import xlsx_report

    db = BenchmarkDb(str(tmp_path / "res.sqlite"))
    res = BenchmarkResult(
        workload="plasticc", sf_dir="x", iteration=0, measurements={"t_etl": 1.0}
    )
    db.report(res, run_id="r", host_params={})
    db.close()
    rc = xlsx_report.main(
        ["-db_file", str(tmp_path / "res.sqlite"), "-report_path", str(tmp_path / "rep.html")]
    )
    assert rc == 0
    assert (tmp_path / "rep.html").exists()
