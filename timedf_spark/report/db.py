"""Results warehouse: the reference's two-table schema on stdlib sqlite3.

Schema parity with timedf/report/schema.py:29-70 — ``iteration`` (run
metadata + host info + schemaless JSON params) 1—N ``measurement``
(name, duration_s) — without the SQLAlchemy dependency (not available
here; the reference's ORM usage is plain inserts/selects anyway,
benchmark_db.py:62-75,125-174).
"""

from __future__ import annotations

import json
import sqlite3
import time
from dataclasses import asdict

from timedf_spark.benchmark import BenchmarkResult

__all__ = ["BenchmarkDb"]

_SCHEMA = """
CREATE TABLE IF NOT EXISTS iteration (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    run_id TEXT NOT NULL,
    benchmark TEXT NOT NULL,
    backend TEXT NOT NULL,
    iteration_no INTEGER NOT NULL,
    date REAL NOT NULL,
    host_params TEXT,
    params TEXT
);
CREATE TABLE IF NOT EXISTS measurement (
    id INTEGER PRIMARY KEY AUTOINCREMENT,
    iteration_id INTEGER NOT NULL REFERENCES iteration(id),
    name TEXT NOT NULL,
    duration_s REAL NOT NULL
);
"""


class BenchmarkDb:
    def __init__(self, path: str = ":memory:") -> None:
        self.con = sqlite3.connect(path)
        self.con.executescript(_SCHEMA)

    def report(
        self,
        result: BenchmarkResult,
        run_id: str,
        backend: str = "spark",
        host_params: dict | None = None,
    ) -> int:
        cur = self.con.execute(
            "INSERT INTO iteration (run_id, benchmark, backend, iteration_no, date, host_params, params)"
            " VALUES (?,?,?,?,?,?,?)",
            (
                run_id,
                result.workload,
                backend,
                result.iteration,
                time.time(),
                json.dumps(host_params or {}),
                json.dumps({k: str(v) for k, v in result.params.items()} | {"sf_dir": result.sf_dir}),
            ),
        )
        it_id = cur.lastrowid
        self.con.executemany(
            "INSERT INTO measurement (iteration_id, name, duration_s) VALUES (?,?,?)",
            [(it_id, n, d) for n, d in result.measurements.items()],
        )
        self.con.commit()
        return int(it_id)

    def load_measurements(self, run_id: str) -> list[tuple[str, str, int, str, float]]:
        """(benchmark, backend, iteration_no, name, duration_s) rows."""
        return list(
            self.con.execute(
                "SELECT i.benchmark, i.backend, i.iteration_no, m.name, m.duration_s"
                " FROM iteration i JOIN measurement m ON m.iteration_id = i.id"
                " WHERE i.run_id = ? ORDER BY i.id, m.id",
                (run_id,),
            )
        )

    def aggregate(self, run_id: str, agg: str = "median") -> dict[tuple[str, str], float]:
        """Per (benchmark, stage) aggregate over iterations (ref xlsx -agg
        choices mean/min/max/median, report_xlsx.py:111-117)."""
        import statistics

        rows = self.load_measurements(run_id)
        acc: dict[tuple[str, str], list[float]] = {}
        for bench, _backend, _it, name, dur in rows:
            acc.setdefault((bench, name), []).append(dur)
        fn = {
            "median": statistics.median,
            "mean": statistics.fmean,
            "min": min,
            "max": max,
        }[agg]
        return {k: fn(v) for k, v in acc.items()}

    def close(self) -> None:
        self.con.close()
