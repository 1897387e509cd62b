"""benchmark-run-compatible CLI (capability parity with
timedf/arg_parser.py:100-212 + timedf/scripts/benchmark_run.py:52-122).

    python -m timedf_spark.cli ny_taxi -data_file /root/testdata/sf0.1 \
        -backend local -iterations 3 -db_file results.sqlite

The reference's ``-backend`` axis (pandas/modin/hdk) becomes a Spark conf
profile name (session.PROFILES); everything else keeps its shape: N timed
iterations, per-stage measurements, results into the warehouse DB, peak
memory per run.
"""

from __future__ import annotations

import argparse
import json
import uuid

from timedf_spark.benchmark import REGISTRY, run_workload
from timedf_spark.report.db import BenchmarkDb
from timedf_spark.report.host import MemoryTracker, host_params
from timedf_spark.session import PROFILES, get_spark


def make_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="benchmark-run", description=__doc__)
    p.add_argument("benchmark", choices=sorted(REGISTRY), help="workload name")
    p.add_argument("-data_file", default="/root/testdata/sf0.01", help="sf dir with parquet tables")
    p.add_argument("-backend", default="local", choices=sorted(PROFILES), help="Spark conf profile")
    p.add_argument("-iterations", type=int, default=1)
    p.add_argument("-db_file", default=None, help="sqlite results path (default: no persistence)")
    p.add_argument("-verbosity", type=int, default=0)
    return p


def main(argv: list[str] | None = None) -> int:
    args = make_parser().parse_args(argv)
    spark = get_spark(profile=args.backend, app_name=f"timedf_spark::{args.benchmark}")
    workload = REGISTRY[args.benchmark]
    run_id = uuid.uuid4().hex[:12]
    db = BenchmarkDb(args.db_file) if args.db_file else None
    tracker = MemoryTracker()
    tracker.start()
    for it in range(args.iterations):
        result = run_workload(
            spark, workload, args.data_file, iteration=it, verbosity=args.verbosity
        )
        if db:
            db.report(result, run_id=run_id, backend=args.backend, host_params=host_params())
        print(json.dumps({"iteration": it, **{k: round(v, 4) for k, v in result.measurements.items()}}))
    peak = tracker.stop()
    print(json.dumps({"run_id": run_id, "max_memory_mb": round(peak, 1)}))
    if db:
        agg = db.aggregate(run_id)
        print(json.dumps({"median": {f"{b}.{n}": round(v, 4) for (b, n), v in agg.items()}}))
        db.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
