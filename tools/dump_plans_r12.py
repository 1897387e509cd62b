"""Dump `.explain("formatted")` for named queries to plans/r12/<q>_<tag>.txt.

Usage: PYTHONPATH=. python tools/dump_plans_r12.py <tag> <query> [<query> ...]

Planning only for pure-dataflow queries; queries with internal eager
checkpoints / driver fast paths execute those parts while the frame is
built (their final plan then shows the checkpoint boundary as a
LogicalRDD/LocalTableScan — for changes INSIDE such a boundary see
tools/dump_subplans_r12.py). Plans are captured at the bench scale
(sf0.1 default) so join-strategy choices match what the bench measures.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timedf_spark.queries import all_queries  # noqa: E402
from timedf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_plans_r12")
    qs = all_queries()
    for name in names:
        df = qs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain(formatted) at {SF_DIR} [{tag}]\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
