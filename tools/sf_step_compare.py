"""Real-testdata 10x scale step for lineitem/star-schema queries.

The generated 10x set (tools/gen_scale.py) carries only
documents/embeddings/events/orders, so queries over lineitem/supplier/
customer/nation measure their scale step on the REAL sf0.01 → sf0.1
testdata instead — also a true 10x in rows at matched distributions
(constant co-purchase degree, 10x keys). Reports wall-times and the
observed exponent log(t10/t1)/log(10), merged into SCALE_SHAKEOUT.json
under "sf_step_queries".

Usage: SF_STEP_QUERIES="a,b" python tools/sf_step_compare.py
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timedf_spark.queries import all_queries  # noqa: E402
from timedf_spark.session import get_spark  # noqa: E402
from timedf_spark.sources import trigger  # noqa: E402

QUERIES = [
    "copurchase_kcore",
    "nation_revenue_trend",
    "orders_snapshot_diff",
    "customer_anonymity_audit",
    "price_decile_bin",
    "nation_seed_ppr",
]
_sel = os.environ.get("SF_STEP_QUERIES")
if _sel:
    QUERIES = [q.strip() for q in _sel.split(",") if q.strip()]

ITERS = int(os.environ.get("SF_STEP_ITERS", "2"))
SF1 = "/root/testdata/sf0.01"
SF10 = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "SCALE_SHAKEOUT.json")


def _median_time(spark, fn, sf_dir):
    times = []
    fn(spark, sf_dir).count()  # warm
    for _ in range(ITERS):
        spark.catalog.clearCache()
        t0 = time.time()
        trigger(fn(spark, sf_dir))
        times.append(time.time() - t0)
    return statistics.median(times)


def main() -> None:
    spark = get_spark()
    qs = all_queries()
    report = {}
    for name in QUERIES:
        fn = qs[name].fn
        t1 = _median_time(spark, fn, SF1)
        t10 = _median_time(spark, fn, SF10)
        exp = math.log(t10 / t1) / math.log(10.0)
        report[name] = {
            "t1_sec": round(t1, 3),
            "t10_sec": round(t10, 3),
            "exponent": round(exp, 2),
        }
        print(name, report[name], file=sys.stderr)
    merged = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            merged = json.load(f)
    merged.setdefault("sf_step_queries", {}).update(report)
    with open(OUT, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({"sf_step_queries": report}))


if __name__ == "__main__":
    main()
