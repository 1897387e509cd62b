"""Round-28: gaps-and-islands streaks — brute-force twin + plan pin."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from timedf_spark.queries import all_queries
from timedf_spark.sources.readers import load_table

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_DAY_US = 86_400_000_000


def test_streak_histogram_matches_python_brute(spark):
    rows = all_queries()["activity_streaks"].fn(spark, SF_SMALL).collect()
    assert rows and sum(r["n_users"] for r in rows) > 0
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day"))
        .distinct()
        .collect()
    )
    by_user: dict = {}
    for r in ev:
        by_user.setdefault(r["user_id"], set()).add(r["day"])
    hist: dict = {}
    for days in by_user.values():
        best = cur = 0
        prev = None
        for d in sorted(days):
            cur = cur + 1 if prev is not None and d == prev + 1 else 1
            best = max(best, cur)
            prev = d
        hist[best] = hist.get(best, 0) + 1
    got = {r["best_streak"]: r["n_users"] for r in rows}
    assert got == hist
    # histogram covers every user exactly once
    assert sum(hist.values()) == len(by_user)


def test_streaks_single_user_window_no_join(spark):
    spark.catalog.clearCache()
    df = all_queries()["activity_streaks"].fn(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan
