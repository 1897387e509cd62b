"""Round-27 queries: semantic pins (brute-force twins) + physical-plan
audits for the scale claims in the module docstring."""

from __future__ import annotations

import math
import os

import numpy as np

from pyspark.sql import functions as F

from timedf_spark.queries import all_queries
from timedf_spark.sources.readers import load_table

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _executed_plan(spark, name: str) -> str:
    spark.catalog.clearCache()
    df = all_queries()[name].fn(spark, SF_SMALL)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_ipf_margins_converge_toward_targets(spark):
    """After two sweeps the column margins match their targets exactly
    (the last step scales columns) and row margins are within the
    quantization + one-sweep residual band."""
    rows = all_queries()["ipf_raking"].fn(spark, SF_SMALL).collect()
    assert rows
    o = load_table(spark, SF_SMALL, "orders").selectExpr(
        "o_custkey", "o_orderstatus",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
    )
    c = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_nationkey")
    pdf = (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_nationkey", "o_orderstatus", "cents")
        .toPandas()
    )
    n_total = len(pdf)
    rev_total = pdf["cents"].sum()
    # column targets (status margins)
    col_t = {
        s: n_total * (g["cents"].sum() / rev_total)
        for s, g in pdf.groupby("o_orderstatus")
    }
    got_col: dict = {}
    for r in rows:
        got_col[r["o_orderstatus"]] = got_col.get(r["o_orderstatus"], 0) + r[
            "raked_w_milli"
        ]
    for s, t in col_t.items():
        # milli-units; floor quantization loses < 1 milli-unit per cell
        assert abs(got_col[s] / 1000.0 - t) < 0.1, (s, got_col[s] / 1000.0, t)
    # weights are nonnegative and the grand total is preserved
    assert all(r["raked_w_milli"] >= 0 for r in rows)
    assert abs(sum(r["raked_w_milli"] for r in rows) / 1000.0 - n_total) < 0.5


def test_reconciliation_buckets_partition_all_orders(spark):
    rows = all_queries()["order_reconciliation_report"].fn(spark, SF_SMALL).collect()
    n_bucketed = sum(r["n_orders"] for r in rows)
    li = load_table(spark, SF_SMALL, "lineitem").select("l_orderkey").distinct()
    o = load_table(spark, SF_SMALL, "orders").select("o_orderkey")
    n_joined = o.join(li, o.o_orderkey == li.l_orderkey).count()
    assert n_bucketed == n_joined > 0
    for r in rows:
        assert r["bucket"] in {"exact", "within_1", "header_over", "lines_over"}
        if r["bucket"] == "exact":
            assert r["abs_drift_cents"] == 0
        if r["bucket"] == "within_1":
            assert 0 < r["max_abs_cents"] <= 100


def test_backtest_matches_numpy_brute(spark):
    row = all_queries()["forecast_backtest_naive"].fn(spark, SF_SMALL).collect()[0]
    daily = (
        load_table(spark, SF_SMALL, "orders")
        .selectExpr(
            "CAST(o_orderdate AS DATE) AS day",
            "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
        )
        .groupBy("day")
        .agg(F.sum("cents").alias("rev"))
        .orderBy("day")
        .toPandas()
    )
    rev = daily["rev"].to_numpy(np.int64)
    naive = np.abs(rev[7:] - rev[6:-1]).sum()
    snaive = np.abs(rev[7:] - rev[:-7]).sum()
    assert row["n_days"] == len(rev) - 7
    assert row["naive_abs_err"] == naive
    assert row["snaive_abs_err"] == snaive
    assert row["snaive_vs_naive_bp"] == snaive * 10_000 // max(naive, 1)


def test_heaping_shares_sum_and_uniform_band(spark):
    rows = all_queries()["price_heaping_audit"].fn(spark, SF_SMALL).collect()
    assert {r["bucket"] for r in rows} <= {"ends_00", "ends_50", "ends_99", "other"}
    total_share = sum(r["share_bp"] for r in rows)
    assert 10_000 - len(rows) <= total_share <= 10_000  # truncating DIV slack
    # synthetic uniform prices: every ending's lift should be loosely
    # around 10000 bp (no heaping planted) — assert a generous band
    for r in rows:
        assert 2_000 < r["lift_bp"] < 50_000, r


# ------------------------------------------------------------------ plans


def test_ipf_sweeps_are_broadcast_only(spark):
    """Every margin-scale join is a broadcast over the 75-cell grid —
    no shuffled join in the sweep chain."""
    plan = _executed_plan(spark, "ipf_raking")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_reconciliation_single_order_grain_join(spark):
    """One aggregation to order grain, one join on the natural key —
    no window, no nested-loop anything."""
    plan = _executed_plan(spark, "order_reconciliation_report")
    assert "BroadcastNestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_backtest_single_window_day_grain(spark):
    """Both lags ride ONE global-order window over the day grid."""
    plan = _executed_plan(spark, "forecast_backtest_naive")
    assert plan.count("Window") == 1, plan
    assert "Join" not in plan, plan
