"""Round-26 queries: semantic pins (brute-force twins) + physical-plan
audits for the scale claims in the module docstring."""

from __future__ import annotations

import math
import os

import numpy as np

from pyspark.sql import functions as F

from timedf_spark.queries import all_queries
from timedf_spark.sources.readers import load_table

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

_DAY_US = 86_400_000_000


def _executed_plan(spark, name: str) -> str:
    spark.catalog.clearCache()
    df = all_queries()[name].fn(spark, SF_SMALL)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_nelson_aalen_matches_lifelines_style_brute(spark):
    """Risk sets, event counts, and quantized hazard steps equal a
    driver-side recomputation from the raw per-user durations."""
    rows = all_queries()["nelson_aalen_conversion"].fn(spark, SF_SMALL).collect()
    assert rows
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("user_id", F.expr("unix_micros(ts)").alias("us"), "event_type")
        .collect()
    )
    users: dict = {}
    for r in ev:
        u = users.setdefault(r["user_id"], {"t0": r["us"], "tl": r["us"], "tc": None})
        u["t0"] = min(u["t0"], r["us"])
        u["tl"] = max(u["tl"], r["us"])
        if r["event_type"] == "purchase":
            u["tc"] = r["us"] if u["tc"] is None else min(u["tc"], r["us"])
    durs = [
        (((u["tc"] if u["tc"] is not None else u["tl"]) - u["t0"]) // _DAY_US,
         u["tc"] is not None)
        for u in users.values()
    ]
    cum = 0
    got = {r["day"]: r for r in rows}
    for day in sorted({d for d, _ in durs}):
        n_risk = sum(1 for d, _ in durs if d >= day)
        d_events = sum(1 for d, e in durs if d == day and e)
        if d_events == 0:
            assert day not in got
            continue
        step = d_events * 10_000 // n_risk
        cum += step
        r = got[day]
        assert (r["n_risk"], r["d_events"], r["hazard_bp"], r["cum_hazard_bp"]) == (
            n_risk, d_events, step, cum
        ), (day, r)
    # cumulative hazard is nondecreasing by construction
    cums = [r["cum_hazard_bp"] for r in rows]
    assert cums == sorted(cums)


def test_cuped_reduces_or_preserves_mean_gap(spark):
    """CUPED sanity: θ is finite, both variants present, and the
    adjustment equals mean_post − θ·(mean_pre_v − mean_pre_pooled)
    recomputed driver-side."""
    rows = all_queries()["cuped_adjusted_ab"].fn(spark, SF_SMALL).collect()
    assert {r["bucket"] for r in rows} == {0, 1}
    for r in rows:
        assert math.isfinite(r["theta"])
        assert math.isfinite(r["adj_mean_post"])
    # driver-side recomputation of theta from the same cents quantization
    ev = load_table(spark, SF_SMALL, "events").select("user_id", "ts", "value")
    span0 = ev.agg(F.min(F.expr("unix_micros(ts)"))).collect()[0][0]
    pu = (
        ev.select(
            "user_id",
            F.expr(f"CAST((unix_micros(ts) - {span0}) DIV {_DAY_US} AS BIGINT)").alias(
                "day"
            ),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("day") < 15, F.col("cents")).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("day") >= 15, F.col("cents")).otherwise(0)).alias("y"),
        )
        .toPandas()
    )
    x, y = pu["x"].to_numpy(np.float64), pu["y"].to_numpy(np.float64)
    theta = ((len(x) * (x * y).sum() - x.sum() * y.sum())
             / (len(x) * (x * x).sum() - x.sum() * x.sum()))
    for r in rows:
        assert abs(r["theta"] - theta) < 1e-6 * max(1.0, abs(theta))


def test_fs_scores_are_field_weight_sums(spark):
    """Every emitted pair's score equals the recomputed field-agreement
    weight sum, and pairs obey the neighborhood contract (same size
    block, within-window price ranks)."""
    rows = all_queries()["fs_match_scores"].fn(spark, SF_SMALL).collect()
    assert rows
    parts = {
        r["p_partkey"]: r
        for r in load_table(spark, SF_SMALL, "part")
        .select("p_partkey", "p_brand", "p_type", "p_size", "p_retailprice")
        .collect()
    }
    for r in rows:
        a, b = parts[r["a_key"]], parts[r["b_key"]]
        assert a["p_size"] == b["p_size"] == r["p_size"]
        want = (
            (4 if a["p_brand"] == b["p_brand"] else -4)
            + (3 if a["p_type"] == b["p_type"] else -3)
            + (2 if abs(a["p_retailprice"] - b["p_retailprice"]) <= 5.0 else -2)
        )
        assert r["score"] == want >= 1
        assert r["band"] == ("match" if want >= 5 else "possible")


def test_neyman_allocation_brute(spark):
    rows = all_queries()["neyman_allocation"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 3  # A, N, R
    li = load_table(spark, SF_SMALL, "lineitem").selectExpr(
        "l_returnflag AS stratum", "CAST(floor(l_extendedprice) AS BIGINT) AS v"
    ).toPandas()
    wq = {}
    for s, g in li.groupby("stratum"):
        v = g["v"].to_numpy(np.float64)
        sigma = math.sqrt(((len(v) * (v * v).sum() - v.sum() ** 2)) / len(v) ** 2)
        wq[s] = math.floor(len(v) * sigma)
    total_q = sum(wq.values())
    for r in rows:
        assert r["n_h"] == int((li["stratum"] == r["stratum"]).sum())
        # w_h within float tolerance of the brute weight
        assert abs(r["w_h"] - wq[r["stratum"]]) <= max(2.0, 1e-9 * wq[r["stratum"]])
        assert r["alloc_n"] == 10_000 * math.floor(r["w_h"]) // total_q
    # allocation sums to ≈ the target (truncating DIV slack ≤ #strata)
    assert 10_000 - 3 <= sum(r["alloc_n"] for r in rows) <= 10_000


# ------------------------------------------------------------------ plans


def test_nelson_aalen_windows_after_day_grain(spark):
    """Both global-order windows run over the day-grain grid (≤ span
    days rows); no shuffled join anywhere."""
    plan = _executed_plan(spark, "nelson_aalen_conversion")
    assert "SortMergeJoin" not in plan, plan


def test_fs_single_window_no_join(spark):
    """All 3×4 leads ride ONE partitioned window; candidates unfold via
    Generate (stack) — no join, no second sort of part."""
    plan = _executed_plan(spark, "fs_match_scores")
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan
    assert "Generate" in plan, plan


def test_cuped_single_user_grain_shuffle(spark):
    """CUPED reads events once: user-grain aggregation feeds both the
    pooled moments and the per-variant stats; the pooled side joins back
    as a 1-row broadcast (BNLJ scalar assembly), never a shuffled join."""
    plan = _executed_plan(spark, "cuped_adjusted_ab")
    assert "SortMergeJoin" not in plan, plan
