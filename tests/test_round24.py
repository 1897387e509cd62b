"""Round-24 queries: semantic pins + physical-plan audits (the scale
properties each query claims in its docstring)."""

from __future__ import annotations

import os

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


def test_trigrams_no_join_single_window(spark):
    """The trigram stream comes from two lead()s over ONE user-partitioned
    window — no self-join anywhere (the naive form joins events to
    events twice)."""
    plan = _executed_plan(spark, "event_type_trigrams")
    assert "Join" not in plan, plan
    assert plan.count("Window") == 1, plan


def test_sorted_neighborhood_no_join(spark):
    """Sorted-neighborhood blocking must unfold candidates from the
    window + Generate — never a self-join (the naive rank-band form) and
    never a cartesian product."""
    plan = _executed_plan(spark, "sorted_neighborhood_pairs")
    assert "Join" not in plan, plan
    assert "Generate" in plan, plan
    assert plan.count("Window") == 1, plan


def test_ivm_delta_joins_are_delta_sized(spark):
    """The IVM identity's ΔC-sided joins must broadcast the delta (never
    shuffle the base fact table for it), and nothing may degenerate to a
    cartesian/nested-loop product."""
    plan = _executed_plan(spark, "ivm_join_delta")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_drawdown_semantics_match_bruteforce(spark):
    """Per-customer drawdown equals a driver-side recomputation on a
    sample of customers (the centered-series contract)."""
    rows = all_queries()["customer_drawdown"].fn(spark, SF_SMALL).collect()
    assert rows, "no drawdowns found"
    got = {r["o_custkey"]: (r["max_drawdown"], r["n_orders"]) for r in rows}
    some = list(got)[:5]
    o = (
        load_table(spark, SF_SMALL, "orders")
        .where(F.col("o_custkey").isin(some))
        .select(
            "o_custkey",
            "o_orderdate",
            "o_orderkey",
            F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
        )
        .collect()
    )
    by_cust: dict = {}
    for r in o:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    for ck, rs in by_cust.items():
        rs.sort(key=lambda r: (r["o_orderdate"], r["o_orderkey"]))
        n = len(rs)
        total = sum(r["cents"] for r in rs)
        cum = peak = 0
        dd = 0
        first = True
        for r in rs:
            cum += n * r["cents"] - total
            peak = cum if first else max(peak, cum)
            first = False
            dd = max(dd, peak - cum)
        assert got[ck] == (dd, n), (ck, got[ck], (dd, n))


def test_twap_is_between_min_and_max_value(spark):
    """A weighted mean of floor(value) must land inside the per-type
    [min, max] envelope (scaled)."""
    env = {
        r["event_type"]: r
        for r in load_table(spark, SF_SMALL, "events")
        .groupBy("event_type")
        .agg(
            F.min(F.floor("value")).alias("lo"),
            F.max(F.floor("value")).alias("hi"),
        )
        .collect()
    }
    for r in all_queries()["twap_value"].fn(spark, SF_SMALL).collect():
        e = env[r["event_type"]]
        # twap_scaled ≈ 10000 * weighted mean (guarded division slack ≤ 1 unit)
        assert 10_000 * e["lo"] - 10_000 <= r["twap_scaled"] <= 10_000 * (e["hi"] + 1)


def test_fano_poissonish_baseline(spark):
    """Uniformly-timestamped synthetic events are ~Poisson per minute →
    Fano factor near 1 (scaled 10000); assert a generous sanity band and
    positivity (a broken span/zero-minute treatment lands far outside)."""
    rows = all_queries()["fano_burstiness"].fn(spark, SF_SMALL).collect()
    assert rows
    for r in rows:
        assert 0 < r["fano_scaled"] < 100_000, r


def test_ivm_delta_equals_recompute_diff_sparkside(spark):
    """Spark-vs-Spark twin of the oracle contract: the incremental delta
    equals full view minus base view (exceptAll), independent of DuckDB."""
    qs = all_queries()
    delta = qs["ivm_join_delta"].fn(spark, SF_SMALL)
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("price_cents"),
    )
    c = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_mktsegment")
    full = o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey", "o_custkey", "price_cents", "c_mktsegment"
    )
    base = (
        o.where("NOT (o_orderkey % 17 = 3)")
        .join(
            c.where("NOT (c_custkey % 13 = 5)"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("o_orderkey", "o_custkey", "price_cents", "c_mktsegment")
    )
    want = sorted(map(tuple, full.exceptAll(base).collect()))
    got = sorted(map(tuple, delta.collect()))
    assert got == want and len(got) > 0
