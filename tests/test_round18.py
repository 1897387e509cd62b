"""Round-18: drift and stickiness — independent Python recomputation."""

from __future__ import annotations

from datetime import timedelta

from timedf_spark.queries.round18 import price_drift_tvd, stickiness_dau_wau
from timedf_spark.sources import load_table


def test_tvd_shares_and_partition(spark, sf_dir):
    rows = price_drift_tvd(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_early"] + r["n_late"] for r in rows) == n_orders
    te = sum(r["n_early"] for r in rows)
    tl = sum(r["n_late"] for r in rows)
    for r in rows:
        assert r["early_bp"] == r["n_early"] * 10_000 // te
        assert r["late_bp"] == r["n_late"] * 10_000 // tl
        assert r["abs_diff_bp"] == abs(r["early_bp"] - r["late_bp"])


def test_stickiness_python_recomputation(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events").select("user_id", "ts").collect()
    )
    by_day: dict = {}
    for r in rows:
        day = r["ts"].date()
        by_day.setdefault(day, set()).add(r["user_id"])
    expect = {}
    for day, users in by_day.items():
        wau_set = set()
        for k in range(7):
            wau_set |= by_day.get(day - timedelta(days=k), set())
        expect[day] = (len(users), len(wau_set), len(users) * 10_000 // len(wau_set))
    got = {
        r["day"].date(): (r["dau"], r["wau"], r["stickiness_bp"])
        for r in stickiness_dau_wau(spark, sf_dir).collect()
    }
    assert got == expect
    for dau, wau, bp in got.values():
        assert dau <= wau and 0 < bp <= 10_000
