"""Round-15 tier: independent semantic checks beyond the oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from timedf_spark.queries.round15 import nation_spend_gini, rfm_segments
from timedf_spark.sources import load_table


def _tdiv(a: int, b: int) -> int:
    return (abs(a) // abs(b)) * (1 if (a >= 0) == (b >= 0) else -1)


def test_gini_python_recomputation_and_bounds(spark, sf_dir):
    orders = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("c_nationkey", "o_custkey", "o_totalprice")
        .collect()
    )
    spend: dict = {}
    for r in orders:
        k = (r["c_nationkey"], r["o_custkey"])
        spend[k] = spend.get(k, 0) + int(r["o_totalprice"] * 100 // 1)
    by_nation: dict = {}
    for (nat, ck), x in spend.items():
        by_nation.setdefault(nat, []).append((x, ck))
    expect = {}
    for nat, xs in by_nation.items():
        xs.sort()
        n = len(xs)
        s = sum(x for x, _ in xs)
        ix = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        expect[nat] = _tdiv(2 * ix - (n + 1) * s, max((n * s) // 1_000_000, 1))
    got = {
        r["c_nationkey"]: r["gini_scaled"]
        for r in nation_spend_gini(spark, sf_dir).collect()
    }
    assert got == expect
    for g in got.values():
        assert 0 <= g <= 1_000_000  # Gini of non-negative spends is in [0, 1]


def test_rfm_codes_partition_customers(spark, sf_dir):
    rows = rfm_segments(spark, sf_dir).collect()
    n_buyers = (
        load_table(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r["n_customers"] for r in rows) == n_buyers
    for r in rows:
        code = r["rfm_code"]
        rq, fq, mq = code // 100, (code // 10) % 10, code % 10
        assert 1 <= rq <= 4 and 1 <= fq <= 4 and 1 <= mq <= 4
