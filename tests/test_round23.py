"""Round-23 query semantics beyond the oracle hash: invariants that
pin the guards (degree cap, band partition, cumulative exactness,
anomaly detection on a planted spike) rather than just value equality."""

from __future__ import annotations

import pyspark.sql.functions as F

from timedf_spark.queries import all_queries
from timedf_spark.sources.readers import load_table

SF = "/root/testdata/sf0.001"


def _q(name):
    return all_queries()[name]


def test_copart_links_rank_dense_and_degree_guard_bites(spark):
    # sf0.01: max part degree is 41 > the 25 guard, so the hot-part
    # exclusion is actually exercised where the driver hashes the query
    # (at sf0.001 every part sits under the guard)
    sf = "/root/testdata/sf0.01"
    rows = _q("supplier_copart_links").fn(spark, sf).collect()
    assert rows
    per_a = {}
    for r in rows:
        per_a.setdefault(r["supp_a"], []).append(r["link_rank"])
    for a, ranks in per_a.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), a
    sp = (
        load_table(spark, sf, "lineitem")
        .select("l_suppkey", "l_partkey")
        .distinct()
    )
    hot = (
        sp.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") > 25)
        .count()
    )
    assert hot > 0, "testdata has no hot part; guard untested"


def test_price_bands_partition_every_line(spark):
    out = {r["band"]: r["n_lines"] for r in _q("price_band_revenue").fn(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    part = load_table(spark, SF, "part")
    joined = li.join(part, li.l_partkey == part.p_partkey).count()
    assert sum(out.values()) == joined  # bands cover the price domain exactly once


def test_ltv_cumulative_is_exact_total_and_monotone(spark):
    rows = _q("customer_ltv_cohorts").fn(spark, SF).collect()
    per_cohort = {}
    for r in rows:
        per_cohort.setdefault(r["cohort_month"], []).append(r)
    for c, rs in per_cohort.items():
        rs.sort(key=lambda r: r["age_months"])
        run = 0.0
        for r in rs:
            run = round(run + r["month_revenue"], 2)
            assert abs(r["cumulative_ltv"] - run) < 1e-9, (c, r)
    # grand total equals the quantized orders total
    total = round(sum(r["month_revenue"] for r in rows), 2)
    orders_q = (
        load_table(spark, SF, "orders")
        .agg(F.expr("sum(cast(floor(o_totalprice * 100.0 + 0.5) as bigint))"))
        .first()[0]
    )
    assert total == round(orders_q / 100.0, 2)


def test_daily_anomaly_flags_planted_spike(spark, tmp_path):
    """Synthetic series: flat revenue with one 10x day — exactly that day
    must be flagged (first 6 days lack a full window by design)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    okey = 0
    for d in range(30):
        n = 10
        price = 1000.0 if d != 20 else 10000.0
        for _ in range(n):
            rows.append((okey, 1, "O", price, base + dt.timedelta(days=d), "1-URGENT"))
            okey += 1
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    out = str(tmp_path / "orders.parquet")
    df.write.mode("overwrite").parquet(out)
    d = str(tmp_path)
    flagged = [
        r["day"] for r in _q("daily_revenue_anomaly").fn(spark, d).collect()
    ]
    assert flagged == [dt.date(2024, 1, 21)]


def test_aging_buckets_cover_all_ordered_orders(spark):
    out = _q("order_priority_aging").fn(spark, SF).collect()
    n_bucketed = sum(r["n_orders"] for r in out)
    li_orders = load_table(spark, SF, "lineitem").select("l_orderkey").distinct()
    orders = load_table(spark, SF, "orders").select("o_orderkey")
    assert n_bucketed == orders.join(
        li_orders, orders.o_orderkey == li_orders.l_orderkey
    ).count()
    assert {r["age_bucket"] for r in out} <= {"0-30", "31-60", "61-90", "90+"}


def test_lead_time_percentiles_ordered(spark):
    for r in _q("nation_lead_time_profile").fn(spark, SF).collect():
        assert r["p50_days"] <= r["p90_days"]
        assert r["n_lines"] > 0


def test_event_hour_grid_shares_sum_to_one(spark):
    rows = _q("event_hour_grid").fn(spark, SF).collect()
    per_type = {}
    for r in rows:
        assert 0 <= r["hour"] <= 23
        per_type.setdefault(r["event_type"], []).append(r["share_bp"])
    for t, bps in per_type.items():
        # truncating division: total in (10000 - n_cells, 10000]
        assert 10000 - len(bps) < sum(bps) <= 10000, t


def test_wallet_share_bounds_and_rank(spark):
    rows = _q("supplier_share_of_wallet").fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["share_bp"] <= 10000
        assert r["n_suppliers"] >= 1
        # a top supplier's share can't be below an equal split
        assert r["share_bp"] >= 10000 // r["n_suppliers"] - 1


def test_seasonality_index_sums_to_twelve_flat_units(spark):
    rows = _q("brand_seasonality_index").fn(spark, SF).collect()
    per_brand = {}
    for r in rows:
        assert 1 <= r["ship_month"] <= 12
        per_brand.setdefault(r["p_brand"], []).append(r["season_idx_bp"])
    for b, idxs in per_brand.items():
        # truncating division: total within n_cells of 12 x 10000
        assert 120000 - len(idxs) < sum(idxs) <= 120000, b


def test_concentration_share_bounds(spark):
    rows = _q("customer_concentration").fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 < r["top5_share_bp"] <= 10000
        # 5 of n customers hold at least ~5/n of revenue
        if r["n_customers"] > 5:
            assert r["top5_share_bp"] >= (5 * 10000) // r["n_customers"] - 1


def test_discount_bands_cover_all_lines(spark):
    rows = _q("discount_return_rates").fn(spark, SF).collect()
    assert sum(r["n_lines"] for r in rows) == load_table(
        spark, SF, "lineitem"
    ).count()
    for r in rows:
        assert 0 <= r["return_rate_bp"] <= 10000


def test_cadence_percentiles_ordered(spark):
    rows = _q("repeat_purchase_intervals").fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["p50_gap_days"] <= r["p90_gap_days"]
