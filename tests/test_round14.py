"""Round-14 tier: independent semantic checks beyond the oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from timedf_spark.queries.round14 import (
    engagement_upset,
    haar_energy,
    layout_advisor,
    weighted_median_price,
)
from timedf_spark.sources import load_table


def test_upset_masks_partition_users(spark, sf_dir):
    rows = engagement_upset(spark, sf_dir).collect()
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 1 <= r["mask"] <= 31
        assert bin(r["mask"]).count("1") == r["n_types"]


def test_weighted_median_crossing_property(spark, sf_dir):
    """At the reported median m: weight below m < W/2 <= weight at-or-
    below m — the defining property, recomputed independently."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    per_flag: dict = {}
    for r in li:
        per_flag.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], int(r["l_quantity"]))
        )
    got = {
        r["l_returnflag"]: r["wmedian_price"]
        for r in weighted_median_price(spark, sf_dir).collect()
    }
    for flag, pairs in per_flag.items():
        m = got[flag]
        W = sum(q for _, q in pairs)
        below = sum(q for p, q in pairs if p < m)
        at_or_below = sum(q for p, q in pairs if p <= m)
        assert 2 * below < W <= 2 * at_or_below, (flag, m, below, at_or_below, W)


def test_haar_energy_python_recomputation(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "ts", "event_id", "value")
        .orderBy("event_type", "ts", "event_id")
        .collect()
    )
    series: dict = {}
    for r in rows:
        series.setdefault(r["event_type"], []).append(int(r["value"] // 1))
    expect = {}
    for et, xs in series.items():
        cur = xs
        es = []
        for _ in range(3):
            pairs = [(cur[2 * i], cur[2 * i + 1]) for i in range(len(cur) // 2)]
            es.append(sum((a - b) ** 2 for a, b in pairs))
            cur = [a + b for a, b in pairs]
        expect[et] = tuple(es)
    got = {
        r["event_type"]: (r["energy1"], r["energy2"], r["energy3"])
        for r in haar_energy(spark, sf_dir).collect()
    }
    assert got == expect


def test_layout_advisor_bytes_and_skew(spark, sf_dir):
    rows = {r["table_key"]: r for r in layout_advisor(spark, sf_dir).collect()}
    # Independent byte recount for orders (8B x 4 numerics + status +
    # priority byte lengths).
    orders = load_table(spark, sf_dir, "orders").collect()
    total = sum(
        32 + len(r["o_orderstatus"].encode()) + len(r["o_orderpriority"].encode())
        for r in orders
    )
    r = rows["orders/o_custkey"]
    assert r["n_rows"] == len(orders)
    assert r["payload_mb"] == total // 1048576
    assert r["rec_partitions"] == (total + 128 * 1024**2 - 1) // (128 * 1024**2)
    assert r["skew_x1000"] >= 1000  # max >= mean always
