"""Round-12 tier: semantic cross-checks beyond the differential oracle.

The oracle suite pins value equality; these pin properties an equal-
but-wrong oracle pair could share (both engines running the same
mistaken arithmetic), via independent Python recomputation.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from timedf_spark.operators.labelprop import label_propagation
from timedf_spark.queries.round12 import acf_daily, benford_prices, fd_profile
from timedf_spark.sources import load_table


def test_label_propagation_known_graph(spark):
    """Two triangles joined by one bridge edge: 4 synchronous rounds
    must give each triangle one community (min-label tie-break), with
    the bridge not merging them (density wins over connectivity)."""
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["node"])
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)], ["a", "b"]
    )
    got = {r["node"]: r["label"] for r in label_propagation(nodes, edges, 4).collect()}
    assert len(set(got.values())) == 2
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]


def test_label_propagation_isolated_node_keeps_label(spark):
    nodes = spark.createDataFrame([(1,), (2,), (99,)], ["node"])
    edges = spark.createDataFrame([(1, 2)], ["a", "b"])
    got = {r["node"]: r["label"] for r in label_propagation(nodes, edges, 3).collect()}
    assert got[99] == 99
    assert got[1] == got[2] == 1


def test_acf_matches_python_recomputation(spark, sf_dir):
    """Recompute one (type, day) series' quantized ACF in plain Python
    and compare the per-type mean contribution path end-to-end."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.date_trunc("day", "ts").alias("d"), "ts", "event_id", "value")
        .orderBy("event_type", "d", "ts", "event_id")
        .collect()
    )
    series: dict = {}
    for r in rows:
        series.setdefault((r["event_type"], r["d"]), []).append(int(r["value"] // 1))
    def tdiv(a: int, b: int) -> int:
        # Spark DIV and DuckDB // truncate toward zero; Python // floors.
        return (abs(a) // abs(b)) * (1 if (a >= 0) == (b >= 0) else -1)

    per_type: dict = {}
    for (et, _), xs in series.items():
        n, s = len(xs), sum(xs)
        ys = [n * x - s for x in xs]
        den = sum(y * y for y in ys)
        accs = []
        for k in (1, 2, 3):
            num = sum(ys[i] * ys[i - k] for i in range(k, len(ys)))
            accs.append(tdiv(num, max(den // 10_000, 1)) if den else 0)
        per_type.setdefault(et, []).append(accs)
    expect = {
        et: tuple(
            tdiv(sum(day[j] for day in days), len(days)) for j in range(3)
        )
        for et, days in per_type.items()
    }
    got = {
        r["event_type"]: (r["acf1_scaled"], r["acf2_scaled"], r["acf3_scaled"])
        for r in acf_daily(spark, sf_dir).collect()
    }
    assert got == expect


def test_fd_profile_flags_real_violations(spark, sf_dir):
    prof = {r["fd"]: r for r in fd_profile(spark, sf_dir).collect()}
    # documents.source->lang cannot hold (sources mix languages) and a
    # violating FD must report violating_lhs consistent with max fanout.
    for r in prof.values():
        assert r["max_rhs_per_lhs"] >= 1
        if r["violating_lhs"] == 0:
            assert r["max_rhs_per_lhs"] == 1
        else:
            assert r["max_rhs_per_lhs"] > 1


def test_benford_digits_partition_orders(spark, sf_dir):
    """Digit counts must partition the order count exactly and the
    digit extraction must agree with Python's."""
    rows = benford_prices(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders
    prices = [
        r["o_totalprice"]
        for r in load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    ]
    expect = Counter(str(int(p * 100 // 1))[0] for p in prices)
    got = {str(r["digit"]): r["n_orders"] for r in rows}
    assert got == {d: c for d, c in expect.items()}
