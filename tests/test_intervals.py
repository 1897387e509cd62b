"""Grid-bucketed interval join: must EQUAL the brute-force theta join.

Attacks the canonical-cell emission where it is weakest: intervals
crossing many cells, zero-length (point) intervals, exact cell-boundary
endpoints, and touching-at-a-point intervals (inclusive ends ⇒ overlap
of 0 µs counts)."""

from __future__ import annotations

import random

from timedf_spark.operators.intervals import interval_overlap_join

_CELL = 100  # tiny cell so intervals span many cells


def _brute(rows):
    out = set()
    for i, (ia, sa, ea) in enumerate(rows):
        for ib, sb, eb in rows[i + 1 :]:
            if sa <= eb and sb <= ea:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                out.add((lo, hi, min(ea, eb) - max(sa, sb)))
    return out


def _run(spark, rows, pair_filter="a_iv < b_iv"):
    df = spark.createDataFrame(rows, "iv long, start_us long, end_us long")
    got = interval_overlap_join(df, df, cell_us=_CELL, pair_filter=pair_filter)
    return {(r["a_iv"], r["b_iv"], r["overlap_us"]) for r in got.collect()}


def test_random_intervals_match_brute_force(spark):
    rng = random.Random(5)
    rows = []
    for i in range(150):
        s = rng.randrange(0, 2000)
        rows.append((i, s, s + rng.randrange(0, 600)))  # spans up to 7 cells
    assert _run(spark, rows) == _brute(rows)


def test_boundary_and_point_intervals(spark):
    rows = [
        (0, 0, 99),      # exactly one cell
        (1, 100, 100),   # point on a cell boundary
        (2, 99, 100),    # crosses the boundary by one µs
        (3, 100, 199),   # starts on the boundary
        (4, 200, 300),   # touches 5 only at 300
        (5, 300, 400),
        (6, 50, 350),    # spans four cells, overlaps almost everyone
    ]
    assert _run(spark, rows) == _brute(rows)


def test_each_pair_emitted_exactly_once(spark):
    # two long co-extensive intervals share every cell: without the
    # canonical-cell filter this pair appears once per shared cell
    rows = [(0, 0, 1000), (1, 0, 1000)]
    df = spark.createDataFrame(rows, "iv long, start_us long, end_us long")
    got = interval_overlap_join(df, df, cell_us=_CELL, pair_filter="a_iv < b_iv")
    assert got.count() == 1
