"""Round-19: CMS join-size estimate — dominance and error bound."""

from __future__ import annotations

from timedf_spark.queries.round19 import _D, _W, join_size_sketch
from timedf_spark.sources import load_table

_SIDES = {
    "lineitem_orders": ("lineitem", "orders"),
    "lineitem_part": ("lineitem", "part"),
}


def test_sketch_dominates_and_bounded(spark, sf_dir):
    """CMS inner product always >= the true join size (counts only
    add), and the overcount obeys the Markov bound 3*N_a*N_b/w with
    margin (expected overcount is N_a*N_b/w per row, min over d
    independent rows)."""
    rows = {r["join_name"]: r for r in join_size_sketch(spark, sf_dir).collect()}
    assert set(rows) == set(_SIDES)
    for name, r in rows.items():
        lt, rt = _SIDES[name]
        na = load_table(spark, sf_dir, lt).count()
        nb = load_table(spark, sf_dir, rt).count()
        assert r["est_rows"] >= r["exact_rows"], name
        assert r["est_rows"] - r["exact_rows"] <= 3 * na * nb // _W, name
        assert r["overcount_bp"] == (
            (r["est_rows"] - r["exact_rows"]) * 10_000 // r["exact_rows"]
        )
