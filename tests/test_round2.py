"""Semantic tests for round-2 operators: linear interpolation, per-group
mode, char-bigram LM scoring, and the new TPC-H shapes' invariants.

(The differential oracle in test_queries_oracle.py already checks these
against DuckDB end-to-end; the tests here pin the *semantics* on small
hand-computable frames, which survives a testdata regeneration.)
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timedf_spark.operators import lm


def test_interpolate_fills_gap_linearly(spark):
    # hours 0,1,2,3,4 with values at 0 (10.0) and 4 (30.0): the three gap
    # hours must come out 15, 20, 25 (linear in position)
    base = dt.datetime(2024, 1, 1)
    rows = [
        ("a", base, 10.0),
        ("a", base + dt.timedelta(hours=4), 30.0),
    ]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")

    import timedf_spark.queries.timeseries as ts_mod
    import timedf_spark.sources as sources

    orig = sources.load_table
    try:
        ts_mod.load_table = lambda _s, _d, _n: ev
        out = ts_mod.interpolate_hourly(spark, "unused")
        got = {r["hour_ts"].hour: (r["value"], r["is_interpolated"]) for r in out.collect()}
    finally:
        ts_mod.load_table = orig
    assert got[0] == (10.0, False)
    assert got[4] == (30.0, False)
    assert got[1] == (15.0, True)
    assert got[2] == (20.0, True)
    assert got[3] == (25.0, True)


def test_interpolate_edge_gaps_take_nearest(spark):
    # observed only in the middle hour of a 3-hour span per type won't
    # happen via spans (span starts/ends at observed hours), so check the
    # one-sided case differently: two observed hours, no interior gap —
    # nothing interpolated, values pass through.
    base = dt.datetime(2024, 1, 1)
    rows = [("b", base, 1.0), ("b", base + dt.timedelta(hours=1), 2.0)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")

    import timedf_spark.queries.timeseries as ts_mod

    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda _s, _d, _n: ev
        out = ts_mod.interpolate_hourly(spark, "unused").collect()
    finally:
        ts_mod.load_table = orig
    assert sorted((r["value"], r["is_interpolated"]) for r in out) == [
        (1.0, False),
        (2.0, False),
    ]


def test_modal_event_type_tie_breaks_lexicographically(spark):
    rows = [(1, "view"), (1, "click"), (2, "view"), (2, "view"), (2, "click")]
    ev = spark.createDataFrame(rows, "user_id long, event_type string")

    import timedf_spark.queries.timeseries as ts_mod

    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda _s, _d, _n: ev
        out = {r["user_id"]: (r["modal_event_type"], r["n_events"])
               for r in ts_mod.modal_event_type(spark, "unused").collect()}
    finally:
        ts_mod.load_table = orig
    # user 1: tie click/view → lexicographically smaller wins
    assert out[1] == ("click", 1)
    assert out[2] == ("view", 2)


def test_charlm_scores_known_probabilities(spark):
    # corpus: "abab", "abba". bigrams: ab,ba,ab | ab,bb,ba
    # counts: ab=3, ba=2, bb=1; prefix a·=3, b·=3
    # p(ab)=1.0, p(ba)=2/3, p(bb)=1/3
    docs = spark.createDataFrame(
        [(1, "abab"), (2, "abba")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in lm.charlm_doc_scores(docs).collect()}
    assert out[1]["n_bigrams"] == 3
    assert out[2]["n_bigrams"] == 3
    # doc 1: mean(1, 2/3, 1) — quantized at 1e-8
    assert out[1]["charlm_score"] == pytest.approx((1 + 2 / 3 + 1) / 3, abs=1e-7)
    # doc 2: mean(1, 1/3, 2/3)
    assert out[2]["charlm_score"] == pytest.approx((1 + 1 / 3 + 2 / 3) / 3, abs=1e-7)


def test_charlm_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, ""), (3, "ab")], "doc_id long, text string"
    )
    got = lm.charlm_doc_scores(docs).collect()
    assert [r["doc_id"] for r in got] == [3]
    assert got[0]["charlm_score"] == pytest.approx(1.0, abs=1e-7)


def test_min_cost_supplier_argmin_join_back(spark, sf_dir):
    """Every returned (part, supplier) must actually achieve that part's
    minimum unit cost, and every part present in lineitem must appear."""
    from timedf_spark.queries.tpch_round2 import min_cost_supplier
    from timedf_spark.sources import load_table

    out = min_cost_supplier(spark, sf_dir)
    li_parts = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey")
    ).distinct()
    assert out.select("p_partkey").distinct().count() == li_parts.count()
    # per part exactly one minimum value (possibly several suppliers at it)
    bad = (
        out.groupBy("p_partkey")
        .agg(F.countDistinct("min_unit_cost").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert bad == 0


def test_promo_share_bounded(spark, sf_dir):
    from timedf_spark.queries.tpch_round2 import promo_revenue_share

    row = promo_revenue_share(spark, sf_dir).collect()[0]
    assert 0.0 <= row["promo_share_pct"] <= 100.0
    assert row["total_revenue"] > 0


def test_merge_changes_semantics(spark):
    from timedf_spark.operators.merge import merge_changes

    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, name string, val double",
    )
    changes = spark.createDataFrame(
        [(2, "b2", 21.0, "U"), (3, None, None, "D"), (4, "d", 40.0, "I")],
        "k long, name string, val double, op string",
    )
    got = {r["k"]: (r["name"], r["val"]) for r in merge_changes(snap, changes, "k").collect()}
    assert got == {1: ("a", 10.0), 2: ("b2", 21.0), 4: ("d", 40.0)}


def test_merge_changes_strict_rejects_ambiguous_batch(spark):
    from timedf_spark.operators.merge import merge_changes

    snap = spark.createDataFrame([(1, 1.0)], "k long, val double")
    changes = spark.createDataFrame(
        [(1, 2.0, "U"), (1, 3.0, "U")], "k long, val double, op string"
    )
    with pytest.raises(ValueError, match="ambiguous"):
        merge_changes(snap, changes, "k", strict=True)


def test_scd2_collapses_consecutive_duplicates(spark):
    import datetime as dt

    import timedf_spark.queries.timeseries as ts_mod

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(hours=h), eid, st)
        for eid, (h, st) in enumerate(
            [(0, "a"), (1, "a"), (2, "b"), (3, "a"), (4, "a"), (5, "a")]
        )
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    orig = ts_mod.load_table
    try:
        ts_mod.load_table = lambda _s, _d, _n: ev
        got = sorted(
            ts_mod.scd2_history(spark, "unused").collect(),
            key=lambda r: r["valid_from"],
        )
    finally:
        ts_mod.load_table = orig
    # runs: a(2 rows), b(1), a(3) — consecutive duplicates collapsed, but
    # the re-appearance of 'a' is a NEW interval
    assert [(r["state"], r["n_events"], r["is_current"]) for r in got] == [
        ("a", 2, False),
        ("b", 1, False),
        ("a", 3, True),
    ]
    assert got[0]["valid_to"] == got[1]["valid_from"]
    assert got[1]["valid_to"] == got[2]["valid_from"]
    assert got[2]["valid_to"] is None


def test_charlm_release_unpersists_cache(spark):
    """release=True must leave no cached bigram blocks behind — the
    long-lived-session contract (ADVICE r2). Only the localCheckpoint of
    the (one-row-per-doc) result may remain in block storage; the exploded
    bigram SQL cache (identifiable by its explode plan name) must be gone."""
    from timedf_spark.operators.lm import charlm_doc_scores

    docs = spark.createDataFrame(
        [(1, "abab"), (2, "abba"), (3, "baba")], ["doc_id", "text"]
    )
    spark.catalog.clearCache()
    out = charlm_doc_scores(docs, release=True)
    assert out.count() == 3
    cached_names = [
        str(r.name()) for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    ]
    assert not any("explode" in n for n in cached_names), cached_names
