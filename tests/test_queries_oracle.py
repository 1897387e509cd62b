"""Differential oracle tests — the engine's primary correctness gate
(SURVEY.md §5 item 2: implements the cross-backend validation the reference
only promised, ny_taxi.py:156-162 / docs 06-future.rst).

Every registered query with an oracle must match DuckDB exactly (row count,
column names, order-insensitive values) at the test scale factor.
"""

from __future__ import annotations

import pytest

from tests.oracle_compare import compare, duckdb_connection
from timedf_spark.queries import all_queries

_SPECS = all_queries()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(name, spark, sf_dir, con):
    spec = _SPECS[name]
    if spec.oracle is None:
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    issues = compare(spec.fn(spark, sf_dir), con, spec.oracle)
    assert issues == [], f"{name}: {issues}"


def test_approx_cardinalities_within_tolerance(spark, sf_dir):
    """HLL++ at rsd=0.02 must land within 5% of the exact distinct counts.
    The registry query now attests this bound IN-QUERY (ok_* flags, oracle-
    checked); this test pins the RAW estimates independently so weakening
    the in-query flags can't silently pass."""
    import pyspark.sql.functions as F

    from timedf_spark.queries import all_queries
    from timedf_spark.sources import load_table

    raw = (
        load_table(spark, sf_dir, "orders")
        .agg(
            *[
                F.approx_count_distinct(c, rsd=0.02).alias(n)
                for n, c in [
                    ("n_status", "o_orderstatus"),
                    ("n_priority", "o_orderpriority"),
                    ("n_custkey", "o_custkey"),
                ]
            ]
        )
        .first()
    )
    exact = all_queries()["column_cardinalities"].fn(spark, sf_dir).first()
    for col in ["n_status", "n_priority", "n_custkey"]:
        a, e = raw[col], exact[col]
        assert abs(a - e) <= max(1, 0.05 * e), (col, a, e)
    attested = all_queries()["approx_cardinalities"].fn(spark, sf_dir).first()
    assert all(attested[f"ok_{s}"] for s in ["status", "priority", "custkey"])


def test_approx_quantiles_within_tolerance(spark, sf_dir):
    """approx_percentile at accuracy=10000 must land within 2% relative of
    the exact per-group percentiles. The registry query attests the bound
    in-query (ok_* flags, oracle-checked); this pins the raw sketch."""
    import pyspark.sql.functions as F

    from timedf_spark.queries import all_queries
    from timedf_spark.sources import load_table

    qs = all_queries()
    pcts = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    exact = {r["l_returnflag"]: r for r in qs["quantile_profile"].fn(spark, sf_dir).collect()}
    raw = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"approx_percentile(l_quantity, {v}, 10000)").alias(n)
                for n, v in pcts.items()
            ]
        )
        .collect()
    }
    assert set(exact) == set(raw)
    for flag, e in exact.items():
        a = raw[flag]
        for p in pcts:
            assert abs(a[p] - e[p]) <= max(1.0, 0.02 * abs(e[p])), (flag, p, a[p], e[p])
    for r in qs["approx_quantile_profile"].fn(spark, sf_dir).collect():
        assert all(r[f"ok_{p}"] for p in pcts), r


_ANSI_REPRESENTATIVES = [
    # quantized-sum arithmetic (the overflow-guard contract), conv()/md5
    # hashing, window ranks, HOF folds, count-distinct, share-of-total
    "pricing_summary", "market_share", "taxi_q4", "corpus_mix",
    "dedup_exact", "supplier_part_counts", "zscore_outliers",
    "repetition_stats", "tfidf_top_terms", "temperature_mix",
    # round-5 arithmetic: min-hash race conv(), chi-square floor-casts,
    # interval µs div/sequence
    "weighted_doc_sample", "source_lang_drift", "overlapping_sessions",
]


def test_queries_hold_under_ansi_mode(spark, sf_dir, con):
    """spark.sql.ansi.enabled=true is the recommended guard for the
    quantized-sum overflow contract (functions/deterministic.py): under
    ANSI an overflow raises instead of wrapping. The suite must produce
    IDENTICAL results with it on — i.e. nothing relies on non-ANSI
    wrap/cast semantics. (Full-suite ANSI run verified manually; this
    pins a representative cross-section.)"""
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for name in _ANSI_REPRESENTATIVES:
            spec = _SPECS[name]
            issues = compare(spec.fn(spark, sf_dir), con, spec.oracle)
            assert issues == [], f"{name} under ANSI: {issues}"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_results_invariant_to_shuffle_partitioning(spark, sf_dir, con):
    """The reproducibility contract: identical results under a different
    spark.sql.shuffle.partitions (different partial-aggregation merge
    trees, different partition orders). True only because every float
    aggregate is a quantized integer sum — a raw double sum would flip
    last bits here."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        for name in ["pricing_summary", "market_share", "plasticc_multi_agg",
                     "winsorized_price_mean", "retention_cohorts"]:
            spec = _SPECS[name]
            issues = compare(spec.fn(spark, sf_dir), con, spec.oracle)
            assert issues == [], f"{name} at 7 shuffle partitions: {issues}"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
