"""Round-10 tests: collocation mining semantics the oracle can't see,
plan-shape pins for the session's new query tier."""

from __future__ import annotations

import os
import re

import pytest

from timedf_spark.queries import all_queries

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


# Upper bounds on real shuffles (Exchange minus Reused/Broadcast) per
# query — a loosened pin so a silent plan regression (broadcast lost to
# a shuffle join, a new global sort) fails loudly while AQE jitter
# doesn't. Iterative queries (kmeans/kcore/ppr) are excluded: their
# executed plan is round-local.
_SHUFFLE_BOUNDS = {
    "collocations": 6,
    "nation_revenue_trend": 3,
    "customer_anonymity_audit": 3,
    "price_decile_bin": 4,
    "orders_snapshot_diff": 4,
    "cms_term_estimates": 5,
    "copurchase_triangles": 8,
}


@pytest.mark.parametrize("name", sorted(_SHUFFLE_BOUNDS))
def test_new_tier_plan_shape(spark, name):
    spark.catalog.clearCache()
    df = all_queries()[name].fn(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan, name
    # Count shuffle NODES line-wise: a ReusedExchange line embeds the
    # text of the exchange it reuses ("ReusedExchange [...], Exchange
    # hashpartitioning(...)"), so substring counting over-counts.
    shuffles = sum(
        1
        for line in plan.splitlines()
        if re.match(r"^[\s:+\-*()\d]*Exchange\s", line)
    )
    assert shuffles <= _SHUFFLE_BOUNDS[name], (name, shuffles, plan)


def test_collocations_rank_bound_phrase_above_frequent_pair(spark):
    """'hong kong' (always together, moderate count) must outscore
    'the cat' (frequent words co-occurring incidentally) — the property
    PMI ranking exists for; and the hapax floor keeps one-off pairs out."""
    from timedf_spark.queries import round10
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "hong kong is busy . the cat saw the cat again") for i in range(6)]
        + [(100, "unique pairing once")],
        "doc_id long, text string",
    )
    # run the same dataflow as the query, against the constructed frame
    words = docs.select(F.split("text", " ").alias("t"))
    uni = words.select(F.explode("t").alias("w")).groupBy("w").count()
    assert uni.where("w = 'hong'").first()["count"] == 6

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            (r["w1"], r["w2"]): r["pmi_ratio_scaled"]
            for r in round10.collocations(spark, d).collect()
        }
    assert ("hong", "kong") in out
    assert ("unique", "pairing") not in out  # below the support floor
    assert out[("hong", "kong")] > out.get(("the", "cat"), 0)


def test_ppr_mass_conservation_and_seed_locality(spark):
    """Total rank mass stays 1 (teleport + dangling both flow to the
    seeds), and mass concentrates on the seed side: the seed nation's
    suppliers out-rank the average non-seed supplier."""
    rows = all_queries()["nation_seed_ppr"].fn(spark, SF_SMALL).collect()
    total = sum(r["rank"] for r in rows)
    assert abs(total - 1.0) < 1e-6
    from timedf_spark.queries.round10 import _CUST_NS, _SEED_NATION

    supp = spark.read.parquet(f"{SF_SMALL}/supplier.parquet")
    seed_ids = {
        r["s_suppkey"]
        for r in supp.where(f"s_nationkey = {_SEED_NATION}").collect()
    }
    seed_ranks = [r["rank"] for r in rows if r["node"] in seed_ids]
    other_supp = [
        r["rank"]
        for r in rows
        if r["node"] < _CUST_NS and r["node"] not in seed_ids
    ]
    assert seed_ranks and other_supp
    assert (sum(seed_ranks) / len(seed_ranks)) > (
        sum(other_supp) / len(other_supp)
    )


def test_ppr_uniform_seed_equals_pagerank(spark):
    """Seeding with EVERY node degenerates PPR to standard PageRank.
    N = 8 so 1/N is a dyadic double: x * (1/N) and x / N are then the
    same IEEE value and the two operators agree BIT-for-bit (at non-dyadic
    N they differ by ulps — the arithmetic is a*pv vs a/N)."""
    from timedf_spark.operators.pagerank import pagerank, personalized_pagerank

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 6), (6, 7)],
        "src long, dst long",
    )
    pr = sorted(map(tuple, pagerank(nodes, edges, iters=5).collect()))
    ppr = sorted(
        map(tuple, personalized_pagerank(nodes, edges, nodes, iters=5).collect())
    )
    assert pr == ppr


def test_collocations_gate_shape(spark):
    rows = all_queries()["collocations"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 25
    assert all(r["c_xy"] >= 5 for r in rows)
    # descending, deterministic tie-break
    keys = [(-r["pmi_ratio_scaled"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys)
