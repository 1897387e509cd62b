"""Round-25 queries: semantic pins (numpy/pandas brute-force twins) +
physical-plan audits for the scale claims in the module docstring."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd

from pyspark.sql import functions as F

from timedf_spark.queries import all_queries
from timedf_spark.sources.readers import load_table

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _executed_plan(spark, name: str) -> str:
    spark.catalog.clearCache()
    df = all_queries()[name].fn(spark, SF_SMALL)
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_price_divergence_matches_numpy_brute(spark):
    """The grid KS/EMD integers equal an exact numpy recomputation of the
    same cross-multiplied CDF arithmetic."""
    row = all_queries()["price_divergence_report"].fn(spark, SF_SMALL).collect()[0]
    pdf = (
        load_table(spark, SF_SMALL, "orders")
        .select("o_totalprice", "o_orderstatus")
        .toPandas()
    )
    buckets = np.floor(pdf["o_totalprice"].to_numpy() / 1000.0).astype(np.int64)
    is_o = (pdf["o_orderstatus"] == "O").to_numpy()
    is_f = (pdf["o_orderstatus"] == "F").to_numpy()
    grid = np.arange(buckets.min(), buckets.max() + 1)
    c1 = np.array([(is_o & (buckets == b)).sum() for b in grid], dtype=np.int64)
    c2 = np.array([(is_f & (buckets == b)).sum() for b in grid], dtype=np.int64)
    keep = (c1 + c2) > 0  # only observed buckets enter the grid relation
    c1, c2, grid = c1[keep], c2[keep], grid[keep]
    n1, n2 = int(c1.sum()), int(c2.sum())
    d = np.abs(np.cumsum(c1) * n2 - np.cumsum(c2) * n1)
    assert row["n_o"] == n1 and row["n_f"] == n2
    assert row["ks_bp"] == int(d.max()) // max((n1 * n2) // 10000, 1)
    assert row["ks_bucket"] == int(grid[int(np.argmax(d))])
    assert row["emd_dollars"] == int(d.sum()) // max((n1 * n2) // 1000, 1)


def test_mann_whitney_matches_rank_brute(spark):
    """U equals the per-row average-rank brute force (SciPy's definition,
    recomputed in numpy to stay dependency-free)."""
    row = all_queries()["mann_whitney_discount"].fn(spark, SF_SMALL).collect()[0]
    pdf = (
        load_table(spark, SF_SMALL, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R"))
        .select("l_discount", "l_returnflag")
        .toPandas()
    )
    v = np.round(pdf["l_discount"].to_numpy() * 100).astype(np.int64)
    a = v[(pdf["l_returnflag"] == "A").to_numpy()]
    r = v[(pdf["l_returnflag"] == "R").to_numpy()]
    combined = np.concatenate([a, r])
    ranks = pd.Series(combined).rank(method="average").to_numpy()
    r1 = ranks[: len(a)].sum()
    u1 = r1 - len(a) * (len(a) + 1) / 2
    assert row["n_a"] == len(a) and row["n_r"] == len(r)
    assert row["u1_x2"] == int(round(2 * u1))
    assert row["u1_x2"] + row["u2_x2"] == 2 * len(a) * len(r)
    # AUC in [0, 10000] and near the brute ratio (guarded-div slack ≤ 1)
    auc = u1 / (len(a) * len(r))
    assert abs(row["auc_bp"] - 10000 * auc) <= 2


def test_corr_matrix_matches_numpy(spark):
    rows = all_queries()["corr_matrix_lineitem"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 6
    li = load_table(spark, SF_SMALL, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(floor(l_extendedprice) AS BIGINT) AS p",
        "CAST(round(l_discount * 100) AS BIGINT) AS d",
        "CAST(round(l_tax * 100) AS BIGINT) AS t",
    ).toPandas()
    for r in rows:
        want = np.corrcoef(li[r["x_col"]], li[r["y_col"]])[0, 1]
        assert r["n"] == len(li)
        assert r["corr"] is not None and abs(r["corr"] - want) < 1e-9, (r, want)
        assert -1.0 - 1e-12 <= r["corr"] <= 1.0 + 1e-12


def test_keyness_targets_first_source_and_is_positive(spark):
    rows = all_queries()["keyness_odds_terms"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 40
    docs = load_table(spark, SF_SMALL, "documents").select("source", "text").toPandas()
    target = docs["source"].min()
    target_tokens = [
        w for t in docs.loc[docs["source"] == target, "text"] for w in t.split() if w
    ]
    counts = pd.Series(target_tokens).value_counts()
    for r in rows:
        assert r["ratio_bp"] > 0
        assert r["k_target"] >= 3
        assert counts.get(r["term"], 0) == r["k_target"], r
    # descending keyness with term tie-break
    got = [(r["ratio_bp"], r["term"]) for r in rows]
    assert got == sorted(got, key=lambda x: (-x[0], x[1]))


def test_blocking_profile_matches_pandas_brute(spark):
    rows = {
        r["scheme"]: r
        for r in all_queries()["blocking_profile"].fn(spark, SF_SMALL).collect()
    }
    docs = load_table(spark, SF_SMALL, "documents").select(
        "lang", "n_chars", "text"
    ).toPandas()
    n = len(docs)
    keys_a = docs["lang"] + "|" + (docs["n_chars"] // 64).astype(str)
    keys_b = docs["text"].str.split(" ").str[0]
    for scheme, keys in (("lang_len", keys_a), ("first_token", keys_b)):
        sizes = keys.value_counts()
        r = rows[scheme]
        assert r["n_docs"] == n
        assert r["n_blocks"] == len(sizes)
        assert r["max_block"] == int(sizes.max())
        assert r["singleton_blocks"] == int((sizes == 1).sum())
        cand = int((sizes * (sizes - 1) // 2).sum())
        assert r["cand_pairs"] == cand
        assert r["reduction_bp"] == 10000 - cand // max((n * (n - 1) // 2) // 10000, 1)


def test_simpson_slopes_match_polyfit(spark):
    rows = all_queries()["simpson_slope_audit"].fn(spark, SF_SMALL).collect()
    li = load_table(spark, SF_SMALL, "lineitem").selectExpr(
        "l_suppkey",
        "CAST(round(l_discount * 100) AS BIGINT) AS x",
        "CAST(floor(l_extendedprice) AS BIGINT) AS y",
    )
    supp = load_table(spark, SF_SMALL, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, SF_SMALL, "nation").select("n_nationkey", "n_name")
    pdf = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .select("n_name", "x", "y")
        .toPandas()
    )
    assert len(rows) == pdf["n_name"].nunique() > 0
    pooled = np.polyfit(pdf["x"], pdf["y"], 1)[0]
    for r in rows[:8]:
        g = pdf[pdf["n_name"] == r["n_name"]]
        want = np.polyfit(g["x"], g["y"], 1)[0]
        assert math.isfinite(r["slope"]) and abs(r["slope"] - want) < 1e-6 * max(
            1.0, abs(want)
        ), (r["n_name"], r["slope"], want)
        assert abs(r["pooled_slope"] - pooled) < 1e-6 * max(1.0, abs(pooled))
        assert r["sign_flip"] == (r["slope"] * r["pooled_slope"] < 0)


# ------------------------------------------------------------------ plans


def test_corr_matrix_single_pass_no_join(spark):
    """All 15 co-moments come from ONE aggregation — no join, no window,
    and exactly one pair of exchanges (partial → final agg)."""
    plan = _executed_plan(spark, "corr_matrix_lineitem")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_blocking_profile_no_pair_materialization(spark):
    """The audit never joins and never generates pair rows: only
    groupBy/agg at block grain (the whole point of the query)."""
    plan = _executed_plan(spark, "blocking_profile")
    assert "Join" not in plan, plan
    assert "Generate" not in plan, plan  # no explode of pair arrays


def test_price_divergence_window_after_aggregation(spark):
    """The only global-order window runs over the post-aggregation grid
    relation; joins are 1-row broadcast scalar assemblies (BNLJ), never
    a shuffled join."""
    plan = _executed_plan(spark, "price_divergence_report")
    assert "SortMergeJoin" not in plan, plan
    assert "Window" in plan, plan


def test_simpson_dims_broadcast(spark):
    """supplier and nation join as broadcasts; the single shuffle pair
    belongs to the nation-grain aggregation."""
    plan = _executed_plan(spark, "simpson_slope_audit")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
