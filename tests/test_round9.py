"""Round-9 tests: BM25 retrieval, DSIR importance weights, vocab growth.

Oracle equality is covered by test_queries_oracle.py; these pin the
semantics the oracle can't see (ranking behavior on constructed corpora,
weight-table bounds) and the plan shapes the scale posture claims.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from timedf_spark.operators import retrieval, selection
from timedf_spark.queries import all_queries

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _executed_plan(spark, name: str) -> str:
    spark.catalog.clearCache()
    df = all_queries()[name].fn(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# ---- BM25 -----------------------------------------------------------------


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_tf_saturation_and_rare_term_weighting(spark):
    """A doc matching the RARE query term outranks a doc stuffing the
    common one (idf dominates tf saturation — the property BM25 adds over
    raw tf matching)."""
    docs = _mk_docs(
        spark,
        [
            "common common common common common common common common",  # 0: stuffed
            "rare filler filler filler filler filler filler filler",    # 1: one rare hit
            "common filler filler filler filler filler filler filler",  # 2: one common hit
        ]
        + ["common pad pad pad pad pad pad pad"] * 7,  # make 'common' common
    )
    qt = spark.createDataFrame([(1, "common"), (1, "rare")], "qid long, term string")
    got = {r["doc_id"]: r["rank"] for r in retrieval.bm25_topk(docs, qt, k=10).collect()}
    assert got[1] == 1, got  # rare-term doc wins
    # stuffing 8x the common term beats a single common hit, but not the rare doc
    assert got[0] < got[2], got


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc scores higher (the b·dl/avgdl term)."""
    docs = _mk_docs(
        spark,
        [
            "hit pad",
            "hit pad pad pad pad pad pad pad pad pad pad pad pad pad",
            "pad pad",
        ],
    )
    qt = spark.createDataFrame([(1, "hit")], "qid long, term string")
    rows = {r["doc_id"]: r["score"] for r in retrieval.bm25_topk(docs, qt, k=10).collect()}
    assert rows[0] > rows[1]
    assert 2 not in rows  # no query term -> not retrieved


def test_bm25_topk_is_per_query(spark):
    out = all_queries()["bm25_search"].fn(spark, SF_SMALL).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (qid, ranks)
        assert len(ranks) <= 5


def test_bm25_postings_filtered_before_exchange(spark):
    """The corpus token stream must hit the broadcast query-term semi-join
    BEFORE any (doc, term) exchange — the property that keeps the big
    shuffle bounded by query-term postings, not corpus vocabulary."""
    plan = _executed_plan(spark, "bm25_search")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---- DSIR importance ------------------------------------------------------


def test_dsir_target_tokens_score_higher(spark):
    """Docs made of target-only tokens must out-score docs of tokens the
    target never uses; a uniform doc lands in between."""
    target_texts = ["alpha beta gamma delta"] * 8
    other_texts = ["omega psi chi phi"] * 8
    rows = (
        [(i, t, "en") for i, t in enumerate(target_texts)]
        + [(100 + i, t, "zz") for i, t in enumerate(other_texts)]
        + [(200, "alpha omega", "zz")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    imp = {
        r["doc_id"]: r["importance"]
        for r in selection.importance_weights(docs, "lang = 'en'").collect()
    }
    assert imp[0] > imp[200] > imp[100], imp


def test_dsir_weight_table_is_bucket_bounded(spark):
    """The broadcast side is O(n_buckets) regardless of corpus size."""
    docs = all_queries()["dsir_importance"].fn(spark, SF_SMALL)
    assert docs.count() > 0
    # structural bound: distinct buckets cannot exceed N_BUCKETS
    tok = (
        docs.sparkSession.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter("term <> ''")
        .select(F.expr(selection._BUCKET_SPARK).alias("b"))
    )
    assert tok.distinct().count() <= selection.N_BUCKETS


def test_dsir_importance_of_uniform_corpus_is_one(spark):
    """Target == corpus -> every smoothed ratio is exactly 1.0 after
    quantization, for every doc."""
    docs = spark.createDataFrame(
        [(i, "a b c d", "en") for i in range(10)],
        "doc_id long, text string, lang string",
    )
    out = selection.importance_weights(docs, "lang = 'en'").collect()
    assert all(abs(r["importance"] - 1.0) < 1e-6 for r in out)


# ---- exact Lloyd k-means ----------------------------------------------------


def test_kmeans_distance_decreases_with_iterations(spark):
    """Lloyd monotonicity survives the integer quantization: 3 rounds must
    cut total squared distance well below the seed assignment."""
    from timedf_spark.operators import kmeans

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    d0 = kmeans.lloyd_assignments(emb, 8, 0).agg(F.sum("qdist")).first()[0]
    d3 = kmeans.lloyd_assignments(emb, 8, 3).agg(F.sum("qdist")).first()[0]
    assert d3 < 0.9 * d0, (d0, d3)


def test_kmeans_parallelism_invariance(spark):
    """Identical assignments at any input partitioning — the property the
    integer min/sum arithmetic buys (run-to-run reproducibility on a
    cluster)."""
    from timedf_spark.operators import kmeans

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    a1 = kmeans.lloyd_assignments(emb.repartition(1), 6, 2).collect()
    a7 = kmeans.lloyd_assignments(emb.repartition(7), 6, 2).collect()
    assert sorted(map(tuple, a1)) == sorted(map(tuple, a7))


def test_kmeans_persist_vectors_path_equal_and_released(spark):
    from timedf_spark.operators import kmeans

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    plain = kmeans.lloyd_assignments(emb, 5, 2).collect()
    persisted = kmeans.lloyd_assignments(emb, 5, 2, persist_vectors=True).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, persisted))


def test_kmeans_assign_to_centroids_matches_final_assignment(spark):
    """The probe half (frozen centroids) must reproduce the fit's own
    final assignment bit-for-bit — the contract the streaming twin and
    any offline re-scorer rely on."""
    from timedf_spark.operators import kmeans

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    full = kmeans.lloyd_assignments(emb, 6, 2).collect()
    cent = kmeans.lloyd_centroids(emb, 6, 2)
    probe = kmeans.assign_to_centroids(emb, cent, 6).collect()
    assert sorted(map(tuple, full)) == sorted(map(tuple, probe))


def test_kmeans_streaming_store_probe_equals_batch(spark, tmp_path):
    """Persisted-store round trip: publish the fit, assign two
    'micro-batches' through the foreachBatch body, compare the union to
    one-shot batch assignment. Also pins refit atomicity: publishing a
    new version switches the NEXT batch, and idempotent redelivery
    rewrites identical content."""
    from timedf_spark.operators import kmeans
    from timedf_spark.streaming import kmeans_apply

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    store = str(tmp_path / "cent")
    out = str(tmp_path / "assigned")
    kmeans_apply.publish_centroids(kmeans.lloyd_centroids(emb, 6, 2), store)

    b0 = emb.where("vec_id % 2 = 0")
    b1 = emb.where("vec_id % 2 = 1")
    kmeans_apply.assign_batch(b0, 0, store, out, 6)
    kmeans_apply.assign_batch(b1, 1, store, out, 6)
    streamed = sorted(
        map(tuple, spark.read.parquet(f"{out}/batch=0", f"{out}/batch=1").collect())
    )
    cent = kmeans_apply.read_centroids(spark, store)
    batch = sorted(map(tuple, kmeans.assign_to_centroids(emb, cent, 6).collect()))
    assert streamed == batch

    # redelivery of batch 1 is a byte-identical overwrite (idempotent)
    kmeans_apply.assign_batch(b1, 1, store, out, 6)
    again = sorted(
        map(tuple, spark.read.parquet(f"{out}/batch=0", f"{out}/batch=1").collect())
    )
    assert again == streamed

    # refit: a later version switches the next read atomically
    kmeans_apply.publish_centroids(kmeans.lloyd_centroids(emb, 4, 1), store, version=1)
    assert kmeans_apply.read_centroids(spark, store).count() == 4


def test_cluster_balanced_sample_caps_and_determinism(spark):
    qs = all_queries()
    rows = qs["cluster_balanced_sample"].fn(spark, SF_SMALL).collect()
    per = {}
    for r in rows:
        per[r["cid"]] = per.get(r["cid"], 0) + 1
        assert 1 <= r["rnk"] <= 40
    assert all(n <= 40 for n in per.values())
    again = qs["cluster_balanced_sample"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_cluster_label_purity_counts_consistent(spark):
    rows = all_queries()["cluster_label_purity"].fn(spark, SF_SMALL).collect()
    emb_n = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").count()
    assert sum(r["n_members"] for r in rows) == emb_n
    for r in rows:
        assert 1 <= r["majority_n"] <= r["n_members"]


def test_kmeans_stats_derive_equals_next_lloyd_round(spark):
    """centroids_from_stats(assignment_stats(corpus, cent_T)) must equal
    lloyd_centroids(corpus, T+1) exactly — the identity that lets the
    streaming stats store start where the offline fit left off."""
    from timedf_spark.operators import kmeans

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cent2 = kmeans.lloyd_centroids(emb, 6, 2)
    derived = kmeans.centroids_from_stats(kmeans.assignment_stats(emb, cent2, 6))
    cent3 = kmeans.lloyd_centroids(emb, 6, 3)
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, cent3.collect())
    )


def test_kmeans_stats_additive_over_batches(spark):
    """assignment_stats against FROZEN centroids folds over disjoint
    batches by (cid, i)-wise addition — the mergeability the stats store
    relies on."""
    from timedf_spark.operators import kmeans

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cent = kmeans.lloyd_centroids(emb, 5, 1)
    full = kmeans.assignment_stats(emb, cent, 5)
    parts = [
        kmeans.assignment_stats(emb.where(f"vec_id % 2 = {m}"), cent, 5)
        for m in (0, 1)
    ]
    folded = (
        parts[0].unionByName(parts[1])
        .groupBy("cid", "i")
        .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
    )
    assert sorted(map(tuple, folded.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_kmeans_stats_store_batches_and_replay(spark, tmp_path):
    """Store round trip: seed from the fit, fold two mini-batches,
    replayed batch is a no-op, and the derived centroids change only
    through published versions."""
    from timedf_spark.operators import kmeans
    from timedf_spark.streaming import kmeans_apply

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cent = kmeans.lloyd_centroids(emb, 4, 1)
    seed = kmeans.assignment_stats(emb, cent, 4)
    store = str(tmp_path / "kstats")
    kmeans_apply.seed_stats_store(seed, store)

    b1 = emb.where("vec_id % 3 = 0")
    b2 = emb.where("vec_id % 3 = 1")
    kmeans_apply.apply_stats_batch(b1, 1, store, 4)
    s_after_1 = sorted(map(tuple, kmeans_apply.read_stats(spark, store).collect()))
    kmeans_apply.apply_stats_batch(b1, 1, store, 4)  # replay: no-op
    assert sorted(map(tuple, kmeans_apply.read_stats(spark, store).collect())) == s_after_1
    kmeans_apply.apply_stats_batch(b2, 2, store, 4)

    # total mass conservation: n summed over store == corpus + b1 + b2 members
    per_dim_n = (
        kmeans_apply.read_stats(spark, store).where("i = 0").agg(F.sum("n")).first()[0]
    )
    assert per_dim_n == emb.count() + b1.count() + b2.count()


def test_kmeans_no_cartesian_no_corpus_shuffle_per_round(spark):
    """Centroids broadcast onto the vector scan (BroadcastNestedLoopJoin of
    a k-row side is the intended physical shape); the corpus must never hit
    a SortMergeJoin or an unbroadcast CartesianProduct."""
    plan = _executed_plan(spark, "kmeans_assign")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


# ---- per-group OLS trend ----------------------------------------------------


def test_group_ols_known_line_and_degenerate(spark):
    """A perfect line recovers its slope exactly (num/den reduces to it);
    a single-x group yields NULL slope fields."""
    from timedf_spark.operators import trend

    pts = [("a", x, 7 * x + 3) for x in range(10)] + [("b", 5, 100), ("b", 5, 200)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    rows = {r["g"]: r for r in trend.group_ols(df, ["g"], "x", "y").collect()}
    a = rows["a"]
    assert a["slope_num"] / a["slope_den"] == 7.0
    assert a["slope_scaled"] == 7 * 10_000
    b = rows["b"]
    assert b["slope_num"] is not None  # numerator is 0 here, defined
    assert b["slope_den"] is None and b["slope_scaled"] is None


def test_group_ols_negative_slope_floor_semantics(spark):
    """Negative slopes floor toward -inf on both engines: y = -3x + 1
    with a half-step wobble lands between grid points."""
    from timedf_spark.operators import trend

    pts = [("g", x, -3 * x + (x % 2)) for x in range(9)]
    df = spark.createDataFrame(pts, "g string, x long, y long")
    r = trend.group_ols(df, ["g"], "x", "y").first()
    exact = r["slope_num"] / r["slope_den"]
    import math

    assert r["slope_scaled"] == math.floor(exact * 10_000)
    assert r["slope_scaled"] < 0


def test_trend_store_equals_one_shot_and_replay(spark, tmp_path):
    """Folding month-slices through the trend store reproduces the
    one-shot sufficient statistics bit-exactly, derived slopes match
    group_ols on the union, and a replayed batch is a no-op."""
    from timedf_spark.operators import trend
    from timedf_spark.streaming import trend_apply

    pts = spark.createDataFrame(
        [("g1", x, 5 * x + (x % 3)) for x in range(30)]
        + [("g2", x, 1000 - 4 * x) for x in range(30)],
        "g string, x long, y long",
    )
    store = str(tmp_path / "trend")
    b0, b1, b2 = (pts.where(f"x % 3 = {m}") for m in (0, 1, 2))
    trend_apply.seed_trend_store(trend.sufficient_stats(b0, ["g"], "x", "y"), store)
    trend_apply.apply_trend_batch(b1, 1, store, ["g"], "x", "y")
    trend_apply.apply_trend_batch(b1, 1, store, ["g"], "x", "y")  # replay
    trend_apply.apply_trend_batch(b2, 2, store, ["g"], "x", "y")

    stored = sorted(
        map(tuple, trend_apply.read_trend_stats(spark, store).collect())
    )
    oneshot = sorted(
        map(tuple, trend.sufficient_stats(pts, ["g"], "x", "y").collect())
    )
    assert stored == oneshot

    derived = sorted(
        map(
            tuple,
            trend_apply.derive_slopes(
                trend_apply.read_trend_stats(spark, store), ["g"]
            ).collect(),
        )
    )
    direct = sorted(map(tuple, trend.group_ols(pts, ["g"], "x", "y").collect()))
    assert derived == direct


# ---- governance audits ------------------------------------------------------


def test_anonymity_report_flags_small_and_uniform_groups(spark):
    from timedf_spark.operators import privacy

    rows = (
        [("n1", "A", float(i)) for i in range(10)]          # big, diverse: clean
        + [("n2", "B", 1.0), ("n2", "B", 2.0)]              # k-violation (n=2)
        + [("n3", "C", 5.0)] * 12                            # l-violation (1 value)
    )
    df = spark.createDataFrame(rows, "nat string, seg string, bal double")
    rep = {
        (r["nat"], r["seg"]): (r["n_rows"], r["n_sensitive"])
        for r in privacy.anonymity_report(df, ["nat", "seg"], "bal", 5, 3).collect()
    }
    assert rep == {("n2", "B"): (2, 2), ("n3", "C"): (12, 1)}


def test_price_decile_bin_depth_and_total(spark):
    """Every order binned exactly once; decile populations are balanced
    up to value multiplicity (max bucket <= min bucket + largest tie)."""
    rows = all_queries()["price_decile_bin"].fn(spark, SF_SMALL).collect()
    n_orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").count()
    assert len(rows) == n_orders
    per = {}
    for r in rows:
        assert 0 <= r["bucket"] <= 9
        per[r["bucket"]] = per.get(r["bucket"], 0) + 1
    assert len(per) == 10
    assert max(per.values()) - min(per.values()) <= n_orders // 10


# ---- snapshot diff ----------------------------------------------------------


def test_snapshot_diff_ops_and_round_trip(spark):
    """Known I/U/D classification, unchanged rows omitted, and the
    round-trip law: merge_changes(old, snapshot_diff(old, new)) == new."""
    from timedf_spark.operators.merge import merge_changes, snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
        "k long, s string, v long",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, None, 30), (5, "e", 50)],
        "k long, s string, v long",
    )
    diff = snapshot_diff(old, new, "k")
    ops = {r["k"]: r["op"] for r in diff.collect()}
    assert ops == {2: "U", 4: "D", 5: "I"}  # 1 and 3 (null-safe) omitted
    merged = merge_changes(old, diff, "k")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, new.collect()))


def test_orders_snapshot_diff_round_trip(spark):
    """The gated query's diff, applied back to the real orders table,
    reproduces the mutated snapshot exactly."""
    from timedf_spark.operators.merge import merge_changes

    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    diff = all_queries()["orders_snapshot_diff"].fn(spark, SF_SMALL)
    merged = merge_changes(orders, diff, "o_orderkey")
    n_del = orders.where("o_orderkey % 97 = 0").count()
    n_ins = orders.where("o_orderkey % 113 = 0").count()
    assert merged.count() == orders.count() - n_del + n_ins
    # spot the semantics: every %31 surviving key is repriced by +10
    probe = (
        merged.alias("m")
        .join(orders.alias("o"), "o_orderkey")
        .where("o_orderkey % 31 = 0 AND o_orderkey % 97 <> 0")
        .selectExpr("max(abs(m.o_totalprice - o.o_totalprice - 10)) AS d")
        .first()["d"]
    )
    assert probe == 0.0


# ---- triangle counting ------------------------------------------------------


def test_triangle_count_known_graph(spark):
    """K4 (4 triangles, 4 choose 2 = 6 edges), plus a pendant edge and a
    disconnected triangle; duplicates/reversals/self-loops must not count."""
    from timedf_spark.operators import triangles

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(3, 9), (10, 11), (11, 12), (12, 10)]
    noisy = edges + [(b, a) for a, b in edges] + [(5, 5)] + edges[:3]
    df = spark.createDataFrame(noisy, "a long, b long")
    row = triangles.triangle_stats(df, "a", "b").first()
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == 4 + 1
    # wedge count: sum over nodes of C(out_deg, 2) >= triangles
    assert row["n_wedges"] >= row["n_triangles"]
    assert row["n_nodes"] == 8


def test_triangle_count_hot_node_star(spark):
    """A pure star has zero triangles and — thanks to the orientation —
    zero wedges centered on the hub (every edge points INTO the hub)."""
    from timedf_spark.operators import triangles

    star = [(0, i) for i in range(1, 200)]
    df = spark.createDataFrame(star, "a long, b long")
    row = triangles.triangle_stats(df, "a", "b").first()
    assert row["n_triangles"] == 0
    assert row["n_wedges"] == 0  # leaves have out-degree 1; hub has 0


def test_copurchase_triangles_plan_no_cartesian(spark):
    plan = _executed_plan(spark, "copurchase_triangles")
    assert "CartesianProduct" not in plan


# ---- k-core -----------------------------------------------------------------


def test_kcore_driver_path_matches_distributed(spark, monkeypatch):
    """r11 driver fast path: the numpy peel replay must produce the exact
    (node, deg) table of the distributed rounds — partial peel (rounds
    cut mid-cascade), converged form, and an everything-peels graph."""
    from timedf_spark.operators import kcore

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k5 + chain, "a long, b long")

    def snap(frame):
        return sorted(map(tuple, frame.collect()))

    fast = [
        snap(kcore.kcore_peel(df, "a", "b", 3, r)) for r in (0, 1, 2, 5)
    ] + [
        snap(kcore.kcore_converged(df, "a", "b", 3)),
        snap(kcore.kcore_converged(df, "a", "b", 5)),  # nothing survives
    ]
    monkeypatch.setenv("SPARK_GRAFT_GRAPH_DRIVER_PATH", "0")
    slow = [
        snap(kcore.kcore_peel(df, "a", "b", 3, r)) for r in (0, 1, 2, 5)
    ] + [
        snap(kcore.kcore_converged(df, "a", "b", 3)),
        snap(kcore.kcore_converged(df, "a", "b", 5)),
    ]
    assert fast == slow
    assert fast[-1] == []  # 5-core of K5+chain is empty


def test_kcore_peel_cascade_and_fixpoint(spark):
    """A K5 with a pendant chain: round 1 drops the chain tail, the
    cascade eats the whole chain, K5 survives any number of 3-core
    peels. Converged == fixed-rounds once stable."""
    from timedf_spark.operators import kcore

    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    chain = [(4, 10), (10, 11), (11, 12)]
    df = spark.createDataFrame(k5 + chain, "a long, b long")
    core = kcore.kcore_converged(df, "a", "b", 3)
    rows = {r["node"]: r["deg"] for r in core.collect()}
    assert rows == {i: 4 for i in range(5)}  # K5 only, all deg 4
    fixed = kcore.kcore_peel(df, "a", "b", 3, 5)
    assert sorted(map(tuple, fixed.collect())) == sorted(
        map(tuple, core.collect())
    )


def test_kcore_converged_every_node_meets_k(spark):
    """Fixpoint invariant on real data: every surviving node has deg >= k
    within the surviving subgraph. Uses the FULL co-purchase graph —
    at sf0.001 the gated query's 1/4 part sample is too sparse for a
    20-core, the full graph is not."""
    from pyspark.sql import functions as F  # noqa: F811
    from timedf_spark.operators import kcore
    from timedf_spark.queries.round9 import _KCORE_K

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_partkey"
    )
    pairs = (
        li.alias("l1")
        .join(li.alias("l2"), "l_orderkey")
        .where(F.expr("l1.l_partkey < l2.l_partkey"))
        .select(F.expr("l1.l_partkey").alias("a"), F.expr("l2.l_partkey").alias("b"))
    )
    core = kcore.kcore_converged(pairs, "a", "b", _KCORE_K)
    assert core.where(f"deg < {_KCORE_K}").count() == 0
    assert core.count() > 0


# ---- count-min sketch -------------------------------------------------------


def test_cms_never_undercounts_and_respects_bound(spark):
    """est >= true for every item (CMS one-sided error), and the report's
    overcount stays within the d-row min bound on real data."""
    rows = all_queries()["cms_term_estimates"].fn(spark, SF_SMALL).collect()
    assert len(rows) == 30
    for r in rows:
        assert r["cms_est"] >= r["exact_n"]
        assert r["overcount"] == r["cms_est"] - r["exact_n"]


def test_cms_merge_equals_one_shot(spark):
    """Cell-wise addition of per-batch sketches is bit-identical to the
    one-shot sketch — the equality the streaming store relies on."""
    from timedf_spark.operators import cms

    items = spark.createDataFrame(
        [(f"w{i % 17}",) for i in range(300)], "item string"
    )
    full = sorted(map(tuple, cms.cms_build(items, "item", 3, 64).collect()))
    a = cms.cms_build(items.where("length(item) = 2"), "item", 3, 64)
    b = cms.cms_build(items.where("length(item) = 3"), "item", 3, 64)
    merged = sorted(map(tuple, cms.cms_merge(a, b).collect()))
    assert merged == full


def test_cms_streaming_store_equals_batch_sketch(spark, tmp_path):
    """Folding micro-batches through the persisted store reproduces the
    one-shot corpus sketch exactly; redelivery is a no-op."""
    from timedf_spark.operators import cms
    from timedf_spark.streaming import cms_apply

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    tok = docs.selectExpr("doc_id", "explode(split(text, ' ')) AS item")
    store = str(tmp_path / "cms")
    cms_apply.seed_cms_store(spark, store)
    for bid, pred in enumerate(["doc_id % 3 = 0", "doc_id % 3 = 1", "doc_id % 3 = 2"]):
        cms_apply.apply_cms_batch(tok.where(pred), bid, store, "item", 4, 128)
    cms_apply.apply_cms_batch(tok.where("doc_id % 3 = 1"), 1, store, "item", 4, 128)  # replay
    stored = sorted(map(tuple, cms_apply.read_cms(spark, store).collect()))
    oneshot = sorted(map(tuple, cms.cms_build(tok, "item", 4, 128).collect()))
    assert stored == oneshot


# ---- vocab growth ---------------------------------------------------------


def test_vocab_growth_monotone_and_exact_final(spark):
    rows = all_queries()["vocab_growth"].fn(spark, SF_SMALL).collect()
    assert [r["bucket"] for r in rows] == sorted(r["bucket"] for r in rows)
    for col in ("docs_cum", "tokens_cum", "vocab_cum"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals), col
    # final vocab_cum equals the corpus's exact distinct trigram count
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    tri = docs.select(F.split("text", " ").alias("t")).select(
        F.explode(
            F.expr(
                "case when size(t) >= 3 then transform(sequence(0, size(t) - 3),"
                " i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])) else array() end"
            )
        ).alias("g")
    )
    assert rows[-1]["vocab_cum"] == tri.distinct().count()
    assert rows[-1]["docs_cum"] == docs.count()
