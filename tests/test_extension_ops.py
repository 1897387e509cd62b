"""Semantics tests for the extension-layer operators beyond the oracle gate:
approximate tiers are validated against their exact baselines (recall /
containment), which an equality oracle cannot express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timedf_spark.operators import dedup, similarity
from timedf_spark.operators.sessionize import GAP_MINUTES, sessionize
from timedf_spark.sources import load_table


def test_lsh_ann_recall_vs_brute_force(spark, sf_dir):
    """SRP-LSH top-k must (a) be a subset of the vector set, (b) rank its
    own bucket correctly, and (c) achieve production-grade recall@10 of
    the exact neighbours. With 8 bits × 4 tables and hamming-radius-2
    multi-probe (the round-6 default operating point) measured recall is
    0.85 at sf0.1 — we assert the rank-1 self-match is always found (a
    vector shares its own bucket) and overall recall ≥ 0.6 (VERDICT r05
    item 5)."""
    exact = {
        (r["q_id"], r["vec_id"])
        for r in similarity.brute_force_topk(spark, sf_dir).collect()
    }
    approx_rows = similarity.lsh_topk(spark, sf_dir).collect()
    approx = {(r["q_id"], r["vec_id"]) for r in approx_rows}
    # self-match: every query finds itself at rank 1
    rank1 = {r["q_id"]: r["vec_id"] for r in approx_rows if r["rank"] == 1}
    for q, v in rank1.items():
        assert q == v, f"query {q} rank-1 is {v}, expected itself"
    recall = len(exact & approx) / len(exact)
    # rerank=16 default (r08): measured 0.84/0.81/0.82 at sf0.001/0.01/0.1
    assert recall >= 0.7, f"recall@10 too low: {recall}"


def test_minhash_candidates_contain_true_pairs(spark, sf_dir):
    """Every verified-LSH pair must also be found by the exact Jaccard join
    (LSH verification re-computes exact Jaccard, so LSH ⊆ exact)."""
    exact = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(spark, sf_dir).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == pytest.approx(exact[pair])
    # and at threshold 0.2 with banding at s≈0.55 the high-sim pairs survive
    high = {p for p, j in exact.items() if j >= 0.8}
    assert high <= set(lsh), f"missed near-identical pairs: {high - set(lsh)}"


def test_simhash_separates_near_dups_from_random(spark, sf_dir):
    """Near-identical docs (shingle-Jaccard ≥ 0.95) must sit within hamming
    distance 3 (→ ≥1 shared 15-bit band by pigeonhole); random pairs must be
    far (median hamming ~30 on 60 bits for independent texts)."""
    import statistics

    rows = dedup.simhash64(spark, sf_dir).collect()
    sig = {r["doc_id"]: r for r in rows}

    def hamming(a, b):
        return bin(sig[a]["simhash"] ^ sig[b]["simhash"]).count("1")

    near = [
        (r["doc_a"], r["doc_b"])
        for r in dedup.ngram_jaccard_pairs(spark, sf_dir, threshold=0.95).collect()
    ]
    if not near:
        pytest.skip("no ≥0.95 near-dup pairs in this sf")
    # simhash weights by token frequency, so shingle-Jaccard ≥0.95 does not
    # hard-bound hamming; near-dups must be CLOSE (≤10 of 60 bits) and the
    # band decomposition must reconstruct the signature exactly.
    for a, b in near:
        assert hamming(a, b) <= 10, (a, b, hamming(a, b))
    for r in list(sig.values())[:20]:
        rebuilt = sum(r[f"band{j}"] << (15 * j) for j in range(4))
        assert rebuilt == r["simhash"]
    ids = sorted(sig)
    random_pairs = [(ids[i], ids[(i * 7 + 13) % len(ids)]) for i in range(100)]
    rand_med = statistics.median(
        hamming(a, b) for a, b in random_pairs if a != b
    )
    near_max = max(hamming(a, b) for a, b in near)
    assert rand_med > near_max + 5, (rand_med, near_max)


def test_sessionize_gap_semantics(spark, sf_dir):
    """Within a session max gap ≤ 30 min; consecutive sessions of a user are
    separated by > 30 min; event counts conserve."""
    sessions = sessionize(spark, sf_dir).collect()
    events = load_table(spark, sf_dir, "events")
    assert sum(r["n_events"] for r in sessions) == events.count()
    by_user: dict[int, list] = {}
    for r in sessions:
        by_user.setdefault(r["user_id"], []).append(r)
    gap = GAP_MINUTES * 60
    for user, rows in by_user.items():
        rows.sort(key=lambda r: r["t_start"])
        for prev, nxt in zip(rows, rows[1:]):
            assert (nxt["t_start"] - prev["t_end"]).total_seconds() > gap, (
                user, prev["session_id"], nxt["session_id"],
            )


def test_exact_dedup_conserves_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    groups = dedup.exact_dedup(spark, sf_dir)
    total = groups.agg(F.sum("dup_cnt")).first()[0]
    assert total == docs.count()


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    """IVF top-k: self-match at rank 1 (a vector's own cell is always among
    its probed cells — it is the argmax), candidate set is a subset of the
    corpus, and recall@10 holds the r07 operating point (48 cells /
    nprobe 16 — the measured frontier lives in the evidence block)."""
    exact = {
        (r["q_id"], r["vec_id"])
        for r in similarity.brute_force_topk(spark, sf_dir).collect()
    }
    approx_rows = similarity.ivf_topk(spark, sf_dir).collect()
    approx = {(r["q_id"], r["vec_id"]) for r in approx_rows}
    rank1 = {r["q_id"]: r["vec_id"] for r in approx_rows if r["rank"] == 1}
    for q, v in rank1.items():
        assert q == v, f"query {q} rank-1 is {v}, expected itself"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"recall@10 too low: {recall}"


def test_cosine_dedup_pairs_exact_over_blocks(spark, sf_dir):
    """Every emitted near-dup pair must have true cosine ≥ threshold
    (blocking can only lose pairs, never fabricate them), and pairs are
    canonical (id_a < id_b) with no duplicates."""
    rows = similarity.cosine_dedup_pairs(spark, sf_dir).collect()
    pairs = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(a < b for a, b in pairs)
    assert all(r["cos_q"] >= 0.4 for r in rows)
    emb = {
        r["vec_id"]: r["embedding"]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    import math

    for r in rows:
        a, b = emb[r["id_a"]], emb[r["id_b"]]
        dot = sum(x * y for x, y in zip(a, b))
        cos = dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )
        assert abs(cos - r["cos_q"]) < 1e-4


def test_connected_components_vs_union_find(spark):
    """Min-label propagation fixpoint == classic union-find on a seeded
    random graph (cycles, chains, singletons all present)."""
    import random

    from timedf_spark.operators.cluster import connected_components

    rng = random.Random(99)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    # reference: union-find with path compression
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    # canonical component id = min vertex in component
    comp_min: dict[int, int] = {}
    for v in range(n):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {(v, comp_min[find(v)]) for v in range(n)}

    vdf = spark.createDataFrame([(v,) for v in range(n)], "v long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        (r["vertex"], r["component"])
        for r in connected_components(vdf, edf).collect()
    }
    assert got == expected


def test_connected_components_chain_converges_logarithmically(spark):
    """A 400-node path graph has diameter 399: plain neighbour propagation
    needs ~399 rounds, pointer jumping must finish in O(log n) — the round
    cap of 14 only holds if path halving works."""
    from timedf_spark.operators.cluster import connected_components

    n = 400
    vdf = spark.createDataFrame([(v,) for v in range(n)], "v long")
    edf = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], "src long, dst long")
    got = connected_components(vdf, edf, max_rounds=14).collect()
    assert all(r["component"] == 0 for r in got)
    assert len(got) == n


def test_connected_components_star_same_fixpoint(spark):
    """Large-star/small-star (the skew-robust alternative) must reach the
    identical (vertex, component) fixpoint as pointer jumping on a graph
    mixing a hot hub (power-law degree), a chain, cycles, and singletons."""
    import random

    from timedf_spark.operators.cluster import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    n = 120
    edges = [(0, rng.randrange(1, 40)) for _ in range(60)]  # hub at 0
    edges += [(i, i + 1) for i in range(50, 70)]  # chain
    edges += [(80, 81), (81, 82), (82, 80)]  # cycle
    edges += [(rng.randrange(n), rng.randrange(n)) for _ in range(30)]
    vdf = spark.createDataFrame([(v,) for v in range(n)], "v long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    a = {(r["vertex"], r["component"]) for r in connected_components(vdf, edf).collect()}
    b = {(r["vertex"], r["component"]) for r in connected_components_star(vdf, edf).collect()}
    assert a == b


def test_connected_components_star_chain_converges(spark):
    """Star rounds must also beat O(diameter) on a path graph."""
    from timedf_spark.operators.cluster import connected_components_star

    n = 200
    vdf = spark.createDataFrame([(v,) for v in range(n)], "v long")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = connected_components_star(vdf, edf, max_rounds=12).collect()
    assert len(got) == n
    assert all(r["component"] == 0 for r in got)


def test_ngram_jaccard_hot_shingle_guard(spark, sf_dir):
    """max_doc_freq drops shingles shared by > f docs before pairing.
    Differential check against the DuckDB oracle with the same cutoff, plus
    the structural property: guarded pairs are computed over filtered
    shingle sets, so no pair's n_common may exceed the unguarded one."""
    from tests.oracle_compare import compare, duckdb_connection

    docs = load_table(spark, sf_dir, "documents")
    guarded = dedup.ngram_jaccard_pairs_df(docs, max_doc_freq=2)
    con = duckdb_connection(sf_dir)
    issues = compare(guarded, con, dedup.ngram_jaccard_sql(max_doc_freq=2))
    assert issues == [], issues

    base = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in dedup.ngram_jaccard_pairs_df(docs).collect()
    }
    for r in guarded.collect():
        key = (r["doc_a"], r["doc_b"])
        if key in base:
            assert r["n_common"] <= base[key]


def test_ivfpq_ann_recall_vs_brute_force(spark, sf_dir):
    """IVF-PQ: ADC candidate scoring over 8-byte codes + exact re-rank must
    reach the IVF recall floor — PQ only re-orders candidates within probed
    cells, so with rerank window 8k recall stays close to plain IVF."""
    from timedf_spark.operators import similarity

    exact = {(r.q_id, r.vec_id) for r in similarity.brute_force_topk(spark, sf_dir).collect()}
    rows = similarity.ivfpq_topk(spark, sf_dir).collect()
    approx = {(r.q_id, r.vec_id) for r in rows}
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q_id, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q_id
    recall = len(exact & approx) / len(exact)
    # rerank=16 default (r08): measured 0.84/0.81/0.82 at sf0.001/0.01/0.1
    assert recall >= 0.7, f"recall@10 too low: {recall}"


def test_opq_rotation_cuts_distortion_on_anisotropic_vectors():
    """Parametric OPQ (PCA rotation + eigenvalue-balanced subspace
    allocation): on vectors whose variance is concentrated in one
    positional subspace — the case that breaks plain PQ, since dim order
    decides subspace quality — the rotation must redistribute variance
    and cut quantization distortion by a wide margin. Driver-side numpy,
    fully deterministic."""
    import numpy as np

    from timedf_spark.operators import similarity

    def distortion(x, books):
        m, _, ds = books.shape
        err = 0.0
        for sub in range(m):
            xs = x[:, sub * ds : (sub + 1) * ds]
            d2 = ((xs[:, None, :] - books[sub][None, :, :]) ** 2).sum(axis=2)
            err += d2.min(axis=1).sum()
        return err / len(x)

    rng = np.random.default_rng(7)
    scales = np.ones(64) * 0.02
    scales[:8] = 1.0  # all the variance lands in plain PQ's subspace 0
    x = rng.standard_normal((500, 64)) * scales
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    rot = similarity._opq_rotation(x)
    assert np.allclose(rot @ rot.T, np.eye(64), atol=1e-8)  # orthonormal
    d_plain = distortion(x, similarity._pq_codebooks(x))
    d_opq = distortion(x @ rot.T, similarity._pq_codebooks(x @ rot.T))
    assert d_opq < 0.25 * d_plain, (d_opq, d_plain)

    # determinism: same sample → bit-identical rotation
    assert np.array_equal(rot, similarity._opq_rotation(x))


def test_ivfpq_opq_end_to_end_recall(spark, sf_dir):
    """opq=True end-to-end: ranks stay dense per query and recall holds
    the same floor as plain PQ (the testdata embeddings are near-isotropic,
    so OPQ is recall-neutral here — the anisotropic win is pinned above)."""
    from timedf_spark.operators import similarity

    exact = {(r.q_id, r.vec_id) for r in similarity.brute_force_topk(spark, sf_dir).collect()}
    rows = similarity.ivfpq_topk(spark, sf_dir, opq=True).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.rank)
    for q_id, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), q_id
    recall = len(exact & {(r.q_id, r.vec_id) for r in rows}) / len(exact)
    assert recall >= 0.7, f"recall@10 too low: {recall}"


def test_pagerank_matches_numpy_and_duckdb_twin(spark):
    """PageRank on a hand-built graph with a dangling node: (a) within the
    1e-9 quantization grid of an unquantized numpy power iteration, (b)
    BIT-identical to the unrolled-CTE DuckDB twin (the property that makes
    an iterative float algorithm oracle-checkable), (c) total mass 1."""
    import duckdb
    import numpy as np

    from timedf_spark.operators.pagerank import pagerank, pagerank_sql

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)]
    ndf = spark.createDataFrame([(i,) for i in range(4)], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(ndf, edf, iters=12).collect()}

    # unquantized reference
    out = {0: [1, 2], 1: [2, 3], 2: [0], 3: []}
    d, n = 0.85, 4
    r = np.ones(n) / n
    for _ in range(12):
        nxt = np.full(n, (1 - d) / n)
        nxt += d * sum(r[u] for u in range(n) if not out[u]) / n
        for u in range(n):
            for v in out[u]:
                nxt[v] += d * r[u] / len(out[u])
        r = nxt
    assert max(abs(got[i] - r[i]) for i in range(n)) < 2e-8
    assert abs(sum(got.values()) - 1.0) < 1e-7  # mass conserved

    con = duckdb.connect()
    con.execute("CREATE TABLE n(node BIGINT)")
    con.execute("INSERT INTO n VALUES (0),(1),(2),(3)")
    con.execute("CREATE TABLE edges_t(src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO edges_t VALUES (?,?)", edges)
    sql = pagerank_sql("SELECT node FROM n", "SELECT src, dst FROM edges_t", iters=12)
    du = {row[0]: row[1] for row in con.execute(sql).fetchall()}
    assert du == got  # bit-identical, not approximately equal


def test_pagerank_releases_checkpoint_blocks(spark):
    """Iterative-operator contract: after the result materializes, only
    the final round's checkpoint blocks may remain registered."""
    from timedf_spark.operators.pagerank import pagerank

    sc = spark.sparkContext
    before = {int(str(k)) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    ndf = spark.createDataFrame([(i,) for i in range(20)], "node long")
    edf = spark.createDataFrame(
        [(i, (i + 1) % 20) for i in range(20)], "src long, dst long"
    )
    res = pagerank(ndf, edf, iters=8)
    res.collect()
    after = {int(str(k)) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
    assert len(after - before) <= 1, "stale checkpoint blocks leaked"


def test_incremental_components_equals_full_recompute(spark):
    """Incremental cluster maintenance must reach the same fixpoint as
    clustering the whole edge set from scratch — across merges of
    existing components, extensions by brand-new vertices, and untouched
    components passing through."""
    from timedf_spark.operators.cluster import (
        connected_components,
        incremental_components,
    )

    old_edges = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    new_edges = [(3, 10), (40, 41), (11, 99)]  # merge, new comp, extend
    all_vertices = sorted({v for e in old_edges + new_edges for v in e})

    vdf = spark.createDataFrame([(v,) for v in all_vertices], "v long")
    e_old = spark.createDataFrame(old_edges, "src long, dst long")
    e_new = spark.createDataFrame(new_edges, "src long, dst long")

    base = connected_components(vdf, e_old)
    inc = incremental_components(
        base.select("vertex", "component"), e_new
    )
    full = connected_components(vdf, e_old.unionByName(e_new))

    got = {(r["vertex"], r["component"]) for r in inc.collect()}
    want = {(r["vertex"], r["component"]) for r in full.collect()}
    assert got == want
    # untouched component (20,21) really passed through unrelabelled
    assert (20, 20) in got and (21, 20) in got


def test_prefix_filter_prunes_candidates_but_loses_nothing(spark, sf_dir):
    """Prefix filtering is exact (same pair set as the inverted-index
    tier — also pinned by the shared oracle) while generating strictly
    fewer candidate pairs than 'any shared shingle'."""
    from pyspark.sql.window import Window as W

    from timedf_spark.operators.text import shingle_expr_spark

    docs = load_table(spark, sf_dir, "documents")
    base = {(r["doc_a"], r["doc_b"]): r["jaccard"]
            for r in dedup.ngram_jaccard_pairs(spark, sf_dir).collect()}
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"]
           for r in dedup.ngram_jaccard_prefix_pairs(spark, sf_dir).collect()}
    assert got == base

    # candidate volume: prefix-join pairs vs any-shared-shingle pairs
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({shingle_expr_spark('text', 5)})")).alias("s"),
    ).select("doc_id", F.expr(
        "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)").alias("sh")).cache()
    any_shared = (
        sh.alias("a").join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select("a.doc_id", "b.doc_id").distinct().count()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    t = 0.2
    prefix = (
        sh.join(freq, "sh").join(sizes, "doc_id")
        .withColumn("rk", F.row_number().over(W.partitionBy("doc_id").orderBy("df", "sh")))
        .filter(F.col("rk") <= F.col("n_sh") - F.ceil(F.lit(t) * F.col("n_sh")) + 1)
    )
    pruned = (
        prefix.alias("a").join(
            prefix.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).select("a.doc_id", "b.doc_id").distinct().count()
    )
    sh.unpersist()
    assert pruned < any_shared, (pruned, any_shared)
    assert pruned >= len(base)  # candidates must cover every true pair


def test_filtered_ivf_search_recall_and_predicate(spark, sf_dir):
    """Filtered vector search: every hit must satisfy the attribute
    predicate (pre-filter soundness — post-filtering can emit none), and
    probe oversampling must recover recall vs the filtered brute force
    despite the ~10x-selective filter thinning each cell."""
    flt = "label = 3"
    exact = {
        (r["q_id"], r["vec_id"])
        for r in similarity.brute_force_topk(spark, sf_dir, corpus_filter=flt).collect()
    }
    got_rows = similarity.ivf_topk(
        spark, sf_dir, corpus_filter=flt, probe_boost=3
    ).collect()
    got = {(r["q_id"], r["vec_id"]) for r in got_rows}
    labels = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    assert got and all(labels[v] == 3 for _, v in got)
    recall = len(exact & got) / len(exact)
    assert recall >= 0.5, f"filtered recall too low: {recall}"
    # unfiltered behavior unchanged by the new parameters' defaults
    base = similarity.ivf_topk(spark, sf_dir)
    assert base.filter(F.col("rank") == 1).count() > 0
