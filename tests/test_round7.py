"""Round-5 regression tests: the four round-4 advisor items (compaction
liveness wedge, zero-pair tier report, persist-mode equality) plus the
off-timed-path persistence refactor."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from timedf_spark.sources.readers import load_table
from timedf_spark.streaming import sinks as streaming_sinks
from timedf_spark.streaming.compaction import compact_sink, read_sink


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_compaction_debris_below_covered(spark, sf_dir, tmp_path):
    """A partially-deleted folded dir BELOW coverage (best-effort cleanup
    crashed after removing _SUCCESS) must not wedge future compactions —
    the advisor's liveness finding: pre-fix, the ceiling pinned at the
    debris id <= covered and every compact_sink returned compacted=False
    forever."""
    path = str(tmp_path / "sink")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(300)
    )
    batches = [ev.filter((F.col("event_id") % 7) == i) for i in range(7)]
    for i in range(5):
        streaming_sinks.write_batch_idempotent(batches[i], i, path)
    stats = compact_sink(spark, path)  # folds 0..3, leaves max live (4)
    assert stats["compacted"] and stats["covered"] == 3

    # simulate cleanup debris: an already-folded dir id=2 reappears with a
    # stray data file and NO _SUCCESS (rmtree removed the marker, crashed)
    debris = os.path.join(path, "batch_id=2")
    os.makedirs(debris, exist_ok=True)
    with open(os.path.join(debris, "part-stray.parquet"), "wb") as f:
        f.write(b"not a real parquet file")

    for i in (5, 6):
        streaming_sinks.write_batch_idempotent(batches[i], i, path)
    stats2 = compact_sink(spark, path)
    assert stats2["compacted"], "debris below covered wedged the compactor"
    assert stats2["covered"] == 5  # folded 4,5; max live (6) left alone

    # reader view: all 7 committed batches, debris invisible
    assert _rows(read_sink(spark, path).drop("batch_id")) == _rows(ev)


def test_prefix_pairs_persist_modes_identical(spark, sf_dir):
    """persist_mode is an execution knob, never a semantics knob: cache
    (query-path default, harness owns cleanup) and checkpoint (long-lived
    session) must return identical pair sets."""
    from timedf_spark.operators import dedup

    cached = dedup.ngram_jaccard_prefix_pairs(spark, sf_dir, persist_mode="cache")
    ckpt = dedup.ngram_jaccard_prefix_pairs(spark, sf_dir, persist_mode="checkpoint")
    assert _rows(cached) == _rows(ckpt)
    spark.catalog.clearCache()


def test_tier_report_zero_pair_corpus_yields_null(spark, tmp_path):
    """On a corpus with no near-dup pairs, recall/precision must be NULL
    (nullif guard) rather than a crash or an engine-dependent x/0."""
    import duckdb

    from timedf_spark.queries.round6 import _tier_report_oracle, near_dup_tier_report

    sf = str(tmp_path / "mini")
    os.makedirs(sf, exist_ok=True)
    texts = [
        "alpha bravo charlie delta echo foxtrot golf hotel india juliett",
        "kilo lima mike november oscar papa quebec romeo sierra tango",
        "uniform victor whiskey xray yankee zulu one two three four",
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "web") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string",
    )
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))

    out = near_dup_tier_report(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_exact"] == 0 and r["n_lsh"] == 0 and r["n_common"] == 0
    assert r["recall"] is None and r["precision"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    orc = con.execute(_tier_report_oracle()).fetchall()
    assert orc[0][:3] == (0, 0, 0)
    assert orc[0][3] is None and orc[0][4] is None


def test_charlm_release_is_callers_choice(spark, sf_dir):
    """release=True and release=False score identically; the query wrapper
    defaults to False (harness owns cache hygiene — the r04 3.5x lesson)."""
    from timedf_spark.operators import lm

    docs = (
        load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    )
    kept = _rows(lm.charlm_doc_scores(docs, release=False))
    spark.catalog.clearCache()
    released = _rows(lm.charlm_doc_scores(docs, release=True))
    assert kept == released
    spark.catalog.clearCache()


def test_indexed_probe_equals_rehash_path(spark, sf_dir):
    """The band-signature-index probe must produce bit-identical pairs to
    the per-batch corpus re-hash (same deterministic hash family) — the
    contract that lets a deployment swap the O(corpus-tokens) re-hash for
    an index lookup without a semantics change."""
    from timedf_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)

    rehash = dedup.incremental_near_dup_pairs(batch, corpus)
    corpus_bands, _sh = dedup._minhash_bands(corpus)
    indexed = dedup.incremental_near_dup_pairs_indexed(batch, corpus, corpus_bands)
    assert _rows(rehash) == _rows(indexed)
    assert len(_rows(indexed)) > 0  # non-vacuous: sf0.001 has near-dups
    spark.catalog.clearCache()


def test_sketched_probe_equals_rehash_and_skips_corpus_text(spark, sf_dir, tmp_path):
    """The fully-sketched probe (persisted band index + persisted shingle
    store) must produce bit-identical pairs to the re-hash path, and its
    plan must not reference corpus TEXT anywhere — candidate verify runs
    on the stored (doc_id, sh) rows."""
    import re

    from timedf_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    bands_pq = str(tmp_path / "bands")
    sh_pq = str(tmp_path / "shingles")
    corpus_bands, corpus_sh = dedup._minhash_bands(corpus)
    corpus_bands.write.parquet(bands_pq)
    corpus_sh.write.parquet(sh_pq)
    spark.catalog.clearCache()

    sketched = dedup.incremental_near_dup_pairs_sketched(
        batch, spark.read.parquet(bands_pq), spark.read.parquet(sh_pq)
    )
    rehash = dedup.incremental_near_dup_pairs(batch, corpus)
    assert _rows(sketched) == _rows(rehash)
    assert len(_rows(sketched)) > 0
    # plan audit (r11 shape): the candidate probe of the band store ran
    # ONCE eagerly (_materialized_candidates) so the band relation is
    # gone from the lazy plan — a LogicalRDD stands in for it; the
    # shingle store relation remains (pruned by the bounded literal id
    # predicate), and corpus text still comes from NO relation.
    plan = sketched._jdf.queryExecution().analyzed().toString()
    assert not re.search(r"Relation \[doc_id#\d+L,band#\d+,band_key#\d+\]", plan)
    assert "LogicalRDD" in plan
    assert re.search(r"Relation \[doc_id#\d+L,sh#\d+L\]", plan)
    spark.catalog.clearCache()


def test_ingest_dedup_sig_coverage_mismatch_falls_back(spark, sf_dir, tmp_path):
    """Stores enabled MID-STREAM: corpus batches written before sig_path
    existed have no band rows. The probe must NOT silently miss pairs
    against them — uncovered batches fall back to the re-hash tier, so
    the assignment still reaches the exact all-docs fixpoint."""
    from timedf_spark.operators import cluster, dedup
    from timedf_spark.streaming import cluster_apply as ca
    from timedf_spark.streaming import ingest_dedup as idd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_store = str(tmp_path / "docs_store")
    assign_store = str(tmp_path / "assign_store")
    sig_store = str(tmp_path / "sig_store")
    shingle_store = str(tmp_path / "shingle_store")
    idd.seed_empty_assignments(spark, assign_store)
    # batches 0-1: no index stores at all; batch 2: sig only; batch 3: both
    n = 4
    for b in range(n):
        part = docs.filter(F.col("doc_id") % n == b)
        idd.apply_ingest_batch(
            part, b, corpus_store, assign_store,
            sig_path=sig_store if b >= 2 else None,
            shingle_path=shingle_store if b >= 3 else None,
        )
    got = {
        (r["vertex"], r["component"])
        for r in ca.read_assignments(spark, assign_store).collect()
    }
    want = {
        (r["vertex"], r["component"])
        for r in cluster.connected_components(
            docs.select("doc_id"),
            dedup.minhash_lsh_pairs_df(docs).select("doc_a", "doc_b"),
        ).collect()
    }
    assert got == want
    spark.catalog.clearCache()


def test_indexed_probe_plan_skips_corpus_minhash(spark, sf_dir, tmp_path):
    """With a persisted signature store, candidate generation reads the
    index instead of re-minhashing the corpus. r11 materializes the
    candidate frame eagerly on BOTH paths (it feeds two consumers), so
    the distinction now lives at the candidate-PROBE stage, where the
    minhash aggregates are countable via their mh0 alias: the rehash
    probe signs batch AND corpus (2 aggregates), the indexed probe signs
    only the batch (1) and scans the band store. The returned lazy plans
    both carry ZERO minhash aggregates (the sketch work ran once, inside
    the checkpoint) and corpus text survives only under the
    candidate-verify."""
    import re

    from timedf_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    corpus_pq = str(tmp_path / "corpus_docs")
    bands_pq = str(tmp_path / "corpus_bands")
    docs.filter(F.col("doc_id") % 5 != 0).write.parquet(corpus_pq)
    corpus_bands, _sh = dedup._minhash_bands(spark.read.parquet(corpus_pq))
    corpus_bands.write.parquet(bands_pq)
    spark.catalog.clearCache()

    corpus = spark.read.parquet(corpus_pq)
    store = spark.read.parquet(bands_pq)
    # probe stage: where the corpus-minhash-skipped property is visible
    batch_bands, _bsh = dedup._minhash_bands(batch)
    rehash_bands, _csh = dedup._minhash_bands(corpus)
    probe_i = dedup._probe_candidates(batch_bands, store)
    probe_r = dedup._probe_candidates(batch_bands, rehash_bands)
    pplan_i = probe_i._jdf.queryExecution().analyzed().toString()
    pplan_r = probe_r._jdf.queryExecution().analyzed().toString()
    assert pplan_i.count(" AS mh0#") == 1, pplan_i.count(" AS mh0#")
    assert pplan_r.count(" AS mh0#") == 2, pplan_r.count(" AS mh0#")
    assert re.search(r"Relation \[doc_id#\d+L,band#\d+,band_key#\d+\]", pplan_i)

    indexed = dedup.incremental_near_dup_pairs_indexed(
        batch, corpus, spark.read.parquet(bands_pq)
    )
    rehash = dedup.incremental_near_dup_pairs(batch, corpus)
    plan_i = indexed._jdf.queryExecution().analyzed().toString()
    plan_r = rehash._jdf.queryExecution().analyzed().toString()
    # r11: the batch sketch AND the band/corpus probe live inside the
    # eagerly-materialized candidate frame on both paths, so neither lazy
    # plan re-runs a minhash aggregate per consumer; the band relation is
    # replaced by a LogicalRDD; corpus text survives only under the
    # candidate verify.
    assert plan_i.count(" AS mh0#") == 0, plan_i.count(" AS mh0#")
    assert plan_r.count(" AS mh0#") == 0, plan_r.count(" AS mh0#")
    assert not re.search(r"Relation \[doc_id#\d+L,band#\d+,band_key#\d+\]", plan_i)
    assert "LogicalRDD" in plan_i
    n_corpus_text = len(re.findall(r"Relation \[doc_id#\d+L,text#\d+\]", plan_i))
    assert 0 < n_corpus_text <= 2, plan_i
    spark.catalog.clearCache()


def test_streaming_ingest_dedup_signature_store(spark, sf_dir, tmp_path):
    """ingest_dedup with sig_path: the loop maintains a per-batch band
    signature store, probes it instead of re-hashing the corpus, and
    still reaches the exact batch fixpoint (same assignment as
    from-scratch CC over all-docs LSH pairs)."""
    import glob
    import tempfile

    from timedf_spark.operators import cluster, dedup
    from timedf_spark.streaming import cluster_apply as ca
    from timedf_spark.streaming import ingest_dedup as idd

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_store = str(tmp_path / "docs_store")
    assign_store = str(tmp_path / "assign_store")
    sig_store = str(tmp_path / "sig_store")
    idd.seed_empty_assignments(spark, assign_store)

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "docs")
        docs.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            idd.ingest_dedup_sink(
                stream, corpus_store, assign_store, os.path.join(d, "ckpt"),
                sig_path=sig_store,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # one committed signature dir per document batch
    sig_dirs = glob.glob(os.path.join(sig_store, "batch_id=*"))
    doc_dirs = glob.glob(os.path.join(corpus_store, "batch_id=*"))
    assert len(sig_dirs) == len(doc_dirs) >= 3

    got = {
        (r["vertex"], r["component"])
        for r in ca.read_assignments(spark, assign_store).collect()
    }
    want = {
        (r["vertex"], r["component"])
        for r in cluster.connected_components(
            docs.select("doc_id"),
            dedup.minhash_lsh_pairs_df(docs).select("doc_a", "doc_b"),
        ).collect()
    }
    assert got == want
    spark.catalog.clearCache()


def test_incremental_components_hybrid_paths_agree(spark):
    """The driver union-find fast path and the distributed pointer-
    jumping path must produce identical assignments (small_graph_edges=0
    forces distributed)."""
    from timedf_spark.operators.cluster import incremental_components

    asg = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3), (4, 4), (5, 5), (9, 9)],
        "vertex long, component long",
    )
    edges = spark.createDataFrame(
        [(2, 3), (4, 5), (7, 8), (8, 1)], "src long, dst long"
    )
    fast = _rows(incremental_components(asg, edges))
    dist = _rows(incremental_components(asg, edges, small_graph_edges=0))
    assert fast == dist
    # spot-check semantics: 7-8-1-2-3 all collapse to min id 1; 4-5 to 4
    # (_rows sorts columns alphabetically: tuples are (component, vertex))
    d = {v: c for c, v in fast}
    assert d[7] == d[8] == d[1] == d[2] == d[3] == 1
    assert d[4] == d[5] == 4 and d[9] == 9


def test_connected_components_hybrid_paths_agree(spark):
    """connected_components' driver union-find fast path (round-6
    addition) must match the distributed pointer-jumping fixpoint on the
    same graph, with and without an explicit vertex frame."""
    from timedf_spark.operators.cluster import connected_components

    edges = spark.createDataFrame(
        [(2, 3), (4, 5), (7, 8), (8, 1), (1, 2)], "src long, dst long"
    )
    verts = spark.createDataFrame(
        [(v,) for v in (1, 2, 3, 4, 5, 7, 8, 42)], "v long"
    )
    fast = _rows(connected_components(verts, edges))
    dist = _rows(connected_components(verts, edges, small_graph_edges=0))
    assert fast == dist
    d = {v: c for c, v in fast}
    assert d[1] == d[2] == d[3] == d[7] == d[8] == 1
    assert d[4] == d[5] == 4 and d[42] == 42  # off-graph singleton
    # endpoints-only contract (vertices=None)
    fast_n = _rows(connected_components(None, edges))
    dist_n = _rows(connected_components(None, edges, small_graph_edges=0))
    assert fast_n == dist_n
    assert {v for _, v in fast_n} == {1, 2, 3, 4, 5, 7, 8}


def test_streaming_equidepth_from_rollup_counts_equals_batch(spark, sf_dir, tmp_path):
    """Equi-depth over a LIVING table: the per-value count store (exact
    rollup store, keys=['v']) maintained through micro-batches, finished
    by the same boundary pass — bit-for-bit equal to the one-shot batch
    histogram."""
    import tempfile

    from timedf_spark.operators import summaries
    from timedf_spark.queries.round7 import _EQUIDEPTH_K, _PRICE_EXPR
    from timedf_spark.streaming import rollup_apply as ra

    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(F.expr(_PRICE_EXPR).alias("v"))
    store = str(tmp_path / "counts_store")
    ra.seed_rollup_store(spark, store, "v bigint")

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "vals")
        vals.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema(vals.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            ra.rollup_sink(stream, store, os.path.join(d, "ckpt"),
                           ["v"], "v bigint", "v")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    counts = ra.read_rollup(spark, store, "v bigint").select(
        "v", F.col("n_rows").alias("n")
    )
    got = _rows(summaries.equidepth_from_counts(counts, _EQUIDEPTH_K))
    want = _rows(summaries.equidepth_histogram(orders, _PRICE_EXPR, _EQUIDEPTH_K))
    assert got == want


def test_streaming_mg_guarantee_and_replay(spark, sf_dir, tmp_path):
    """Multi-batch MG maintenance: every estimate undercounts by at most
    n_total/(k+1), every true heavy hitter above that bound is present,
    the summary never exceeds k counters, and a redelivered batch id is
    a no-op."""
    import tempfile

    from timedf_spark.streaming import mg_apply as mg

    k = 20
    docs = load_table(spark, sf_dir, "documents")
    tokens = (
        docs.select(F.explode(F.split("text", " ")).alias("item"))
        .filter(F.col("item") != "")
    )
    store = str(tmp_path / "mg_store")
    mg.seed_mg_store(spark, store)

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "tokens")
        tokens.repartition(5).write.parquet(src)
        stream = (
            spark.readStream.schema(tokens.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            mg.mg_sink(stream, store, os.path.join(d, "ckpt"), "item", k)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    summary = {r["item"]: r["est_count"] for r in mg.read_mg(spark, store).collect()}
    exact = {
        r["item"]: r["cnt"]
        for r in tokens.groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    n_total = sum(exact.values())
    bound = n_total / (k + 1)
    assert 0 < len(summary) <= k
    for item, est in summary.items():
        assert est <= exact[item], (item, est, exact[item])          # undercount only
        assert exact[item] - est <= bound, (item, est, exact[item])  # error bound
    for item, cnt in exact.items():  # true HH above the bound must survive
        if cnt > bound:
            assert item in summary, (item, cnt, bound)

    # redelivery: same (or lower) batch id must be a no-op
    from timedf_spark.streaming.cdc_apply import _current_version

    v = _current_version(store)
    mg.apply_mg_batch(tokens.limit(100), v, store, "item", k)
    assert _current_version(store) == v
    after = {r["item"]: r["est_count"] for r in mg.read_mg(spark, store).collect()}
    assert after == summary


def test_cc_long_iteration_stays_flat(spark):
    """High-diameter graphs need 20+ pointer-jumping rounds; pre-fix,
    planner metadata compounded through the checkpoint chain and round
    cost grew ~2.4x/round from round ~16 (never converging on the
    10x-scale graph). With the metadata strip in _checkpoint, a
    phase-transition random graph converges in bounded wall-clock.
    Deterministic graph (xxhash), exact component count pinned against
    driver-side union-find."""
    import time

    from timedf_spark.operators.cluster import (
        _unionfind_components,
        connected_components,
    )

    n = 2000
    edges = (
        spark.range(1100)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(1))) % n).alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(2))) % n).alias("dst"),
        )
        .filter("src != dst")
    )
    rows = [(r["src"], r["dst"]) for r in edges.collect()]
    want = sorted(_unionfind_components(rows))

    t0 = time.perf_counter()
    got = sorted(
        (r["vertex"], r["component"])
        for r in connected_components(None, edges).collect()
    )
    wall = time.perf_counter() - t0
    assert got == want
    assert wall < 120, f"CC took {wall:.0f}s — iteration blowup regressed"
    spark.catalog.clearCache()
