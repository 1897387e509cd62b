"""Round-7 regression tests: the five round-6 advisor items.

1. (high)   ingest_dedup fallback tier threshold must equal the shared
            _JACCARD_THRESHOLD — mid-Jaccard cross-batch pairs must not
            be dropped by the rehash tier.
2. (medium) compaction records a coverage FLOOR; _store_bids must not
            claim batches below the first batch ever folded (index
            store enabled mid-stream + later compaction).
3. (low)    labelprop driver fast path bounds the NODE collect too.
4. (low)    drift-monitor redelivery repair fires on a PARTIAL log dir
            (no _SUCCESS), not only a missing one.
5. (low)    cosine_dedup_pairs docstring points at the evidence guard
            that actually exists.
"""

from __future__ import annotations

import inspect
import os

import pyspark.sql.functions as F

from timedf_spark.operators.dedup import _JACCARD_THRESHOLD


def test_rehash_tier_default_threshold_matches_shared_constant():
    from timedf_spark.streaming import ingest_dedup as idd

    sig = inspect.signature(idd._rehash_corpus_pairs)
    assert sig.parameters["threshold"].default == _JACCARD_THRESHOLD


def test_rehash_tier_finds_mid_jaccard_cross_batch_pair(spark, tmp_path):
    """Two docs with Jaccard well inside [_JACCARD_THRESHOLD, 0.8) land
    in different batches with NO index stores (every corpus batch routes
    through the rehash fallback). The pre-fix 0.8 default silently
    dropped exactly this pair."""
    from timedf_spark.operators import dedup
    from timedf_spark.streaming import cluster_apply as ca
    from timedf_spark.streaming import ingest_dedup as idd

    words = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
        "victor", "whiskey", "xray", "yankee", "zulu", "one", "two",
        "three", "four",
    ]
    base = " ".join(words)
    # 8 appended words → 4-shingle Jaccard ≈ 27/38 ≈ 0.71: inside the
    # band s-curve (pair IS an LSH candidate) and inside [0.2, 0.8).
    variant = base + " " + " ".join(f"tail{i} word{i}" for i in range(4))
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, variant),
            (3, "totally different unrelated content entirely here now"),
        ],
        "doc_id long, text string",
    )
    # Confirm the pair is mid-band: present at the shared threshold,
    # absent at 0.8 — otherwise this test can't catch the regression.
    at_shared = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs_df(docs).select("doc_a", "doc_b").collect()
    }
    at_strict = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs_df(docs, threshold=0.8)
        .select("doc_a", "doc_b")
        .collect()
    }
    assert (1, 2) in at_shared and (1, 2) not in at_strict

    corpus_store = str(tmp_path / "docs_store")
    assign_store = str(tmp_path / "assign_store")
    idd.seed_empty_assignments(spark, assign_store)
    idd.apply_ingest_batch(docs.filter("doc_id = 1"), 0, corpus_store, assign_store)
    idd.apply_ingest_batch(
        docs.filter("doc_id != 1"), 1, corpus_store, assign_store
    )
    comp = {
        r["vertex"]: r["component"]
        for r in ca.read_assignments(spark, assign_store).collect()
    }
    assert comp[1] == comp[2], "cross-batch mid-Jaccard pair was dropped"
    assert comp[3] != comp[1]
    spark.catalog.clearCache()


def test_compaction_floor_blocks_phantom_coverage(spark, tmp_path):
    """A store enabled mid-stream (first batch id 2) that later compacts
    must not claim coverage of batches 0..covered — only floor..covered."""
    from timedf_spark.streaming import ingest_dedup as idd
    from timedf_spark.streaming.compaction import _load_manifest, compact_sink
    from timedf_spark.streaming.sinks import write_batch_idempotent

    store = str(tmp_path / "sig_store")
    for b in (2, 3, 4):
        df = spark.range(b * 10, b * 10 + 5).select(
            F.col("id").alias("doc_id"), F.lit(b).alias("band")
        )
        write_batch_idempotent(df, b, store)
    assert idd._store_bids(store, 10) == {2, 3, 4}
    res = compact_sink(spark, store, min_batches=2, include_max_live=True)
    assert res["compacted"] and res["covered"] == 4
    assert _load_manifest(store)["floor"] == 2
    # Post-compaction the dirs are folded into the epoch; coverage must
    # still be exactly {2, 3, 4} — NOT {0, 1, 2, 3, 4}.
    assert idd._store_bids(store, 10) == {2, 3, 4}
    # A second compaction carries the floor forward.
    for b in (5, 6):
        df = spark.range(b * 10, b * 10 + 5).select(
            F.col("id").alias("doc_id"), F.lit(b).alias("band")
        )
        write_batch_idempotent(df, b, store)
    res = compact_sink(spark, store, min_batches=2, include_max_live=True)
    assert res["compacted"]
    assert _load_manifest(store)["floor"] == 2
    assert idd._store_bids(store, 10) == {2, 3, 4, 5, 6}


def test_ingest_dedup_correct_after_mid_stream_sig_store_compaction(
    spark, sf_dir, tmp_path
):
    """End-to-end: sig store enabled at batch 2 of 5, compacted after
    batch 3 — later batches must still reach the exact all-docs
    fixpoint (pre-fix, batches 0-1 routed to the indexed tier with no
    rows and their cross pairs vanished)."""
    from timedf_spark.operators import cluster, dedup
    from timedf_spark.sources.readers import load_table
    from timedf_spark.streaming import cluster_apply as ca
    from timedf_spark.streaming import ingest_dedup as idd
    from timedf_spark.streaming.compaction import compact_sink

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus_store = str(tmp_path / "docs_store")
    assign_store = str(tmp_path / "assign_store")
    sig_store = str(tmp_path / "sig_store")
    idd.seed_empty_assignments(spark, assign_store)
    n = 5
    for b in range(n):
        part = docs.filter(F.col("doc_id") % n == b)
        idd.apply_ingest_batch(
            part, b, corpus_store, assign_store,
            sig_path=sig_store if b >= 2 else None,
        )
        if b == 3:
            res = compact_sink(
                spark, sig_store, min_batches=2, include_max_live=True
            )
            assert res["compacted"]
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


def test_lpa_driver_path_requires_node_bound(spark, monkeypatch):
    """With the node count above _DRIVER_MAX_NODES the fast path must
    NOT collect — the distributed rounds run (observed by poisoning the
    driver kernel) and still produce the right labels."""
    from timedf_spark.operators import labelprop

    nodes = spark.createDataFrame([(i,) for i in range(8)], "node long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "a long, b long"
    )
    want = {
        (r["node"], r["label"])
        for r in labelprop.label_propagation(nodes, edges, iters=2).collect()
    }

    def _boom(*a, **k):
        raise AssertionError("driver fast path taken despite node bound")

    monkeypatch.setattr(labelprop, "_DRIVER_MAX_NODES", 4)
    monkeypatch.setattr(labelprop, "_driver_lpa", _boom)
    got = {
        (r["node"], r["label"])
        for r in labelprop.label_propagation(nodes, edges, iters=2).collect()
    }
    assert got == want


def test_drift_redelivery_repairs_partial_log_dir(spark, sf_dir, tmp_path):
    """Crash DURING the log write leaves a partial dir without _SUCCESS;
    redelivery must rewrite it, not skip the repair."""
    import shutil

    from timedf_spark.sources.readers import load_table
    from timedf_spark.streaming import drift_monitor as dm

    events = load_table(spark, sf_dir, "events")
    batch = events.limit(500).select(
        (F.abs(F.hash("event_type")) % 10).alias("bucket")
    )
    ref = batch.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    store = str(tmp_path / "drift")
    dm.seed_drift_monitor(spark, store, ref)
    dm.apply_drift_batch(batch, 0, store)
    log_dir = os.path.join(store, "log", "batch=0")
    want = sorted(tuple(r) for r in spark.read.parquet(log_dir).collect())
    # Simulate the mid-write crash: keep the dir, drop the commit marker
    # and a data file.
    os.remove(os.path.join(log_dir, "_SUCCESS"))
    for f in os.listdir(log_dir):
        if f.endswith(".parquet"):
            os.remove(os.path.join(log_dir, f))
            break
    dm.apply_drift_batch(batch, 0, store)  # redelivery
    assert os.path.exists(os.path.join(log_dir, "_SUCCESS"))
    got = sorted(tuple(r) for r in spark.read.parquet(log_dir).collect())
    assert got == want
    shutil.rmtree(store, ignore_errors=True)


def test_cosine_dedup_docstring_references_existing_evidence_guard():
    from timedf_spark.operators import similarity
    import timedf_spark.evidence as ev

    # r09: the full docstring moved to the frame-level function when the
    # table entry point became a thin wrapper — check where it lives now
    doc = similarity.cosine_dedup_pairs_df.__doc__
    src = inspect.getsource(ev)
    assert "semantic_dedup_capped" in doc
    assert "semantic_dedup_degree_cap" not in doc
    assert 'guard("semantic_dedup_capped"' in src
