"""Round-8 regression tests: the four round-7 advisor items.

1. (medium) a LEGACY compaction manifest (no 'floor' key) must not make
   _store_bids claim NOTHING for the compacted epoch — for the CORPUS
   store that silently drops batches 0..covered from the probe set
   (missed pairs). The floor is derived from the epoch data's true
   min(batch_id).
2. (low)    a second compaction over a legacy manifest must not record
   floor = min(live) (> covered, permanently orphaning the epoch
   region) — it derives the true floor from the existing epoch.
3. (low)    interval_overlap_topk with a right frame lacking *_id
   columns must still rank deterministically (falls back to every b_
   column as the tie-break).
4. (low)    bench._plan_chunks with an all-isolated name list must not
   divide by zero, and evidence must still run in some chunk.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F


def _strip_floor(store: str) -> None:
    """Rewrite the manifest WITHOUT its floor key — exactly what a store
    compacted by pre-floor code left on disk."""
    from timedf_spark.streaming import compaction as cp

    m = cp._load_manifest(store)
    m.pop("floor", None)
    with open(cp._manifest_path(store), "w") as f:
        json.dump(m, f)
    cp._FLOOR_CACHE.clear()


def test_legacy_manifest_epoch_floor_derived(spark, tmp_path):
    """Legacy manifest (epoch published, no floor): _store_bids derives
    floor..covered from the epoch parquet instead of claiming nothing.
    Pre-fix this returned {} for the compacted region — for the corpus
    store that is a correctness loss, not a slow path."""
    from timedf_spark.streaming import ingest_dedup as idd
    from timedf_spark.streaming.compaction import _load_manifest, compact_sink
    from timedf_spark.streaming.sinks import write_batch_idempotent

    store = str(tmp_path / "corpus_store")
    for b in range(4):
        df = spark.range(b * 10, b * 10 + 5).select(
            F.col("id").alias("doc_id"), F.lit(f"doc {b}").alias("text")
        )
        write_batch_idempotent(df, b, store)
    res = compact_sink(spark, store, min_batches=2, include_max_live=True)
    assert res["compacted"] and res["covered"] == 3
    _strip_floor(store)
    assert "floor" not in _load_manifest(store)
    assert idd._store_bids(store, 10) == {0, 1, 2, 3}


def test_legacy_manifest_second_compaction_derives_true_floor(spark, tmp_path):
    """Compacting on top of a legacy manifest must record the epoch's
    true lowest batch id (here 1: store enabled mid-stream), not
    min(live) — which after the first compaction is > covered and would
    permanently orphan the epoch region from every coverage consumer."""
    from timedf_spark.streaming import ingest_dedup as idd
    from timedf_spark.streaming.compaction import _load_manifest, compact_sink
    from timedf_spark.streaming.sinks import write_batch_idempotent

    store = str(tmp_path / "sig_store")
    for b in (1, 2, 3):
        df = spark.range(b * 10, b * 10 + 5).select(
            F.col("id").alias("doc_id"), F.lit(b).alias("band")
        )
        write_batch_idempotent(df, b, store)
    assert compact_sink(spark, store, min_batches=2, include_max_live=True)[
        "compacted"
    ]
    _strip_floor(store)
    for b in (4, 5):
        df = spark.range(b * 10, b * 10 + 5).select(
            F.col("id").alias("doc_id"), F.lit(b).alias("band")
        )
        write_batch_idempotent(df, b, store)
    assert compact_sink(spark, store, min_batches=2, include_max_live=True)[
        "compacted"
    ]
    # pre-fix: floor would be min(live) = 4, orphaning batches 1-3
    assert _load_manifest(store)["floor"] == 1
    assert idd._store_bids(store, 10) == {1, 2, 3, 4, 5}
    # and mid-stream enablement is still honored: batch 0 never claimed
    assert 0 not in idd._store_bids(store, 10)


def test_legacy_corpus_store_still_probed_end_to_end(spark, tmp_path):
    """The actual miss scenario the advisor flagged: corpus compacted by
    pre-floor code, then a new batch arrives whose only near-dup lives
    in the compacted region — the pair must still be found."""
    from timedf_spark.streaming import cluster_apply as ca
    from timedf_spark.streaming import ingest_dedup as idd
    from timedf_spark.streaming.compaction import compact_sink

    words = [
        "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
        "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
        "oscar", "papa", "quebec", "romeo", "sierra", "tango",
    ]
    base = " ".join(words)
    docs = [
        (1, base),
        (2, "totally different unrelated content entirely here now"),
        (3, "another separate piece of text with its own private words"),
        (4, base + " tiny tail"),  # near-dup of doc 1 (batch 0)
    ]
    corpus_store = str(tmp_path / "docs_store")
    assign_store = str(tmp_path / "assign_store")
    idd.seed_empty_assignments(spark, assign_store)
    for b in range(3):
        df = spark.createDataFrame([docs[b]], "doc_id long, text string")
        idd.apply_ingest_batch(df, b, corpus_store, assign_store)
    assert compact_sink(
        spark, corpus_store, min_batches=2, include_max_live=True
    )["compacted"]
    _strip_floor(corpus_store)
    df = spark.createDataFrame([docs[3]], "doc_id long, text string")
    idd.apply_ingest_batch(df, 3, corpus_store, assign_store)
    comp = {
        r["vertex"]: r["component"]
        for r in ca.read_assignments(spark, assign_store).collect()
    }
    assert comp[4] == comp[1], "pair against the compacted corpus was missed"
    assert comp[2] != comp[1]
    spark.catalog.clearCache()


def test_interval_topk_deterministic_without_id_columns(spark):
    """Right frame with no *_id columns: the tie-break falls back to all
    b_ columns, so equal-overlap partners rank deterministically (the
    smaller (b_end_us, b_start_us, b_tag) tuple wins)."""
    from timedf_spark.operators.intervals import interval_overlap_topk

    left = spark.createDataFrame(
        [(7, 100, 200)], "a_key long, start_us long, end_us long"
    ).selectExpr("a_key as key", "start_us", "end_us")
    # two right rows with IDENTICAL interval (same overlap) but different
    # tag; plus one longer-overlap row that must rank first
    right = spark.createDataFrame(
        [(120, 160, "zz"), (120, 160, "aa"), (100, 200, "mid")],
        "start_us long, end_us long, tag string",
    )
    out = interval_overlap_topk(
        left, right, key_cols=["a_key"], k=2
    ).orderBy("overlap_rank")
    rows = out.collect()
    assert [r["overlap_rank"] for r in rows] == [1, 2]
    assert rows[0]["b_tag"] == "mid"  # largest overlap first
    # among the tied pair, all-b_-column ordering picks 'aa' ahead of 'zz'
    assert rows[1]["b_tag"] == "aa"


def test_bench_plan_chunks_all_isolated_and_mixed():
    import bench

    # all-isolated: pre-fix this raised ZeroDivisionError and silently
    # skipped evidence (evidence_chunk = -1 matched nothing)
    chunks, ev = bench._plan_chunks(list(bench.ISOLATED_QUERIES))
    assert chunks and all(len(c) == 1 for c in chunks)
    assert 0 <= ev < len(chunks)
    # mixed: evidence runs in the last REGULAR chunk
    names = ["q1", "q2", bench.ISOLATED_QUERIES[0], "q3"]
    chunks, ev = bench._plan_chunks(names)
    assert chunks[ev] == ["q1", "q2", "q3"]
    assert [bench.ISOLATED_QUERIES[0]] in chunks
    # splitting respects CHUNK_LIMIT
    many = [f"q{i}" for i in range(bench.CHUNK_LIMIT + 1)]
    chunks, ev = bench._plan_chunks(many)
    assert all(len(c) <= bench.CHUNK_LIMIT for c in chunks)
    assert sum(len(c) for c in chunks) == len(many)
    assert os.path.basename(bench.__file__) == "bench.py"


def test_bench_graph_family_gets_its_own_chunk():
    """VERDICT r07 item 1: the iterative-graph queries share ONE dedicated
    fresh-JVM chunk — never mixed into the regular slices."""
    import bench

    fam = list(bench.FAMILY_CHUNKS["graph"])
    names = ["q1", *fam, "q2", bench.ISOLATED_QUERIES[0]]
    chunks, ev = bench._plan_chunks(names)
    assert fam in chunks
    assert chunks[ev] == ["q1", "q2"]
    for c in chunks:
        if c != fam:
            assert not set(c) & set(fam)


def test_bench_local_pin_relative_suspect_trigger(monkeypatch):
    """A driver-env query inflated vs the scan-adjusted LOCAL pin must be
    re-measured even when its own driver pin is equally inflated (the
    supplier_communities r07 blind spot)."""
    import bench

    driver_pin = {"sf": 0.1, "queries": {"slowq": 11.5, "fineq": 1.0},
                  "scan_baseline_sec": 2.1}
    local_pin = {"sf": 0.1, "queries": {"slowq": 6.3, "fineq": 1.0},
                 "scan_baseline_sec": 1.8}
    monkeypatch.setattr(bench, "_read_pin", lambda: driver_pin)
    monkeypatch.setattr(
        bench, "_read_pin_for",
        lambda tag: local_pin if tag == "local" else driver_pin,
    )
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ENV", raising=False)
    # 11.4 s is within 2.5x of its own (inflated) pin -> pre-fix: no
    # suspect; the local-pin rule flags it (11.4 > 1.5 * (2.1/1.8) * 6.3)
    got = bench._find_suspects({"slowq": 11.4, "fineq": 1.05}, 0.1, 2.1)
    assert got == ["slowq"]
    # a local-tagged run must NOT apply the cross-env rule to itself
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ENV", "local")
    monkeypatch.setattr(bench, "_read_pin", lambda: local_pin)
    assert bench._find_suspects({"slowq": 11.4, "fineq": 1.05}, 0.1, 1.8) == []
    # ...until it crosses its own-pin threshold
    assert bench._find_suspects({"slowq": 16.0, "fineq": 1.05}, 0.1, 1.8) == ["slowq"]


def test_pagerank_scale_autofit():
    """Past ~9M nodes the fixed scale-9 envelope fails; _fit_scale must
    lower the quantum (loudly) instead of refusing, stay a pure function
    of n, and refuse only below the scale-5 floor."""
    import warnings

    from timedf_spark.operators.pagerank import _fit_scale

    assert _fit_scale(1_600, 9) == 9  # small graph untouched
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = _fit_scale(16_000_000, 9)  # the 1000x graph tier
        assert got == 8 and 16_000_000 * 10**8 < (1 << 53)
        assert any("scale lowered" in str(x.message) for x in w)
    assert _fit_scale(16_000_000, 9) == got  # deterministic
    import pytest

    with pytest.raises(AssertionError):
        _fit_scale(10**14, 9)  # beyond even scale-5: refuse
