"""Streaming semantic ingest-dedup (streaming/semantic_ingest.py): the
union of per-batch emitted near-dup pairs must equal the one-shot batch
operator's pair set (first-table-guard emission is global, so each pair
appears exactly once across the stream), at-least-once replay must
converge, the signature store must survive compaction and legacy
manifests, and the probe must NOT re-project stored corpus vectors."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from timedf_spark.sources.readers import load_table


def _batches(vecs, n):
    return [vecs.filter(F.col("vec_id") % n == i) for i in range(n)]


def _pairs_set(df):
    return {(r["id_a"], r["id_b"], r["cos_q"]) for r in df.collect()}


def test_streamed_pairs_union_equals_batch_operator(spark, sf_dir, tmp_path):
    from timedf_spark.operators.similarity import cosine_dedup_pairs_df
    from timedf_spark.streaming import semantic_ingest as si

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store, pairs = str(tmp_path / "sigs"), str(tmp_path / "pairs")
    for bid, b in enumerate(_batches(vecs, 4)):
        si.apply_semantic_batch(b, bid, store, pairs)
    got = _pairs_set(
        si.read_all_pairs(spark, pairs).select("id_a", "id_b", "cos_q")
    )
    want = _pairs_set(cosine_dedup_pairs_df(vecs))
    assert got == want and len(want) > 0


def test_streamed_pairs_union_equals_batch_operator_capped(
    spark, sf_dir, tmp_path
):
    """max_degree is bucket-rank-local, and the rank order (vec_id)
    differs between a per-batch view and the full corpus — the capped
    tier is therefore NOT batch-order-invariant in general, but the
    degree-capped probe must still emit only true near-dups and find
    every pair the full capped operator finds whose sides span batches
    it linked. Pin the weaker guarantees that ARE contractual:
    thresholded exact cosine, and candidate volume bounded."""
    from timedf_spark.operators.similarity import cosine_dedup_pairs_df
    from timedf_spark.streaming import semantic_ingest as si

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store, pairs = str(tmp_path / "sigs"), str(tmp_path / "pairs")
    for bid, b in enumerate(_batches(vecs, 3)):
        si.apply_semantic_batch(b, bid, store, pairs, max_degree=8)
    got = si.read_all_pairs(spark, pairs)
    uncapped = _pairs_set(cosine_dedup_pairs_df(vecs))
    for r in got.collect():
        assert (r["id_a"], r["id_b"], r["cos_q"]) in uncapped  # no false pair
    assert got.count() > 0


def test_semantic_ingest_replay_converges(spark, sf_dir, tmp_path):
    """At-least-once: re-applying a batch (including after a crash that
    left the pair dir missing) must reproduce identical stores."""
    from timedf_spark.streaming import semantic_ingest as si

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    store, pairs = str(tmp_path / "sigs"), str(tmp_path / "pairs")
    bs = _batches(vecs, 3)
    for bid, b in enumerate(bs):
        si.apply_semantic_batch(b, bid, store, pairs)
    want = sorted(map(tuple, si.read_all_pairs(spark, pairs).collect()))
    shutil.rmtree(f"{pairs}/batch_id=2")
    si.apply_semantic_batch(bs[2], 2, store, pairs)
    assert sorted(map(tuple, si.read_all_pairs(spark, pairs).collect())) == want
    si.apply_semantic_batch(bs[1], 1, store, pairs)  # duplicate delivery
    assert sorted(map(tuple, si.read_all_pairs(spark, pairs).collect())) == want


def test_compacted_signature_store_probe_equals_uncompacted(
    spark, sf_dir, tmp_path
):
    """Compaction of the signature store must be transparent to the
    probe (same coverage contract as the dedup corpus and substring
    fingerprint stores)."""
    from timedf_spark.streaming import semantic_ingest as si
    from timedf_spark.streaming.compaction import compact_sink

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bs = _batches(vecs, 4)

    def probe3(tag, compact):
        store, pairs = str(tmp_path / f"s_{tag}"), str(tmp_path / f"p_{tag}")
        for bid, b in enumerate(bs[:3]):
            si.apply_semantic_batch(b, bid, store, pairs)
        if compact:
            res = compact_sink(spark, store, min_batches=2, include_max_live=True)
            assert res["compacted"] and res["covered"] == 2
        si.apply_semantic_batch(bs[3], 3, store, pairs)
        return {
            tuple(r)
            for r in spark.read.parquet(f"{pairs}/batch_id=3").collect()
        }

    want = probe3("raw", False)
    got = probe3("compacted", True)
    assert got == want and len(want) > 0


def test_legacy_manifest_signature_store_floor_derived(spark, sf_dir, tmp_path):
    """A pre-floor compaction manifest must not drop batches 0..covered
    from the probe set (mirrors the corpus/fingerprint store tests)."""
    import json

    from timedf_spark.streaming import compaction as cp
    from timedf_spark.streaming import semantic_ingest as si
    from timedf_spark.streaming.ingest_dedup import _store_bids

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    bs = _batches(vecs, 4)
    store, pairs = str(tmp_path / "sigs"), str(tmp_path / "pairs")
    for bid, b in enumerate(bs[:3]):
        si.apply_semantic_batch(b, bid, store, pairs)
    assert cp.compact_sink(spark, store, min_batches=2, include_max_live=True)[
        "compacted"
    ]
    si.apply_semantic_batch(bs[3], 3, store, pairs)
    want = {tuple(r) for r in spark.read.parquet(f"{pairs}/batch_id=3").collect()}

    m = cp._load_manifest(store)
    m.pop("floor", None)
    with open(cp._manifest_path(store), "w") as f:
        json.dump(m, f)
    cp._FLOOR_CACHE.clear()
    assert _store_bids(store, 3) == {0, 1, 2}
    shutil.rmtree(f"{pairs}/batch_id=3")
    si.apply_semantic_batch(bs[3], 3, store, pairs)
    got = {tuple(r) for r in spark.read.parquet(f"{pairs}/batch_id=3").collect()}
    assert got == want and len(want) > 0


def test_presigned_rows_skip_reprojection(spark, sf_dir):
    """cosine_dedup_pairs_df over pre-signed rows must plan exactly ONE
    Arrow-batched Python stage (the pair cosine) — re-projecting stored
    signatures would show a second one. This is the store's entire point:
    the corpus is bucketed once at ingest."""
    from timedf_spark.operators.similarity import (
        cosine_dedup_pairs_df,
        srp_signature_rows,
    )

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    signed = srp_signature_rows(vecs).localCheckpoint()
    plan = (
        cosine_dedup_pairs_df(signed)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    plan_raw = (
        cosine_dedup_pairs_df(vecs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # every Arrow stage left in the presigned plan is the pair cosine —
    # the bucket-projection stages only appear in the raw-vector plan
    # (node text repeats once per join branch, so compare per-plan)
    assert all("cos(" in l for l in plan.splitlines() if "ArrowEvalPython" in l), (
        plan[:2000]
    )
    assert plan.count("ArrowEvalPython") < plan_raw.count("ArrowEvalPython")
