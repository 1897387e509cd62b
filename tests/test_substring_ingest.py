"""Streaming substring-fingerprint ingest (streaming/substring_ingest.py):
the union of per-batch emitted candidate pairs must equal the one-shot
batch operator's candidate set (with the df guard off — the guard is
corpus-so-far-relative in a stream by construction), and at-least-once
replay must converge."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F

from timedf_spark.sources.readers import load_table


def _batches(docs, n):
    return [docs.filter(F.col("doc_id") % n == i) for i in range(n)]


def test_streamed_pairs_union_equals_batch_operator(spark, sf_dir, tmp_path):
    from timedf_spark.operators.substring import fingerprint_candidate_pairs
    from timedf_spark.streaming import substring_ingest as si

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp_path = str(tmp_path / "fps")
    pairs_path = str(tmp_path / "pairs")
    for bid, b in enumerate(_batches(docs, 4)):
        si.apply_substring_batch(
            b, bid, fp_path, pairs_path, min_shared=1, max_doc_freq=None
        )
    got = {
        (r["doc_a"], r["doc_b"], r["n_shared"])
        for r in si.read_all_pairs(spark, pairs_path)
        .select("doc_a", "doc_b", "n_shared")
        .collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], r["n_shared"])
        for r in fingerprint_candidate_pairs(
            docs, min_shared=1, max_doc_freq=None
        ).collect()
    }
    assert got == want and len(want) > 0


def test_compacted_fp_store_probe_equals_uncompacted(spark, sf_dir, tmp_path):
    """Compaction of the fingerprint index store must be TRANSPARENT to
    the probe: a batch probed against a compacted store emits exactly the
    pairs it emits against the raw per-batch store (VERDICT r08 item 7 —
    the same coverage contract the dedup corpus store gets)."""
    from timedf_spark.streaming import substring_ingest as si
    from timedf_spark.streaming.compaction import compact_sink

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bs = _batches(docs, 4)

    def probe_batch3(tag: str, compact: bool) -> set:
        fp, pairs = str(tmp_path / f"fp_{tag}"), str(tmp_path / f"pairs_{tag}")
        for bid, b in enumerate(bs[:3]):
            si.apply_substring_batch(b, bid, fp, pairs)
        if compact:
            res = compact_sink(spark, fp, min_batches=2, include_max_live=True)
            assert res["compacted"] and res["covered"] == 2
        si.apply_substring_batch(bs[3], 3, fp, pairs)
        return {
            tuple(r)
            for r in spark.read.parquet(f"{pairs}/batch_id=3")
            .select("doc_a", "doc_b", "n_shared")
            .collect()
        }

    want = probe_batch3("raw", compact=False)
    got = probe_batch3("compacted", compact=True)
    assert got == want and len(want) > 0


def test_legacy_manifest_fp_store_floor_derived(spark, sf_dir, tmp_path):
    """A LEGACY compaction manifest (no 'floor' key — pre-floor code) on
    the fingerprint store must not silently drop batches 0..covered from
    the probe set: _store_bids derives the floor from the epoch data
    (mirrors test_advice_r08::test_legacy_manifest_epoch_floor_derived
    for the substring-fingerprint index — VERDICT r08 item 7)."""
    import json
    import shutil

    from timedf_spark.streaming import compaction as cp
    from timedf_spark.streaming import substring_ingest as si
    from timedf_spark.streaming.ingest_dedup import _store_bids

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bs = _batches(docs, 4)
    fp, pairs = str(tmp_path / "fp"), str(tmp_path / "pairs")
    for bid, b in enumerate(bs[:3]):
        si.apply_substring_batch(b, bid, fp, pairs)
    res = cp.compact_sink(spark, fp, min_batches=2, include_max_live=True)
    assert res["compacted"]
    si.apply_substring_batch(bs[3], 3, fp, pairs)
    want = {
        tuple(r)
        for r in spark.read.parquet(f"{pairs}/batch_id=3")
        .select("doc_a", "doc_b", "n_shared")
        .collect()
    }

    # strip the floor key — exactly what a store compacted by pre-floor
    # code left on disk — and replay the probe
    m = cp._load_manifest(fp)
    m.pop("floor", None)
    with open(cp._manifest_path(fp), "w") as f:
        json.dump(m, f)
    cp._FLOOR_CACHE.clear()
    assert _store_bids(fp, 3) == {0, 1, 2}
    shutil.rmtree(f"{pairs}/batch_id=3")
    si.apply_substring_batch(bs[3], 3, fp, pairs)
    got = {
        tuple(r)
        for r in spark.read.parquet(f"{pairs}/batch_id=3")
        .select("doc_a", "doc_b", "n_shared")
        .collect()
    }
    assert got == want and len(want) > 0


def test_substring_ingest_replay_converges(spark, sf_dir, tmp_path):
    """At-least-once: re-applying a batch (including after a crash that
    left a partial pair write) must reproduce identical stores."""
    from timedf_spark.streaming import substring_ingest as si

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    fp_path = str(tmp_path / "fps")
    pairs_path = str(tmp_path / "pairs")
    bs = _batches(docs, 3)
    for bid, b in enumerate(bs):
        si.apply_substring_batch(b, bid, fp_path, pairs_path)
    want_pairs = sorted(
        map(tuple, si.read_all_pairs(spark, pairs_path).collect())
    )
    # crash window: batch 2's pair dir is gone/partial, replay batch 2
    shutil.rmtree(f"{pairs_path}/batch_id=2")
    si.apply_substring_batch(bs[2], 2, fp_path, pairs_path)
    got_pairs = sorted(
        map(tuple, si.read_all_pairs(spark, pairs_path).collect())
    )
    assert got_pairs == want_pairs
    # plain duplicate delivery of an already-complete batch also converges
    si.apply_substring_batch(bs[1], 1, fp_path, pairs_path)
    again = sorted(map(tuple, si.read_all_pairs(spark, pairs_path).collect()))
    assert again == want_pairs
