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
