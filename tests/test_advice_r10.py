"""Regression tests for the round-10 ADVICE items (plus the IVF manifest
tests living in test_ivf_index.py):

1. similarity.srp_signature_rows on an EMPTY frame returns an empty
   signature frame instead of crashing on first()[0] — the shape an
   empty foreachBatch invocation hands apply_semantic_batch under
   streaming replay/recovery.
2. cosine_dedup_pairs_df's pre-signed fast path rejects rows signed
   under different (bits, n_tables) instead of silently mis-blocking.
3. connected_components' star routing no longer re-symmetrizes the
   already-symmetric checkpointed edge set (assume_symmetric reuses the
   outer blocks) — pinned by fixpoint equality vs the generic path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_srp_signature_rows_empty_frame(spark):
    from timedf_spark.operators.similarity import srp_signature_rows

    empty = _vecs(spark, [])
    out = srp_signature_rows(empty, bits=8, n_tables=3)
    assert out.count() == 0
    assert [c for c in out.columns if c.startswith("bucket")] == [
        "bucket0", "bucket1", "bucket2"
    ]
    # the empty frame still carries the parameter stamp
    md = out.schema["bucket0"].metadata
    assert md["srp_bits"] == 8 and md["srp_tables"] == 3


def test_apply_semantic_batch_empty_batch(spark, tmp_path):
    """The streaming foreachBatch body must survive an empty batch."""
    from timedf_spark.streaming.semantic_ingest import apply_semantic_batch

    apply_semantic_batch(
        _vecs(spark, []), 0, str(tmp_path / "store"), str(tmp_path / "pairs")
    )  # must not raise


def test_presigned_fast_path_rejects_mismatched_params(spark):
    from timedf_spark.operators.similarity import (
        cosine_dedup_pairs_df,
        srp_signature_rows,
    )

    vecs = _vecs(
        spark,
        [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(40)],
    )
    signed = srp_signature_rows(vecs, bits=8, n_tables=3).localCheckpoint()
    # matching params: accepted (fast path)
    assert cosine_dedup_pairs_df(signed, bits=8, n_tables=3).count() >= 0
    # different bits at same n_tables: the stamp catches it
    with pytest.raises(ValueError, match="srp_bits"):
        cosine_dedup_pairs_df(signed, bits=12, n_tables=3)
    # fewer tables than the store was signed with: surplus bucket columns
    with pytest.raises(ValueError, match="bucket"):
        cosine_dedup_pairs_df(signed, bits=8, n_tables=2)


def test_presigned_stamp_survives_parquet(spark, tmp_path):
    """The store is parquet — the parameter stamp must round-trip, or a
    reopened store would lose the guard."""
    from timedf_spark.operators.similarity import (
        cosine_dedup_pairs_df,
        srp_signature_rows,
    )

    vecs = _vecs(spark, [(i, [1.0, float(i), 0.5]) for i in range(10)])
    srp_signature_rows(vecs, bits=8, n_tables=3).write.mode("overwrite").parquet(
        str(tmp_path / "store")
    )
    back = spark.read.parquet(str(tmp_path / "store"))
    md = back.schema["bucket0"].metadata
    assert md["srp_bits"] == 8 and md["srp_tables"] == 3
    with pytest.raises(ValueError, match="srp_bits"):
        cosine_dedup_pairs_df(back, bits=16, n_tables=3)


def test_star_assume_symmetric_matches_generic(spark):
    """assume_symmetric=True over a pre-built symmetric frame must reach
    the identical fixpoint as the generic path over the raw edge list."""
    from timedf_spark.operators.cluster import connected_components_star

    raw = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 8), (10, 9)], "src long, dst long"
    )
    sym = raw.select("src", "dst").union(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    got = sorted(
        map(
            tuple,
            connected_components_star(None, sym, assume_symmetric=True).collect(),
        )
    )
    want = sorted(
        map(tuple, connected_components_star(None, raw).collect())
    )
    assert got == want
    assert (1, 1) in got and (3, 1) in got and (8, 8) in got


def test_cc_routing_star_still_correct(spark, monkeypatch):
    """End-to-end: the distributed star routing (driver fast path off)
    with the reuse-outer-checkpoint wiring labels correctly."""
    from timedf_spark.operators import cluster

    monkeypatch.setenv("SPARK_GRAFT_GRAPH_DRIVER_PATH", "0")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 20, 2)], "src long, dst long"
    )
    out = cluster.connected_components(None, edges)
    rows = {r["vertex"]: r["component"] for r in out.collect()}
    for i in range(0, 20, 2):
        assert rows[i] == i and rows[i + 1] == i


def test_bench_chunk_layout_is_pinned(tmp_path, monkeypatch):
    """VERDICT r09 item 1: chunk membership must be stable under (a)
    registry reorder (the correctness-window rotation) and (b) query
    insertion — the r09 'silent regressions' were neighborhood shifts
    masquerading as per-query slowdowns."""
    import bench

    pin = tmp_path / "pin.json"
    monkeypatch.setenv("SPARK_GRAFT_BENCH_CHUNKS_PIN", str(pin))
    names = [f"q{i:03d}" for i in range(150)]
    chunks1, _ = bench._plan_chunks(names)
    assert pin.exists()
    # registry reorder: identical layout
    chunks2, _ = bench._plan_chunks(list(reversed(names)))
    assert chunks1 == chunks2
    # insertion: every existing query keeps its chunk; the new one appends
    chunks3, _ = bench._plan_chunks(names + ["zzz_new"])
    pos1 = {n: i for i, c in enumerate(chunks1) for n in c}
    pos3 = {n: i for i, c in enumerate(chunks3) for n in c}
    assert all(pos3[n] == pos1[n] for n in names)
    assert "zzz_new" in pos3
    # deletion: survivors keep their chunk
    chunks4, _ = bench._plan_chunks(names[:-10])
    pos4 = {n: i for i, c in enumerate(chunks4) for n in c}
    assert all(pos4[n] == pos1[n] for n in names[:-10])


def test_bench_parent_stdout_drops_mb_dicts(tmp_path, monkeypatch, capsys):
    """VERDICT r09 item 7: the parent's printed detail line must not
    carry the shuffle-MB per-query dicts (they read like stale seconds
    in the driver artifact tail); the pin FILE keeps them."""
    import bench

    monkeypatch.setattr(bench, "_pin_path", lambda tag=None: str(tmp_path / "pin.json"))
    bench._report(
        per_query={"q1": 1.0},
        shuffle_mb={"q1": 17.4},
        scan_baseline=0.5,
        evidence={"e1": {"value": 1, "ok": True}},
        sf=0.1,
        write_local=True,
        stdout_full=False,
    )
    import json as _json

    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    detail = _json.loads(lines[0])
    assert "queries" in detail
    assert "shuffle_write_mb" not in detail
    assert "shuffle_baseline_mb" not in detail
    assert "evidence" not in detail
    # the pin file keeps the full record
    pinned = _json.loads((tmp_path / "pin.json").read_text())
    assert pinned["shuffle_write_mb"] == {"q1": 17.4}
    assert pinned["evidence"]
    # child mode keeps the full stdout line (the parent parses it)
    bench._report(
        per_query={"q1": 1.0},
        shuffle_mb={"q1": 17.4},
        scan_baseline=0.5,
        evidence={},
        sf=0.1,
        write_local=False,
        stdout_full=True,
    )
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert "shuffle_write_mb" in _json.loads(lines[0])


def test_small_scan_sites_not_fanned(spark, sf_dir):
    """r10 fan_out per-site floors: the columnar/join-dominated call
    sites (plasticc ETL, the vector-dedup entry, duplicate_paragraphs,
    charlm) must NOT pay a round-robin exchange on a sub-floor scan —
    the r09 default flip silently re-fanned them (plasticc_etl 0.99 s
    floored vs 1.79 s fanned at sf0.1). Above the floor the under-split
    guard still engages; this pins the small-scan side only."""
    from timedf_spark.queries import all_queries

    qs = all_queries()
    for name in (
        "plasticc_etl",
        "dedup_embedding_cosine",
        "duplicate_paragraphs",
        "charlm_score",
    ):
        plan = (
            qs[name]
            .fn(spark, sf_dir)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ROUND_ROBIN" not in plan and "RoundRobinPartitioning" not in plan, (
            name,
            [l for l in plan.splitlines() if "Exchange" in l][:5],
        )
