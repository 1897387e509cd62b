"""Delta-assignment protocol (streaming/cluster_apply.py, r10): each
batch writes only the relabelled affected rows + new singletons at
v=batch_id over a full base snapshot; reads resolve latest-wins;
compaction folds deltas back into a snapshot every _COMPACT_EVERY
versions. Folding a batch used to rewrite the whole assignment table -
the last O(store) per-batch write in the ingest loop."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _read(spark, path):
    from timedf_spark.streaming.cluster_apply import read_assignments

    return {
        (r["vertex"], r["component"]) for r in read_assignments(spark, path).collect()
    }


def test_delta_fold_equals_one_shot_cc(spark, tmp_path):
    from timedf_spark.operators.cluster import connected_components
    from timedf_spark.streaming import cluster_apply as ca

    path = str(tmp_path / "assign")
    ca.seed_assignments(
        spark.createDataFrame(
            [(i, i) for i in range(20)], "vertex long, component long"
        ),
        path,
    )
    batches = [
        [(1, 2), (3, 4)],
        [(2, 3), (10, 11)],
        [(4, 10), (15, 16)],
        [(16, 17), (17, 18)],
    ]
    for b, rows in enumerate(batches):
        ca.apply_edge_batch(_edges(spark, rows), b, path)
    got = _read(spark, path)
    # one-shot ground truth over the same vertices + all edges
    all_edges = _edges(spark, [e for rows in batches for e in rows])
    verts = spark.createDataFrame([(i,) for i in range(20)], "v long")
    want = {
        (r["vertex"], r["component"])
        for r in connected_components(verts, all_edges).collect()
    }
    assert got == want
    # the store really is delta-layered: manifest carries a base older
    # than the version, and delta dirs exist
    with open(os.path.join(path, "_snapshot_manifest.json")) as f:
        m = json.load(f)
    assert m["version"] == 3 and m["base"] == -1
    assert os.path.isdir(os.path.join(path, "v=2"))


def test_delta_compaction_folds_and_cleans(spark, tmp_path, monkeypatch):
    from timedf_spark.streaming import cluster_apply as ca

    monkeypatch.setattr(ca, "_COMPACT_EVERY", 3)
    path = str(tmp_path / "assign")
    ca.seed_assignments(
        spark.createDataFrame(
            [(i, i) for i in range(10)], "vertex long, component long"
        ),
        path,
    )
    for b, rows in enumerate([[(0, 1)], [(2, 3)], [(1, 2)], [(5, 6)]]):
        ca.apply_edge_batch(_edges(spark, rows), b, path)
    with open(os.path.join(path, "_snapshot_manifest.json")) as f:
        m = json.load(f)
    # batch 2 hit the compaction threshold (2 - (-1) >= 3): base jumped
    assert m["base"] >= 2
    # pre-base dirs are gone
    assert not os.path.isdir(os.path.join(path, "v=-1"))
    assert not os.path.isdir(os.path.join(path, "v=0"))
    assert _read(spark, path) == {
        (0, 0), (1, 0), (2, 0), (3, 0), (4, 4),
        (5, 5), (6, 5), (7, 7), (8, 8), (9, 9),
    }


def test_legacy_snapshot_store_upgrades(spark, tmp_path):
    """A store written by the pre-delta layout (full snapshot at v=cur,
    manifest without 'base') must read correctly and upgrade on the next
    fold."""
    from timedf_spark.streaming import cluster_apply as ca
    from timedf_spark.streaming.cdc_apply import _publish

    path = str(tmp_path / "assign")
    os.makedirs(path)
    spark.createDataFrame(
        [(i, i if i != 4 else 3) for i in range(6)],
        "vertex long, component long",
    ).write.mode("overwrite").parquet(os.path.join(path, "v=7"))
    _publish(path, 7)  # legacy manifest: {"version": 7}
    assert (3, 3) in _read(spark, path) and (4, 3) in _read(spark, path)
    ca.apply_edge_batch(_edges(spark, [(0, 1)]), 8, path)
    got = _read(spark, path)
    assert (0, 0) in got and (1, 0) in got and (4, 3) in got
    # delta layered over the legacy snapshot-as-base
    with open(os.path.join(path, "_snapshot_manifest.json")) as f:
        m = json.load(f)
    assert m["version"] == 8 and m["base"] == 7


def test_ingest_batch_writes_delta_not_snapshot(spark, tmp_path):
    """The ingest loop's assignment write is the batch's DELTA: its row
    count is bounded by the batch + affected rows, not the corpus."""
    from timedf_spark.streaming import ingest_dedup as idd

    docs = spark.createDataFrame(
        [(i, f"unique document text number {i} " * 5) for i in range(40)],
        "doc_id long, text string",
    )
    d = str(tmp_path)
    idd.seed_empty_assignments(spark, f"{d}/assign")
    idd.apply_ingest_batch(
        docs.filter(F.col("doc_id") < 30), 0, f"{d}/corpus", f"{d}/assign"
    )
    idd.apply_ingest_batch(
        docs.filter(F.col("doc_id") >= 30), 1, f"{d}/corpus", f"{d}/assign"
    )
    delta_rows = spark.read.parquet(f"{d}/assign/v=1").count()
    assert delta_rows <= 15  # the 10-doc batch (+ tiny affected set), not 40
    assert len(_read(spark, f"{d}/assign")) == 40


def test_delta_protocol_randomized_batches_property(spark, monkeypatch):
    """Property: for random edge-batch sequences (with random compaction
    cadence), the delta store's resolved assignment equals one-shot
    connected_components over the union — across merges that span
    batches, re-merges, and compaction boundaries."""
    import random

    from timedf_spark.operators.cluster import connected_components
    from timedf_spark.streaming import cluster_apply as ca

    rng = random.Random(1234)
    for trial in range(3):
        import tempfile

        compact_every = rng.choice([1, 2, 5])
        monkeypatch.setattr(ca, "_COMPACT_EVERY", compact_every)
        n = 30
        with tempfile.TemporaryDirectory() as d:
            path = f"{d}/assign"
            ca.seed_assignments(
                spark.createDataFrame(
                    [(i, i) for i in range(n)], "vertex long, component long"
                ),
                path,
            )
            all_edges = []
            for b in range(6):
                rows = [
                    (rng.randrange(n), rng.randrange(n))
                    for _ in range(rng.randrange(1, 5))
                ]
                all_edges.extend(rows)
                ca.apply_edge_batch(_edges(spark, rows), b, path)
            got = _read(spark, path)
            verts = spark.createDataFrame([(i,) for i in range(n)], "v long")
            want = {
                (r["vertex"], r["component"])
                for r in connected_components(
                    verts, _edges(spark, all_edges)
                ).collect()
            }
            assert got == want, (trial, compact_every)


def test_flag_probe_optimizations_match_full_pair_set(spark):
    """Property: the require_flag probe (with every r10 optimization -
    literal bucket prune, cell semi-join, thin pair formation, late
    embedding fetch) emits exactly the flag-touching subset of the full
    operator's pair set, on BOTH the capped and uncapped tiers."""
    import random

    from timedf_spark.operators.similarity import (
        cosine_dedup_pairs_df,
        srp_signature_rows,
    )

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(30)]
    rows = []
    vid = 0
    for v in base:
        rows.append((vid, v)); vid += 1
        if rng.random() < 0.5:  # near-dup twin
            rows.append((vid, [x + rng.gauss(0, 0.01) for x in v])); vid += 1
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    signed = srp_signature_rows(vecs, bits=6, n_tables=3).localCheckpoint()
    new_ids = {r["vec_id"] for r in signed.collect() if r["vec_id"] % 3 == 0}
    flagged = signed.withColumn(
        "is_new", F.col("vec_id") % 3 == F.lit(0)
    )
    for cap in (None, 4):
        full = {
            (r["id_a"], r["id_b"])
            for r in cosine_dedup_pairs_df(
                signed, bits=6, n_tables=3, max_degree=cap
            ).collect()
        }
        want = {
            (a, b) for a, b in full if a in new_ids or b in new_ids
        }
        got = {
            (r["id_a"], r["id_b"])
            for r in cosine_dedup_pairs_df(
                flagged,
                bits=6,
                n_tables=3,
                max_degree=cap,
                require_flag="is_new",
                small_batch=True,
            ).collect()
        }
        assert got == want, cap
