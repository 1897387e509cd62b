"""Round-12 optimization tests: internals changed by the r12 pass.

Oracle equality for the re-planned queries is covered by
test_queries_oracle.py; these pin the operator-level equivalences the
oracle can't see — the lazy/eager candidate paths producing identical
pairs, the kcore driver-path dtype gate, and the explode-symmetrization
row sets.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timedf_spark.operators import dedup
from timedf_spark.operators.kcore import kcore_peel
from timedf_spark.operators.labelprop import label_propagation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_candidate_materialization_paths_identical(spark):
    """materialize=True (eager checkpoint + literal-id prune) and
    materialize=False (lazy, broadcast semi-join prune) must yield the
    same pair set — the streaming tier dispatch picks between them by
    store size, so they are interchangeable by contract."""
    corpus = _docs(
        spark,
        [(i, "alpha beta gamma delta epsilon zeta eta theta " * 3) for i in range(6)]
        + [(10 + i, f"unique{i} text body nothing shared here at all {i}") for i in range(4)],
    )
    batch = _docs(
        spark,
        [(100, "alpha beta gamma delta epsilon zeta eta theta " * 3),
         (101, "completely different tokens without any overlap whatsoever")],
    )
    batch_bands, batch_sh = dedup._minhash_bands(batch)
    corpus_bands, corpus_sh = dedup._minhash_bands(corpus)

    def pairs(materialize):
        out = dedup._incremental_pairs_sketched_pre(
            batch_bands, batch_sh, corpus_bands, corpus_sh,
            materialize_candidates=materialize,
        )
        return sorted(
            (int(r["batch_id"]), int(r["corpus_id"]), round(float(r["jaccard"]), 9))
            for r in out.collect()
        )

    eager = pairs(True)
    lazy = pairs(False)
    assert eager == lazy
    assert eager, "constructed near-dup must be found by both paths"


def test_kcore_driver_gate_rejects_nonintegral_keys(spark):
    """ADVICE r11: double-typed node keys must take the distributed path
    (the numpy replay would silently truncate) and still produce the
    correct k-core. 0.5-spaced keys collide pairwise under int64
    truncation, so a wrong (driver) route would merge distinct nodes."""
    # triangle a-b-c (all deg 2) plus pendant d: 2-core = the triangle
    edges_f = spark.createDataFrame(
        [(1.0, 1.5), (1.5, 2.0), (2.0, 1.0), (2.0, 2.5)],
        "a double, b double",
    )
    out = kcore_peel(edges_f, "a", "b", k=2, rounds=5)
    nodes = sorted(float(r["node"]) for r in out.collect())
    assert nodes == [1.0, 1.5, 2.0]

    # same graph on integral keys (scaled 2x) runs the driver path and
    # must agree
    edges_i = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 2), (4, 5)], "a long, b long"
    )
    out_i = kcore_peel(edges_i, "a", "b", k=2, rounds=5)
    assert sorted(int(r["node"]) for r in out_i.collect()) == [2, 3, 4]


def test_labelprop_explode_symmetrization_matches_manual(spark):
    """The explode-based edge symmetrization must behave exactly like
    the old two-select union: labels propagate across BOTH orientations
    of each input edge (here: an edge given only as (low, high) still
    pulls the high node down to the low label)."""
    nodes = spark.createDataFrame([(i,) for i in range(1, 7)], "node long")
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "a long, b long"
    )
    out = {
        int(r["node"]): int(r["label"])
        for r in label_propagation(nodes, edges, iters=4).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[5] == out[6] == 5
    assert out[4] == 4
