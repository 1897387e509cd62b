"""Round-9 tests: BM25 retrieval, DSIR importance weights, vocab growth.

Oracle equality is covered by test_queries_oracle.py; these pin the
semantics the oracle can't see (ranking behavior on constructed corpora,
weight-table bounds) and the plan shapes the scale posture claims.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from timedf_spark.operators import retrieval, selection
from timedf_spark.queries import all_queries

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _executed_plan(spark, name: str) -> str:
    spark.catalog.clearCache()
    df = all_queries()[name].fn(spark, SF_SMALL)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# ---- BM25 -----------------------------------------------------------------


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_tf_saturation_and_rare_term_weighting(spark):
    """A doc matching the RARE query term outranks a doc stuffing the
    common one (idf dominates tf saturation — the property BM25 adds over
    raw tf matching)."""
    docs = _mk_docs(
        spark,
        [
            "common common common common common common common common",  # 0: stuffed
            "rare filler filler filler filler filler filler filler",    # 1: one rare hit
            "common filler filler filler filler filler filler filler",  # 2: one common hit
        ]
        + ["common pad pad pad pad pad pad pad"] * 7,  # make 'common' common
    )
    qt = spark.createDataFrame([(1, "common"), (1, "rare")], "qid long, term string")
    got = {r["doc_id"]: r["rank"] for r in retrieval.bm25_topk(docs, qt, k=10).collect()}
    assert got[1] == 1, got  # rare-term doc wins
    # stuffing 8x the common term beats a single common hit, but not the rare doc
    assert got[0] < got[2], got


def test_bm25_length_normalization(spark):
    """Same tf, shorter doc scores higher (the b·dl/avgdl term)."""
    docs = _mk_docs(
        spark,
        [
            "hit pad",
            "hit pad pad pad pad pad pad pad pad pad pad pad pad pad",
            "pad pad",
        ],
    )
    qt = spark.createDataFrame([(1, "hit")], "qid long, term string")
    rows = {r["doc_id"]: r["score"] for r in retrieval.bm25_topk(docs, qt, k=10).collect()}
    assert rows[0] > rows[1]
    assert 2 not in rows  # no query term -> not retrieved


def test_bm25_topk_is_per_query(spark):
    out = all_queries()["bm25_search"].fn(spark, SF_SMALL).collect()
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r["qid"], []).append(r["rank"])
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), (qid, ranks)
        assert len(ranks) <= 5


def test_bm25_postings_filtered_before_exchange(spark):
    """The corpus token stream must hit the broadcast query-term semi-join
    BEFORE any (doc, term) exchange — the property that keeps the big
    shuffle bounded by query-term postings, not corpus vocabulary."""
    plan = _executed_plan(spark, "bm25_search")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# ---- DSIR importance ------------------------------------------------------


def test_dsir_target_tokens_score_higher(spark):
    """Docs made of target-only tokens must out-score docs of tokens the
    target never uses; a uniform doc lands in between."""
    target_texts = ["alpha beta gamma delta"] * 8
    other_texts = ["omega psi chi phi"] * 8
    rows = (
        [(i, t, "en") for i, t in enumerate(target_texts)]
        + [(100 + i, t, "zz") for i, t in enumerate(other_texts)]
        + [(200, "alpha omega", "zz")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    imp = {
        r["doc_id"]: r["importance"]
        for r in selection.importance_weights(docs, "lang = 'en'").collect()
    }
    assert imp[0] > imp[200] > imp[100], imp


def test_dsir_weight_table_is_bucket_bounded(spark):
    """The broadcast side is O(n_buckets) regardless of corpus size."""
    docs = all_queries()["dsir_importance"].fn(spark, SF_SMALL)
    assert docs.count() > 0
    # structural bound: distinct buckets cannot exceed N_BUCKETS
    tok = (
        docs.sparkSession.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select(F.explode(F.split("text", " ")).alias("term"))
        .filter("term <> ''")
        .select(F.expr(selection._BUCKET_SPARK).alias("b"))
    )
    assert tok.distinct().count() <= selection.N_BUCKETS


def test_dsir_importance_of_uniform_corpus_is_one(spark):
    """Target == corpus -> every smoothed ratio is exactly 1.0 after
    quantization, for every doc."""
    docs = spark.createDataFrame(
        [(i, "a b c d", "en") for i in range(10)],
        "doc_id long, text string, lang string",
    )
    out = selection.importance_weights(docs, "lang = 'en'").collect()
    assert all(abs(r["importance"] - 1.0) < 1e-6 for r in out)


# ---- vocab growth ---------------------------------------------------------


def test_vocab_growth_monotone_and_exact_final(spark):
    rows = all_queries()["vocab_growth"].fn(spark, SF_SMALL).collect()
    assert [r["bucket"] for r in rows] == sorted(r["bucket"] for r in rows)
    for col in ("docs_cum", "tokens_cum", "vocab_cum"):
        vals = [r[col] for r in rows]
        assert vals == sorted(vals), col
    # final vocab_cum equals the corpus's exact distinct trigram count
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    tri = docs.select(F.split("text", " ").alias("t")).select(
        F.explode(
            F.expr(
                "case when size(t) >= 3 then transform(sequence(0, size(t) - 3),"
                " i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])) else array() end"
            )
        ).alias("g")
    )
    assert rows[-1]["vocab_cum"] == tri.distinct().count()
    assert rows[-1]["docs_cum"] == docs.count()
