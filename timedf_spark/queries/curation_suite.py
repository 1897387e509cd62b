"""Curation suite: the round-2 LLM-pipeline operators as driver queries
(chunking, repetition quality rules, PII redaction, contamination probe).

Each query pairs a Spark builder from operators/curation.py with its DuckDB
oracle twin; column names are aliased identically on both sides per the
driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.operators import bloom, curation, dedup, lm
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import fan_out, load_table


def _doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.chunk_documents(
        fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    )


def _repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation.repetition_stats(
        fan_out(load_table(spark, sf_dir, "documents")).select("doc_id", "text")
    )


def _pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events")).select("event_id", "props")
    return curation.redact_pii(ev, "props").select(
        "event_id", "n_email", "n_num", "redacted"
    )


def _contamination_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No min_bytes floor (r11): this path explodes k-gram shingles and
    # md5-hashes every shingle — per-row-CPU work, the class fan_out was
    # built for. The r10 floor measured ~2x scan-normalized SLOWER in both
    # env pins (driver 1.06->1.97 s, local 0.84->2.03 s); reverted.
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return curation.contamination_probe(spark, docs)


# Incremental ingest: docs with doc_id % 10 = 7 arrive as the "new batch",
# the rest are the standing corpus. The Bloom route (operators/bloom.py)
# keeps the corpus shuffle-free; the result is EXACT, so the oracle is the
# plain NOT-EXISTS anti-join the operator is equivalent to.
_INGEST_PRED = "doc_id % 10 = 7"


def _incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.filter(_INGEST_PRED).select("doc_id", "text", "lang", "source")
    corpus = docs.filter(f"NOT ({_INGEST_PRED})").select("text")
    return bloom.incremental_dedup(new_batch, corpus).select(
        "doc_id", "content_hash", "lang", "source"
    )


INCREMENTAL_INGEST_ORACLE = f"""
WITH newb AS (
  SELECT doc_id, md5(text) AS content_hash, lang, source
  FROM documents WHERE {_INGEST_PRED}
),
keepers AS (
  SELECT content_hash, min(doc_id) AS doc_id FROM newb GROUP BY content_hash
)
SELECT n.doc_id, n.content_hash, n.lang, n.source
FROM newb n
JOIN keepers k ON n.content_hash = k.content_hash AND n.doc_id = k.doc_id
WHERE NOT EXISTS (
  SELECT 1 FROM documents c
  WHERE NOT ({_INGEST_PRED.replace('doc_id', 'c.doc_id')})
    AND md5(c.text) = n.content_hash
)
"""


def _charlm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    # min_bytes floor (r10): A/B at sf0.1 measured the fan-out exchange
    # as a small net loss on this path (1.06 s floored vs 1.24 s fanned).
    docs = fan_out(
        load_table(spark, sf_dir, "documents"), min_bytes=24 << 20
    ).select("doc_id", "text")
    # release=False: session cache hygiene belongs to the harness, not the
    # timed query — bench.py clearCache()s between queries, so an in-band
    # eager localCheckpoint here would pay disk I/O on every iteration to
    # solve a problem the harness already solves (r04: 1.13 s -> 3.93 s).
    # Long-lived sessions scoring many corpora outside the bench protocol
    # should pass release=True themselves.
    return lm.charlm_doc_scores(docs, release=False)


SUITE = {
    "charlm_score": QuerySpec(
        "charlm_score",
        _charlm_score,
        lm.charlm_scores_sql(),
        "char-bigram LM quality score: train on corpus, broadcast model, score per doc",
    ),
    "doc_chunks": QuerySpec(
        "doc_chunks",
        _doc_chunks,
        curation.doc_chunks_sql(),
        "overlapping token-window chunking (explode, zero shuffle)",
    ),
    "repetition_stats": QuerySpec(
        "repetition_stats",
        _repetition_stats,
        curation.repetition_stats_sql(),
        "Gopher-style repetition metrics: dup-word frac + top-bigram frac",
    ),
    "pii_redact": QuerySpec(
        "pii_redact",
        _pii_redact,
        curation.pii_redact_sql("events", "props", "event_id"),
        "regex PII redaction (<EMAIL>/<NUM>) with audit counts, one projection",
    ),
    "contamination_probe": QuerySpec(
        "contamination_probe",
        _contamination_probe,
        curation.contamination_probe_sql(),
        "n-gram benchmark-contamination probe (broadcast probe set)",
    ),
    "incremental_ingest": QuerySpec(
        "incremental_ingest",
        _incremental_ingest,
        INCREMENTAL_INGEST_ORACLE,
        "Bloom-prefiltered exact incremental dedup vs standing corpus (zero corpus shuffle)",
    ),
}


def _incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dups of the ingest batch against the existing
    corpus (the approximate sibling of incremental_ingest's exact check):
    corpus band rows probe a BROADCAST batch band set — zero corpus
    self-join, zero corpus shuffle for candidates."""
    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.filter(_INGEST_PRED).select("doc_id", "text")
    corpus = docs.filter(f"NOT ({_INGEST_PRED})").select("doc_id", "text")
    return dedup.incremental_near_dup_pairs(new_batch, corpus)


SUITE["incremental_near_dup"] = QuerySpec(
    "incremental_near_dup",
    _incremental_near_dup,
    dedup.incremental_near_dup_sql(_INGEST_PRED),
    "batch-vs-corpus MinHash-LSH near-dups, broadcast probe, no corpus self-join",
)


def _incremental_near_dup_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deployment shape of the same probe: candidate generation reads
    a PRECOMPUTED corpus band-signature index and the exact-Jaccard
    verify reads the corpus shingle store (both built in-query here so
    the query stays a pure function of the tables; in the streaming loop
    they are the persisted sig + shingle stores the ingest sink
    maintains) — corpus TEXT is never re-shingled on the probe path.
    Round 7: switched from the indexed (text-verify) shape to the
    sketched verify per VERDICT r06 item 3 — ``_minhash_bands`` computes
    the corpus shingle rows to build the index anyway, so the indexed
    shape's candidate-text re-shingle was pure rework (~1.4x slower,
    measured). Same hash family, bit-identical pairs — so it shares the
    rehash path's oracle verbatim, making the driver gate itself the
    probe-path-equality proof."""
    docs = load_table(spark, sf_dir, "documents")
    new_batch = docs.filter(_INGEST_PRED).select("doc_id", "text")
    corpus = docs.filter(f"NOT ({_INGEST_PRED})").select("doc_id", "text")
    corpus_bands, corpus_sh = dedup._minhash_bands(corpus)
    return dedup.incremental_near_dup_pairs_sketched(
        new_batch, corpus_bands, corpus_sh
    )


SUITE["incremental_near_dup_indexed"] = QuerySpec(
    "incremental_near_dup_indexed",
    _incremental_near_dup_indexed,
    dedup.incremental_near_dup_sql(_INGEST_PRED),
    "same pairs via the band-signature index + shingle store: corpus text never re-read on the probe path",
)


def _decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No min_bytes floor (r11): chunking + shingle/md5 probe work is
    # per-row-CPU; the r10 floor measured ~1.3-1.6x scan-normalized slower
    # in both env pins (driver 1.25->1.92 s, local 1.32->2.16 s); reverted.
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "text"
    )
    return curation.decontaminate_spans(spark, docs)


SUITE["decontaminate_spans"] = QuerySpec(
    "decontaminate_spans",
    _decontaminate_spans,
    curation.decontaminate_spans_sql(),
    "excise contaminated chunks, keep the rest: chunk → broadcast-probe flag → ordered reassembly",
)
