"""Round-9 queries: corpus retrieval and data-selection primitives.

- ``bm25_search``: query-driven BM25 top-k over the documents table
  (operators/retrieval.py — rational idf + quantized integer score
  totals, so the value-hash oracle is exact). The pipeline use is
  answer-bearing decontamination and "more like this" data selection.

- ``dsir_importance``: hashed n-gram importance weights against an
  English-target distribution (operators/selection.py — the DSIR shape
  with exact-integer bucket counts and a quantized probability-ratio
  weight table).

- ``vocab_growth``: Heaps-law vocabulary-growth curve — cumulative
  distinct vocabulary at 10 corpus prefixes. The "have I scanned enough
  to stop growing the tokenizer vocab" curve every BPE/tokenizer run
  wants. No global sort: prefix buckets come from integer division of
  doc_id by a 1-row-agg width; per-term first-occurrence is one
  vocabulary-sized min; cumulation is a window over 10 rows.

Scale posture per query lives in the operator docstrings.

Reference parity: none of these exist in intel-ai/timedf (the reference
has no text/retrieval surface — SURVEY.md §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timedf_spark.operators import retrieval, selection
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_TOPK = 5
_DSIR_TARGET = "lang = 'en'"
_N_PREFIXES = 10


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    qt = spark.createDataFrame(
        list(retrieval.QUERY_SET), "qid long, term string"
    )
    return retrieval.bm25_topk(docs, qt, _TOPK)


def dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return selection.importance_weights(docs, _DSIR_TARGET)


def vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative docs/tokens/vocabulary at 10 doc_id-prefix checkpoints —
    the "has the tokenizer seen enough corpus" Heaps-law curve. The unit
    is the word TRIGRAM: the testdata's unigram vocabulary saturates in
    the first prefix, while the trigram space keeps growing through the
    whole corpus — the regime the curve exists to show.

    Plan: bucket width from one 1-row max aggregate (broadcast); tokens
    bucketed by integer division (no sort, no row_number over the
    corpus); per-term first occurrence is a vocabulary-sized min; the
    three 10-row bucket tables join and cumulate in a trivial window.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    width = docs.agg(
        F.expr(f"(max(doc_id) + {_N_PREFIXES}) DIV {_N_PREFIXES}").alias("w")
    )
    bdocs = docs.join(F.broadcast(width)).withColumn(
        "bucket", F.expr("doc_id DIV w")
    )
    tok = bdocs.select(F.split("text", " ").alias("t"), "doc_id", "bucket").select(
        "doc_id",
        "bucket",
        F.explode(
            F.expr(
                "case when size(t) >= 3 then "
                "transform(sequence(0, size(t) - 3), "
                "i -> concat(t[i], ' ', t[i + 1], ' ', t[i + 2])) "
                "else array() end"
            )
        ).alias("term"),
    )
    docs_b = bdocs.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_docs"))
    toks_b = tok.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_tokens"))
    vocab_b = (
        tok.groupBy("term")
        .agg(F.min("bucket").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_new_terms"))
    )
    joined = (
        docs_b.join(toks_b, "bucket", "left")
        .join(vocab_b, "bucket", "left")
        .na.fill(0, ["n_tokens", "n_new_terms"])
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "bucket",
        F.sum("n_docs").over(w).alias("docs_cum"),
        F.sum("n_tokens").over(w).alias("tokens_cum"),
        F.sum("n_new_terms").over(w).alias("vocab_cum"),
    )


VOCAB_GROWTH_ORACLE = f"""
WITH width AS (
  SELECT (max(doc_id) + {_N_PREFIXES}) // {_N_PREFIXES} AS w FROM documents
), bdocs AS (
  SELECT doc_id, string_split(text, ' ') AS t, doc_id // w AS bucket
  FROM documents CROSS JOIN width
), tok AS (
  SELECT doc_id, bucket,
         unnest([t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
                 FOR i IN generate_series(1, len(t) - 2)]) AS term
  FROM bdocs
), docs_b AS (
  SELECT bucket, count(*) AS n_docs FROM bdocs GROUP BY bucket
), toks_b AS (
  SELECT bucket, count(*) AS n_tokens FROM tok GROUP BY bucket
), vocab_b AS (
  SELECT bucket, count(*) AS n_new_terms FROM (
    SELECT term, min(bucket) AS bucket FROM tok GROUP BY term
  ) GROUP BY bucket
)
SELECT bucket,
       cast(sum(n_docs) OVER cum AS BIGINT) AS docs_cum,
       cast(sum(coalesce(n_tokens, 0)) OVER cum AS BIGINT) AS tokens_cum,
       cast(sum(coalesce(n_new_terms, 0)) OVER cum AS BIGINT) AS vocab_cum
FROM docs_b
LEFT JOIN toks_b USING (bucket)
LEFT JOIN vocab_b USING (bucket)
WINDOW cum AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


SUITE = {
    "bm25_search": QuerySpec(
        "bm25_search",
        bm25_search,
        retrieval.bm25_topk_sql("documents", "text", _TOPK),
        "BM25 top-k retrieval per query: broadcast query terms filter postings pre-exchange; exact integer score totals",
    ),
    "dsir_importance": QuerySpec(
        "dsir_importance",
        dsir_importance,
        selection.importance_weights_sql("documents", _DSIR_TARGET),
        "DSIR-shape importance weights: bucket-sized count shuffles, broadcast quantized ratio table, exact sums",
    ),
    "vocab_growth": QuerySpec(
        "vocab_growth",
        vocab_growth,
        VOCAB_GROWTH_ORACLE,
        "Heaps-law vocabulary growth at 10 corpus prefixes: no global sort, vocabulary-sized min + 10-row window",
    ),
}
