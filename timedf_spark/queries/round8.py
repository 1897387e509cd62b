"""Round-8 queries: exact substring-level dedup (operators/substring.py)
and training-export primitives — per-source document caps and a
deterministic shard plan.

Scale posture (the 100 TB lens, per query):

- ``duplicate_substring_spans`` / ``strip_duplicate_spans``: the exact
  Lee-et-al substring tier. One hash exchange over the k-gram window
  stream (~24 bytes per corpus character — the honest cost of EXACT
  substring dedup; the approximate tiers in operators/dedup.py are the
  cheap path), then doc_id-partitioned islands/reassembly with the
  exchange reused across the window, the span groupBy, and the segment
  aggregate. No global sort anywhere (the suffix-array formulation
  needs one; this doesn't).

- ``source_cap_sample``: per-origin cap via sampling.cap_per_group —
  under-cap sources bypass the window through a broadcast semi-join,
  over-cap sources run a two-stage top-n keyed first by (source,
  input-partition) so one hot domain spreads across the cluster rather
  than landing on a single reducer. The oracle is the naive one-window
  form: same rows, different physics.

- ``corpus_shard_plan``: deterministic shard assignment for training
  export. Shard = 60-bit md5(doc_id) mod N — hash partitioning, NOT a
  global sort; within-shard sequence is a shard-partitioned window.
  The (shard, seq) pair is a reproducible global shuffle of the corpus:
  any two runs at any parallelism emit identical shard files, which is
  what makes a 100 TB training run resumable and its data order
  auditable.

Reference parity: none of these exist in intel-ai/timedf (the reference
has no text surface at all — SURVEY.md §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.hashing import DOC_HASH_DUCK, DOC_HASH_SPARK
from timedf_spark.operators import substring as substr_ops
from timedf_spark.operators.sampling import cap_per_group
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import fan_out, load_table

_SPAN_K = 20
_CAP_N = 10
_N_SHARDS = 16
# sampled-substring tier (r08: anchor-sampled, see operators/substring.py
# — the md5 0-mod-p rule was the family's dominant CPU cost): density
# ~1/6 at word-boundary anchors catches the short-span regime (typical
# dup spans here are 20-60 chars and word-aligned — the generator
# mutates whole words); min_shared=1 is principled because one shared
# sampled gram IS a real shared k-char substring (collisions aside) -
# the threshold only trades candidate volume.
_FP_MIN_SHARED = 1


def duplicate_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out with min_bytes=0 (unconditional when under-split): the
    # CHARACTER k-gram explode is ~20x the per-byte CPU of word shingles,
    # so parallelizing pays even on a sub-MB scan (A/B at sf0.1: the
    # family dropped 16 s -> 5.8 s) — unlike the jaccard/minhash call
    # sites, which keep the size-gated default
    docs = fan_out(load_table(spark, sf_dir, "documents"), min_bytes=0)
    return substr_ops.duplicate_span_report(docs, "text", _SPAN_K)


def strip_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), min_bytes=0)
    return substr_ops.strip_duplicate_spans(docs, "text", _SPAN_K)


def source_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = cap_per_group(
        docs,
        ["source"],
        [F.desc("n_chars"), F.asc("doc_id")],
        _CAP_N,
    )
    return kept.select("doc_id", "source", F.col("n_chars").cast("long").alias("n_chars"))


SOURCE_CAP_ORACLE = f"""
SELECT doc_id, source, cast(n_chars AS BIGINT) AS n_chars FROM (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS rk
  FROM documents
) WHERE rk <= {_CAP_N}
"""


def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id", F.expr(DOC_HASH_SPARK).alias("h")
    ).withColumn("shard", F.expr(f"pmod(h, {_N_SHARDS})").cast("long"))
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return hashed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("seq"),
    )


SHARD_PLAN_ORACLE = f"""
SELECT doc_id,
       cast({DOC_HASH_DUCK} % {_N_SHARDS} AS BIGINT) AS shard,
       cast(row_number() OVER (
           PARTITION BY {DOC_HASH_DUCK} % {_N_SHARDS}
           ORDER BY {DOC_HASH_DUCK}, doc_id) AS BIGINT) AS seq
FROM documents
"""


def substring_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"), min_bytes=0)
    return substr_ops.fingerprint_candidate_pairs(docs, "text", _SPAN_K, _FP_MIN_SHARED)


_AUDIT_PRED = "doc_id % 10 < 4"  # deterministic 40% audit sample


def substring_tier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level recall of the sampled-fingerprint tier against the exact
    span tier, as a 1-row report (the same self-evaluating-tier shape as
    near_dup_tier_report), evaluated on a DETERMINISTIC 40% audit sample
    — the 100 TB posture stated since r05 ("run on a bounded sample"),
    now what the query actually does (VERDICT r07 item 6): the exact
    baseline is the expensive side, the mod-p tier the cheap one, and
    the recall RATIO is what transfers; the full-corpus candidate tier
    stays ``substring_candidates``. Both engines apply the same sample
    predicate, so the oracle remains an equality check."""
    docs = fan_out(load_table(spark, sf_dir, "documents").filter(_AUDIT_PRED), min_bytes=0)
    # r11 note: materializing exact/pairs/cand (each feeds two consumers;
    # the r10 plan runs the span and fingerprint pipelines twice each, 90
    # Exchange nodes) was A/B'd and REVERTED — the duplicated subtrees
    # execute concurrently inside the single job, and the three eager
    # localCheckpoints serialized the critical path (2.11 -> 3.2-6.0 s in
    # two same-chunk-layout bench A/Bs at sf0.1). At cluster scale the
    # re-execution is 2x compute; a cost-based engine would materialize —
    # this call site keeps the measured-faster concurrent shape.
    exact = (
        substr_ops.duplicate_span_report(docs, "text", _SPAN_K)
        .select("doc_id")
        .distinct()
    )
    pairs = substr_ops.fingerprint_candidate_pairs(docs, "text", _SPAN_K, _FP_MIN_SHARED)
    cand = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    n_exact = exact.agg(F.count(F.lit(1)).alias("n_exact_docs"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidate_docs"))
    n_both = exact.join(cand, "doc_id", "left_semi").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        n_exact.crossJoin(n_cand)
        .crossJoin(n_both)  # 1-row x 1-row scalar assembly
        .select(
            "n_exact_docs",
            "n_candidate_docs",
            "n_overlap",
            F.expr(
                "cast(n_overlap as double) / nullif(cast(n_exact_docs as double), 0.0)"
            ).alias("doc_recall"),
        )
    )


TIER_REPORT_ORACLE = f"""
WITH {{span_ctes}},
exact AS (SELECT DISTINCT doc_id FROM spans),
pairs AS ({{cand_sql}}),
cand AS (
  SELECT DISTINCT doc_id FROM (
    SELECT doc_a AS doc_id FROM pairs UNION ALL SELECT doc_b FROM pairs
  )
)
SELECT (SELECT count(*) FROM exact) AS n_exact_docs,
       (SELECT count(*) FROM cand) AS n_candidate_docs,
       (SELECT count(*) FROM exact WHERE doc_id IN (SELECT doc_id FROM cand))
         AS n_overlap,
       cast((SELECT count(*) FROM exact WHERE doc_id IN (SELECT doc_id FROM cand))
            AS DOUBLE)
         / nullif(cast((SELECT count(*) FROM exact) AS DOUBLE), 0.0) AS doc_recall
""".format(
    span_ctes=substr_ops._span_ctes(
        f"(SELECT * FROM documents WHERE {_AUDIT_PRED}) AS _audit",
        "text",
        _SPAN_K,
    ),
    cand_sql=substr_ops.fingerprint_candidates_sql(
        f"(SELECT * FROM documents WHERE {_AUDIT_PRED}) AS _audit2",
        "text", _SPAN_K, _FP_MIN_SHARED,
    ).strip(),
)


_BATCH_PRED = "doc_id % 10 = 7"  # same ingest split as curation_suite


def incremental_substring_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arriving batch probed against the persisted fingerprint index
    (built in-query from the corpus split so the query stays a pure
    function of the tables; in a streaming loop it is the stored index).
    Oracle = the FULL candidate set filtered to batch-touching pairs, so
    the driver gate doubles as the probe-path-equivalence proof — the
    same pattern as incremental_near_dup_indexed."""
    docs = fan_out(load_table(spark, sf_dir, "documents"), min_bytes=0)
    new_batch = docs.filter(_BATCH_PRED).select("doc_id", "text")
    corpus = docs.filter(f"NOT ({_BATCH_PRED})").select("doc_id", "text")
    fps = substr_ops.corpus_fingerprints(corpus, "text", _SPAN_K)
    return substr_ops.incremental_fingerprint_probe(
        new_batch, fps, "text", _SPAN_K, _FP_MIN_SHARED
    )


SUITE = {
    "duplicate_substring_spans": QuerySpec(
        "duplicate_substring_spans",
        duplicate_substring_spans,
        substr_ops.duplicate_span_sql("documents", "text", _SPAN_K),
        "maximal cross-doc duplicated character spans (exact substring tier, hash exchange not suffix sort)",
    ),
    "strip_duplicate_spans": QuerySpec(
        "strip_duplicate_spans",
        strip_duplicate_spans,
        substr_ops.strip_duplicate_spans_sql("documents", "text", _SPAN_K),
        "cut duplicated spans out of every doc; order-defined reassembly on the reused doc_id exchange",
    ),
    "source_cap_sample": QuerySpec(
        "source_cap_sample",
        source_cap_sample,
        SOURCE_CAP_ORACLE,
        "per-source doc cap: broadcast bypass for under-cap sources, two-stage skew-spread top-n for hot ones",
    ),
    "corpus_shard_plan": QuerySpec(
        "corpus_shard_plan",
        corpus_shard_plan,
        SHARD_PLAN_ORACLE,
        "deterministic hash-shard + in-shard sequence: reproducible global shuffle without a global sort",
    ),
    "substring_candidates": QuerySpec(
        "substring_candidates",
        substring_candidates,
        substr_ops.fingerprint_candidates_sql("documents", "text", _SPAN_K, _FP_MIN_SHARED),
        "anchor-sampled fingerprint candidate pairs: ~1/6 of the exact tier's shuffle, md5-free, hot-gram guarded",
    ),
    "substring_tier_report": QuerySpec(
        "substring_tier_report",
        substring_tier_report,
        TIER_REPORT_ORACLE,
        "doc-level recall of the sampled tier vs the exact span tier (self-evaluating approximate tier)",
    ),
    "incremental_substring_probe": QuerySpec(
        "incremental_substring_probe",
        incremental_substring_probe,
        substr_ops.incremental_fingerprint_sql(
            _BATCH_PRED, "documents", "text", _SPAN_K, _FP_MIN_SHARED
        ),
        "batch probes the substring fingerprint index; corpus never re-shingled (probe == full-batch filtered)",
    ),
}
