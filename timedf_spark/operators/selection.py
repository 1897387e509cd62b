"""Hashed n-gram importance weighting for targeted data selection
(the DSIR shape: Xie et al., "Data Selection for Language Models via
Importance Resampling", NeurIPS 2023).

Given a small TARGET subset (the distribution you want more of — a
trusted domain, a language, a quality tier) and the raw corpus, weight
every document by how target-like its token distribution is:

    pass 1: hash each token into one of ``n_buckets`` feature buckets
        (60-bit md5 → pmod — the cross-engine hash family from
        functions/hashing.py) and count buckets twice: over the target
        subset and over the whole corpus. Both count tables are
        bucket-sized (≤ n_buckets rows), shuffled with map-side combine.
    pass 2: per-bucket weight = ratio of add-one-smoothed probabilities,
        target over corpus, quantized to a bigint; the weight table is
        tiny → broadcast onto the token stream; per-doc importance is
        the exact integer weight sum over the doc's tokens divided by
        its token count.

Determinism: the published DSIR weight is a LOG-likelihood ratio; ln()
is libm-dependent (operators/lm.py precedent), so the weight here is the
*probability ratio itself*, quantized — per-bucket monotone in the log
form; the per-doc aggregation averages ratios instead of summing logs
(geometric → arithmetic mean swap; same high/low-importance tails, and
the oracle comparison is exact). All inputs are exact integers; every
float op is one fixed tree of IEEE +,/,* — bit-identical across engines;
the per-doc sum is an order-independent bigint sum.

At 100 TB (r11 single-pass shape): ONE corpus token pass reduced
in-aggregate to a (doc_id, bucket) count histogram, which is
materialized once (a doc-grain frame — its exchange and storage are the
price of removing four more token passes) and feeds every downstream
derivation: the bucket count table, the totals, and the per-doc score
join. The weight table stays O(n_buckets) regardless of corpus size —
the property that made DSIR practical at CommonCrawl scale. The
histogram materialization goes through operators.cluster._checkpoint,
so SPARK_GRAFT_CHECKPOINT_DIR switches it to a reliable disk
checkpoint when executor storage memory is the constraint (the r08 OOM
mode); block release falls to the session owner (the bench unpersists
between queries; a long-lived cluster job should unpersist after
consuming the result).

Quantization bound (LOUD): quantized weights are ≤ ratio_max * 10^6
where ratio_max ≈ (tot_corpus + n_buckets)/(tot_target + n_buckets);
per-doc totals then must stay < 2^53 — holds while doc_len * ratio_max
< ~9e9. A 100 TB run with a tiny target should cap ratio_max (clip the
weight table) or drop the quantization scale; the clip is one
``least()`` on the broadcast side.

Reference parity: no data-selection surface exists in intel-ai/timedf
(SURVEY.md §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["importance_weights", "importance_weights_sql"]

N_BUCKETS = 1024
_SCALE = 6

_BUCKET_SPARK = (
    f"pmod(cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint), {N_BUCKETS})"
)
_BUCKET_DUCK = f"((('0x' || substr(md5(term), 1, 15))::BIGINT) % {N_BUCKETS})"

# shared Spark-SQL/DuckDB text over exact-integer columns nt, nc, tot_t,
# tot_c: quantized smoothed-probability ratio (target / corpus)
_QW_SQL = (
    "cast(floor(((cast(nt as double) + 1.0)"
    f" / (cast(tot_t as double) + {float(N_BUCKETS):.1f}))"
    " / ((cast(nc as double) + 1.0)"
    f" / (cast(tot_c as double) + {float(N_BUCKETS):.1f}))"
    f" * {10.0 ** _SCALE:.1f} + 0.5) as bigint)"
)


def importance_weights(
    docs: DataFrame,
    target_pred: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, importance) for every document; importance is the
    mean quantized target/corpus probability ratio over the doc's hashed
    token buckets (module docstring). ``target_pred`` is a SQL predicate
    over ``docs`` selecting the target subset."""
    tok = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.expr(f"({target_pred})").alias("is_target"),
        )
        .select(
            "doc_id",
            "is_target",
            F.explode(F.split("_t", " ")).alias("term"),
        )
        .filter("term <> ''")
        .withColumn("bucket", F.expr(_BUCKET_SPARK))
    )
    # r11: the explode + per-token md5 subtree is the dominant cost and
    # fed FIVE consumers (corpus counts, target counts, both totals
    # branches, the per-doc score join) — five full token passes in one
    # job. Reduce it ONCE to the (doc_id, is_target, bucket) count
    # histogram (map-side combine; is_target is doc-constant so the
    # grain is (doc_id, bucket)) and materialize that; every downstream
    # quantity is an exact integer derivation from the histogram:
    # nc = sum(cnt), nt = sum(cnt | is_target) (the LEFT JOIN + coalesce
    # collapses into the conditional sum), tot_* = their sums over the
    # <= n_buckets-row count table — nullif(.,0) reproduces the empty-
    # target NULL the old separate aggregate produced — and the per-doc
    # token sum sum(qw) over tokens == sum(qw * cnt) over histogram rows.
    # ADVICE r11: route the doc-grain materialization through the shared
    # _checkpoint helper — it honors the SPARK_GRAFT_CHECKPOINT_DIR
    # reliable-checkpoint switch (raw localCheckpoint caches whole
    # partitions in executor heap, the r08 OOM mode at the 1000x decade).
    from timedf_spark.operators.cluster import _checkpoint

    hist, _hist_ids = _checkpoint(
        tok.groupBy("doc_id", "is_target", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    counts = hist.groupBy("bucket").agg(
        F.sum("cnt").alias("nc"),
        F.sum(F.when(F.col("is_target"), F.col("cnt")).otherwise(0)).alias("nt"),
    )
    totals = counts.agg(
        F.sum("nc").alias("tot_c"),
        F.expr("nullif(sum(nt), 0)").alias("tot_t"),
    )
    weights = (
        counts.join(F.broadcast(totals))
        .withColumn("qw", F.expr(_QW_SQL))
        .select("bucket", "qw")
    )
    per_doc = (
        hist.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr("qw * cnt")).alias("sw"),
            F.sum("cnt").alias("n_tokens"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        F.expr(
            f"(cast(sw as double) / cast(n_tokens as double)) / {10.0 ** _SCALE:.1f}"
        ).alias("importance"),
    )


def importance_weights_sql(
    table: str = "documents",
    target_pred: str = "lang = 'en'",
    text_col: str = "text",
) -> str:
    """DuckDB twin — identical weight expression text (_QW_SQL)."""
    return f"""
WITH tok AS (
  SELECT doc_id, is_target, term, {_BUCKET_DUCK} AS bucket FROM (
    SELECT doc_id, ({target_pred}) AS is_target,
           unnest(string_split({text_col}, ' ')) AS term
    FROM {table}
  ) WHERE term <> ''
), corpus_counts AS (
  SELECT bucket, count(*) AS nc FROM tok GROUP BY bucket
), target_counts AS (
  SELECT bucket, count(*) AS nt FROM tok WHERE is_target GROUP BY bucket
), totals AS (
  SELECT (SELECT sum(nc) FROM corpus_counts) AS tot_c,
         (SELECT sum(nt) FROM target_counts) AS tot_t
), weights AS (
  SELECT bucket, {_QW_SQL} AS qw
  FROM (
    SELECT c.bucket, c.nc, coalesce(t.nt, 0) AS nt
    FROM corpus_counts c LEFT JOIN target_counts t USING (bucket)
  ) CROSS JOIN totals
), per_doc AS (
  SELECT doc_id, sum(qw) AS sw, count(*) AS n_tokens
  FROM tok JOIN weights USING (bucket)
  GROUP BY doc_id
)
SELECT doc_id, n_tokens,
       (cast(sw AS DOUBLE) / cast(n_tokens AS DOUBLE)) / {10.0 ** _SCALE:.1f}
         AS importance
FROM per_doc
"""
