"""Extension-layer suite: LLM-data-pipeline operators as driver queries
(dedup, similarity search, text analysis, sessionization, splits).

These go beyond the reference's own surface (BASELINE.json north star) and
are first-class: each has a (spark, sf_dir) callable; everything except the
recall-validated ANN tier has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import davg
from timedf_spark.functions.hashing import DOC_HASH_DUCK, DOC_HASH_SPARK
from timedf_spark.operators import cluster, dedup, sessionize, similarity
from timedf_spark.operators.text import (
    fingerprint_sql,
    lang_guess_sql,
    text_stats_sql,
    token_counts_sql,
    with_fingerprint,
    with_lang_guess,
    with_text_stats,
    with_token_counts,
)
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import fan_out, load_table


# ---- text analysis --------------------------------------------------------

def _text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = with_text_stats(fan_out(load_table(spark, sf_dir, "documents")))
    return df.select(
        "doc_id", "lang", "source", "n_chars",
        "n_tokens", "n_uniq_tokens", "n_chars_obs", "n_punct", "n_stop",
        "stop_ratio", "uniq_ratio", "quality_score",
    )


def _lang_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = with_lang_guess(fan_out(load_table(spark, sf_dir, "documents")))
    return df.select("doc_id", "lang", "lang_guess")


def _fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = with_fingerprint(fan_out(load_table(spark, sf_dir, "documents")))
    return df.select("doc_id", "fingerprint")


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = with_token_counts(fan_out(load_table(spark, sf_dir, "documents")))
    return df.select("doc_id", "bpe_tokens", "ws_tokens", "tokens_per_100_chars")


# ---- dedup ----------------------------------------------------------------

def _exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(spark, sf_dir)


# Hot-shingle df cutoff for the STANDALONE exact-Jaccard query: a shingle
# in more than this many documents is boilerplate evidence, not
# near-duplication evidence, and its inverted-index bucket costs O(df²)
# pairs — the one quadratic tier VERDICT r03 flagged. The guard is a
# broadcast anti-join (heavy hitters are few by definition) and the DuckDB
# oracle applies the SAME cutoff, so the query stays oracle-exact; Jaccard
# is then defined over the filtered shingle sets (semantics delta
# documented in ngram_jaccard_pairs_df). Composite pipelines that need the
# unguarded baseline (dedup_clusters' oracle twin, the prefix tier's
# shared oracle) keep max_doc_freq=None explicitly.
_HOT_SHINGLE_DF = 64


def _ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(spark, sf_dir, max_doc_freq=_HOT_SHINGLE_DF)


def _minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(spark, sf_dir)


def _simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash64(spark, sf_dir)


def _dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs → canonical clusters: connected components over the exact
    Jaccard near-dup graph (iterative min-label propagation; the cluster id
    is the component's minimum doc_id). Singleton docs keep themselves.

    The pair graph is the HOT-SHINGLE-GUARDED tier (df ≤ _HOT_SHINGLE_DF,
    same cutoff as the standalone dedup_ngram_jaccard query, applied on
    both engines): until r08 this query clustered the UNGUARDED graph —
    one boilerplate shingle shared by D docs costs O(D²) candidate pairs,
    and the r08 100× forced-distributed shakeout caught exactly that (a
    single verify-stage straggler with ~450 s of CPU while 31 cores sat
    idle). The guard is also the right curation semantics: boilerplate
    shingles must not glue unrelated documents into one mega-cluster."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = dedup.ngram_jaccard_pairs(
        spark, sf_dir, max_doc_freq=_HOT_SHINGLE_DF
    ).select("doc_a", "doc_b")
    return cluster.connected_components(docs, edges).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )


DEDUP_CLUSTERS_ORACLE = (
    "SELECT vertex AS doc_id, component AS cluster_id FROM ("
    + cluster.connected_components_sql(
        "SELECT doc_id AS v FROM documents",
        "SELECT doc_a AS src, doc_b AS dst FROM ("
        + dedup.ngram_jaccard_sql(max_doc_freq=_HOT_SHINGLE_DF)
        + ")",
    )
    + ")"
)


# ---- deterministic corpus mixing ------------------------------------------

# Per-language keep rates (percent). Reproducible corpus mixing must not
# use engine RNG: the keep/drop decision is a pure function of the row
# (md5 of the doc id), so ANY engine — and any re-run, at any parallelism —
# selects the identical subset. This is how production corpus mixes stay
# stable across pipeline versions. Rebalances the language mix:
# downsample dominant English, keep mid-resource, trim zh harder.
_MIX_RATES = {"en": 60, "de": 90, "es": 90, "fr": 90, "zh": 40}

# doc-id hash-threshold family shared with temperature_mix (functions/hashing.py)
_MIX_HASH = DOC_HASH_SPARK
_MIX_HASH_DUCK = DOC_HASH_DUCK
_MIX_CASE = "case " + " ".join(f"when lang = '{l}' then {r}" for l, r in _MIX_RATES.items()) + " else 100 end"


def _corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-threshold sampling: keep doc iff h(doc_id) mod 100 < rate(lang).
    One codegen'd scan, no shuffle, no RNG — the sample is a deterministic
    property of the data, reproducible at any scale/parallelism."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("bucket", F.expr(f"{_MIX_HASH} % 100"))
        .filter(F.expr(f"bucket < {_MIX_CASE}"))
        .select("doc_id", "lang", "source", "bucket")
    )


CORPUS_MIX_ORACLE = f"""
SELECT doc_id, lang, source, {_MIX_HASH_DUCK} % 100 AS bucket
FROM documents
WHERE {_MIX_HASH_DUCK} % 100 < ({_MIX_CASE})
"""

# ---- token-budget packing -------------------------------------------------

_TOKEN_BUDGET = 5000  # per language


def _token_budget_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the highest-quality documents per language until a token
    budget fills: window cumulative sum over (quality desc, doc_id) order,
    keep rows whose running total stays within budget. One shuffle on the
    partition key; the cumsum is exact integer arithmetic, and the ordering
    key (quality_score) is the same IEEE double in both engines, so the
    selected set is engine-exact."""
    from pyspark.sql.window import Window

    scored = with_text_stats(fan_out(load_table(spark, sf_dir, "documents"))).select(
        "doc_id", "lang", "n_tokens", "quality_score"
    )
    w = (
        Window.partitionBy("lang")
        .orderBy(F.desc("quality_score"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_tokens", "quality_score")
    )


def _token_budget_oracle() -> str:
    from timedf_spark.operators import text as _text

    toks = "string_split(text, ' ')"
    stats = (
        "SELECT doc_id, lang, "
        f"cast(len({toks}) as bigint) AS n_tokens, "
        f"cast(len(list_distinct({toks})) as bigint) AS n_uniq_tokens, "
        f"cast(len(list_filter({toks}, w -> w in ({_text._sql_list(_text.STOPWORDS)}))) as bigint) AS n_stop "
        "FROM documents"
    )
    return f"""
WITH stats AS ({stats}),
scored AS (SELECT doc_id, lang, n_tokens, {_text._QUALITY} AS quality_score FROM stats),
packed AS (
  SELECT doc_id, lang, n_tokens, quality_score,
         cast(sum(n_tokens) OVER (
           PARTITION BY lang ORDER BY quality_score DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) as bigint) AS cum_tokens
  FROM scored
)
SELECT doc_id, lang, n_tokens, cum_tokens, quality_score
FROM packed WHERE cum_tokens <= {_TOKEN_BUDGET}
"""


# ---- corpus curation: the end-to-end pipeline -----------------------------

_CURATE_QUALITY_MIN = 0.5


def curate_near_dup_pairs(qx: DataFrame) -> DataFrame:
    """The near-dup stage curate_corpus composes: the MinHash-LSH tier.
    Exposed as a named stage so the plan test can audit the candidate join
    shape directly (the connected-components checkpoint downstream hides
    this subplan from the end-to-end executed plan)."""
    return dedup.minhash_lsh_pairs_df(qx.select("doc_id", "text")).select("doc_a", "doc_b")


def _curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite op a training-data pipeline actually runs, end to end:

        quality-score → filter → exact dedup (md5 keeper) →
        near-dup clusters (MinHash-LSH pairs → connected components) →
        keep one representative per cluster

    Output: surviving doc_id with its token count and quality score.

    Scale shape: scoring+filter is one codegen'd scan (shrinks everything
    downstream — the cheapest stage runs first); exact dedup shuffles
    16-byte digests; the near-dup stage is the LSH tier — candidate
    generation is an equi-join on (band, band_key), NEVER a shingle-bucket
    self-join, so a hot stopword shingle shared by millions of docs costs
    one aggregate row, not O(docs²) pairs. (Round 2 composed the exact
    Jaccard tier here; that inverted-index self-join is quadratic per hot
    shingle — a 100 TB scale-killer. The exact tier remains available as
    ngram_jaccard_pairs, the documented oracle baseline.) The oracle below
    runs the SAME md5-family MinHash banding in DuckDB, so candidates —
    and therefore clusters — match exactly, not just approximately.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = with_text_stats(docs).select("doc_id", "text", "n_tokens", "quality_score")
    # r11 note: materializing q (it feeds both sides of the exact-dedup
    # join) was A/B'd and REVERTED — the duplicated subtrees run
    # concurrently inside one job on an idle box, so the eager
    # localCheckpoint serialized the critical path and measured
    # 1.85 -> 4.4-5.0 s in two same-chunk-layout bench A/Bs at sf0.1
    # (steady-state in-session timing is a wash: 4.2-4.6 s both ways).
    q = scored.filter(F.col("quality_score") >= _CURATE_QUALITY_MIN)
    keep_exact = (
        q.groupBy(F.expr("md5(text)").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    qx = q.join(keep_exact, "doc_id").cache()
    pairs = curate_near_dup_pairs(qx)
    comp = cluster.connected_components(qx.select("doc_id"), pairs)
    keepers = comp.filter(F.col("vertex") == F.col("component")).select(
        F.col("vertex").alias("doc_id")
    )
    return qx.join(keepers, "doc_id").select("doc_id", "n_tokens", "quality_score")


def _curate_ctes() -> str:
    """The shared WITH-RECURSIVE body of the curation pipeline's DuckDB
    twin (quality score → filter → exact-dedup keepers → MinHash-LSH
    pairs → connected components). Both the curate_corpus oracle and the
    curation_funnel oracle append their own final SELECT to this text, so
    the two can never drift apart."""
    from timedf_spark.operators import text as _text

    toks = "string_split(text, ' ')"
    stats = (
        "SELECT doc_id, text, "
        f"cast(len({toks}) as bigint) AS n_tokens, "
        f"cast(len(list_distinct({toks})) as bigint) AS n_uniq_tokens, "
        f"cast(len(list_filter({toks}, w -> w in ({_text._sql_list(_text.STOPWORDS)}))) as bigint) AS n_stop "
        "FROM documents"
    )
    pairs_sql = dedup.minhash_lsh_sql(src="qx")
    return f"""
WITH RECURSIVE
stats AS ({stats}),
scored AS (SELECT doc_id, text, n_tokens, {_text._QUALITY} AS quality_score FROM stats),
q AS (SELECT * FROM scored WHERE quality_score >= 5e-1),
ex AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY md5(text)),
qx AS (SELECT q.* FROM q JOIN ex ON ex.doc_id = q.doc_id),
pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql})),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
walk(v, lbl) AS (
  SELECT doc_id, doc_id FROM qx
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.v
),
comp AS (SELECT v AS doc_id, min(lbl) AS cluster_id FROM walk GROUP BY v)"""


def _curate_corpus_oracle() -> str:
    return _curate_ctes() + """
SELECT qx.doc_id, qx.n_tokens, qx.quality_score
FROM qx JOIN comp ON comp.doc_id = qx.doc_id AND comp.cluster_id = qx.doc_id
"""


def _curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts of the curation pipeline — the
    observability report every production corpus build publishes next to
    its output (how many docs each gate removed). Same stages, same
    arithmetic as curate_corpus; the output is the 4-row funnel instead
    of the surviving rows.

    Scale posture: identical to curate_corpus (each stage's count is a
    single partial+final aggregate of a frame the pipeline materializes
    anyway); the stage frames union at 1 row each."""
    docs = load_table(spark, sf_dir, "documents")
    scored = with_text_stats(docs).select("doc_id", "text", "quality_score")
    # r11 note: materializing q (three executions: both exact-dedup join
    # sides + the stage-2 count) was A/B'd and REVERTED — same finding as
    # curate_corpus: the duplicated subtrees are concurrent within one
    # job, and the eager checkpoint serialized the critical path
    # (3.05 -> 4.7-4.9 s, two same-layout bench A/Bs at sf0.1).
    q = scored.filter(F.col("quality_score") >= _CURATE_QUALITY_MIN)
    keep_exact = (
        q.groupBy(F.expr("md5(text)").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    qx = q.join(keep_exact, "doc_id").cache()
    pairs = curate_near_dup_pairs(qx)
    comp = cluster.connected_components(qx.select("doc_id"), pairs)
    keepers = comp.filter(F.col("vertex") == F.col("component")).select(
        F.col("vertex").alias("doc_id")
    )

    def stage(order: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_docs")).select(
            F.lit(order).alias("stage_order"), F.lit(name).alias("stage"), "n_docs"
        )

    out = (
        stage(1, "raw", docs)
        .unionByName(stage(2, "quality", q))
        .unionByName(stage(3, "exact_dedup", qx))
        .unionByName(stage(4, "near_dup_keepers", qx.join(keepers, "doc_id")))
        .orderBy("stage_order")
    )
    # The funnel is 4 rows: eagerly materialize it and release the qx
    # cache in-band (unlike charlm_score, where the checkpointed frame is
    # per-doc and the in-band release cost 3.5x — here it's free). Without
    # this, each re-run parks another copy of qx's blocks until the next
    # clearCache.
    out = out.localCheckpoint(eager=True)
    qx.unpersist()
    return out


def _curation_funnel_oracle() -> str:
    return _curate_ctes() + """
SELECT 1 AS stage_order, 'raw' AS stage, count(*) AS n_docs FROM documents
UNION ALL
SELECT 2, 'quality', count(*) FROM q
UNION ALL
SELECT 3, 'exact_dedup', count(*) FROM qx
UNION ALL
SELECT 4, 'near_dup_keepers', count(*)
FROM qx JOIN comp ON comp.doc_id = qx.doc_id AND comp.cluster_id = qx.doc_id
ORDER BY stage_order
"""


# ---- similarity search ----------------------------------------------------

def _ann_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.brute_force_topk(spark, sf_dir)


def _ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.lsh_topk(spark, sf_dir)


def _ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivf_topk(spark, sf_dir)


def _ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.ivfpq_topk(spark, sf_dir)


def _ann_ivf_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serving-path IVF: probe the persisted cell-partitioned index
    (built once per sf_dir — the first call pays the build, every later
    call measures the probe). Rows identical to ann_ivf_topk at the
    same parameters, pinned by tests/test_ivf_index.py."""
    from timedf_spark.operators.ivf_index import ann_ivf_persisted

    return ann_ivf_persisted(spark, sf_dir)


def _cosine_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.cosine_dedup_pairs(spark, sf_dir)


# ---- embeddings misc ------------------------------------------------------

_EMB_STATS_AGGS = {
    "n_vectors": "count(*)",
    "dim": "cast(max(size) as bigint)",
    "first_mean": davg("first_val", scale=8),
}


def _embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding stats — array columns meet plain aggregation.
    first_val goes through double so the quantized mean matches the oracle
    (float32 widening is exact)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label",
        F.expr("cast(size(embedding) as int)").alias("size"),
        F.expr("cast(embedding[0] as double)").alias("first_val"),
    )
    return emb.groupBy("label").agg(
        *[F.expr(sql).alias(name) for name, sql in _EMB_STATS_AGGS.items()]
    )


EMB_STATS_ORACLE = f"""
WITH emb AS (
  SELECT label, cast(len(embedding) as int) AS size,
         cast(embedding[1] as double) AS first_val
  FROM embeddings
)
SELECT label, {', '.join(f'{sql} AS {name}' for name, sql in _EMB_STATS_AGGS.items())}
FROM emb GROUP BY label
"""


# ---- per-label embedding centroids (vector aggregation) -------------------
#
# The classifier-data-quality primitive: the mean vector per label. The
# vector aggregate is expressed as posexplode → per-(label, dimension)
# quantized mean — one shuffle keyed by (label, dim), partial aggregation
# collapses the exploded rows map-side, so the shuffle carries
# labels × dims rows, not vectors × dims. Output is LONG format (one row
# per label per dimension): scalar doubles hash identically across
# engines, where an array column's serialization would not. Reassembling
# the array (array_agg ordered by dim) is one more map-side step when a
# consumer needs it.


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    return (
        emb.select("label", (F.col("pos") + 1).alias("dim_idx"),
                   F.col("v").cast("double").alias("v"))
        .groupBy("label", "dim_idx")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.expr(davg("v", scale=8)).alias("centroid_val"),
        )
    )


LABEL_CENTROIDS_ORACLE = f"""
WITH exploded AS (
  SELECT label, cast(i as bigint) AS dim_idx, cast(embedding[i] as double) AS v
  FROM (
    SELECT label, embedding,
           unnest(generate_series(1, len(embedding))) AS i
    FROM embeddings
  )
)
SELECT label, dim_idx, count(*) AS n_vectors,
       {davg('v', scale=8)} AS centroid_val
FROM exploded GROUP BY label, dim_idx
"""


# ---- stratified split (K1, exact/systematic) ------------------------------
#
# sklearn's stratified split (ref: benchmark_utils.py:118-155) takes exact
# per-stratum fractions. Spark's sampleBy is only approximate; the
# deterministic, oracle-checkable equivalent is systematic sampling: number
# rows per stratum in a stable order, assign every 5th to test (20%).

_SPLIT_SQL_BODY = """
SELECT label, split, count(*) AS cnt FROM (
  SELECT label,
         CASE WHEN row_number() OVER (PARTITION BY label ORDER BY vec_id) % 5 = 0
              THEN 'test' ELSE 'train' END AS split
  FROM embeddings
) GROUP BY label, split
"""


def _stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView("embeddings")
    return spark.sql(_SPLIT_SQL_BODY)


# ---- sessionization -------------------------------------------------------

def _sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize.sessionize(spark, sf_dir)


# ---- trained quality classifier -------------------------------------------

def _quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a linear quality classifier on a doc_id split, score ALL docs.

    Iterative IRLS training (one scan per Newton round, O(d²) driver
    traffic) → no single oracle SQL; correctness is pinned by
    tests/test_quality_model.py (held-out accuracy, numpy scorer parity).
    """
    from timedf_spark.operators import quality_model as qm

    # no fan_out: IRLS is iteration-dominated, and per-round scheduling
    # overhead on widened tiny partitions outweighs the projection win
    # (same measured call as CC rounds / curate_corpus, COVERAGE.md)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    # r11: featured feeds TWO full executions — the training block build
    # and the final scoring scan — and with_text_stats (tokenize + regex
    # stats over text) is the expensive part of both. Project to the nine
    # narrow columns either consumer needs (drops text) and materialize
    # ONCE; θ and the scores are unchanged because the feature values are.
    featured = (
        qm.classifier_features(docs)
        .select("doc_id", "lang", "quality_score", *qm.FEATURES)
        .localCheckpoint(eager=True)
    )
    theta = qm.train_quality_classifier(featured.filter("doc_id % 5 < 4"))
    return qm.score_documents(featured, theta).select(
        "doc_id", "lang", "quality_prob", "prob_bucket"
    )


# ---- multimodal feature extraction ----------------------------------------

def _multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload feature extraction through the real mapInPandas
    plumbing (operators/multimodal.py): documents → BinaryType payloads →
    Arrow-batched decode-stub features. Python-side float math → rows-only
    driver check; the decode stub is deterministic so row count and schema
    are stable."""
    from timedf_spark.operators.multimodal import (
        attach_fake_payloads,
        extract_image_features,
    )

    media = attach_fake_payloads(fan_out(load_table(spark, sf_dir, "documents")))
    return extract_image_features(media)



# ---- string-function depth (H11): opening-word profile per language -------
#
# regexp_extract + lower + nested aggregation (count per word, then argmax
# per language). Regex kept to the Java/RE2-shared subset.

_FIRST_WORD_SQL = """
WITH words AS (
  SELECT lang, lower(regexp_extract(text, '^[A-Za-z]+', 0)) AS w FROM documents
),
counts AS (
  SELECT lang, w, count(*) AS n FROM words WHERE w <> '' GROUP BY lang, w
)
SELECT lang,
       max_by(w, concat(lpad(cast(n as string), 12, '0'), w)) AS top_word,
       max(n) AS top_count
FROM counts GROUP BY lang
"""

_FIRST_WORD_ORACLE = """
WITH words AS (
  SELECT lang, lower(regexp_extract(text, '^[A-Za-z]+', 0)) AS w FROM documents
),
counts AS (
  SELECT lang, w, count(*) AS n FROM words WHERE w <> '' GROUP BY lang, w
)
SELECT lang,
       arg_max(w, concat(lpad(cast(n as varchar), 12, '0'), w)) AS top_word,
       max(n) AS top_count
FROM counts GROUP BY lang
"""


def _top_first_word(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common opening word per language; ties broken by the larger
    word (count zero-padded into a sortable composite key, the same
    construction as latest_order_per_customer)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_FIRST_WORD_SQL)

SUITE = {
    "text_stats": QuerySpec(
        "text_stats", _text_stats, text_stats_sql(),
        "token/char/punct/stopword metrics + quality score",
    ),
    "lang_id": QuerySpec(
        "lang_id", _lang_guess, lang_guess_sql(),
        "marker-based language ID",
    ),
    "doc_fingerprint": QuerySpec(
        "doc_fingerprint", _fingerprint, fingerprint_sql(),
        "min-md5-shingle document fingerprint",
    ),
    "dedup_exact": QuerySpec(
        "dedup_exact", _exact_dedup, dedup.EXACT_DEDUP_SQL,
        "exact dedup via md5 hash-groupBy",
    ),
    "dedup_ngram_jaccard": QuerySpec(
        "dedup_ngram_jaccard", _ngram_jaccard,
        dedup.ngram_jaccard_sql(max_doc_freq=_HOT_SHINGLE_DF),
        "exact shingle-Jaccard near-dup pairs (inverted-index join, "
        "hot-shingle df guard on both engines)",
    ),
    "dedup_minhash_lsh": QuerySpec(
        "dedup_minhash_lsh", _minhash_lsh, dedup.minhash_lsh_sql(),
        "MinHash+LSH banding candidates, Jaccard-verified",
    ),
    "dedup_simhash": QuerySpec(
        "dedup_simhash", _simhash, dedup.simhash_sql(),
        "64-bit SimHash signatures + hamming bands",
    ),
    "dedup_clusters": QuerySpec(
        "dedup_clusters", _dedup_clusters, DEDUP_CLUSTERS_ORACLE,
        "near-dup pairs → canonical clusters (iterative connected components)",
    ),
    "curation_funnel": QuerySpec(
        "curation_funnel", _curation_funnel, _curation_funnel_oracle(),
        "per-stage survivor counts of the curation pipeline (raw -> quality -> exact dedup -> near-dup keepers)",
    ),
    "curate_corpus": QuerySpec(
        "curate_corpus", _curate_corpus, _curate_corpus_oracle(),
        "end-to-end curation: quality filter → exact dedup → near-dup clusters → keepers",
    ),
    "corpus_mix": QuerySpec(
        "corpus_mix", _corpus_mix, CORPUS_MIX_ORACLE,
        "deterministic hash-threshold corpus mixing by language rate",
    ),
    "token_budget_pack": QuerySpec(
        "token_budget_pack", _token_budget_pack, _token_budget_oracle(),
        "best-quality docs per language until a token budget (window cumsum)",
    ),
    "ann_brute_topk": QuerySpec(
        "ann_brute_topk", _ann_brute, similarity.brute_force_topk_sql(),
        "exact cosine top-k (broadcast queries, windowed rank)",
    ),
    "ann_lsh_topk": QuerySpec(
        "ann_lsh_topk", _ann_lsh, None,  # approximate: validated by recall test
        "SRP-LSH bucketed approximate top-k",
    ),
    "ann_ivf_topk": QuerySpec(
        "ann_ivf_topk", _ann_ivf, None,  # approximate: validated by recall test
        "IVF coarse-quantized approximate top-k (nprobe cells)",
    ),
    "ann_ivfpq_topk": QuerySpec(
        "ann_ivfpq_topk", _ann_ivfpq, None,  # approximate: validated by recall test
        "IVF-PQ: product-quantized ADC candidates + exact re-rank",
    ),
    "ann_ivf_persisted": QuerySpec(
        "ann_ivf_persisted", _ann_ivf_persisted, None,  # == ann_ivf_topk, pinned by test
        "persisted IVF index probe: partition-pruned postings scan (serving path)",
    ),
    "dedup_embedding_cosine": QuerySpec(
        "dedup_embedding_cosine", _cosine_dedup, similarity.cosine_dedup_sql(),
        "embedding-cosine near-dup pairs (SRP-LSH blocked, exact verify)",
    ),
    "token_counts": QuerySpec(
        "token_counts", _token_counts, token_counts_sql(),
        "BPE-style regex + whitespace token counting",
    ),
    "embedding_stats": QuerySpec(
        "embedding_stats", _embedding_stats, EMB_STATS_ORACLE,
        "array-column aggregation per label",
    ),
    "label_centroids": QuerySpec(
        "label_centroids", _label_centroids, LABEL_CENTROIDS_ORACLE,
        "per-label centroid vectors via posexplode + per-dimension quantized mean",
    ),
    "stratified_split": QuerySpec(
        "stratified_split", _stratified_split, _SPLIT_SQL_BODY,
        "exact systematic stratified split (K1)",
    ),
    "sessionize": QuerySpec(
        "sessionize", _sessionize, sessionize.SESSIONIZE_SQL,
        "gap-based sessionization via windows (E gap)",
    ),
    "top_first_word": QuerySpec(
        "top_first_word", _top_first_word, _FIRST_WORD_ORACLE,
        "regexp_extract + nested agg + argmax (H11 depth)",
    ),
    "multimodal_features": QuerySpec(
        "multimodal_features", _multimodal_features, None,  # Python float math
        "binary-payload feature extraction via Arrow mapInPandas",
    ),
    "quality_classifier": QuerySpec(
        "quality_classifier", _quality_classifier, None,  # iterative IRLS training
        "train CCNet-style linear quality model (IRLS), score corpus in codegen",
    ),
}


_KEEPER_CAP = 8  # same per-vector degree bound as semantic_dedup_capped


def _semantic_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level near-dup CLUSTERS → keeper summary: DEGREE-CAPPED
    SRP-blocked cosine pairs (no all-pairs), connected components over
    them, one row per cluster = (keeper vec_id = min member, member
    count). The semantic twin of curate_corpus's text-level keeper
    selection.

    Capped, not uncapped (r09): clustering needs CONNECTIVITY, not every
    edge — the degree bound's consecutive-link chaining keeps a dense
    same-bucket duplicate group in one component while capping candidate
    volume at N·tables·cap (the uncapped tier's in-bucket volume is
    quadratic in occupancy: measured 224 s / exponent 1.0 at 100x —
    200k vectors over 256 buckets/table — vs the capped tier's 0.24).
    Pair recall of the capped graph vs uncapped is the measured
    ``semantic_dedup_degree_cap`` evidence bound (0.88); transitive
    chaining recovers most of the gap at the COMPONENT level."""
    # CC only over edge ENDPOINTS (vertices=None): vertices without a
    # near-dup edge are singleton components, and the query filters
    # singletons anyway — so the iterative rounds run over the (tiny)
    # duplicate graph, not the whole corpus. The endpoint set derives
    # from the operator's own edge checkpoint: zero extra
    # materialization of the SRP+cosine pipeline.
    edges = similarity.cosine_dedup_pairs(
        spark, sf_dir, max_degree=_KEEPER_CAP
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    cc = cluster.connected_components(None, edges)
    return (
        cc.groupBy(F.col("component").alias("keeper_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter("n_members > 1")  # singletons are trivially their own keeper
        .orderBy("keeper_id")
    )


SEMANTIC_DEDUP_ORACLE = (
    "SELECT component AS keeper_id, count(*) AS n_members FROM ("
    + cluster.connected_components_sql(
        "SELECT vec_id AS v FROM embeddings",
        "SELECT id_a AS src, id_b AS dst FROM ("
        + similarity.cosine_dedup_capped_sql(_KEEPER_CAP)
        + ")",
    )
    + ") GROUP BY component HAVING count(*) > 1 ORDER BY keeper_id"
)

SUITE["semantic_dedup_keepers"] = QuerySpec(
    "semantic_dedup_keepers",
    _semantic_dedup_keepers,
    SEMANTIC_DEDUP_ORACLE,
    "embedding near-dup clusters -> keeper summary (SRP blocking + CC)",
)


# --- incremental cluster maintenance ---------------------------------------

_INC_CLUSTER_PRED = "(doc_a + doc_b) % 3 = 0"  # ~1/3 of pairs arrive "later"


def _incremental_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest cluster maintenance, end-to-end: cluster the corpus on
    2/3 of the near-dup pairs, then fold in the remaining 1/3 through
    operators/cluster.py::incremental_components — only components touched
    by a new edge re-cluster; everything else passes through. The oracle
    is the FULL-recompute recursive-CTE twin over all pairs: incremental
    maintenance is only correct if it reaches the from-scratch fixpoint."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    # checkpoint the pair pipeline ONCE: both the base and the increment
    # read it (a lazy frame would re-run the shingle self-join per branch).
    # Hot-shingle-guarded tier — same graph (and same r08 rationale) as
    # dedup_clusters above; the full-recompute oracle applies the guard too.
    pairs, _ids = cluster._checkpoint(
        dedup.ngram_jaccard_pairs(
            spark, sf_dir, max_doc_freq=_HOT_SHINGLE_DF
        ).select("doc_a", "doc_b")
    )
    old_e = pairs.filter(f"NOT ({_INC_CLUSTER_PRED})")
    new_e = pairs.filter(_INC_CLUSTER_PRED)
    # base assignments WITHOUT a corpus-wide iteration: endpoint-restricted
    # CC over the old edges, union the off-graph docs as their own
    # singletons (exactly what full CC assigns them, minus the rounds)
    base_cc = cluster.connected_components(None, old_e)
    endpoints = old_e.select(F.col("doc_a").alias("doc_id")).union(
        old_e.select(F.col("doc_b").alias("doc_id"))
    ).distinct()
    singles = docs.join(endpoints, "doc_id", "left_anti").select(
        F.col("doc_id").alias("vertex"), F.col("doc_id").alias("component")
    )
    base = base_cc.unionByName(singles)
    return cluster.incremental_components(base, new_e).select(
        F.col("vertex").alias("doc_id"), F.col("component").alias("cluster_id")
    )


SUITE["incremental_dedup_clusters"] = QuerySpec(
    "incremental_dedup_clusters",
    _incremental_dedup_clusters,
    DEDUP_CLUSTERS_ORACLE,  # the full-recompute fixpoint IS the contract
    "incremental cluster maintenance reaches the from-scratch fixpoint",
)


def _jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_prefix_pairs(spark, sf_dir)


SUITE["dedup_jaccard_prefix"] = QuerySpec(
    "dedup_jaccard_prefix",
    _jaccard_prefix,
    dedup.ngram_jaccard_sql(),  # EXACT tier: same results as the inverted-index form
    "PPJoin prefix-filtered exact Jaccard: rare-first prefixes generate candidates, full-set verify",
)
