"""Corpus-curation operators for LLM-data pipelines: document chunking,
repetition (Gopher-style quality rules), PII redaction, and benchmark-
contamination probing.

Extension layer beyond the reference surface (BASELINE.json north star:
"add the LLM-data-pipeline operators ... design every operator for 100 TB
scale"). Shapes:

- **Chunking** is a per-row explode — zero shuffles; output partitioning
  inherits the scan. On 100 TB this is the map stage feeding a tokenizer.
- **Repetition stats** explode bigrams and aggregate on (doc_id, bigram):
  partial+final hash agg with map-side combine, one shuffle keyed by a
  compound key that's near-unique → no skew.
- **PII redaction** is a single codegen'd projection (JVM regexp_replace,
  no Python) — a 100 TB redact is one pass, no shuffle.
- **Contamination probe** hashes shingles to 60-bit md5-prefix ints
  (8-byte keys, dedup.py convention) and joins the corpus's exploded
  shingles against a BROADCAST distinct-shingle set of the (small)
  benchmark side — the big side never shuffles for the join; only the
  per-doc count aggregation shuffles.

Every operator has a Spark builder and a DuckDB SQL twin with identical
semantics (regex dialect kept to the Java∩RE2 subset, no backslashes so
SQL-literal escaping can't diverge).

Reference anchor: the reference has no text curation (SURVEY.md §2 "absent
rows"); these follow published pipeline designs (Gopher/MassiveText
repetition rules, n-gram decontamination as in GPT-3/PaLM appendices).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.dedup import _HASH60_DUCK, _HASH60_SPARK
from timedf_spark.operators.text import shingle_expr_duckdb, shingle_expr_spark

__all__ = [
    "chunk_documents",
    "doc_chunks_sql",
    "repetition_stats",
    "repetition_stats_sql",
    "redact_pii",
    "pii_redact_sql",
    "contamination_probe",
    "contamination_probe_sql",
    "decontaminate_spans",
    "decontaminate_spans_sql",
]

# ---- document chunking -----------------------------------------------------

CHUNK_TOKENS = 32  # window size W (tokens per chunk)
CHUNK_STRIDE = 24  # stride S (W - S = 8 tokens of overlap between chunks)


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Split each document into overlapping ``window``-token chunks every
    ``stride`` tokens (the standard pre-tokenization windowing for LLM
    training). Pure per-row explode: no shuffle, chunk boundaries are a
    function of the row alone, so the output is deterministic at any
    parallelism. The final (short) chunk is kept — both engines' slices
    clamp at the end of the token array."""
    toks = f"split({text_col}, ' ')"
    out = df.withColumn(
        "chunk_start", F.explode(F.expr(f"sequence(1, size({toks}), {stride})"))
    )
    return out.select(
        "doc_id",
        F.col("chunk_start").cast("long").alias("chunk_start"),
        F.expr(f"concat_ws(' ', slice({toks}, chunk_start, {window}))").alias("chunk_text"),
    ).withColumn("chunk_tokens", F.expr("cast(size(split(chunk_text, ' ')) as bigint)"))


def doc_chunks_sql(
    table: str = "documents",
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> str:
    toks = f"string_split({text_col}, ' ')"
    return f"""
WITH starts AS (
  SELECT doc_id, {toks} AS toks,
         unnest(generate_series(1, len({toks}), {stride})) AS s
  FROM {table}
)
SELECT doc_id, cast(s as bigint) AS chunk_start,
       array_to_string(list_slice(toks, s, s + {window - 1}), ' ') AS chunk_text,
       cast(len(string_split(array_to_string(list_slice(toks, s, s + {window - 1}), ' '), ' ')) as bigint)
         AS chunk_tokens
FROM starts
"""


# ---- repetition stats (Gopher/MassiveText-style quality rules) -------------

def repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition metrics used by published corpus-quality
    filters: duplicate-word fraction and the fraction of all bigrams taken
    by the single most frequent bigram (high → boilerplate/spam).

    Fully row-local: every metric — including the top-bigram count, via a
    sort + longest-run fold over the row's own bigram array — is computed
    inside the scan with ZERO shuffles (the earlier explode → two-level
    aggregate → join-back shape moved the whole bigram stream through two
    exchanges; measured 3.8× slower at sf0.1 for identical output). The
    per-row arrays are bounded by document length — the same
    single-document-fits-in-memory contract doc_chunks already assumes.
    The top-bigram *fraction* compares counts, never bigram strings, so
    there is no argmax tie to diverge across engines."""
    t = df.select("doc_id", F.split(text_col, " ").alias("t"))
    return (
        t.select(
            "doc_id",
            F.expr("cast(size(t) as bigint)").alias("n_tokens"),
            F.expr("(size(t) - size(array_distinct(t))) / size(t)").alias("dup_word_frac"),
            F.expr("cast(greatest(size(t) - 1, 0) as bigint)").alias("n_bigrams"),
            # longest run in the sorted bigram array == max bigram count
            F.expr(
                """
                case when size(t) >= 2 then (
                  aggregate(
                    array_sort(transform(sequence(0, size(t) - 2),
                                         i -> concat(t[i], ' ', t[i+1]))),
                    struct(cast(0 as bigint) as best, cast(0 as bigint) as cur,
                           cast(null as string) as prev),
                    (acc, x) -> struct(
                      greatest(acc.best,
                               case when acc.prev is not null and x = acc.prev
                                    then acc.cur + 1 else 1 end) as best,
                      case when acc.prev is not null and x = acc.prev
                           then acc.cur + 1 else 1 end as cur,
                      x as prev),
                    acc -> acc.best)
                ) else cast(0 as bigint) end
                """
            ).alias("top_bigram_cnt"),
        )
        # nullif: a bigram-less doc must yield NULL in BOTH engines (DuckDB
        # would give 0/0 = NaN under ieee_floating_point_ops, Spark NULL).
        .withColumn("top_bigram_frac", F.expr("top_bigram_cnt / nullif(n_bigrams, 0)"))
    )


def repetition_stats_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = f"string_split({text_col}, ' ')"
    return f"""
WITH base AS (
  SELECT doc_id,
         cast(len({toks}) as bigint) AS n_tokens,
         (len({toks}) - len(list_distinct({toks}))) / len({toks}) AS dup_word_frac
  FROM {table}
),
bg AS (
  SELECT doc_id, unnest({shingle_expr_duckdb(text_col, 2)}) AS bg FROM {table}
),
per_bigram AS (
  SELECT doc_id, bg, cast(count(*) as bigint) AS cnt FROM bg GROUP BY doc_id, bg
),
per_doc AS (
  SELECT doc_id, max(cnt) AS top_bigram_cnt, cast(sum(cnt) as bigint) AS n_bigrams
  FROM per_bigram GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens, b.dup_word_frac,
       coalesce(p.n_bigrams, 0) AS n_bigrams,
       coalesce(p.top_bigram_cnt, 0) AS top_bigram_cnt,
       coalesce(p.top_bigram_cnt, 0) / nullif(coalesce(p.n_bigrams, 0), 0) AS top_bigram_frac
FROM base b LEFT JOIN per_doc p USING (doc_id)
"""


# ---- PII redaction ---------------------------------------------------------
#
# Regexes stay inside the Java∩RE2 common subset AND avoid backslashes
# entirely ([.] instead of \.) so neither engine's string-literal escaping
# can change the pattern. Order matters: emails first (they contain
# digits), then standalone number runs.

EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
NUMBER_PATTERN = "[0-9]+"


def redact_pii(df: DataFrame, text_col: str, out_col: str = "redacted") -> DataFrame:
    """Replace email addresses with <EMAIL> and digit runs with <NUM>,
    keeping pre-redaction match counts for audit. One codegen'd projection
    (Spark regexp_replace is global), no shuffle, no Python."""
    return df.withColumns(
        {
            "n_email": F.expr(
                f"cast(regexp_count({text_col}, '{EMAIL_PATTERN}') as bigint)"
            ),
            "n_num": F.expr(
                f"cast(regexp_count(regexp_replace({text_col}, '{EMAIL_PATTERN}', '<EMAIL>'),"
                f" '{NUMBER_PATTERN}') as bigint)"
            ),
            out_col: F.expr(
                f"regexp_replace(regexp_replace({text_col}, '{EMAIL_PATTERN}', '<EMAIL>'),"
                f" '{NUMBER_PATTERN}', '<NUM>')"
            ),
        }
    )


def pii_redact_sql(table: str, text_col: str, key_cols: str) -> str:
    # DuckDB regexp_replace needs the 'g' flag to match Spark's
    # replace-all default.
    email_done = f"regexp_replace({text_col}, '{EMAIL_PATTERN}', '<EMAIL>', 'g')"
    return f"""
SELECT {key_cols},
       cast(len(regexp_extract_all({text_col}, '{EMAIL_PATTERN}')) as bigint) AS n_email,
       cast(len(regexp_extract_all({email_done}, '{NUMBER_PATTERN}')) as bigint) AS n_num,
       regexp_replace({email_done}, '{NUMBER_PATTERN}', '<NUM>', 'g') AS redacted
FROM {table}
"""


# ---- benchmark-contamination probe -----------------------------------------

CONTAM_K = 8  # shingle width for the overlap probe
PROBE_MOD = 20  # doc_id % PROBE_MOD == 0 plays the "benchmark set" role


def contamination_probe(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    k: int = CONTAM_K,
    probe_mod: int = PROBE_MOD,
) -> DataFrame:
    """For every corpus document, count its distinct ``k``-gram shingles
    that also occur anywhere in the probe ("benchmark") set — the standard
    n-gram decontamination check run before training.

    Scale: shingles are hashed to 60-bit md5-prefix ints at explode time
    (8-byte keys); the probe side (benchmark suites — tiny vs the corpus)
    is collapsed to a distinct-hash set and BROADCAST, so the 100 TB corpus
    side joins without shuffling; only the per-doc count aggregation
    shuffles (doc_id keys, near-uniform)."""
    sh = shingle_expr_spark(text_col, k)
    hashed = docs.select(
        "doc_id", F.explode(F.expr(sh)).alias("s")
    ).select("doc_id", F.expr(_HASH60_SPARK).alias("sh"))
    probe = (
        hashed.filter(F.col("doc_id") % probe_mod == 0).select("sh").distinct()
    )
    corpus = hashed.filter(F.col("doc_id") % probe_mod != 0).dropDuplicates(
        ["doc_id", "sh"]
    )
    counts = (
        corpus.join(F.broadcast(probe), "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared_shingles"))
    )
    out = (
        docs.filter(F.col("doc_id") % probe_mod != 0)
        .select("doc_id")
        .join(counts, "doc_id", "left")
    )
    return out.select(
        "doc_id",
        F.coalesce("n_shared_shingles", F.lit(0).cast("long")).alias("n_shared_shingles"),
        (F.coalesce("n_shared_shingles", F.lit(0)) > 0).alias("contaminated"),
    )


def contamination_probe_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = CONTAM_K,
    probe_mod: int = PROBE_MOD,
) -> str:
    return f"""
WITH shs AS (
  SELECT doc_id, unnest({shingle_expr_duckdb(text_col, k)}) AS s FROM {table}
),
hashed AS (SELECT doc_id, {_HASH60_DUCK} AS sh FROM shs),
probe AS (SELECT DISTINCT sh FROM hashed WHERE doc_id % {probe_mod} = 0),
corpus AS (
  SELECT DISTINCT doc_id, sh FROM hashed WHERE doc_id % {probe_mod} != 0
),
cnt AS (
  SELECT doc_id, cast(count(*) as bigint) AS n_shared_shingles
  FROM corpus JOIN probe USING (sh) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(c.n_shared_shingles, 0) AS n_shared_shingles,
       coalesce(c.n_shared_shingles, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM {table} WHERE doc_id % {probe_mod} != 0) d
LEFT JOIN cnt c USING (doc_id)
"""


# ---- span-level decontamination -------------------------------------------
#
# Document-level decontamination (contamination_probe) drops a whole doc
# for one leaked paragraph; span-level removal (Lee et al., "Deduplicating
# Training Data Makes Language Models Better", ACL 2022, applied to
# benchmark overlap as in the GPT-3/PaLM appendices) excises only the
# contaminated windows and keeps the rest. Shape: chunk (zero-shuffle
# explode, NON-overlapping so reassembly is exact) → flag chunks whose
# shingles hit the BROADCAST probe set (corpus side never shuffles for
# the join) → reassemble per doc with an order-defined string aggregate
# (one shuffle on doc_id).

_SPAN_WINDOW = 24  # non-overlapping: stride == window


def decontaminate_spans(
    spark: SparkSession,
    docs: DataFrame,
    text_col: str = "text",
    k: int = CONTAM_K,
    probe_mod: int = PROBE_MOD,
    window: int = _SPAN_WINDOW,
) -> DataFrame:
    """Per corpus doc: chunk count, removed-chunk count, and the cleaned
    text with contaminated chunks excised (order-preserving reassembly).
    Probe set = shingles of docs with doc_id % probe_mod == 0 (the
    'benchmark' role, as in contamination_probe)."""
    corpus = docs.filter(F.col("doc_id") % probe_mod != 0).select("doc_id", text_col)
    chunks = chunk_documents(corpus, text_col, window=window, stride=window)

    probe = (
        docs.filter(F.col("doc_id") % probe_mod == 0)
        .select(F.explode(F.expr(shingle_expr_spark(text_col, k))).alias("s"))
        .select(F.expr(_HASH60_SPARK).alias("sh"))
        .distinct()
    )
    flagged = (
        chunks.select(
            "doc_id", "chunk_start",
            F.explode(F.expr(shingle_expr_spark("chunk_text", k))).alias("s"),
        )
        .select("doc_id", "chunk_start", F.expr(_HASH60_SPARK).alias("sh"))
        .join(F.broadcast(probe), "sh", "left_semi")
        .select("doc_id", "chunk_start")
        .distinct()
    )
    kept = chunks.join(flagged, ["doc_id", "chunk_start"], "left_anti")
    kept_agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.expr(
            "concat_ws(' ', transform(array_sort(collect_list("
            "struct(chunk_start, chunk_text))), x -> x.chunk_text))"
        ).alias("clean_text"),
    )
    totals = chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_chunks"))
    return totals.join(kept_agg, "doc_id", "left").select(
        "doc_id",
        F.col("n_chunks").cast("long").alias("n_chunks"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).cast("long").alias("n_removed"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def decontaminate_spans_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = CONTAM_K,
    probe_mod: int = PROBE_MOD,
    window: int = _SPAN_WINDOW,
) -> str:
    toks = f"string_split({text_col}, ' ')"
    return f"""
WITH corpus AS (
  SELECT doc_id, {text_col} FROM {table} WHERE doc_id % {probe_mod} != 0
),
chunks AS (
  SELECT doc_id, cast(s as bigint) AS chunk_start,
         array_to_string(list_slice(toks, s, s + {window - 1}), ' ') AS chunk_text
  FROM (
    SELECT doc_id, {toks} AS toks,
           unnest(generate_series(1, len({toks}), {window})) AS s
    FROM corpus
  )
),
probe AS (
  SELECT DISTINCT {_HASH60_DUCK} AS sh FROM (
    SELECT unnest({shingle_expr_duckdb(text_col, k)}) AS s
    FROM {table} WHERE doc_id % {probe_mod} = 0
  )
),
flagged AS (
  SELECT DISTINCT doc_id, chunk_start FROM (
    SELECT doc_id, chunk_start, {_HASH60_DUCK} AS sh FROM (
      SELECT doc_id, chunk_start,
             unnest({shingle_expr_duckdb('chunk_text', k)}) AS s
      FROM chunks
    )
  ) WHERE sh IN (SELECT sh FROM probe)
),
kept AS (
  SELECT c.* FROM chunks c
  WHERE NOT EXISTS (
    SELECT 1 FROM flagged f
    WHERE f.doc_id = c.doc_id AND f.chunk_start = c.chunk_start
  )
),
ka AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(chunk_text, ' ' ORDER BY chunk_start) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       cast(t.n_chunks AS BIGINT) AS n_chunks,
       cast(t.n_chunks - coalesce(ka.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(ka.clean_text, '') AS clean_text
FROM (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY doc_id) t
LEFT JOIN ka ON t.doc_id = ka.doc_id
"""
