"""Text analysis for LLM-data pipelines over the ``documents`` table.

Everything here is built from JVM-side Column expressions (split, HOF
lambdas, regexp) — no Python UDFs — so a 100 TB corpus is one codegen'd
scan: token metrics, quality scores, language ID, and fingerprints all
compute in a single pass with zero shuffles (only the optional aggregation
steps shuffle).

Design: each metric has a Spark Column-expression builder and a DuckDB SQL
rendering with identical semantics (different builtin names, same values:
integer counts and IEEE arithmetic on them are engine-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "STOPWORDS",
    "LANG_MARKERS",
    "with_text_stats",
    "with_lang_guess",
    "with_fingerprint",
    "text_stats_sql",
    "lang_guess_sql",
    "fingerprint_sql",
]

# Small function-word lists; deterministic and embedded in both engines'
# expressions. (A production language-ID would be a model scoring n-grams —
# the *operator shape* here is what matters: marker-hit counting per
# language, argmax by CASE.)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
    "es": ("el", "la", "de", "y", "es", "un"),
    "fr": ("le", "la", "et", "de", "est", "un"),
}

_PUNCT = "[.,!?;:]"


def _sql_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


# ---- token / quality stats ------------------------------------------------

def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_tokens, n_uniq_tokens, n_chars_obs, n_punct, stop_ratio,
    uniq_ratio, quality_score. One projection, no shuffle."""
    toks = f"split({text_col}, ' ')"
    exprs = {
        "n_tokens": f"cast(size({toks}) as bigint)",
        "n_uniq_tokens": f"cast(size(array_distinct({toks})) as bigint)",
        "n_chars_obs": f"cast(length({text_col}) as bigint)",
        "n_punct": f"cast(regexp_count({text_col}, '{_PUNCT}') as bigint)",
        "n_stop": (
            f"cast(size(filter({toks}, w -> w in ({_sql_list(STOPWORDS)}))) as bigint)"
        ),
    }
    out = df.withColumns({k: F.expr(v) for k, v in exprs.items()})
    return out.withColumns(
        {
            "stop_ratio": F.expr("n_stop / n_tokens"),
            "uniq_ratio": F.expr("n_uniq_tokens / n_tokens"),
            "quality_score": F.expr(_QUALITY),
        }
    )


# Quality heuristic (length band + lexical diversity + stopword plausibility).
# Literals are written in e-notation: both Spark and DuckDB parse `50.0` as
# DECIMAL, and bigint/decimal division follows engine-specific decimal scale
# rules that diverge in the last ulp — `50e0` parses as DOUBLE in both, so
# the whole expression stays in engine-independent IEEE arithmetic.
_QUALITY = (
    "least(n_tokens / 50e0, 1e0) * 4e-1"
    " + (n_uniq_tokens / n_tokens) * 4e-1"
    " + least((n_stop / n_tokens) / 3e-1, 1e0) * 2e-1"
)


def text_stats_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = f"string_split({text_col}, ' ')"
    return f"""
WITH base AS (
  SELECT doc_id, lang, source, n_chars,
         cast(len({toks}) as bigint) AS n_tokens,
         cast(len(list_distinct({toks})) as bigint) AS n_uniq_tokens,
         cast(length({text_col}) as bigint) AS n_chars_obs,
         cast(len(regexp_extract_all({text_col}, '{_PUNCT}')) as bigint) AS n_punct,
         cast(len(list_filter({toks}, w -> w in ({_sql_list(STOPWORDS)}))) as bigint) AS n_stop
  FROM {table}
)
SELECT *, n_stop / n_tokens AS stop_ratio,
       n_uniq_tokens / n_tokens AS uniq_ratio,
       {_QUALITY} AS quality_score
FROM base
"""


# ---- language ID ----------------------------------------------------------

def _lang_hit_exprs_spark(text_col: str) -> dict[str, str]:
    toks = f"split({text_col}, ' ')"
    return {
        f"hits_{lang}": f"size(filter({toks}, w -> w in ({_sql_list(words)})))"
        for lang, words in LANG_MARKERS.items()
    }


def _argmax_case() -> str:
    arms = []
    for lang in LANG_MARKERS:
        geq = " and ".join(
            f"hits_{lang} >= hits_{other}" for other in LANG_MARKERS if other != lang
        )
        arms.append(f"when {geq} and hits_{lang} > 0 then '{lang}'")
    return "case " + " ".join(arms) + " else 'und' end"


_LANG_ARGMAX = _argmax_case()


def with_lang_guess(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-hit language ID; ties resolve in fixed LANG_MARKERS order, so
    the CASE chain is deterministic across engines."""
    out = df.withColumns({k: F.expr(v) for k, v in _lang_hit_exprs_spark(text_col).items()})
    out = out.withColumn("lang_guess", F.expr(_LANG_ARGMAX))
    return out.drop(*[f"hits_{lang}" for lang in LANG_MARKERS])


def lang_guess_sql(table: str = "documents", text_col: str = "text") -> str:
    toks = f"string_split({text_col}, ' ')"
    hits = ", ".join(
        f"len(list_filter({toks}, w -> w in ({_sql_list(words)}))) AS hits_{lang}"
        for lang, words in LANG_MARKERS.items()
    )
    return f"""
WITH h AS (SELECT doc_id, lang, {hits} FROM {table})
SELECT doc_id, lang, {_LANG_ARGMAX} AS lang_guess FROM h
"""


# ---- shingles + fingerprint ----------------------------------------------

def shingle_expr_spark(text_col: str, k: int) -> str:
    """Word k-gram shingles as array<string> (Spark side).

    Guarded so short documents yield an empty array — Spark's sequence(1, n)
    DESCENDS when n < 1, which would fabricate bogus shingles."""
    toks = f"split({text_col}, ' ')"
    return (
        f"case when size({toks}) >= {k} then "
        f"transform(sequence(1, size({toks}) - {k - 1}), i -> concat_ws(' ', slice({toks}, i, {k}))) "
        f"else array() end"
    )


def shingle_expr_duckdb(text_col: str, k: int) -> str:
    toks = f"string_split({text_col}, ' ')"
    parts = ", ".join(f"{toks}[i + {j}]" for j in range(k))
    return f"list_transform(generate_series(1, len({toks}) - {k - 1}), i -> concat_ws(' ', {parts}))"


def with_fingerprint(df: DataFrame, text_col: str = "text", k: int = 4) -> DataFrame:
    """Document fingerprint: lexicographic min of md5(shingle) — a 1-permutation
    MinHash usable as a cheap near-dup prefilter key. md5 is identical across
    engines, making the fingerprint oracle-checkable (unlike engine hash()).
    """
    sh = shingle_expr_spark(text_col, k)
    return df.withColumn(
        "fingerprint", F.expr(f"array_min(transform({sh}, s -> md5(s)))")
    )


def fingerprint_sql(table: str = "documents", text_col: str = "text", k: int = 4) -> str:
    sh = shingle_expr_duckdb(text_col, k)
    return f"""
SELECT doc_id, list_min(list_transform({sh}, s -> md5(s))) AS fingerprint
FROM {table}
"""


# ---- BPE-style regex tokenization -----------------------------------------
#
# GPT-2-family pre-tokenizers split on the pattern "word | number-digit |
# punctuation-run | whitespace" before byte-pair merging. The regex below is
# the library-free core of that split, restricted to constructs whose
# semantics are identical in Java regex (Spark) and RE2 (DuckDB): character
# classes, alternation, +. Counting these pre-tokens is the standard
# proxy for "LLM token count" when no tokenizer model is shipped.

BPE_TOKEN_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add bpe_tokens (regex pre-token count), ws_tokens (whitespace count),
    and tokens_per_100_chars. One projection, no shuffle, no Python."""
    return df.withColumns(
        {
            "bpe_tokens": F.expr(
                f"cast(regexp_count({text_col}, '{BPE_TOKEN_PATTERN}') as bigint)"
            ),
            "ws_tokens": F.expr(f"cast(size(split({text_col}, ' ')) as bigint)"),
            "tokens_per_100_chars": F.expr(
                f"cast(regexp_count({text_col}, '{BPE_TOKEN_PATTERN}') as bigint)"
                # nullif: Spark (non-ANSI) yields NULL on /0 but DuckDB yields
                # inf — guard both sides so empty docs agree cross-engine.
                f" * 100e0 / nullif(length({text_col}), 0)"
            ),
        }
    )


def token_counts_sql(table: str = "documents", text_col: str = "text") -> str:
    n_bpe = f"cast(len(regexp_extract_all({text_col}, '{BPE_TOKEN_PATTERN}')) as bigint)"
    return f"""
SELECT doc_id,
       {n_bpe} AS bpe_tokens,
       cast(len(string_split({text_col}, ' ')) as bigint) AS ws_tokens,
       {n_bpe} * 100e0 / nullif(length({text_col}), 0) AS tokens_per_100_chars
FROM {table}
"""
