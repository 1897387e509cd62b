"""Round-6 queries: session Markov transitions and exact incremental
aggregate maintenance.

Scale posture (the 100 TB lens, per query):

- ``markov_transitions``: the journey model on top of the sessionizer.
  Both session windows AND the next-event lead() ride ONE user_id
  exchange (hashpartitioning(user_id) satisfies the (user_id,
  session_id) window's clustered distribution — the same exchange-reuse
  as session_paths); the transition aggregate then runs at
  event-type² cardinality (map-side combine collapses almost every row
  before its shuffle), and the row-probability window runs on that
  aggregate grain. Nothing after the first exchange scales with the
  fact table. The probability is ONE IEEE division of two exact
  integers — cross-engine exact, no transcendentals.

- ``incremental_daily_rollup``: maintain a day-grain aggregate through
  a delta batch WITHOUT rescanning the fact — the daily-ingest pattern
  (aggregate the delta, combine with the stored aggregate on the
  day grain). The deterministic quantized-sum layer is what makes the
  incrementally-maintained result EXACTLY equal to a full recompute:
  the stored accumulator is the integer quantized sum, and integer
  partial sums are associative, so base_q + delta_q == full_q
  bit-for-bit at any split of the data — a plain float sum could never
  pass this oracle. At scale the base table is day-grain (tiny), the
  delta aggregation touches only new data, and the combine is a
  full-outer join at aggregate grain.

Reference parity: the reference has no windowed or incremental
operators (SURVEY.md §2.E/§2.I absent rows); these are extension-layer
capabilities a production event pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.sessionize import GAP_MINUTES
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --- session Markov transitions --------------------------------------------

# Dialect-shared text (same string runs as Spark SQL and DuckDB): the
# sessionizer fragment is the proven SESSIONIZE_SQL shape; transitions are
# lead() within (user, session); row-normalized probabilities divide exact
# integer counts.
MARKOV_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN ts - lag(ts) OVER w > INTERVAL {GAP_MINUTES} MINUTE THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts, event_type,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
),
hops AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id, session_id ORDER BY ts, event_id) AS to_type
  FROM sessions
),
counts AS (
  SELECT from_type, to_type, count(*) AS n_transitions
  FROM hops WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
)
SELECT from_type, to_type, n_transitions,
       n_transitions / (sum(n_transitions) OVER (PARTITION BY from_type)) AS p
FROM counts
ORDER BY from_type, to_type
"""


def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(MARKOV_SQL)


# --- exact incremental aggregate maintenance -------------------------------

# The "late-arriving quarter": 3/4 of orders form the standing aggregate,
# the rest arrive as today's delta batch.
_DELTA_PRED = "o_orderkey % 4 = 0"
_SCALE_MULT = "10000.0"
_Q_EXPR = f"cast(floor(o_totalprice * {_SCALE_MULT} + 0.5) as bigint)"


def _day_rollup(orders: DataFrame) -> DataFrame:
    """Day-grain aggregate with the INTEGER quantized sum as the stored
    accumulator — the mergeable representation (plain bigint adds)."""
    return orders.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.expr(_Q_EXPR)).alias("rev_q"),
    )


def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    base = _day_rollup(orders.filter(f"NOT ({_DELTA_PRED})"))
    delta = _day_rollup(orders.filter(_DELTA_PRED))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(d, F.col("b.day") == F.col("d.day"), "full_outer").select(
        F.coalesce(F.col("b.day"), F.col("d.day")).alias("day"),
        (
            F.coalesce(F.col("b.n_orders"), F.lit(0))
            + F.coalesce(F.col("d.n_orders"), F.lit(0))
        ).alias("n_orders"),
        (
            F.coalesce(F.col("b.rev_q"), F.lit(0))
            + F.coalesce(F.col("d.rev_q"), F.lit(0))
        ).alias("rev_q"),
    )
    return merged.select(
        "day",
        "n_orders",
        F.expr(f"cast(rev_q as double) / {_SCALE_MULT}").alias("revenue"),
    ).orderBy("day")


# Full recompute over ALL orders — the incremental path must reach it
# bit-for-bit (associative integer accumulators), not approximately.
INCREMENTAL_ROLLUP_ORACLE = f"""
SELECT o_orderdate AS day, count(*) AS n_orders,
       (cast(sum({_Q_EXPR}) as double) / {_SCALE_MULT}) AS revenue
FROM orders
GROUP BY o_orderdate
ORDER BY day
"""

# --- language-ID confusion matrix ------------------------------------------


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language-ID against the labelled
    ``lang`` column — the evaluation report that belongs next to any
    rule-based classifier in a curation pipeline. One scan → codegen
    lang-guess projection → event-type²-grade aggregate; the share is one
    IEEE division of exact counts (same pattern as markov_transitions)."""
    from pyspark.sql import Window

    from timedf_spark.operators.text import with_lang_guess

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    guessed = with_lang_guess(docs).select("lang", "lang_guess")
    counts = guessed.groupBy("lang", "lang_guess").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return counts.select(
        "lang",
        "lang_guess",
        "n_docs",
        (F.col("n_docs") / F.sum("n_docs").over(w)).alias("share"),
    ).orderBy("lang", "lang_guess")


def _lang_confusion_oracle() -> str:
    from timedf_spark.operators.text import lang_guess_sql

    return f"""
WITH g AS ({lang_guess_sql()}),
c AS (SELECT lang, lang_guess, count(*) AS n_docs FROM g GROUP BY lang, lang_guess)
SELECT lang, lang_guess, n_docs,
       n_docs / (sum(n_docs) OVER (PARTITION BY lang)) AS share
FROM c
ORDER BY lang, lang_guess
"""


# --- per-language sequence packing ------------------------------------------

# Context-window size for concat-style packing (tokens per training
# sequence). Doc→bin assignment: deterministic hash order within each
# language stream, running token cumsum, bin = floor(preceding_tokens /
# ctx) — each doc lands in the bin where its text STARTS (concat-then-
# chunk semantics at doc grain).
_CTX_TOKENS = 2048


def context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing report: per (lang, context-window bin),
    how many docs and tokens land there and how full the bin is.

    Scale posture: the running sum windows PER LANGUAGE (the real
    pipeline packs per shard/language stream), so there is no global
    single-partition sort; the order key is a hash — deterministic at
    any parallelism, no RNG. For a language too hot for one reducer,
    salt the stream into ``lang#salt`` sub-streams — same semantics per
    stream. The bin aggregate runs at (lang × bins) grain."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.expr("cast(size(split(text, ' ')) as bigint)").alias("n_tokens"),
        F.expr("md5(cast(doc_id as string))").alias("ord"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("ord", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # cast to double explicitly: a bare `/ 2048.0` parses as a DECIMAL
    # literal in Spark SQL (bigint/decimal → decimal(27,6)) where DuckDB
    # reads a double — the dtype-strict harness catches exactly this
    binned = docs.withColumn("cum", F.sum("n_tokens").over(w)).withColumn(
        "bin_id",
        F.expr(
            f"cast(floor(cast(cum - n_tokens as double) / cast({_CTX_TOKENS} as double)) as bigint)"
        ),
    )
    return (
        binned.groupBy("lang", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("bin_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.expr(f"cast(bin_tokens as double) / cast({_CTX_TOKENS} as double)"),
        )
        .orderBy("lang", "bin_id")
    )


CONTEXT_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, lang,
         cast(len(string_split(text, ' ')) as bigint) AS n_tokens,
         md5(cast(doc_id as varchar)) AS ord
  FROM documents
),
o AS (
  SELECT lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY ord, doc_id ROWS UNBOUNDED PRECEDING) AS cum
  FROM t
),
b AS (
  SELECT lang,
         cast(floor(cast(cum - n_tokens as double) / cast({_CTX_TOKENS} as double)) as bigint) AS bin_id,
         n_tokens
  FROM o
)
SELECT lang, bin_id, count(*) AS n_docs,
       cast(sum(n_tokens) AS BIGINT) AS bin_tokens,
       cast(cast(sum(n_tokens) AS BIGINT) as double) / cast({_CTX_TOKENS} as double) AS fill_ratio
FROM b
GROUP BY lang, bin_id
ORDER BY lang, bin_id
"""

SUITE = {
    "lang_confusion": QuerySpec(
        "lang_confusion",
        lang_confusion,
        _lang_confusion_oracle(),
        "language-ID confusion matrix vs labelled lang, per-row shares",
    ),
    "context_pack": QuerySpec(
        "context_pack",
        context_pack,
        CONTEXT_PACK_ORACLE,
        "per-language sequence packing into context-window bins (hash order, running cumsum)",
    ),
    "markov_transitions": QuerySpec(
        "markov_transitions",
        markov_transitions,
        MARKOV_SQL,
        "within-session next-event transition matrix with row probabilities",
    ),
    "incremental_daily_rollup": QuerySpec(
        "incremental_daily_rollup",
        incremental_daily_rollup,
        INCREMENTAL_ROLLUP_ORACLE,
        "delta-batch aggregate maintenance == full recompute, exactly (integer quantized accumulators)",
    ),
}
