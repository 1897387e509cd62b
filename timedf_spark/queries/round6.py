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
# the rest arrive as today's delta batch. Representation + merge live in
# operators/rollup.py, shared with the streaming maintenance sink
# (streaming/rollup_apply.py).
_DELTA_PRED = "o_orderkey % 4 = 0"
_SCALE_MULT = "10000.0"
_Q_EXPR = f"cast(floor(o_totalprice * {_SCALE_MULT} + 0.5) as bigint)"


def _day_rollup(orders: DataFrame) -> DataFrame:
    from timedf_spark.operators.rollup import quantized_rollup

    return quantized_rollup(
        orders.select(F.col("o_orderdate").alias("day"), "o_totalprice"),
        ["day"],
        "o_totalprice",
    )


def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timedf_spark.operators.rollup import finish_rollup, merge_rollups

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_totalprice"
    )
    base = _day_rollup(orders.filter(f"NOT ({_DELTA_PRED})"))
    delta = _day_rollup(orders.filter(_DELTA_PRED))
    merged = merge_rollups(base, delta, ["day"])
    return (
        finish_rollup(merged, "revenue")
        .select("day", F.col("n_rows").alias("n_orders"), "revenue")
        .orderBy("day")
    )


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

# --- point-in-time (temporal) dimension lookup ------------------------------

_PIT_FACT = "purchase"


def purchase_state_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each purchase event looks up the user's
    BROWSING state (SCD2 validity intervals built from the non-purchase
    events) as of the purchase timestamp — the classic temporal dimension
    lookup every warehouse needs (fact.ts ∈ [valid_from, valid_to)).

    Scale posture: the join is ANCHORED on the user_id equi-key — Spark
    plans a hash/sort-merge join on the key with the interval predicate
    as a residual filter, never a nested loop; per-key history runs are
    short, so the residual is cheap. Intervals are disjoint per user by
    construction (gaps-and-islands), so each fact row matches at most
    one interval; purchases before the first interval keep NULL state
    (left join — PIT lookups must not drop facts). At 100 TB: broadcast
    the history if it fits, else both sides shuffle once on user_id.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    dim_src = ev.filter(F.col("event_type") != _PIT_FACT).select(
        "user_id", "ts", "event_id", F.col("event_type").alias("state")
    )
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = F.when(
        F.lag("state").over(order).isNull()
        | (F.lag("state").over(order) != F.col("state")),
        1,
    ).otherwise(0)
    islands = dim_src.withColumn("chg", changed).withColumn(
        "island",
        F.sum("chg").over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    spans = islands.groupBy("user_id", "island").agg(
        F.first("state").alias("state"),
        F.min("ts").alias("valid_from"),
    )
    seq = Window.partitionBy("user_id").orderBy("valid_from", "island")
    hist = spans.select(
        F.col("user_id").alias("h_user"),
        "state",
        "valid_from",
        F.lead("valid_from").over(seq).alias("valid_to"),
    )
    fact = ev.filter(F.col("event_type") == _PIT_FACT).select(
        "event_id", "user_id", "ts"
    )
    joined = fact.join(
        hist,
        (fact.user_id == hist.h_user)
        & (fact.ts >= hist.valid_from)
        & (hist.valid_to.isNull() | (fact.ts < hist.valid_to)),
        "left",
    )
    return joined.select("event_id", "user_id", "ts", "state").orderBy("event_id")


PURCHASE_STATE_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type AS state,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WHERE event_type <> '{_PIT_FACT}'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
islands AS (
  SELECT user_id, ts, state,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
spans AS (
  SELECT user_id, island, first(state) AS state, min(ts) AS valid_from
  FROM islands GROUP BY user_id, island
),
hist AS (
  SELECT user_id AS h_user, state, valid_from,
         lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from, island) AS valid_to
  FROM spans
)
SELECT f.event_id, f.user_id, f.ts, h.state
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = '{_PIT_FACT}') f
LEFT JOIN hist h
  ON f.user_id = h.h_user
 AND f.ts >= h.valid_from
 AND (h.valid_to IS NULL OR f.ts < h.valid_to)
ORDER BY f.event_id
"""

# --- near-dup tier evaluation report ----------------------------------------


def near_dup_tier_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall/precision of the MinHash-LSH tier against the exact
    inverted-index Jaccard baseline — the evaluation a pipeline owner
    runs before trusting the approximate tier at scale. Both tiers'
    pair sets are cross-engine exact (md5 hash families), so even the
    tier COMPARISON is oracle-checkable — unusual for an approximate
    method, and exactly why the md5 construction was chosen.

    LSH verifies candidates with the same exact Jaccard, so precision is
    structurally 1.0; recall < 1 measures what banding misses. One-row
    output: the three counts + the two ratios (single int divisions).

    Scale posture: the baseline here is DELIBERATELY the unguarded
    inverted-index tier (``max_doc_freq=None``) — an evaluation's ground
    truth must be the true pair set. That tier is quadratic in per-shingle
    document frequency, so at 100 TB this report is run on a bounded
    random sample of the corpus (e.g. ``documents.sample(0.001)``), never
    the full corpus; recall estimated on an unbiased sample transfers to
    the population. The production dedup path itself never runs the
    unguarded tier."""
    from timedf_spark.operators import dedup

    # r11 note: materializing each tier's pair frame (two consumers each:
    # own count + overlap join) was A/B'd and REVERTED — the duplicated
    # shingle pipelines run concurrently inside the one job, so the eager
    # localCheckpoints serialized the critical path (1.60 -> 2.3-2.5 s in
    # two same-chunk-layout bench A/Bs at sf0.1).
    exact = dedup.ngram_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    lsh = dedup.minhash_lsh_pairs(spark, sf_dir).select("doc_a", "doc_b")
    ne = exact.agg(F.count(F.lit(1)).alias("n_exact"))
    nl = lsh.agg(F.count(F.lit(1)).alias("n_lsh"))
    nc = exact.join(lsh, ["doc_a", "doc_b"]).agg(F.count(F.lit(1)).alias("n_common"))
    return (
        ne.crossJoin(nl)
        .crossJoin(nc)
        .select(
            "n_exact",
            "n_lsh",
            "n_common",
            # nullif guard: a corpus/sf with zero near-dup pairs must
            # yield NULL identically on both engines (Spark x/0 is NULL,
            # DuckDB integer x/0 errors — the guard unifies them)
            (F.col("n_common") / F.expr("nullif(n_exact, 0)")).alias("recall"),
            (F.col("n_common") / F.expr("nullif(n_lsh, 0)")).alias("precision"),
        )
    )


def _tier_report_oracle() -> str:
    from timedf_spark.operators import dedup

    return f"""
WITH exact AS (SELECT doc_a, doc_b FROM ({dedup.ngram_jaccard_sql()})),
lsh AS (SELECT doc_a, doc_b FROM ({dedup.minhash_lsh_sql()})),
c AS (SELECT count(*) AS n_common FROM exact JOIN lsh USING (doc_a, doc_b)),
e AS (SELECT count(*) AS n_exact FROM exact),
l AS (SELECT count(*) AS n_lsh FROM lsh)
SELECT n_exact, n_lsh, n_common,
       n_common / nullif(n_exact, 0) AS recall,
       n_common / nullif(n_lsh, 0) AS precision
FROM e, l, c
"""


# --- declarative data-quality expectations ----------------------------------

_PRICE_HI = 1_000_000


def order_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The table contract a production load validates on every run:
    null-free keys, value domain, price range, key uniqueness, customer
    FK — compiled by operators/expect.py into ONE aggregate pass plus
    one broadcast anti-join (see its docstring for the 100 TB shape)."""
    from timedf_spark.operators import expect as X

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rules = [
        X.not_null("o_custkey"),
        X.in_range("o_totalprice", 0, _PRICE_HI),
        X.accepted_values("o_orderstatus", ["O", "F", "P"]),
        X.unique("o_orderkey"),
        X.foreign_key("o_custkey", "c_custkey"),
    ]
    return X.expectations_report(orders, rules, dims={"c_custkey": customer})


ORDER_EXPECTATIONS_ORACLE = f"""
WITH s AS (
  SELECT count(*) AS n,
         cast(sum(CASE WHEN NOT COALESCE((o_custkey IS NOT NULL), false) THEN 1 ELSE 0 END) AS BIGINT) AS v_notnull,
         cast(sum(CASE WHEN NOT COALESCE((o_totalprice IS NOT NULL AND o_totalprice >= 0 AND o_totalprice <= {_PRICE_HI}), false) THEN 1 ELSE 0 END) AS BIGINT) AS v_range,
         cast(sum(CASE WHEN NOT COALESCE((o_orderstatus IN ('F', 'O', 'P')), false) THEN 1 ELSE 0 END) AS BIGINT) AS v_vals,
         count(DISTINCT o_orderkey) AS u,
         count(o_orderkey) AS nn
  FROM orders
),
fk AS (
  SELECT count(*) AS orphans
  FROM orders o
  WHERE o.o_custkey IS NOT NULL
    AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)
)
SELECT * FROM (
  SELECT 'not_null(o_custkey)' AS rule, n AS n_rows,
         v_notnull AS n_violations, v_notnull = 0 AS ok FROM s
  UNION ALL
  SELECT 'in_range(o_totalprice,0,{_PRICE_HI})', n, v_range, v_range = 0 FROM s
  UNION ALL
  SELECT 'accepted_values(o_orderstatus)', n, v_vals, v_vals = 0 FROM s
  UNION ALL
  SELECT 'unique(o_orderkey)', n, nn - u, nn - u = 0 FROM s
  UNION ALL
  SELECT 'fk(o_custkey->c_custkey)', n, orphans, orphans = 0 FROM s, fk
)
ORDER BY rule
"""

SUITE = {
    "order_expectations": QuerySpec(
        "order_expectations",
        order_expectations,
        ORDER_EXPECTATIONS_ORACLE,
        "declarative data-quality expectations: one-pass contract validation report",
    ),
    "near_dup_tier_report": QuerySpec(
        "near_dup_tier_report",
        near_dup_tier_report,
        _tier_report_oracle(),
        "LSH tier recall/precision vs the exact Jaccard baseline, oracle-checked end to end",
    ),
    "purchase_state_lookup": QuerySpec(
        "purchase_state_lookup",
        purchase_state_lookup,
        PURCHASE_STATE_ORACLE,
        "point-in-time temporal lookup: purchases join the SCD2 browsing-state history on key + validity interval",
    ),
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
