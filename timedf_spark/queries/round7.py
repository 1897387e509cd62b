"""Round-7 queries: mergeable distribution summaries — exact equi-depth
histograms and Misra-Gries heavy hitters (operators/summaries.py), each
with a DuckDB oracle and a streaming maintenance twin
(streaming/mg_apply.py; the equi-depth count store rides the exact
rollup store).

Scale posture (the 100 TB lens):

- ``equidepth_prices``: the row scan reduces to per-value counts
  (distributed partial+final aggregate); only the value-grain count
  table (bounded by the caller's quantization — whole currency units
  here) passes through the single-partition cumulative window that
  places bucket boundaries. The same counts are exactly what the
  streaming rollup store maintains, so the histogram of a living table
  is a finisher over the store, not a fact rescan.

- ``mg_token_summary``: token counting is the distributed aggregate;
  the MG reduction reads only the top k+1 counts via TakeOrdered
  (per-partition top-k then a tiny driver merge — no global sort) and a
  1-row broadcast threshold join. The one-shot batch form here is
  oracle-exact; the multi-batch streaming form keeps the
  ``true - est <= n/(k+1)`` undercount bound (pinned in tests).

Reference parity: no histogram or heavy-hitter surface exists in
intel-ai/timedf (SURVEY.md §2 D16/H11 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators import summaries
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_EQUIDEPTH_K = 8
_MG_K = 20

# whole-currency-unit quantization: bounds the distinct-value frame the
# boundary window touches (same expression text on both engines)
_PRICE_EXPR = "cast(floor(o_totalprice) as bigint)"


def equidepth_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 8-bucket equi-depth histogram of order prices."""
    orders = load_table(spark, sf_dir, "orders")
    return summaries.equidepth_histogram(orders, _PRICE_EXPR, _EQUIDEPTH_K)


EQUIDEPTH_ORACLE = summaries.equidepth_sql("orders", _PRICE_EXPR, _EQUIDEPTH_K)


def mg_token_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-shot Misra-Gries summary (k=20 counters) of the corpus token
    stream — the stopword/boilerplate discovery pass of a curation
    pipeline. est_count = count minus the (k+1)-th largest count."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = (
        docs.select(F.explode(F.split("text", " ")).alias("item"))
        .filter(F.col("item") != "")
    )
    counts = tokens.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    return summaries.mg_reduce(counts, _MG_K)


MG_TOKENS_ORACLE = summaries.mg_summary_sql(
    _MG_K,
    "SELECT unnest(string_split(text, ' ')) AS token FROM documents",
    item_filter="token <> ''",
)


_MG_GROUP_K = 5
_ROLL_W = 6  # rows preceding: window = 7 most recent events per user


def mg_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP Misra-Gries: the k=5 heavy tokens per language — the
    grouped form of mg_token_summary (per-language stopword discovery).

    Scale posture: counts reduce distributed at (lang, token) grain with
    map-side combine; both windows partition BY LANG (rank and the
    (k+1)-th-count threshold), so no global sort and no single-partition
    window — each language's count table ranks independently."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(F.split("text", " ")).alias("item"))
        .filter(F.col("item") != "")
        .groupBy("lang", "item")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("item"))
    w_lang = Window.partitionBy("lang")
    ranked = counts.withColumn("rk", F.row_number().over(w_rank)).withColumn(
        "thr",
        F.coalesce(
            F.max(F.when(F.col("rk") == _MG_GROUP_K + 1, F.col("cnt"))).over(w_lang),
            F.lit(0).cast("long"),
        ),
    )
    return ranked.filter(F.col("cnt") > F.col("thr")).select(
        "lang", "item", (F.col("cnt") - F.col("thr")).alias("est_count")
    )


MG_PER_LANG_ORACLE = f"""
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS item FROM documents
),
c AS (SELECT lang, item, count(*) AS cnt FROM tok WHERE item <> '' GROUP BY 1, 2),
r AS (
  SELECT lang, item, cnt,
         row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, item) AS rk
  FROM c
),
t AS (
  SELECT lang, item, cnt,
         coalesce(max(CASE WHEN rk = {_MG_GROUP_K + 1} THEN cnt END)
                  OVER (PARTITION BY lang), 0) AS thr
  FROM r
)
SELECT lang, item, cast(cnt - thr AS bigint) AS est_count
FROM t WHERE cnt > thr
"""


def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling median of event value over each user's last
    {w+1} events — the robust-baseline smoother of an anomaly pipeline
    (Spark has no exact median window function; percentile_approx is not
    an oracle-checkable substitute).

    Implementation: sort_array(collect_list) over a BOUNDED row frame +
    1-based element_at — both engines evaluate the identical
    middle-element formula on the identical sorted 7-element array, so
    even-count interpolation is IEEE-identical. Scale posture: the frame
    is bounded (7 rows), so per-row state is O(w) regardless of history
    length, and the only exchange is the per-user window partition.
    Rows with NULL value are excluded up front (Spark collect_list skips
    NULLs, DuckDB list() keeps them — filtering unifies the engines)."""
    from pyspark.sql.window import Window

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "value")
        .filter(F.col("value").isNotNull())
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-_ROLL_W, 0)
    arr = F.sort_array(F.collect_list("value").over(w))
    return ev.select(
        "event_id",
        "user_id",
        arr.alias("a"),
    ).select(
        "event_id",
        "user_id",
        F.expr(
            "CASE WHEN size(a) % 2 = 1 "
            "THEN element_at(a, cast((size(a)+1) div 2 as int)) "
            "ELSE (element_at(a, cast(size(a) div 2 as int)) "
            "      + element_at(a, cast(size(a) div 2 + 1 as int))) / 2.0e0 "
            "END"
        ).alias("rolling_median"),
    )


ROLLING_MEDIAN_ORACLE = f"""
WITH base AS (
  SELECT event_id, user_id, ts, value FROM events WHERE value IS NOT NULL
),
w AS (
  SELECT event_id, user_id,
         list_sort(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {_ROLL_W} PRECEDING AND CURRENT ROW)) AS a
  FROM base
)
SELECT event_id, user_id,
       CASE WHEN len(a) % 2 = 1 THEN a[(len(a)+1)//2]
            ELSE (a[len(a)//2] + a[len(a)//2 + 1]) / 2.0
       END AS rolling_median
FROM w
"""


# --- TPC-H Q6: forecasting revenue change ----------------------------------
# The last of the 22 TPC-H shapes (the other 21 live in tpch*.py): a
# pure filter-aggregate whose entire value at scale is PUSHDOWN — the
# date/discount/quantity predicates must reach the parquet scan
# (row-group min/max skipping) and the single global aggregate is one
# partial+final pass with no grouping exchange. Window shifted to 1996
# (this dataset's shipdates span 1995-2001). l_discount literals parse
# to identical doubles on both engines, so the BETWEEN is cross-engine
# exact.
_Q6_PRED = (
    "l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
    "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
)


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from timedf_spark.functions.deterministic import dsum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    return li.filter(_Q6_PRED).agg(
        F.expr(dsum("l_extendedprice * l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


def _forecast_revenue_oracle() -> str:
    from timedf_spark.functions.deterministic import dsum

    return f"""
SELECT {dsum('l_extendedprice * l_discount')} AS revenue, count(*) AS n_lines
FROM lineitem WHERE {_Q6_PRED}
"""


SUITE = {
    "forecast_revenue": QuerySpec(
        "forecast_revenue",
        forecast_revenue,
        _forecast_revenue_oracle(),
        "TPC-H Q6 shape: pushdown filter + single global aggregate (completes all 22 TPC-H shapes)",
    ),
    "equidepth_prices": QuerySpec(
        "equidepth_prices",
        equidepth_prices,
        EQUIDEPTH_ORACLE,
        "exact equi-depth price histogram from mergeable per-value counts",
    ),
    "mg_token_summary": QuerySpec(
        "mg_token_summary",
        mg_token_summary,
        MG_TOKENS_ORACLE,
        "Misra-Gries k=20 heavy-hitter token summary (TakeOrdered + threshold, no global sort)",
    ),
    "mg_tokens_per_lang": QuerySpec(
        "mg_tokens_per_lang",
        mg_tokens_per_lang,
        MG_PER_LANG_ORACLE,
        "per-language Misra-Gries heavy tokens (lang-partitioned windows, no global sort)",
    ),
    "rolling_median_value": QuerySpec(
        "rolling_median_value",
        rolling_median_value,
        ROLLING_MEDIAN_ORACLE,
        "exact rolling median over a bounded per-user event window",
    ),
}
