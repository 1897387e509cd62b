"""Window-function suite (SURVEY.md §2.E — absent from the reference,
extension-layer time-series capability): rolling frames, running totals,
lag deltas.

Determinism: sums inside window frames re-use the quantized-decimal
construction (functions/deterministic.py) — a windowed decimal sum is
exact under any evaluation order, so Spark's incremental frame evaluation
and DuckDB's segment-tree evaluation agree bit-for-bit. Date arithmetic is
NOT dialect-shared (Spark date−date is an INTERVAL, DuckDB's is days), so
these queries pair a DataFrame implementation with a separate oracle text
whose integer outputs are trivially engine-independent.

Scale notes: one shuffle per query (the window partition / the daily
pre-aggregation); rolling frames evaluate incrementally per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_EPOCH = "1970-01-01"


def _windowed_qsum(col: str, frame: str) -> str:
    """Order-independent windowed SUM(double) (shared construction with
    deterministic.dsum, OVER a frame instead of GROUP BY)."""
    return (
        f"cast(sum(cast(floor(({col}) * 10000.0 + 0.5) as bigint)) "
        f"OVER ({frame}) as double) / 10000.0"
    )


# ---- 7-day rolling revenue ------------------------------------------------


def rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff("o_orderdate", F.lit(_EPOCH).cast("date")).cast("long").alias("day_idx"),
            "o_totalprice",
        )
        .groupBy("day_idx")
        .agg(
            F.expr(
                "cast(sum(cast(floor(o_totalprice * 10000.0 + 0.5) as bigint)) as double) / 10000.0"
            ).alias("day_revenue")
        )
    )
    frame = "ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW"
    return daily.select(
        "day_idx",
        "day_revenue",
        F.expr(_windowed_qsum("day_revenue", frame)).alias("rolling_7d_revenue"),
        F.expr(f"cast(count(*) OVER ({frame}) as bigint)").alias("rolling_7d_days"),
    )


ROLLING_ORACLE = f"""
WITH daily AS (
  SELECT cast(date_diff('day', DATE '{_EPOCH}', o_orderdate) as bigint) AS day_idx,
         cast(sum(cast(floor(o_totalprice * 10000.0 + 0.5) as bigint)) as double) / 10000.0 AS day_revenue
  FROM orders GROUP BY 1
)
SELECT day_idx, day_revenue,
       {_windowed_qsum("day_revenue", "ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW")} AS rolling_7d_revenue,
       cast(count(*) OVER (ORDER BY day_idx RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) as bigint) AS rolling_7d_days
FROM daily
"""

# ---- running lifetime value per customer ----------------------------------

_CUM_FRAME = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING"

CUMULATIVE_SQL = f"""
SELECT o_custkey, o_orderkey,
       cast(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) as bigint) AS order_seq,
       {_windowed_qsum("o_totalprice", _CUM_FRAME)} AS lifetime_value
FROM orders
"""


def cumulative_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fully dialect-shared text (no date arithmetic involved)
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(CUMULATIVE_SQL)


# ---- lag: days between consecutive orders ---------------------------------


def order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.datediff("o_orderdate", F.lag("o_orderdate").over(w)).cast("long").alias("days_since_prev"),
    )


LAG_ORACLE = """
WITH seq AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         lag(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_date
  FROM orders
)
SELECT o_custkey, o_orderkey,
       cast(date_diff('day', prev_date, o_orderdate) as bigint) AS days_since_prev
FROM seq
"""


# ---- time-series resample with gap filling --------------------------------
#
# Downsample the events stream to an hourly grid per event_type, emitting
# ZERO rows for silent hours — the op every monitoring/feature pipeline
# needs and plain GROUP BY cannot produce (it has no row to group). The
# dense grid comes from sequence()+explode on each series' [min,max] span:
# grid generation is a per-series projection (no shuffle, |series| ×
# span/step rows), and the fill is a left join back to the hourly
# aggregate on (series, bucket) — hash-partitioned, linear. value_sum uses
# the deterministic quantized sum; fill literals are 0 / 0e0 doubles,
# identical in both engines.

from timedf_spark.functions.deterministic import dsum as _dsum

_VAL_SUM = _dsum("value")


def resample_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
    )
    agg = ev.groupBy("event_type", "h").agg(
        F.count(F.lit(1)).alias("n_events"), F.expr(_VAL_SUM).alias("value_sum")
    )
    spans = agg.groupBy("event_type").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    )
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    return grid.join(agg, ["event_type", "h"], "left").select(
        "event_type",
        F.col("h").alias("hour_ts"),
        F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
        F.coalesce("value_sum", F.lit(0.0)).alias("value_sum"),
    )


RESAMPLE_ORACLE = f"""
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h,
         count(*) AS n_events, {_VAL_SUM} AS value_sum
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
spans AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM agg GROUP BY event_type),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM spans
)
SELECT g.event_type, g.h AS hour_ts,
       cast(coalesce(a.n_events, 0) as bigint) AS n_events,
       coalesce(a.value_sum, 0e0) AS value_sum
FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.h = g.h
"""

# ---- funnel analysis ------------------------------------------------------
#
# How far does each user get through view → click → purchase (in time
# order)? Classic product-analytics shape: per-user FIRST occurrence of
# each stage via conditional min aggregation — one shuffle on user_id, no
# self-joins (the naive formulation joins events to events per stage and
# explodes at scale). A user counts for stage k iff first(view) <
# first(click) < ... through stage k. Deterministic: timestamps compare
# exactly; ties across stages break toward the earlier stage (strict <).

_FUNNEL = ("view", "click", "purchase")


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
            for s in _FUNNEL
        ]
    )
    # stage reached = longest strictly-ordered prefix of first-occurrences
    conds = []
    prev = []
    for s in _FUNNEL:
        chain = " AND ".join(
            f"t_{a} < t_{b}" for a, b in zip([*prev, s][:-1], [*prev, s][1:])
        )
        notnull = " AND ".join(f"t_{x} IS NOT NULL" for x in [*prev, s])
        cond = f"({notnull})" + (f" AND ({chain})" if chain else "")
        conds.append(cond)
        prev.append(s)
    sel = [
        F.expr(f"count_if({c})").cast("long").alias(f"n_{s}")
        for s, c in zip(_FUNNEL, conds)
    ]
    return firsts.agg(*sel)


FUNNEL_ORACLE = """
WITH firsts AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT
  cast(count(*) FILTER ((t_view IS NOT NULL)) as bigint) AS n_view,
  cast(count(*) FILTER ((t_view IS NOT NULL AND t_click IS NOT NULL)
       AND (t_view < t_click)) as bigint) AS n_click,
  cast(count(*) FILTER ((t_view IS NOT NULL AND t_click IS NOT NULL AND t_purchase IS NOT NULL)
       AND (t_view < t_click AND t_click < t_purchase)) as bigint) AS n_purchase
FROM firsts
"""

# ---- JSON extraction (H11: semi-structured props column) ------------------
#
# Every row carries a JSON props string; extract the numeric field k and
# aggregate per event type. Extraction is get_json_object — JVM-side,
# inside whole-stage codegen, one scan (never a Python json.loads UDF).
# k is integral, so sums are exact cross-engine without quantization.


def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("long"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_with_k"),
            F.sum("k").alias("k_sum"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
        )
    )


JSON_PROPS_ORACLE = """
SELECT event_type,
       count(k) AS n_with_k, cast(sum(k) as bigint) AS k_sum, min(k) AS k_min, max(k) AS k_max
FROM (
  SELECT event_type, cast(json_extract(props, '$.k') as bigint) AS k FROM events
)
GROUP BY event_type
"""

# ---- rank-family windows: ntile / percent_rank -----------------------------
#
# Customer balance quartiles WITHIN nation: the window partitions on
# c_nationkey, so every partition's sort is local to its nation — the
# distributed-safe shape for rank windows (a global ntile would serialize
# the corpus through one task; partitioned ntile scales with the key
# cardinality). The order key includes the unique c_custkey so ranks are
# total-order deterministic across engines.

def balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    ranked = cust.withColumns(
        {
            "bal_quartile": F.ntile(4).over(w).cast("long"),
            "bal_pct_rank": F.percent_rank().over(w),
        }
    )
    return (
        ranked.groupBy("c_nationkey", "bal_quartile")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.expr(_dsum("c_acctbal")).alias("quartile_balance"),
            F.max("bal_pct_rank").alias("max_pct_rank"),
        )
        .orderBy("c_nationkey", "bal_quartile")
    )


QUARTILES_ORACLE = f"""
WITH ranked AS (
  SELECT c_nationkey, c_acctbal,
         cast(ntile(4) OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) as bigint) AS bal_quartile,
         percent_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey) AS bal_pct_rank
  FROM customer
)
SELECT c_nationkey, bal_quartile, count(*) AS n_cust,
       {_dsum('c_acctbal')} AS quartile_balance,
       max(bal_pct_rank) AS max_pct_rank
FROM ranked
GROUP BY c_nationkey, bal_quartile
ORDER BY c_nationkey, bal_quartile
"""

# ---- fixed-width histogram -------------------------------------------------
#
# Order-price histogram with 5000-wide bins: pure projection + groupBy —
# the scale-safe alternative to rank-based bucketing (no sort anywhere;
# the bin id is arithmetic, the count is a partial+final aggregate).

_BIN = "50e2"


def order_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice")
    return (
        orders.groupBy(
            F.expr(f"cast(floor(o_totalprice / {_BIN}) as bigint)").alias("price_bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.expr(_dsum("o_totalprice")).alias("bin_total"),
        )
        .orderBy("price_bin")
    )


HISTOGRAM_ORACLE = f"""
SELECT cast(floor(o_totalprice / {_BIN}) as bigint) AS price_bin,
       count(*) AS n_orders, {_dsum('o_totalprice')} AS bin_total
FROM orders
GROUP BY price_bin
ORDER BY price_bin
"""

SUITE = {
    "rolling_revenue": QuerySpec(
        "rolling_revenue", rolling_revenue, ROLLING_ORACLE, "7-day rolling revenue via RANGE frame (E)"
    ),
    "cumulative_value": QuerySpec(
        "cumulative_value", cumulative_value, CUMULATIVE_SQL, "running total per customer (E)"
    ),
    "order_gaps": QuerySpec(
        "order_gaps", order_gaps, LAG_ORACLE, "lag-based day gaps between orders (E)"
    ),
    "resample_hourly": QuerySpec(
        "resample_hourly", resample_hourly, RESAMPLE_ORACLE,
        "hourly downsample with zero-filled gaps (dense grid via sequence+explode)",
    ),
    "funnel_counts": QuerySpec(
        "funnel_counts", funnel_counts, FUNNEL_ORACLE,
        "view→click→purchase funnel via conditional first-occurrence aggregation",
    ),
    "json_props_stats": QuerySpec(
        "json_props_stats", json_props_stats, JSON_PROPS_ORACLE,
        "JSON field extraction from the props column + per-type aggregation",
    ),
    "balance_quartiles": QuerySpec(
        "balance_quartiles", balance_quartiles, QUARTILES_ORACLE,
        "ntile(4) + percent_rank per nation (partitioned rank windows)",
    ),
    "order_price_histogram": QuerySpec(
        "order_price_histogram", order_price_histogram, HISTOGRAM_ORACLE,
        "fixed-width price histogram (arithmetic binning, no sort)",
    ),
}
