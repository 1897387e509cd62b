"""Round-16 queries: conversion latency distribution.

``conversion_latency`` — per user, the exact time from first ``click``
to first subsequent ``purchase``; reported as a per-cohort (users
bucketed by activity volume) distribution: converter count, exact
median / p90 latency seconds via the cumulative-count crossing (the
same exact-quantile move as weighted_median_price, here at converter
grain — an aggregate-sized frame, not fact-sized), and min/max. The
funnel-timing diagnostic that funnel_counts (how many) and
first_touch_attribution (who gets credit) don't answer: HOW LONG.

All integer: epoch-microsecond gaps divided down to seconds with
truncating division; no float timestamps anywhere.

Reference parity: none (intel-ai/timedf has no event-funnel surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# activity-volume cohorts: bucket by floor(log2-ish) of event count via
# integer thresholds (shared constants, no transcendentals)
_COHORTS = [(0, "lt32"), (32, "32to63"), (64, "64to127"), (128, "ge128")]


def _cohort_expr() -> str:
    return (
        "CASE WHEN n_events >= 128 THEN 'ge128' "
        "WHEN n_events >= 64 THEN '64to127' "
        "WHEN n_events >= 32 THEN '32to63' "
        "ELSE 'lt32' END"
    )


def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", F.unix_micros("ts"))).alias(
            "_c"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.unix_micros("ts"))).alias(
            "_p"
        ),
        F.count(F.lit(1)).alias("n_events"),
    )
    conv = (
        per.where(F.col("_c").isNotNull() & (F.col("_p") > F.col("_c")))
        .withColumn("lat_s", F.expr("(_p - _c) DIV 1000000"))
        .withColumn("cohort", F.expr(_cohort_expr()))
    )
    w = Window.partitionBy("cohort").orderBy("lat_s").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("cohort")
    ranked = conv.withColumn("_cum", F.count(F.lit(1)).over(w)).withColumn(
        "_tot", F.count(F.lit(1)).over(wall)
    )
    return (
        ranked.groupBy("cohort")
        .agg(
            F.max("_tot").alias("n_converters"),
            F.min(F.when(F.expr("2 * _cum >= _tot"), F.col("lat_s"))).alias(
                "median_lat_s"
            ),
            F.min(F.when(F.expr("10 * _cum >= 9 * _tot"), F.col("lat_s"))).alias(
                "p90_lat_s"
            ),
            F.min("lat_s").alias("min_lat_s"),
            F.max("lat_s").alias("max_lat_s"),
        )
        .orderBy("cohort")
    )


_CONVERSION_ORACLE = f"""
WITH per AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS c,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS p,
         count(*) AS n_events
  FROM events GROUP BY user_id
), conv AS (
  SELECT (p - c) // 1000000 AS lat_s,
         {_cohort_expr()} AS cohort
  FROM per WHERE c IS NOT NULL AND p > c
), ranked AS (
  SELECT cohort, lat_s,
         count(*) OVER (PARTITION BY cohort ORDER BY lat_s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         count(*) OVER (PARTITION BY cohort) AS tot
  FROM conv
)
SELECT cohort, max(tot) AS n_converters,
       min(CASE WHEN 2 * cum >= tot THEN lat_s END) AS median_lat_s,
       min(CASE WHEN 10 * cum >= 9 * tot THEN lat_s END) AS p90_lat_s,
       min(lat_s) AS min_lat_s, max(lat_s) AS max_lat_s
FROM ranked GROUP BY cohort ORDER BY cohort
"""

SUITE = {
    "conversion_latency": QuerySpec(
        "conversion_latency",
        conversion_latency,
        _CONVERSION_ORACLE,
        "first-click to first-purchase latency: exact median/p90 via cumulative-count crossing at converter grain",
    ),
}
