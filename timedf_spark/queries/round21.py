"""Round-21 query: strict-ordered funnel with per-step deadlines.

``funnel_deadline`` — the sequential conversion funnel
click → view → purchase where each step must happen AFTER the previous
step's first completion and WITHIN a deadline of it. ``funnel_counts``
census unordered presence and ``conversion_latency`` times one pair;
this is the ordered-with-deadline semantics real funnel products
implement (a view before the first click does not count; a purchase a
week later does not count).

Step times are partition-constant minima, so the whole per-user
computation chains THREE window expressions over ONE user_id exchange
— no self-joins, no fact re-reads. All epoch-microsecond integers. The
DuckDB twin uses an independent formulation (grouped CTE per step with
join-back), so the window chaining itself is what the oracle checks.

Reference parity: none (intel-ai/timedf has no event-funnel surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_DEADLINE_US = 86_400 * 1_000_000  # one day per step


def funnel_deadline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("_us")
    )
    w = Window.partitionBy("user_id")
    step1 = F.min(F.when(F.col("event_type") == "click", F.col("_us"))).over(w)
    df = ev.withColumn("_t1", step1)
    step2 = F.min(
        F.when(
            (F.col("event_type") == "view")
            & (F.col("_us") > F.col("_t1"))
            & (F.col("_us") <= F.col("_t1") + _DEADLINE_US),
            F.col("_us"),
        )
    ).over(w)
    df = df.withColumn("_t2", step2)
    step3 = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("_us") > F.col("_t2"))
            & (F.col("_us") <= F.col("_t2") + _DEADLINE_US),
            F.col("_us"),
        )
    ).over(w)
    df = df.withColumn("_t3", step3)
    per_user = df.groupBy("user_id").agg(
        F.max("_t1").alias("t1"), F.max("_t2").alias("t2"), F.max("_t3").alias("t3")
    )
    counts = per_user.agg(
        F.count("t1").alias("n1"), F.count("t2").alias("n2"), F.count("t3").alias("n3")
    )
    return counts.select(
        F.expr(
            "stack(3, 'step1_click', n1, 'step2_view', n2, 'step3_purchase', n3) "
            "AS (step, n_users)"
        )
    ).orderBy("step")


_FUNNEL_ORACLE = f"""
WITH s1 AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t1
  FROM events GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'view'
    AND epoch_us(e.ts) > s1.t1 AND epoch_us(e.ts) <= s1.t1 + {_DEADLINE_US}
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(epoch_us(e.ts)) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase'
    AND epoch_us(e.ts) > s2.t2 AND epoch_us(e.ts) <= s2.t2 + {_DEADLINE_US}
  GROUP BY e.user_id
)
SELECT step, n_users FROM (
  SELECT 'step1_click' AS step, count(t1) AS n_users FROM s1
  UNION ALL SELECT 'step2_view', count(*) FROM s2
  UNION ALL SELECT 'step3_purchase', count(*) FROM s3
) ORDER BY step
"""

SUITE = {
    "funnel_deadline": QuerySpec(
        "funnel_deadline",
        funnel_deadline,
        _FUNNEL_ORACLE,
        "ordered 3-step funnel with per-step deadlines: chained partition-constant minima on ONE user exchange; join-back oracle",
    ),
}
