"""Round-28 query: gaps-and-islands activity streaks.

- ``activity_streaks`` — the classic gaps-and-islands pattern over user
  activity: distinct (user, day) rows get an island id via
  ``day − row_number()`` (consecutive days share it), the longest
  island per user is their best streak, and the report is the streak
  histogram with the user count and longest streak per length. Scale
  posture: everything rides (user)-partitioned windows after a distinct
  to (user, day) grain — no self-join, no global window; the histogram
  grain is ≤ span-days rows. All-integer arithmetic end to end.

Reference parity: no streak surface in intel-ai/timedf (SURVEY.md §2
extension row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_DAY_US = 86_400_000_000


def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"unix_micros(ts) DIV {_DAY_US}").alias("day")
    )
    days = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len")
    )
    best = streaks.groupBy("user_id").agg(F.max("len").alias("best_streak"))
    return (
        best.groupBy("best_streak")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("best_streak")
    )


STREAKS_ORACLE = f"""
WITH days AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events
), islands AS (
  SELECT user_id,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
  FROM days
), streaks AS (
  SELECT user_id, island, count(*) AS len
  FROM islands GROUP BY user_id, island
), best AS (
  SELECT user_id, max(len) AS best_streak FROM streaks GROUP BY user_id
)
SELECT CAST(best_streak AS BIGINT) AS best_streak, count(*) AS n_users
FROM best
GROUP BY best_streak
ORDER BY best_streak
"""


SUITE = {
    "activity_streaks": QuerySpec(
        "activity_streaks",
        activity_streaks,
        STREAKS_ORACLE,
        "gaps-and-islands longest-daily-streak histogram; (user)-partitioned windows only, all-integer",
    ),
}
