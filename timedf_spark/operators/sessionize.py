"""Gap-based sessionization over the ``events`` stream table (batch form).

The reference has no windowed/stateful operators (SURVEY.md §2.E/§2.I —
explicitly absent); this is the extension layer's canonical window-function
workload: lag → gap flag → running sum (session id) → per-session rollup.

The SQL text is dialect-shared: the same string runs as Spark SQL (temp
views) and as the DuckDB oracle — lag/sum OVER, interval literals and
CASE parse identically, so values match by construction (counts are ints;
value_sum uses the deterministic quantized sum).

Scale notes: both windows partition by user_id — ONE shuffle total (Spark
evaluates consecutive windows over the same partitioning in one exchange),
then the rollup groupBy(user_id, session_id) is partition-local under AQE.
The streaming twin of this operator (session_window + watermark) lives in
timedf_spark/streaming/sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.functions.deterministic import dsum
from timedf_spark.sources import load_table

__all__ = ["sessionize", "SESSIONIZE_SQL", "GAP_MINUTES"]

GAP_MINUTES = 30

SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL THEN 1
              WHEN ts - lag(ts) OVER w > INTERVAL {GAP_MINUTES} MINUTE THEN 1
              ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, cast(session_id as bigint) AS session_id,
       count(*) AS n_events,
       min(ts) AS t_start, max(ts) AS t_end,
       {dsum("value")} AS value_sum
FROM sessions
GROUP BY user_id, session_id
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(SESSIONIZE_SQL)
