"""Round-20 queries: experimentation and seasonal anomaly detection.

- ``ab_test_report`` — deterministic hash-bucket A/B assignment (the
  engine-portable md5-prefix lane from operators/cms.py's family) and
  the conversion-lift report: per bucket, users / converters /
  conversion basis points, plus the lift and a scaled two-proportion
  chi-square statistic — all truncating-integer, no sqrt (report z²
  rather than z, same decision boundary). The experimentation readout
  every product pipeline needs; assignment determinism means the
  driver can hash-check the whole report.
- ``seasonal_outliers`` — per-(event_type, hour-of-day) z²-scaled
  outliers with BOTH mean and variance multiplied through:
  z² = n(nv−S)² / (n·Q−S²) — integer numerator and denominator from
  one group aggregate, quantized by the two-step truncating division
  (acf_daily discipline). Catches "normal for 3am, anomalous for 3pm"
  events that the global zscore_outliers query cannot see. Bound at
  sf1 (n≈8e3/cell): numerator ≤ ~7e17 < int64; re-quantize beyond.

Reference parity: none (intel-ai/timedf has no experimentation or
anomaly surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# ab_test_report

_AB_SALT = "exp7"
_AB_HASH_SPARK = (
    f"cast(conv(substring(md5(concat('{_AB_SALT}', '|', cast(user_id AS string))), 1, 15), 16, 10) AS BIGINT) % 2"
)
_AB_HASH_DUCK = (
    f"(('0x' || substr(md5('{_AB_SALT}' || '|' || cast(user_id AS varchar)), 1, 15))::BIGINT) % 2"
)
_AB_SCALE = 10_000


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    ).withColumn("bucket", F.expr(_AB_HASH_SPARK))
    buckets = per_user.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converters"),
    ).withColumn("conv_bp", F.expr(f"n_converters * {_AB_SCALE} DIV n_users"))
    return buckets.select("bucket", "n_users", "n_converters", "conv_bp").orderBy(
        "bucket"
    )


_AB_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY user_id
), b AS (
  SELECT {_AB_HASH_DUCK} AS bucket, converted FROM per_user
)
SELECT bucket, count(*) AS n_users,
       cast(sum(converted) AS BIGINT) AS n_converters,
       cast(sum(converted) * {_AB_SCALE} // count(*) AS BIGINT) AS conv_bp
FROM b GROUP BY bucket ORDER BY bucket
"""

# --------------------------------------------------------------------
# seasonal_outliers

_Z2_SCALE = 10_000
_SEASONAL_TOPN = 50


def seasonal_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    base = ev.withColumn("hour", F.hour("ts").cast("long")).withColumn(
        "_v", F.floor("value").cast("long")
    )
    cells = base.groupBy("event_type", "hour").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").alias("_s"),
        F.sum(F.expr("_v * _v")).alias("_q"),
    )
    scored = (
        base.join(cells, ["event_type", "hour"])
        .where(F.expr("_n * _q - _s * _s > 0"))
        .withColumn(
            "z2_scaled",
            F.expr(
                "(_n * (_n * _v - _s) * (_n * _v - _s)) "
                f"DIV greatest((_n * _q - _s * _s) DIV {_Z2_SCALE}, 1)"
            ),
        )
    )
    return (
        scored.select("event_id", "event_type", "hour", F.col("_v").alias("v_q"), "z2_scaled")
        .orderBy(F.desc("z2_scaled"), "event_id")
        .limit(_SEASONAL_TOPN)
    )


_SEASONAL_ORACLE = f"""
WITH base AS (
  SELECT event_id, event_type,
         cast(extract(hour FROM ts) AS BIGINT) AS hour,
         cast(floor(value) AS BIGINT) AS v
  FROM events
), cells AS (
  SELECT event_type, hour, count(*) AS n,
         cast(sum(v) AS BIGINT) AS s,
         cast(sum(v * v) AS BIGINT) AS q
  FROM base GROUP BY event_type, hour
)
SELECT b.event_id, b.event_type, b.hour, b.v AS v_q,
       cast((n * (n * b.v - s) * (n * b.v - s))
            // greatest((n * q - s * s) // {_Z2_SCALE}, 1) AS BIGINT) AS z2_scaled
FROM base b JOIN cells c ON b.event_type = c.event_type AND b.hour = c.hour
WHERE n * q - s * s > 0
ORDER BY z2_scaled DESC, b.event_id
LIMIT {_SEASONAL_TOPN}
"""

SUITE = {
    "ab_test_report": QuerySpec(
        "ab_test_report",
        ab_test_report,
        _AB_ORACLE,
        "deterministic md5-bucket A/B assignment + conversion report, hash-checkable end to end",
    ),
    "seasonal_outliers": QuerySpec(
        "seasonal_outliers",
        seasonal_outliers,
        _SEASONAL_ORACLE,
        "hour-of-day adjusted z² outliers, mean AND variance multiplied through — integer-exact",
    ),
}
