"""Round-18 queries: distribution drift and engagement stickiness.

- ``price_drift_tvd`` — total-variation distance between the early and
  late halves of the order stream, per fixed price bucket. TVD =
  ½·Σ|p_b − q_b| is THE exact-integer drift statistic (PSI and KL need
  logs; TVD is monotone-equivalent for alerting): shares are scaled
  basis points via truncating division, buckets are fixed-width
  integer constants, the time split is the median order date from a
  1-row broadcast. The train/serve skew detector an ML-ops pipeline
  runs per feature.
- ``stickiness_dau_wau`` — exact DAU/WAU per day (the classic
  engagement stickiness ratio) WITHOUT sketches: the (day, user)
  distinct frame is aggregate-grain (days × users, tiny next to
  events), so the trailing-7-day distinct count is an exact day-grain
  self-join over a window of 7 day-keys — no fact rescan, no HLL
  tolerance (the rolling_distinct sketch store remains the unbounded-
  window scale path).

Reference parity: none (intel-ai/timedf has no drift or product-
analytics surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# price_drift_tvd

_PRICE_BUCKET = 50_000_00  # cents: fixed-width buckets over ~[10^5, 5*10^7]
_TVD_SCALE = 10_000
_SPLIT_DATE = "1996-01-01"


def price_drift_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    # fixed calendar split (shared literal): quantile-based splits have
    # lower/upper-median ambiguity across engines; a drift monitor's
    # window boundary is config anyway
    base = (
        orders
        .withColumn("_late", F.expr(f"CAST(o_orderdate >= timestamp'{_SPLIT_DATE}' AS INT)"))
        .withColumn(
            "bucket",
            F.expr(f"cast(floor(o_totalprice * 100) AS BIGINT) DIV {_PRICE_BUCKET}"),
        )
    )
    counts = base.groupBy("bucket").agg(
        F.sum(F.expr("1 - _late")).alias("n_early"),
        F.sum("_late").alias("n_late"),
    )
    tot = counts.agg(
        F.sum("n_early").alias("_te"), F.sum("n_late").alias("_tl")
    )
    return (
        counts.join(F.broadcast(tot))
        .select(
            "bucket",
            "n_early",
            "n_late",
            F.expr(f"n_early * {_TVD_SCALE} DIV _te").alias("early_bp"),
            F.expr(f"n_late * {_TVD_SCALE} DIV _tl").alias("late_bp"),
            F.expr(
                f"abs(n_early * {_TVD_SCALE} DIV _te - n_late * {_TVD_SCALE} DIV _tl)"
            ).alias("abs_diff_bp"),
        )
        .orderBy("bucket")
    )


_TVD_ORACLE = f"""
WITH base AS (
  SELECT CASE WHEN o_orderdate >= TIMESTAMP '{_SPLIT_DATE}' THEN 1 ELSE 0 END AS late,
         cast(floor(o_totalprice * 100) AS BIGINT) // {_PRICE_BUCKET} AS bucket
  FROM orders
), counts AS (
  SELECT bucket,
         cast(sum(1 - late) AS BIGINT) AS n_early,
         cast(sum(late) AS BIGINT) AS n_late
  FROM base GROUP BY bucket
), tot AS (
  SELECT cast(sum(n_early) AS BIGINT) AS te, cast(sum(n_late) AS BIGINT) AS tl
  FROM counts
)
SELECT bucket, n_early, n_late,
       cast(n_early * {_TVD_SCALE} // te AS BIGINT) AS early_bp,
       cast(n_late * {_TVD_SCALE} // tl AS BIGINT) AS late_bp,
       cast(abs(n_early * {_TVD_SCALE} // te - n_late * {_TVD_SCALE} // tl) AS BIGINT)
         AS abs_diff_bp
FROM counts CROSS JOIN tot
ORDER BY bucket
"""

# --------------------------------------------------------------------
# stickiness_dau_wau

_WAU_DAYS = 7


def stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    du = ev.select(
        F.date_trunc("day", "ts").alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    # trailing-7-day distinct users: each (day, user) row is EXPLODED to
    # the 7 window days it serves — an equi-grain groupBy, not a theta
    # join (which would nest-loop day keys against the frame and explode
    # at scale). Days past the observed range drop via the dau join.
    contrib = du.select(
        F.explode(F.expr(f"sequence(0, {_WAU_DAYS - 1})")).alias("_k"),
        "day",
        "user_id",
    ).select(
        F.expr("day + make_interval(0, 0, 0, _k)").alias("day"), "user_id"
    )
    wau = contrib.groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.expr("dau * 10000 DIV wau").alias("stickiness_bp"),
        )
        .orderBy("day")
    )


_STICKINESS_ORACLE = f"""
WITH du AS (
  SELECT DISTINCT date_trunc('day', ts) AS day, user_id FROM events
), dau AS (
  SELECT day, count(*) AS dau FROM du GROUP BY day
), contrib AS (
  SELECT du.day + k * INTERVAL 1 DAY AS day, du.user_id
  FROM du, LATERAL (SELECT unnest(generate_series(0, {_WAU_DAYS - 1})) AS k)
), wau AS (
  SELECT day, count(DISTINCT user_id) AS wau FROM contrib GROUP BY day
)
SELECT dau.day, dau.dau, wau.wau,
       cast(dau.dau * 10000 // wau.wau AS BIGINT) AS stickiness_bp
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY dau.day
"""

SUITE = {
    "price_drift_tvd": QuerySpec(
        "price_drift_tvd",
        price_drift_tvd,
        _TVD_ORACLE,
        "early-vs-late distribution drift per fixed price bucket: exact scaled shares, no logs",
    ),
    "stickiness_dau_wau": QuerySpec(
        "stickiness_dau_wau",
        stickiness_dau_wau,
        _STICKINESS_ORACLE,
        "exact DAU/WAU from the aggregate-grain (day,user) frame: trailing window as a day-key theta join",
    ),
}
