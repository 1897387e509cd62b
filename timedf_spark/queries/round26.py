"""Round-26 queries: survival analysis (Nelson-Aalen cumulative
hazard), experimentation variance reduction (CUPED), Fellegi-Sunter
scored entity matching, and Neyman-optimal stratified sample
allocation.

Scale posture (the 100 TB lens, per query):

- ``nelson_aalen_conversion`` — the Nelson-Aalen cumulative-hazard
  estimator over time-to-first-purchase (right-censored at each user's
  last event). The risk table aggregates users to DAY grain first
  (≤ span days rows), so the risk-set window — the only global-order
  window — runs over a few dozen rows no matter how many users exist;
  per-step hazards are quantized to basis points with truncating DIV
  and the cumulative hazard is the exact running sum of those integers
  (Nelson-Aalen is a SUM estimator, unlike Kaplan-Meier's product —
  which is why it is the one that stays hash-exact without exp/ln).

- ``cuped_adjusted_ab`` — CUPED (controlled-experiment using pre-period
  data): θ = cov(pre, post)/var(pre) from exact int64 cents co-moments,
  then per-variant adjusted means ŷ_v − θ·(x̄_v − x̄). All float
  arithmetic is +, ×, ÷ on doubles with the op order mirrored verbatim
  in the oracle (correctly-rounded under IEEE 754 → bit-equal hashes).
  One pass for moments, one user-grain aggregation — the deterministic
  md5-bucket assignment is the same salt/hash as ``ab_test_report``.

- ``fs_match_scores`` — Fellegi-Sunter-style scored matching on top of
  sorted-neighborhood blocking (parts sorted by retail price within
  size blocks, each row scored against its next-w neighbors via
  lead()): per-field agreement weights are integers (agree +w,
  disagree −w), so scores are exact and the match/possible/non-match
  bands are reproducible. O(w) comparisons per row, no self-join —
  the candidate stream unfolds from ONE partitioned window.

- ``neyman_allocation`` — Neyman-optimal allocation n_h ∝ N_h·σ_h for
  a stratified sample of lineitem by return flag: σ_h from exact
  integer moments via the mirrored-double pattern, then each stratum's
  weight is QUANTIZED to an integer before the cross-stratum
  normalization — a float sum across rows is accumulation-order-
  dependent (segment-tree vs sequential) and would break cross-engine
  hash equality; an integer sum is exact in any order.

Reference parity: none of these exist in intel-ai/timedf (no survival,
CUPED, scored-ER, or sampling-design surface; SURVEY.md §2 extension
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_DAY_US = 86_400_000_000
_HAZ_SCALE = 10_000

# --------------------------------------------------------------------
# nelson_aalen_conversion


def nelson_aalen_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.expr("unix_micros(ts)")).alias("t0"),
        F.max(F.expr("unix_micros(ts)")).alias("t_last"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.expr("unix_micros(ts)"))
        ).alias("t_conv"),
    )
    # day-grain duration; event=1 when the user converted, else censored
    # at their last observed event
    durations = per_user.select(
        F.expr(
            f"CAST((coalesce(t_conv, t_last) - t0) DIV {_DAY_US} AS BIGINT)"
        ).alias("day"),
        F.expr("CAST(t_conv IS NOT NULL AS INT)").alias("event"),
    )
    grid = durations.groupBy("day").agg(
        F.count(F.lit(1)).alias("leaving"),  # events + censorings at this day
        F.sum("event").alias("d_events"),
    )
    # risk set at day t = users whose duration >= t: total minus all who
    # left strictly before t (suffix sum via ordered prefix over <= day
    # grid rows — a few dozen rows)
    w_prev = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    totals = grid.agg(F.sum("leaving").alias("n_total"))
    risk = (
        grid.crossJoin(F.broadcast(totals))
        .select(
            "day",
            "d_events",
            (
                F.col("n_total")
                - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
            ).alias("n_risk"),
        )
        .where(F.col("d_events") > 0)
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return risk.select(
        "day",
        "n_risk",
        "d_events",
        F.expr(f"d_events * {_HAZ_SCALE} DIV n_risk").alias("hazard_bp"),
    ).withColumn(
        "cum_hazard_bp", F.sum("hazard_bp").over(w_cum)
    ).orderBy("day")


NELSON_AALEN_ORACLE = f"""
WITH per_user AS (
  SELECT user_id,
         min(epoch_us(ts)) AS t0,
         max(epoch_us(ts)) AS t_last,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_conv
  FROM events GROUP BY user_id
), durations AS (
  SELECT CAST((coalesce(t_conv, t_last) - t0) // {_DAY_US} AS BIGINT) AS day,
         CASE WHEN t_conv IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user
), grid AS (
  SELECT day, count(*) AS leaving, sum(event) AS d_events
  FROM durations GROUP BY day
), totals AS (SELECT sum(leaving) AS n_total FROM grid),
risk AS (
  SELECT day, d_events,
         n_total - coalesce(sum(leaving) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS n_risk
  FROM grid CROSS JOIN totals
), steps AS (
  SELECT day, CAST(n_risk AS BIGINT) AS n_risk,
         CAST(d_events AS BIGINT) AS d_events,
         CAST(d_events * {_HAZ_SCALE} // n_risk AS BIGINT) AS hazard_bp
  FROM risk WHERE d_events > 0
)
SELECT day, n_risk, d_events, hazard_bp,
       CAST(sum(hazard_bp) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_hazard_bp
FROM steps
ORDER BY day
"""

# --------------------------------------------------------------------
# cuped_adjusted_ab

_CUPED_SALT = "cuped_v1"
_CUPED_HASH_SPARK = (
    f"cast(conv(substring(md5(concat('{_CUPED_SALT}', '|', cast(user_id AS string))), 1, 15), 16, 10) AS BIGINT) % 2"
)
_CUPED_HASH_DUCK = (
    f"(('0x' || substr(md5('{_CUPED_SALT}' || '|' || cast(user_id AS varchar)), 1, 15))::BIGINT) % 2"
)
# pre-period = first 15 days of the event span, post-period = the rest
_CUPED_SPLIT_DAY = 15

# θ and the adjusted means share one mirrored-double expression family:
# every operand is cast to DOUBLE before arithmetic; only +, −, ×, ÷.
_THETA_EXPR = (
    "(CAST(n AS DOUBLE) * CAST(s_xy AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_y AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(s_xx AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE))"
)


def cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    span = ev.agg(F.min(F.expr("unix_micros(ts)")).alias("span_t0"))
    per_user = (
        ev.crossJoin(F.broadcast(span))
        .select(
            "user_id",
            F.expr(
                f"CAST((unix_micros(ts) - span_t0) DIV {_DAY_US} AS BIGINT)"
            ).alias("day"),
            F.expr("CAST(floor(value * 100) AS BIGINT)").alias("cents"),
        )
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("day") < _CUPED_SPLIT_DAY, F.col("cents")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("day") >= _CUPED_SPLIT_DAY, F.col("cents")).otherwise(0)
            ).alias("y"),
        )
        .withColumn("bucket", F.expr(_CUPED_HASH_SPARK))
    )
    pooled = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s_x"),
        F.sum("y").alias("s_y"),
        F.sum(F.col("x") * F.col("y")).alias("s_xy"),
        F.sum(F.col("x") * F.col("x")).alias("s_xx"),
    )
    variants = per_user.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("v_x"),
        F.sum("y").alias("v_y"),
    )
    return (
        variants.crossJoin(F.broadcast(pooled))
        .selectExpr(
            "bucket",
            "n_users",
            f"{_THETA_EXPR} AS theta",
            "CAST(v_y AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post",
            "CAST(v_x AS DOUBLE) / CAST(n_users AS DOUBLE)"
            " - CAST(s_x AS DOUBLE) / CAST(n AS DOUBLE) AS pre_delta",
        )
        .selectExpr(
            "bucket",
            "n_users",
            "theta",
            "mean_post",
            "mean_post - theta * pre_delta AS adj_mean_post",
        )
        .orderBy("bucket")
    )


CUPED_ORACLE = f"""
WITH span AS (SELECT min(epoch_us(ts)) AS span_t0 FROM events),
per_user AS (
  SELECT user_id,
         sum(CASE WHEN (epoch_us(ts) - span_t0) // {_DAY_US} < {_CUPED_SPLIT_DAY}
                  THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS x,
         sum(CASE WHEN (epoch_us(ts) - span_t0) // {_DAY_US} >= {_CUPED_SPLIT_DAY}
                  THEN CAST(floor(value * 100) AS BIGINT) ELSE 0 END) AS y
  FROM events CROSS JOIN span GROUP BY user_id
), b AS (
  SELECT {_CUPED_HASH_DUCK} AS bucket, x, y FROM per_user
), pooled AS (
  SELECT count(*) AS n, sum(x) AS s_x, sum(y) AS s_y,
         sum(x * y) AS s_xy, sum(x * x) AS s_xx
  FROM b
), variants AS (
  SELECT bucket, count(*) AS n_users, sum(x) AS v_x, sum(y) AS v_y
  FROM b GROUP BY bucket
), j AS (
  SELECT bucket, CAST(n_users AS BIGINT) AS n_users,
         {_THETA_EXPR} AS theta,
         CAST(v_y AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post,
         CAST(v_x AS DOUBLE) / CAST(n_users AS DOUBLE)
           - CAST(s_x AS DOUBLE) / CAST(n AS DOUBLE) AS pre_delta
  FROM variants CROSS JOIN pooled
)
SELECT bucket, n_users, theta, mean_post,
       mean_post - theta * pre_delta AS adj_mean_post
FROM j ORDER BY bucket
"""

# --------------------------------------------------------------------
# fs_match_scores

_FS_WINDOW = 3
_W_BRAND = 4
_W_TYPE = 3
_W_PRICE = 2  # retail price within $5
# ≥ _FS_MATCH is a match (brand AND type agree at minimum); anything
# positive is a possible-match for clerical review — the classic
# Fellegi-Sunter three-band decision rule with the reject band dropped
_FS_MATCH = 5
_FS_THRESHOLD = 1


def fs_match_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type", "p_size", "p_retailprice"
    )
    w = Window.partitionBy("p_size").orderBy("p_retailprice", "p_partkey")
    # ALL leads ride one window (one sort); the candidate stream then
    # unfolds via stack — never a per-offset re-sort or a self-join
    lead_cols = []
    for k in range(1, _FS_WINDOW + 1):
        lead_cols += [
            F.lead("p_partkey", k).over(w).alias(f"k{k}_key"),
            F.lead("p_brand", k).over(w).alias(f"k{k}_brand"),
            F.lead("p_type", k).over(w).alias(f"k{k}_type"),
            F.lead("p_retailprice", k).over(w).alias(f"k{k}_price"),
        ]
    led = part.select("p_partkey", "p_brand", "p_type", "p_size",
                      "p_retailprice", *lead_cols)
    stack_args = ", ".join(
        f"k{k}_key, k{k}_brand, k{k}_type, k{k}_price"
        for k in range(1, _FS_WINDOW + 1)
    )
    pairs = led.selectExpr(
        "p_partkey", "p_brand", "p_type", "p_size", "p_retailprice",
        f"stack({_FS_WINDOW}, {stack_args})"
        " AS (b_key, b_brand, b_type, b_price)",
    ).where(F.col("b_key").isNotNull())
    scored = pairs.select(
        F.col("p_partkey").alias("a_key"),
        F.col("b_key"),
        "p_size",
        (
            F.when(F.col("p_brand") == F.col("b_brand"), _W_BRAND).otherwise(
                -_W_BRAND
            )
            + F.when(F.col("p_type") == F.col("b_type"), _W_TYPE).otherwise(-_W_TYPE)
            + F.when(
                F.abs(F.col("p_retailprice") - F.col("b_price")) <= 5.0, _W_PRICE
            ).otherwise(-_W_PRICE)
        ).alias("score"),
    )
    return (
        scored.where(F.col("score") >= _FS_THRESHOLD)
        .withColumn(
            "band",
            F.when(F.col("score") >= _FS_MATCH, "match").otherwise("possible"),
        )
        .orderBy(F.desc("score"), "a_key", "b_key")
        .limit(200)
    )


_FS_LEADS = ",\n         ".join(
    f"lead(p_partkey, {k}) OVER w AS k{k}_key,"
    f" lead(p_brand, {k}) OVER w AS k{k}_brand,"
    f" lead(p_type, {k}) OVER w AS k{k}_type,"
    f" lead(p_retailprice, {k}) OVER w AS k{k}_price"
    for k in range(1, _FS_WINDOW + 1)
)
_FS_BRANCHES = "\n  UNION ALL\n".join(
    f"  SELECT p_partkey, p_brand, p_type, p_size, p_retailprice,"
    f" k{k}_key AS b_key, k{k}_brand AS b_brand,"
    f" k{k}_type AS b_type, k{k}_price AS b_price FROM led"
    for k in range(1, _FS_WINDOW + 1)
)

FS_ORACLE = f"""
WITH led AS (
  SELECT p_partkey, p_brand, p_type, p_size, p_retailprice,
         {_FS_LEADS}
  FROM part
  WINDOW w AS (PARTITION BY p_size ORDER BY p_retailprice, p_partkey)
), neighbors AS (
{_FS_BRANCHES}
), scored AS (
  SELECT p_partkey AS a_key, b_key, p_size,
         (CASE WHEN p_brand = b_brand THEN {_W_BRAND} ELSE -{_W_BRAND} END
          + CASE WHEN p_type = b_type THEN {_W_TYPE} ELSE -{_W_TYPE} END
          + CASE WHEN abs(p_retailprice - b_price) <= 5.0
                 THEN {_W_PRICE} ELSE -{_W_PRICE} END) AS score
  FROM neighbors WHERE b_key IS NOT NULL
)
SELECT a_key, b_key, p_size, CAST(score AS INT) AS score,
       CASE WHEN score >= {_FS_MATCH} THEN 'match' ELSE 'possible' END AS band
FROM scored WHERE score >= {_FS_THRESHOLD}
ORDER BY score DESC, a_key, b_key
LIMIT 200
"""

# --------------------------------------------------------------------
# neyman_allocation

_NEYMAN_SAMPLE = 10_000


def neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag AS stratum",
        "CAST(floor(l_extendedprice) AS BIGINT) AS v",
    )
    strata = li.groupBy("stratum").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("v").alias("s_v"),
        F.sum(F.col("v") * F.col("v")).alias("s_vv"),
    )
    # σ_h from exact moments, mirrored double ops; the weight N_h·σ_h is
    # then QUANTIZED to integer milli-units so the cross-stratum
    # normalization is an exact integer sum — a float sum across rows
    # would be accumulation-order-dependent and break hash equality
    sized = strata.selectExpr(
        "stratum",
        "n_h",
        "CAST(n_h AS DOUBLE) * sqrt((CAST(n_h AS DOUBLE) * CAST(s_vv AS DOUBLE)"
        " - CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE))"
        " / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE))) AS w_h",
    ).selectExpr("stratum", "n_h", "w_h", "CAST(floor(w_h) AS BIGINT) AS w_q")
    totals = sized.agg(F.sum("w_q").alias("w_total_q"))
    return (
        sized.crossJoin(F.broadcast(totals))
        .selectExpr(
            "stratum",
            "n_h",
            "w_h",
            f"({_NEYMAN_SAMPLE} * w_q) DIV w_total_q AS alloc_n",
        )
        .orderBy("stratum")
    )


NEYMAN_ORACLE = f"""
WITH strata AS (
  SELECT l_returnflag AS stratum, count(*) AS n_h,
         sum(CAST(floor(l_extendedprice) AS BIGINT)) AS s_v,
         sum(CAST(floor(l_extendedprice) AS BIGINT)
             * CAST(floor(l_extendedprice) AS BIGINT)) AS s_vv
  FROM lineitem GROUP BY l_returnflag
), sized AS (
  SELECT stratum, CAST(n_h AS BIGINT) AS n_h,
         CAST(n_h AS DOUBLE) * sqrt((CAST(n_h AS DOUBLE) * CAST(s_vv AS DOUBLE)
           - CAST(s_v AS DOUBLE) * CAST(s_v AS DOUBLE))
           / (CAST(n_h AS DOUBLE) * CAST(n_h AS DOUBLE))) AS w_h
  FROM strata
), q AS (
  SELECT stratum, n_h, w_h, CAST(floor(w_h) AS BIGINT) AS w_q FROM sized
), totals AS (SELECT sum(w_q) AS w_total_q FROM q)
SELECT stratum, n_h, w_h,
       CAST(({_NEYMAN_SAMPLE} * w_q) // w_total_q AS BIGINT) AS alloc_n
FROM q CROSS JOIN totals
ORDER BY stratum
"""


SUITE = {
    "nelson_aalen_conversion": QuerySpec(
        "nelson_aalen_conversion",
        nelson_aalen_conversion,
        NELSON_AALEN_ORACLE,
        "Nelson-Aalen cumulative hazard of time-to-first-purchase, right-censored; exact quantized hazard steps at day grain",
    ),
    "cuped_adjusted_ab": QuerySpec(
        "cuped_adjusted_ab",
        cuped_adjusted_ab,
        CUPED_ORACLE,
        "CUPED variance-reduced A/B means: theta from exact cents co-moments, mirrored IEEE double adjustment",
    ),
    "fs_match_scores": QuerySpec(
        "fs_match_scores",
        fs_match_scores,
        FS_ORACLE,
        "Fellegi-Sunter scored matching over sorted-neighborhood candidates; integer field weights, O(w) pairs/row",
    ),
    "neyman_allocation": QuerySpec(
        "neyman_allocation",
        neyman_allocation,
        NEYMAN_ORACLE,
        "Neyman-optimal stratified sample allocation from exact moments; integer-quantized cross-stratum normalization",
    ),
}
