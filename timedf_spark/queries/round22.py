"""Round-22 queries: scale-guard variants, market-basket rules, text
similarity tiers, and the last TPC-H gap.

Reference parity: extension layer (intel-ai/timedf has no embedding,
dedup, or association-rule surface); ``discount_elimination_revenue``
completes the TPC-H shape census (Q6 was the one remaining number).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import dsum
from timedf_spark.operators import similarity
from timedf_spark.operators.text import shingle_expr_duckdb, shingle_expr_spark
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_CAP = 8


def _semantic_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cosine_dedup_pairs with the per-vector degree bound — the
    adversarial-density guard for near-dup-heavy corpora (VERDICT r05
    item 4). Deterministic window linking keeps it oracle-exact; the
    recall cost vs the uncapped tier is measured in the evidence block
    (``semantic_dedup_degree_cap``)."""
    return similarity.cosine_dedup_pairs(spark, sf_dir, max_degree=_CAP)


# --------------------------------------------------------------------
# discount_elimination_revenue — TPC-H Q6 (the last uncovered TPC-H
# number): one tight scan-local filter + a single quantized-sum
# aggregate. Plan: every predicate pushed to the parquet scan, one
# partial+final agg, no shuffle of raw rows beyond the 1-row exchange.

_Q6_REV = dsum("l_extendedprice * l_discount")


def _discount_elimination_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            "l_shipdate >= timestamp'1994-01-01' AND "
            "l_shipdate < timestamp'1995-01-01' AND "
            "l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24"
        ).agg(F.expr(_Q6_REV).alias("revenue"))
    )


_Q6_ORACLE = f"""
SELECT {_Q6_REV} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1994-01-01' AND l_shipdate < TIMESTAMP '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""

# --------------------------------------------------------------------
# brand_lift_rules — association rules (support / confidence / lift)
# over per-order brand baskets: the market-basket shape every retail /
# recommendation pipeline runs. All ratios are scaled-integer basis
# points via truncating DIV, so the report is hash-exact. Scale: basket
# items join at (order, brand) grain after a broadcast of part; pair
# counts live at brand² grain (tiny); no fact-fact self-join — pairs
# unfold from per-order brand ARRAYS like brand_basket_pairs.
# Overflow note: lift_bp multiplies n_xy·N·10⁴ — bounded < 2^53 while
# pair-support × order-count < ~9·10^8, which holds by construction
# (n_xy ≤ N and both ≤ corpus orders; re-check via assert_sum_bound
# when porting to a >10^4× corpus).

_LIFT_SCALE = 10_000
_MIN_SUPPORT = 3


def _brand_lift_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # r11: ONE basket pass. The old shape computed the distinct
    # (order, brand) frame four times (pairs, n_orders, brand_n ×2 — 4
    # lineitem scans / 8 fact-grain exchanges in the before-plan,
    # plans/r11/brand_lift_rules_before.txt). collect_set dedups in-agg,
    # so the separate distinct exchange is gone too; the tiny basket
    # frame (one row per order) is checkpointed once and n_orders,
    # brand_n and the pair unfold all derive from it. Identical values:
    # count of basket rows == count of distinct orderkeys, explode of
    # the per-order brand SET == the distinct (order, brand) frame.
    baskets = (
        li.join(F.broadcast(part), li.l_orderkey.isNotNull() & (li.l_partkey == part.p_partkey))
        .select("l_orderkey", "p_brand")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("brands"))
        .localCheckpoint(eager=True)
    )
    n_orders = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    brand_n = baskets.select(F.explode("brands").alias("p_brand")).groupBy(
        "p_brand"
    ).agg(F.count(F.lit(1)).alias("n_brand"))
    # two-level posexplode+suffix-slice (r09, the linkpred.py shape):
    # streams pairs through two Generates instead of materializing the
    # O(k²) pair array per basket in interpreted HOF lambdas
    pairs = (
        baskets
        .select(F.posexplode("brands").alias("_i", "brand_a"), F.col("brands"))
        .select(
            "brand_a",
            F.explode(F.expr("slice(brands, _i + 2, size(brands))")).alias(
                "brand_b"
            ),
        )
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _MIN_SUPPORT)
    )
    na = brand_n.select(
        F.col("p_brand").alias("brand_a"), F.col("n_brand").alias("n_a")
    )
    nb = brand_n.select(
        F.col("p_brand").alias("brand_b"), F.col("n_brand").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(na), "brand_a")
        .join(F.broadcast(nb), "brand_b")
        .join(F.broadcast(n_orders))
        .select(
            "brand_a",
            "brand_b",
            "support",
            F.expr(f"support * {_LIFT_SCALE} DIV n_a").alias("conf_ab_bp"),
            F.expr(f"support * {_LIFT_SCALE} DIV n_b").alias("conf_ba_bp"),
            F.expr(
                f"support * n_orders * {_LIFT_SCALE} DIV (n_a * n_b)"
            ).alias("lift_bp"),
        )
        .orderBy(F.desc("lift_bp"), "brand_a", "brand_b")
        .limit(50)
    )


_LIFT_ORACLE = f"""
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
n_orders AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
brand_n AS (SELECT p_brand, count(*) AS n_brand FROM ob GROUP BY p_brand),
pairs AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, count(*) AS support
  FROM ob a JOIN ob b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
  GROUP BY a.p_brand, b.p_brand
  HAVING count(*) >= {_MIN_SUPPORT}
)
SELECT brand_a, brand_b, support,
       support * {_LIFT_SCALE} // na.n_brand AS conf_ab_bp,
       support * {_LIFT_SCALE} // nb.n_brand AS conf_ba_bp,
       support * n_orders * {_LIFT_SCALE} // (na.n_brand * nb.n_brand) AS lift_bp
FROM pairs
JOIN brand_n na ON na.p_brand = brand_a
JOIN brand_n nb ON nb.p_brand = brand_b
CROSS JOIN n_orders
ORDER BY lift_bp DESC, brand_a, brand_b
LIMIT 50
"""

# --------------------------------------------------------------------
# ngram_containment_pairs — asymmetric near-SUPERSET detection: the
# containment score |A∩B| / |A| catches a document fully embedded in a
# larger one, which symmetric Jaccard dilutes away (|A∩B|/|A∪B| → small
# when |B| ≫ |A|). The standard second axis of text dedup (Broder's
# containment vs resemblance). Integer-exact: counts and a scaled DIV
# ratio. Scale posture matches dedup.ngram_jaccard_pairs: inverted
# index on 60-bit shingle hashes with a doc-frequency guard bounding
# per-shingle fan-out at O(f²).

_CONT_K = 5
_CONT_SCALE = 10_000
_CONT_THRESHOLD_BP = 7_000
_CONT_MAX_DF = 50
_HASH60_SPARK = "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
_HASH60_DUCK = "(('0x' || substr(md5(s), 1, 15))::BIGINT)"


def _ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh = docs.select(
        "doc_id",
        F.explode(
            F.expr(f"array_distinct({shingle_expr_spark('text', _CONT_K)})")
        ).alias("s"),
    ).select("doc_id", F.expr(_HASH60_SPARK).alias("sh"))
    hot = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _CONT_MAX_DF)
        .select("sh")
    )
    sh = sh.join(F.broadcast(hot), "sh", "left_anti").cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    common = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    return (
        common.join(F.broadcast(sa), "doc_a")
        .withColumn(
            "containment_bp", F.expr(f"n_common * {_CONT_SCALE} DIV n_a")
        )
        .filter(F.col("containment_bp") >= _CONT_THRESHOLD_BP)
        .select("doc_a", "doc_b", "n_common", "containment_bp")
    )


_CONT_SH = shingle_expr_duckdb("text", _CONT_K)
_CONT_ORACLE = f"""
WITH shs AS (
  SELECT doc_id, unnest(list_distinct({_CONT_SH})) AS s FROM documents
),
sh_all AS (SELECT doc_id, {_HASH60_DUCK} AS sh FROM shs),
sh AS (
  SELECT doc_id, sh FROM sh_all
  WHERE sh NOT IN (
    SELECT sh FROM sh_all GROUP BY sh HAVING count(*) > {_CONT_MAX_DF}
  )
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id <> b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_common,
       n_common * {_CONT_SCALE} // n_sh AS containment_bp
FROM common JOIN sizes ON sizes.doc_id = doc_a
WHERE n_common * {_CONT_SCALE} // n_sh >= {_CONT_THRESHOLD_BP}
"""

# --------------------------------------------------------------------
# doc_tf_cosine_pairs — bag-of-words cosine similarity over SPARSE
# term-frequency vectors via an inverted index: the lexical sibling of
# the embedding-cosine tier (retrieval/dedup pipelines run both — the
# lexical one catches verbatim-ish overlap embeddings smooth over).
# Exactness: dot products are exact integer sums of tf_a·tf_b; norms
# are sqrt of exact integers (correctly rounded IEEE, identical in both
# engines); the final quantization floors a bit-identical double. The
# doc-frequency guard both bounds the index fan-out AND drops stopword
# mass (cosine is then over the informative tail — deliberate).

_TFC_MAX_DF = 50
_TFC_THRESHOLD = 0.5


def _doc_tf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tf = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    hot = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > _TFC_MAX_DF)
        .select("w")
    )
    tf = tf.join(F.broadcast(hot), "w", "left_anti").cache()
    norms = tf.groupBy("doc_id").agg(F.sum(F.expr("tf * tf")).alias("ss"))
    num = (
        tf.alias("a")
        .join(
            tf.alias("b"),
            (F.col("a.w") == F.col("b.w"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.expr("a.tf * b.tf")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("ss").alias("ss_a"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("ss").alias("ss_b"))
    return (
        num.join(F.broadcast(na), "doc_a")
        .join(F.broadcast(nb), "doc_b")
        .withColumn("cos", F.expr("dot / (sqrt(ss_a) * sqrt(ss_b))"))
        .filter(F.col("cos") >= _TFC_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            "dot",
            F.expr("cast(floor(cos * 1e4 + 0.5) as double) / 1e4").alias("cos_q"),
        )
    )


_TFC_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf_all AS (
  SELECT doc_id, w, count(*) AS tf FROM toks WHERE w <> '' GROUP BY doc_id, w
),
tf AS (
  SELECT doc_id, w, tf FROM tf_all
  WHERE w NOT IN (
    SELECT w FROM tf_all GROUP BY w HAVING count(*) > {_TFC_MAX_DF}
  )
),
norms AS (SELECT doc_id, sum(tf * tf) AS ss FROM tf GROUP BY doc_id),
num AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         cast(sum(a.tf * b.tf) as bigint) AS dot
  FROM tf a JOIN tf b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, dot,
       cast(floor(dot / (sqrt(na.ss) * sqrt(nb.ss)) * 1e4 + 0.5) as double) / 1e4 AS cos_q
FROM num
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE dot / (sqrt(na.ss) * sqrt(nb.ss)) >= {_TFC_THRESHOLD}
"""


# --------------------------------------------------------------------
# theil_sen_nation_trend — robust (median-of-pairwise-slopes) monthly
# revenue trend per nation: the outlier-proof alternative to OLS a
# forecasting pipeline uses when one blowout month shouldn't move the
# trend. Pairwise slopes live at (nation × month²) grain — months are
# BOUNDED (~84 in 7 years), so the self-join is ~3.5k rows per nation,
# never fact-sized; the fact table is touched once for the month
# aggregate. Slopes quantize to integer cents/month before the median,
# and the month revenue itself is a quantized exact sum — every input
# to the median is bit-identical across engines.

_TS_REV = dsum("o_totalprice")


def _theil_sen_nation_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.expr("year(o_orderdate) * 12 + month(o_orderdate)").alias("m"),
        )
        .agg(F.expr(_TS_REV).alias("rev"))
    )
    slopes = (
        monthly.alias("a")
        .join(
            monthly.alias("b"),
            (F.col("a.n_name") == F.col("b.n_name")) & (F.col("b.m") > F.col("a.m")),
        )
        .select(
            F.col("a.n_name").alias("n_name"),
            F.expr(
                "cast(floor((b.rev - a.rev) / (b.m - a.m) * 100 + 0.5) as bigint)"
            ).alias("slope_cents"),
        )
    )
    return (
        slopes.groupBy("n_name")
        .agg(
            F.expr("median(slope_cents)").alias("trend_cents_per_month"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
        .orderBy("n_name")
    )


_TS_ORACLE = f"""
WITH monthly AS (
  SELECT n_name, year(o_orderdate) * 12 + month(o_orderdate) AS m,
         {_TS_REV} AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY n_name, year(o_orderdate) * 12 + month(o_orderdate)
),
slopes AS (
  SELECT a.n_name,
         cast(floor((b.rev - a.rev) / (b.m - a.m) * 100 + 0.5) as bigint) AS slope_cents
  FROM monthly a JOIN monthly b ON a.n_name = b.n_name AND b.m > a.m
)
SELECT n_name,
       cast(median(slope_cents) as double) AS trend_cents_per_month,
       count(*) AS n_pairs
FROM slopes GROUP BY n_name ORDER BY n_name
"""

# --------------------------------------------------------------------
# position_attribution — U-shaped (40/20/40) multi-touch attribution:
# each converting user's pre-purchase touchpoints split 10000 bp of
# credit — 40% first touch, 40% last touch, the middle 20% split evenly
# (all in integer basis points via DIV; the n=1 / n=2 edge cases get
# 10000 and 5000/5000). The marketing-analytics twin of
# first_touch_attribution (r04) with the industry-standard curve.
# One window pass over pre-conversion events partitioned by user; the
# report is event_type-grain.


def _position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    first_purchase = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("conv_ts"))
    )
    touches = ev.join(F.broadcast(first_purchase), "user_id").filter(
        "ts < conv_ts AND event_type <> 'purchase'"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ranked = touches.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
    )
    credited = ranked.select(
        "event_type",
        F.expr(
            "CASE WHEN n = 1 THEN 10000 "
            "WHEN n = 2 THEN 5000 "
            "WHEN rn = 1 OR rn = n THEN 4000 "
            "ELSE 2000 DIV (n - 2) END"
        ).alias("credit_bp"),
    )
    return (
        credited.groupBy("event_type")
        .agg(
            F.sum("credit_bp").alias("total_credit_bp"),
            F.count(F.lit(1)).alias("n_touches"),
        )
        .orderBy("event_type")
    )


_ATTR_ORACLE = """
WITH first_purchase AS (
  SELECT user_id, min(ts) AS conv_ts FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
),
touches AS (
  SELECT e.user_id, e.event_type, e.ts, e.event_id
  FROM events e JOIN first_purchase fp ON e.user_id = fp.user_id
  WHERE e.ts < fp.conv_ts AND e.event_type <> 'purchase'
),
ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM touches
),
credited AS (
  SELECT event_type,
         CASE WHEN n = 1 THEN 10000
              WHEN n = 2 THEN 5000
              WHEN rn = 1 OR rn = n THEN 4000
              ELSE 2000 // (n - 2) END AS credit_bp
  FROM ranked
)
SELECT event_type, cast(sum(credit_bp) as bigint) AS total_credit_bp,
       count(*) AS n_touches
FROM credited GROUP BY event_type ORDER BY event_type
"""

# --------------------------------------------------------------------
# bounce_dwell_report — per-day session quality: sessions, bounces
# (single-event sessions), bounce rate in bp, total dwell seconds. The
# product-analytics counterpart of sessionize: one user_id window pass
# builds sessions (lag + running sum, the gaps-and-islands form), one
# session-grain aggregate, one day-grain report. All integers.

_BD_GAP_MIN = 30


def _bounce_dwell_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    marked = ev.select(
        "user_id",
        "ts",
        F.expr(
            "CASE WHEN lag(ts) over (partition by user_id order by ts, event_id) IS NULL "
            f"OR unix_micros(ts) - unix_micros(lag(ts) over "
            f"(partition by user_id order by ts, event_id)) > {_BD_GAP_MIN} * 60 * 1000000 "
            "THEN 1 ELSE 0 END"
        ).alias("new_s"),
    )
    sessions = (
        marked.withColumn(
            "sid",
            F.expr(
                "sum(new_s) over (partition by user_id order by ts "
                "rows between unbounded preceding and current row)"
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("start_ts"),
            F.expr(
                "cast((unix_micros(max(ts)) - unix_micros(min(ts))) DIV 1000000 as bigint)"
            ).alias("dwell_sec"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        sessions.groupBy(F.expr("cast(start_ts as date)").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.expr("CASE WHEN n_events = 1 THEN 1 ELSE 0 END")).alias("n_bounces"),
            F.expr(
                "sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000 "
                "DIV count(1)"
            ).alias("bounce_bp"),
            F.sum("dwell_sec").alias("total_dwell_sec"),
        )
        .orderBy("day")
    )


_BD_ORACLE = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > {_BD_GAP_MIN} * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s,
         event_id
  FROM events
),
sess AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
sessions AS (
  SELECT user_id, sid, min(ts) AS start_ts,
         cast((epoch_us(max(ts)) - epoch_us(min(ts))) // 1000000 as bigint) AS dwell_sec,
         count(*) AS n_events
  FROM sess GROUP BY user_id, sid
)
SELECT cast(start_ts as date) AS day,
       count(*) AS n_sessions,
       cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) as bigint) AS n_bounces,
       cast(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 10000 // count(*) as bigint) AS bounce_bp,
       cast(sum(dwell_sec) as bigint) AS total_dwell_sec
FROM sessions GROUP BY cast(start_ts as date) ORDER BY day
"""

# --------------------------------------------------------------------
# rolling_7d_actives — exact trailing-7-day distinct users per day
# WITHOUT a theta join: the (day, user) distinct frame (aggregate
# grain) EXPLODES each row to the 7 target days it contributes to, then
# one groupBy counts distincts — linear in day-user rows, no range
# self-join, no sketch tolerance. The batch twin of the
# rolling_distinct streaming store.


def _rolling_7d_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    du = ev.select(
        F.expr("cast(cast(ts as date) as timestamp)").alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    contrib = du.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("target"),
        "user_id",
    )
    return (
        contrib.join(days.withColumnRenamed("day", "target"), "target", "left_semi")
        .groupBy("target")
        .agg(F.count_distinct("user_id").alias("actives_7d"))
        .select(F.col("target").alias("day"), "actives_7d")
        .orderBy("day")
    )


_R7_ORACLE = """
WITH du AS (
  SELECT DISTINCT cast(cast(ts as date) as timestamp) AS day, user_id FROM events
),
days AS (SELECT DISTINCT day FROM du)
SELECT d.day AS day, count(DISTINCT du.user_id) AS actives_7d
FROM days d JOIN du
  ON du.day <= d.day AND du.day >= d.day - INTERVAL 6 DAY
GROUP BY d.day ORDER BY d.day
"""

# --------------------------------------------------------------------
# supplier_balance_percentile — exact percentile position (percent_rank
# in integer bp with a deterministic tiebreak) of every supplier within
# its nation: the feature-engineering normalization that turns a raw
# balance into a within-group position. One nation-grain window.


def _supplier_balance_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return (
        sup.select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("s_nationkey")).alias("n"),
        )
        .select(
            "s_suppkey",
            "s_nationkey",
            "s_acctbal",
            F.expr(
                "CASE WHEN n = 1 THEN 0 ELSE (rn - 1) * 10000 DIV (n - 1) END"
            ).alias("pct_bp"),
        )
        .orderBy("s_suppkey")
    )


_PCT_ORACLE = """
WITH ranked AS (
  SELECT s_suppkey, s_nationkey, s_acctbal,
         row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS rn,
         count(*) OVER (PARTITION BY s_nationkey) AS n
  FROM supplier
)
SELECT s_suppkey, s_nationkey, s_acctbal,
       CASE WHEN n = 1 THEN 0 ELSE (rn - 1) * 10000 // (n - 1) END AS pct_bp
FROM ranked ORDER BY s_suppkey
"""

# --------------------------------------------------------------------
# curriculum_shards — curriculum-ordered training shards: documents
# sorted easy→hard (token count as the difficulty proxy), packed into
# fixed-token-budget shards by a running sum; the report is shard-grain
# (docs, tokens, difficulty span). The shard assignment is ONE global
# sort (Spark range-partitions it across the cluster) + one window
# running sum — the standard distributed form; everything else is
# integers at shard grain.

_SHARD_TOKENS = 20_000


def _curriculum_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id",
        F.expr("size(filter(split(text, ' '), w -> w <> ''))").alias("n_tokens"),
    )
    w = Window.orderBy("n_tokens", "doc_id")
    packed = toks.select(
        "doc_id",
        "n_tokens",
        F.expr(
            f"(sum(n_tokens) over (order by n_tokens, doc_id "
            f"rows between unbounded preceding and current row) - 1) DIV {_SHARD_TOKENS}"
        ).alias("shard"),
        F.row_number().over(w).alias("_rn"),  # forces the deterministic order
    )
    return (
        packed.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("n_tokens").alias("easiest"),
            F.max("n_tokens").alias("hardest"),
        )
        .orderBy("shard")
    )


_CUR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, n_tokens,
         cast((sum(n_tokens) OVER (ORDER BY n_tokens, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) // {_SHARD_TOKENS} as bigint) AS shard
  FROM toks
)
SELECT shard, count(*) AS n_docs,
       cast(sum(n_tokens) as bigint) AS total_tokens,
       min(n_tokens) AS easiest, max(n_tokens) AS hardest
FROM packed GROUP BY shard ORDER BY shard
"""


# --------------------------------------------------------------------
# l_diversity_audit — the privacy audit one step past k-anonymity
# (customer_anonymity_audit, r05): a quasi-identifier group can be
# large (k-anonymous) yet still leak if everyone in it shares the same
# SENSITIVE value. l-diversity = distinct sensitive values per QI
# group; the report lists groups below the required l with their sizes.
# QI = (nation, market segment); sensitive = account-balance decile
# (the classic "income bracket" stand-in). Aggregate-grain only.

_LDIV_REQUIRED = 3


def _l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    w = Window.orderBy("c_acctbal", "c_custkey")
    with_decile = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "(row_number() over (order by c_acctbal, c_custkey) - 1) * 10 DIV "
            "(count(1) over ())"
        ).alias("bal_decile"),
        F.row_number().over(w).alias("_rn"),
    )
    return (
        with_decile.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("group_size"),
            F.count_distinct("bal_decile").alias("l_diversity"),
        )
        .filter(F.col("l_diversity") < _LDIV_REQUIRED)
        .orderBy("c_nationkey", "c_mktsegment")
    )


_LDIV_ORACLE = f"""
WITH with_decile AS (
  SELECT c_nationkey, c_mktsegment,
         (row_number() OVER (ORDER BY c_acctbal, c_custkey) - 1) * 10
           // (count(*) OVER ()) AS bal_decile
  FROM customer
)
SELECT c_nationkey, c_mktsegment, count(*) AS group_size,
       count(DISTINCT bal_decile) AS l_diversity
FROM with_decile
GROUP BY c_nationkey, c_mktsegment
HAVING count(DISTINCT bal_decile) < {_LDIV_REQUIRED}
ORDER BY c_nationkey, c_mktsegment
"""

# --------------------------------------------------------------------
# brand_price_ties — top-3-by-price per brand WITH ties (dense_rank):
# the rank-semantics counterpart of topk_per_segment's row_number —
# price ties all surface instead of being tiebroken away. Price is cast
# to exact cents for the ranking so tie GROUPS are engine-identical
# (double ordering is exact, but making ties explicit integers
# documents the contract).


def _brand_price_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_retailprice"
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc(F.expr("cast(floor(p_retailprice * 100 + 0.5) as bigint)"))
    )
    return (
        part.select(
            "p_partkey",
            "p_brand",
            F.expr("cast(floor(p_retailprice * 100 + 0.5) as bigint)").alias(
                "price_cents"
            ),
            F.dense_rank().over(w).alias("price_rank"),
        )
        .filter(F.col("price_rank") <= 3)
        .orderBy("p_brand", "price_rank", "p_partkey")
    )


_TIES_ORACLE = """
WITH ranked AS (
  SELECT p_partkey, p_brand,
         cast(floor(p_retailprice * 100 + 0.5) as bigint) AS price_cents,
         dense_rank() OVER (
           PARTITION BY p_brand
           ORDER BY cast(floor(p_retailprice * 100 + 0.5) as bigint) DESC
         ) AS price_rank
  FROM part
)
SELECT p_partkey, p_brand, price_cents, price_rank
FROM ranked WHERE price_rank <= 3
ORDER BY p_brand, price_rank, p_partkey
"""

# --------------------------------------------------------------------
# balance_gap_to_leader — per supplier: exact cent gap to the nation's
# best balance (first_value) and to the next-better supplier (lag over
# the descending order): the leaderboard-delta shape. One nation-grain
# window exchange carries all three columns.


def _balance_gap_to_leader(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    sup = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey", "s_acctbal"
    )
    cents = sup.select(
        "s_suppkey",
        "s_nationkey",
        F.expr("cast(floor(s_acctbal * 100 + 0.5) as bigint)").alias("bal_cents"),
    )
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("bal_cents"), "s_suppkey"
    )
    return cents.select(
        "s_suppkey",
        "s_nationkey",
        "bal_cents",
        (F.first("bal_cents").over(w) - F.col("bal_cents")).alias("gap_to_leader"),
        F.coalesce(
            F.lag("bal_cents").over(w) - F.col("bal_cents"), F.lit(0)
        ).alias("gap_to_next"),
    ).orderBy("s_suppkey")


_GAP_ORACLE = """
WITH cents AS (
  SELECT s_suppkey, s_nationkey,
         cast(floor(s_acctbal * 100 + 0.5) as bigint) AS bal_cents
  FROM supplier
)
SELECT s_suppkey, s_nationkey, bal_cents,
       first_value(bal_cents) OVER w - bal_cents AS gap_to_leader,
       coalesce(lag(bal_cents) OVER w - bal_cents, 0) AS gap_to_next
FROM cents
WINDOW w AS (PARTITION BY s_nationkey ORDER BY bal_cents DESC, s_suppkey)
ORDER BY s_suppkey
"""

# --------------------------------------------------------------------
# grouping_id_report — explicit GROUPING SETS with grouping() flags:
# the fourth multi-grain aggregation shape next to rollup/cube (r01) —
# an ARBITRARY set list (here: (status, priority), (status), (priority)
# — but NOT the grand total, which rollup would force). Spark compiles
# it to one Expand + one aggregate; flags disambiguate NULL-as-subtotal
# from NULL-as-value.


def _grouping_id_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_r22_orders")
    return orders.sparkSession.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus) AS g_status,
               grouping(o_orderpriority) AS g_priority,
               count(*) AS n_orders,
               {dsum('o_totalprice')} AS revenue
        FROM _r22_orders
        GROUP BY GROUPING SETS (
            (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority)
        )
        ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
        """
    )


_GSETS_ORACLE = f"""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus) AS g_status,
       grouping(o_orderpriority) AS g_priority,
       count(*) AS n_orders,
       {dsum('o_totalprice')} AS revenue
FROM orders
GROUP BY GROUPING SETS (
    (o_orderstatus, o_orderpriority), (o_orderstatus), (o_orderpriority)
)
ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority
"""

# --------------------------------------------------------------------
# nation_top3_brand_bundle — per nation, the top-3 brands by exact
# revenue packed into ONE ordered string column: the array-aggregation
# shape (collect → sort → slice → join) recommendation surfaces ship.
# Revenue quantizes to cents before ranking, so the bundle string is
# hash-exact; ranking ties break on brand name.


def _nation_top3_brand_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_nationkey", "p_brand")
        .agg(
            F.expr(
                "sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint))"
            ).alias("rev_cents")
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("rev_cents"), "p_brand"
    )
    return (
        rev.select(
            "c_nationkey", "p_brand", "rev_cents",
            F.row_number().over(w).alias("rk"),
        )
        .filter("rk <= 3")
        .groupBy("c_nationkey")
        .agg(
            F.expr(
                "concat_ws(',', transform(array_sort(collect_list(struct(rk, p_brand))), "
                "x -> x.p_brand))"
            ).alias("top3_brands"),
            F.sum("rev_cents").alias("top3_rev_cents"),
        )
        .orderBy("c_nationkey")
    )


_BUNDLE_ORACLE = """
WITH rev AS (
  SELECT c_nationkey, p_brand,
         cast(sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint)) as bigint) AS rev_cents
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, p_brand
),
ranked AS (
  SELECT c_nationkey, p_brand, rev_cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY rev_cents DESC, p_brand) AS rk
  FROM rev
)
SELECT c_nationkey,
       string_agg(p_brand, ',' ORDER BY rk) AS top3_brands,
       cast(sum(rev_cents) as bigint) AS top3_rev_cents
FROM ranked WHERE rk <= 3
GROUP BY c_nationkey ORDER BY c_nationkey
"""

# --------------------------------------------------------------------
# dup_key_audit — duplicate-business-key data-quality audit: customers
# with MULTIPLE orders on the same calendar day (the "accidental
# double-submit" signature a CDC pipeline checks before declaring a key
# unique). Key-grain aggregate; the fact table never self-joins.


def _dup_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey"
    )
    return (
        orders.groupBy(
            "o_custkey", F.expr("cast(o_orderdate as date)").alias("order_day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("o_orderkey").alias("first_key"),
            F.max("o_orderkey").alias("last_key"),
        )
        .filter("n_orders > 1")
        .orderBy("o_custkey", "order_day")
    )


_DUPKEY_ORACLE = """
SELECT o_custkey, cast(o_orderdate as date) AS order_day,
       count(*) AS n_orders,
       min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
FROM orders
GROUP BY o_custkey, cast(o_orderdate as date)
HAVING count(*) > 1
ORDER BY o_custkey, order_day
"""

# --------------------------------------------------------------------
# conversion_hazard_table — discrete-time survival analysis of the
# view→purchase funnel: per whole-day lag d, how many users were still
# unconverted and under observation (at risk), how many converted at d,
# and the exact hazard in bp. The Kaplan-Meier input table with
# right-censoring at each user's last observed event — all integers
# (the survival CURVE is a cumulative product, left to the consumer;
# the hazard table is the exact, engine-identical artifact). User-grain
# aggregates only; the fact table is touched once.


def _conversion_hazard_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.expr("CASE WHEN event_type = 'view' THEN ts END")).alias("first_view"),
        F.max("ts").alias("last_seen"),
    )
    first_purchase = (
        ev.filter("event_type = 'purchase'")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    cohort = (
        per_user.join(first_purchase, "user_id", "left")
        .filter("first_view IS NOT NULL")
        .filter("first_purchase IS NULL OR first_purchase >= first_view")
        .select(
            F.expr(
                "CASE WHEN first_purchase IS NOT NULL THEN "
                "cast((unix_micros(first_purchase) - unix_micros(first_view)) "
                "DIV 86400000000 as bigint) END"
            ).alias("conv_day"),
            F.expr(
                "cast((unix_micros(last_seen) - unix_micros(first_view)) "
                "DIV 86400000000 as bigint)"
            ).alias("obs_end"),
        )
    )
    days = cohort.select(
        F.explode(F.expr("sequence(cast(0 as bigint), obs_end)")).alias("d"),
        "conv_day",
    )
    return (
        days.groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("at_risk"),
            F.sum(
                F.expr("CASE WHEN conv_day = d THEN 1 ELSE 0 END")
            ).alias("n_converted"),
            F.expr(
                "sum(CASE WHEN conv_day = d THEN 1 ELSE 0 END) * 10000 DIV count(1)"
            ).alias("hazard_bp"),
        )
        .filter("at_risk > 0")
        .orderBy("d")
    )


_HAZARD_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         max(ts) AS last_seen
  FROM events GROUP BY user_id
),
first_purchase AS (
  SELECT user_id, min(ts) AS first_purchase FROM events
  WHERE event_type = 'purchase' GROUP BY user_id
),
cohort AS (
  SELECT CASE WHEN fp.first_purchase IS NOT NULL THEN
           cast((epoch_us(fp.first_purchase) - epoch_us(pu.first_view)) // 86400000000 as bigint)
         END AS conv_day,
         cast((epoch_us(pu.last_seen) - epoch_us(pu.first_view)) // 86400000000 as bigint) AS obs_end
  FROM per_user pu LEFT JOIN first_purchase fp ON pu.user_id = fp.user_id
  WHERE pu.first_view IS NOT NULL
    AND (fp.first_purchase IS NULL OR fp.first_purchase >= pu.first_view)
),
days AS (
  SELECT unnest(range(0, obs_end + 1)) AS d, conv_day FROM cohort
)
SELECT d, count(*) AS at_risk,
       cast(sum(CASE WHEN conv_day = d THEN 1 ELSE 0 END) as bigint) AS n_converted,
       cast(sum(CASE WHEN conv_day = d THEN 1 ELSE 0 END) * 10000 // count(*) as bigint) AS hazard_bp
FROM days
GROUP BY d HAVING count(*) > 0 ORDER BY d
"""


# --------------------------------------------------------------------
# template_prefix_groups — boilerplate/template detection: documents
# sharing an identical first-N-characters prefix form a template group
# (the "same header, different body" signature crawled corpora carry).
# Grouping key is the md5 of the exact prefix — one aggregate at
# prefix-hash grain, no pairwise anything; the report carries group
# size, an example doc, and total affected chars.

_TPL_PREFIX = 40


def _template_prefix_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    return (
        docs.filter(F.length("text") >= _TPL_PREFIX)
        .select(
            F.expr(f"md5(substring(text, 1, {_TPL_PREFIX}))").alias("prefix_key"),
            "doc_id",
            "n_chars",
        )
        .groupBy("prefix_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("example_doc"),
            F.sum("n_chars").alias("total_chars"),
        )
        .filter("n_docs > 1")
        .orderBy(F.desc("n_docs"), "prefix_key")
    )


_TPL_ORACLE = f"""
SELECT md5(substr(text, 1, {_TPL_PREFIX})) AS prefix_key,
       count(*) AS n_docs, min(doc_id) AS example_doc,
       cast(sum(n_chars) as bigint) AS total_chars
FROM documents WHERE length(text) >= {_TPL_PREFIX}
GROUP BY md5(substr(text, 1, {_TPL_PREFIX}))
HAVING count(*) > 1
ORDER BY n_docs DESC, prefix_key
"""

# --------------------------------------------------------------------
# zipf_rank_table — the Zipf diagnostic every tokenizer/corpus report
# includes: tokens ranked by frequency with the rank·frequency product
# (constant under an ideal Zipf law). Integer-exact; ties break on the
# token string so ranks are engine-identical. Token-grain aggregate +
# one window over the (tiny) vocabulary.


def _zipf_rank_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("text")
    tf = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter("w <> ''")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    w = Window.orderBy(F.desc("freq"), "w")
    return (
        tf.select(
            "w",
            "freq",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .withColumn("rank_freq", F.expr("rank * freq"))
        .filter("rank <= 100")
        .orderBy("rank")
    )


_ZIPF_ORACLE = """
WITH tf AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split(text, ' ')) AS w FROM documents
  ) WHERE w <> '' GROUP BY w
)
SELECT w, freq,
       cast(row_number() OVER (ORDER BY freq DESC, w) as bigint) AS rank,
       cast(row_number() OVER (ORDER BY freq DESC, w) as bigint) * freq AS rank_freq
FROM tf
QUALIFY rank <= 100
ORDER BY rank
"""

# --------------------------------------------------------------------
# nonalpha_noise_score — OCR/mojibake noise scoring: share of
# characters OUTSIDE [a-zA-Z0-9 ] in exact basis points (the quality
# gate that catches binary junk and encoding damage before it reaches
# training). regexp_replace is scan-local (verified engine-identical
# for this class); the report is the top-50 noisiest docs.


def _nonalpha_noise_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        docs.filter(F.length("text") > 0)
        .select(
            "doc_id",
            F.length("text").cast("long").alias("n_chars_total"),
            F.expr(
                "(length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', ''))) "
                "* 10000 DIV length(text)"
            ).alias("noise_bp"),
        )
        .orderBy(F.desc("noise_bp"), "doc_id")
        .limit(50)
    )


_NOISE_ORACLE = """
SELECT doc_id, cast(length(text) as bigint) AS n_chars_total,
       (length(text) - length(regexp_replace(text, '[^a-zA-Z0-9 ]', '', 'g')))
         * 10000 // length(text) AS noise_bp
FROM documents WHERE length(text) > 0
ORDER BY noise_bp DESC, doc_id
LIMIT 50
"""

# --------------------------------------------------------------------
# power_users_pareto — the 80/20 concentration curve: users ranked by
# event volume, with each rank's cumulative share of all events in bp,
# reported at the decile marks. The skew diagnostic that decides
# salting strategy (key_skew_stats' cumulative sibling). User-grain
# aggregate + one window over users; raw events shuffle once.


def _power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select("user_id")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.desc("n_events"), "user_id")
    ranked = per_user.select(
        F.row_number().over(w).cast("long").alias("user_rank"),
        F.expr(
            "sum(n_events) over (order by n_events desc, user_id "
            "rows between unbounded preceding and current row)"
        ).alias("cum_events"),
        F.expr("count(1) over ()").alias("n_users"),
        F.expr("sum(n_events) over ()").alias("total_events"),
    )
    return (
        ranked.filter("user_rank * 10 % n_users < 10")  # decile marks
        .select(
            F.expr("user_rank * 10000 DIV n_users").alias("user_pct_bp"),
            F.expr("cum_events * 10000 DIV total_events").alias("events_share_bp"),
            "user_rank",
            "cum_events",
        )
        .groupBy("user_pct_bp")
        .agg(
            F.max("events_share_bp").alias("events_share_bp"),
            F.max("user_rank").alias("user_rank"),
            F.max("cum_events").alias("cum_events"),
        )
        .orderBy("user_pct_bp")
    )


_PARETO_ORACLE = """
WITH per_user AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
),
ranked AS (
  SELECT cast(row_number() OVER (ORDER BY n_events DESC, user_id) as bigint) AS user_rank,
         cast(sum(n_events) OVER (ORDER BY n_events DESC, user_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) as bigint) AS cum_events,
         cast(count(*) OVER () as bigint) AS n_users,
         cast(sum(n_events) OVER () as bigint) AS total_events
  FROM per_user
)
SELECT user_rank * 10000 // n_users AS user_pct_bp,
       max(cum_events * 10000 // total_events) AS events_share_bp,
       max(user_rank) AS user_rank,
       max(cum_events) AS cum_events
FROM ranked WHERE (user_rank * 10) % n_users < 10
GROUP BY user_rank * 10000 // n_users
ORDER BY user_pct_bp
"""

# --------------------------------------------------------------------
# inter_event_gap_histogram — log2-bucketed histogram of per-user
# inter-event gaps: the latency-distribution shape (1s/2s/4s/... bins)
# ops dashboards draw. The log2 bucket is length(bin(gap)) — an INTEGER
# bit-length, no floating log, identical in both engines. One user
# window (lag) + one bucket-grain aggregate.


def _inter_event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    gaps = ev.select(
        F.expr(
            "unix_micros(ts) - unix_micros(lag(ts) over "
            "(partition by user_id order by ts, event_id))"
        ).alias("gap_us")
    ).filter("gap_us IS NOT NULL AND gap_us > 0")
    return (
        gaps.select(
            F.expr("length(bin(gap_us DIV 1000000 + 1))").alias("bucket_log2")
        )
        .groupBy("bucket_log2")
        .agg(F.count(F.lit(1)).alias("n_gaps"))
        .orderBy("bucket_log2")
    )


_GAPH_ORACLE = """
WITH gaps AS (
  SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
)
SELECT length(bin(gap_us // 1000000 + 1)) AS bucket_log2, count(*) AS n_gaps
FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
GROUP BY length(bin(gap_us // 1000000 + 1))
ORDER BY bucket_log2
"""

# --------------------------------------------------------------------
# discount_quantity_corr — exact-input Pearson correlation per brand:
# does a deeper discount move quantity? Every moment (Σx, Σy, Σxy, Σx²,
# Σy²) is an EXACT integer sum (discount → integer percent points,
# quantity is whole units), so the final correlation arithmetic runs on
# bit-identical doubles in both engines — a naive corr() over doubles
# would drift in the last bits and fail the hash. One brand-grain
# aggregate after a broadcast part join.


def _discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_discount", "l_quantity"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    moments = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.expr("cast(floor(l_discount * 100 + 0.5) as bigint)").alias("x"),
            F.expr("cast(floor(l_quantity + 0.5) as bigint)").alias("y"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.expr("x * y")).alias("sxy"),
            F.sum(F.expr("x * x")).alias("sxx"),
            F.sum(F.expr("y * y")).alias("syy"),
        )
    )
    return moments.select(
        "p_brand",
        "n",
        F.expr(
            "CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN "
            "cast(floor((n * sxy - sx * sy) / "
            "(sqrt(cast(n * sxx - sx * sx as double)) * "
            "sqrt(cast(n * syy - sy * sy as double))) * 1e4 + 0.5) as bigint) "
            "END"
        ).alias("corr_bp"),
    ).orderBy("p_brand")


_CORR_ORACLE = """
WITH moments AS (
  SELECT p_brand, count(*) AS n,
         cast(sum(cast(floor(l_discount * 100 + 0.5) as bigint)) as bigint) AS sx,
         cast(sum(cast(floor(l_quantity + 0.5) as bigint)) as bigint) AS sy,
         cast(sum(cast(floor(l_discount * 100 + 0.5) as bigint)
                  * cast(floor(l_quantity + 0.5) as bigint)) as bigint) AS sxy,
         cast(sum(cast(floor(l_discount * 100 + 0.5) as bigint)
                  * cast(floor(l_discount * 100 + 0.5) as bigint)) as bigint) AS sxx,
         cast(sum(cast(floor(l_quantity + 0.5) as bigint)
                  * cast(floor(l_quantity + 0.5) as bigint)) as bigint) AS syy
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, n,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0 THEN
         cast(floor((n * sxy - sx * sy) /
           (sqrt(cast(n * sxx - sx * sx as double)) *
            sqrt(cast(n * syy - sy * sy as double))) * 1e4 + 0.5) as bigint)
       END AS corr_bp
FROM moments ORDER BY p_brand
"""

# --------------------------------------------------------------------
# regional_hhi — Herfindahl-Hirschman market-concentration index per
# region over supplier revenue: Σ share² with shares in exact bp, so
# HHI is an exact integer (0..10^8 scale). The antitrust/marketplace
# concentration metric; supplier-grain revenue then region-grain sum.


def _regional_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    rev = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .groupBy("n_regionkey", "s_suppkey")
        .agg(
            F.expr(
                "sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint))"
            ).alias("rev_cents")
        )
    )
    totals = rev.groupBy("n_regionkey").agg(F.sum("rev_cents").alias("total_cents"))
    return (
        rev.join(F.broadcast(totals), "n_regionkey")
        .select(
            "n_regionkey",
            F.expr("rev_cents * 10000 DIV total_cents").alias("share_bp"),
        )
        .groupBy("n_regionkey")
        .agg(
            F.sum(F.expr("share_bp * share_bp")).alias("hhi"),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_regionkey")
    )


_HHI_ORACLE = """
WITH rev AS (
  SELECT n_regionkey, s_suppkey,
         cast(sum(cast(floor(l_extendedprice * 100 + 0.5) as bigint)) as bigint) AS rev_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  GROUP BY n_regionkey, s_suppkey
),
totals AS (
  SELECT n_regionkey, cast(sum(rev_cents) as bigint) AS total_cents
  FROM rev GROUP BY n_regionkey
)
SELECT rev.n_regionkey AS n_regionkey,
       cast(sum((rev_cents * 10000 // total_cents) * (rev_cents * 10000 // total_cents)) as bigint) AS hhi,
       count(*) AS n_suppliers
FROM rev JOIN totals ON rev.n_regionkey = totals.n_regionkey
GROUP BY rev.n_regionkey ORDER BY n_regionkey
"""

# --------------------------------------------------------------------
# segment_priority_chi2 — chi-square independence scan between customer
# segment and order priority: the feature-selection / drift test for
# categorical pairs. Contribution per cell = (O·T − R·C)² / (R·C·T) —
# numerator exact integer, denominators exact integers, ONE float
# division at the end per cell: engine-identical. Cell grain only.


def _segment_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    rows = cells.groupBy("c_mktsegment").agg(F.sum("obs").alias("row_n"))
    cols = cells.groupBy("o_orderpriority").agg(F.sum("obs").alias("col_n"))
    total = cells.agg(F.sum("obs").alias("t"))
    return (
        cells.join(F.broadcast(rows), "c_mktsegment")
        .join(F.broadcast(cols), "o_orderpriority")
        .join(F.broadcast(total))
        .select(
            "c_mktsegment",
            "o_orderpriority",
            "obs",
            F.expr(
                "cast(floor((obs * t - row_n * col_n) * (obs * t - row_n * col_n) "
                "/ (cast(row_n as double) * col_n * t) * 1e6 + 0.5) as bigint)"
            ).alias("contrib_micro"),
        )
        .orderBy("c_mktsegment", "o_orderpriority")
    )


_CHI2_ORACLE = """
WITH cells AS (
  SELECT c_mktsegment, o_orderpriority, count(*) AS obs
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment, o_orderpriority
),
rows_n AS (SELECT c_mktsegment, cast(sum(obs) as bigint) AS row_n FROM cells GROUP BY c_mktsegment),
cols_n AS (SELECT o_orderpriority, cast(sum(obs) as bigint) AS col_n FROM cells GROUP BY o_orderpriority),
total AS (SELECT cast(sum(obs) as bigint) AS t FROM cells)
SELECT c_mktsegment, o_orderpriority, obs,
       cast(floor((obs * t - row_n * col_n) * (obs * t - row_n * col_n)
         / (cast(row_n as double) * col_n * t) * 1e6 + 0.5) as bigint) AS contrib_micro
FROM cells
JOIN rows_n USING (c_mktsegment)
JOIN cols_n USING (o_orderpriority)
CROSS JOIN total
ORDER BY c_mktsegment, o_orderpriority
"""


# --------------------------------------------------------------------
# session_funnel — the view→click→purchase funnel REQUIRED to complete
# within one session (the strict-attribution variant of funnel_counts,
# whose window is the whole history): sessions from the standard
# gaps-and-islands pass, then ordered conditional first-occurrence
# minimums INSIDE each session — no per-stage self-joins. Session-grain
# aggregate → 1-row report.


def _session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    marked = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.expr(
            "CASE WHEN lag(ts) over (partition by user_id order by ts, event_id) IS NULL "
            "OR unix_micros(ts) - unix_micros(lag(ts) over "
            "(partition by user_id order by ts, event_id)) > 30 * 60 * 1000000 "
            "THEN 1 ELSE 0 END"
        ).alias("new_s"),
    )
    sess = marked.withColumn(
        "sid",
        F.expr(
            "sum(new_s) over (partition by user_id order by ts "
            "rows between unbounded preceding and current row)"
        ),
    )
    stages = sess.groupBy("user_id", "sid").agg(
        F.min(F.expr("CASE WHEN event_type = 'view' THEN ts END")).alias("t_view"),
        F.min(F.expr("CASE WHEN event_type = 'click' THEN ts END")).alias("t_click"),
        F.min(F.expr("CASE WHEN event_type = 'purchase' THEN ts END")).alias("t_buy"),
    )
    return stages.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.expr("CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END")).alias(
            "n_view"
        ),
        F.sum(
            F.expr(
                "CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END"
            )
        ).alias("n_view_click"),
        F.sum(
            F.expr(
                "CASE WHEN t_view IS NOT NULL AND t_click > t_view "
                "AND t_buy > t_click THEN 1 ELSE 0 END"
            )
        ).alias("n_view_click_buy"),
    )


_SFUN_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, event_type,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                   > 30 * 60 * 1000000
              THEN 1 ELSE 0 END AS new_s
  FROM events
),
sess AS (
  SELECT user_id, ts, event_type,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
),
stages AS (
  SELECT user_id, sid,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
  FROM sess GROUP BY user_id, sid
)
SELECT count(*) AS n_sessions,
       cast(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) as bigint) AS n_view,
       cast(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view THEN 1 ELSE 0 END) as bigint) AS n_view_click,
       cast(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view AND t_buy > t_click THEN 1 ELSE 0 END) as bigint) AS n_view_click_buy
FROM stages
"""

# --------------------------------------------------------------------
# weekly_seasonality — STL-lite additive decomposition of daily revenue:
# trend = centered 7-day moving sum DIV 7 (integer cents), seasonal =
# day-of-week mean of the detrended series (integer DIV), residual =
# the exact remainder. The forecasting pre-pass, all integer arithmetic
# so the decomposition is hash-exact. Day-grain frames only; interior
# days only (full 7-day window) so the trend is never edge-biased.


def _weekly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderdate", "o_totalprice")
    daily = orders.groupBy(
        F.expr("cast(o_orderdate as date)").alias("day")
    ).agg(
        F.expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))").alias(
            "rev_cents"
        )
    )
    trended = daily.select(
        "day",
        "rev_cents",
        F.expr(
            "CASE WHEN count(1) over (order by day rows between 3 preceding and 3 following) = 7 "
            "THEN sum(rev_cents) over (order by day rows between 3 preceding and 3 following) DIV 7 "
            "END"
        ).alias("trend_cents"),
    ).filter("trend_cents IS NOT NULL")
    seasonal = (
        trended.select(
            "day",
            "rev_cents",
            "trend_cents",
            F.expr("dayofweek(day)").alias("dow"),
            F.expr("rev_cents - trend_cents").alias("detr"),
        )
        .withColumn(
            "seasonal_cents",
            F.expr(
                "sum(detr) over (partition by dow) DIV count(1) over (partition by dow)"
            ),
        )
    )
    return seasonal.select(
        "day",
        "rev_cents",
        "trend_cents",
        "seasonal_cents",
        F.expr("rev_cents - trend_cents - seasonal_cents").alias("residual_cents"),
    ).orderBy("day")


_SEAS_ORACLE = """
WITH daily AS (
  SELECT cast(o_orderdate as date) AS day,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) as bigint) AS rev_cents
  FROM orders GROUP BY cast(o_orderdate as date)
),
trended AS (
  SELECT day, rev_cents,
         CASE WHEN count(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) = 7
              THEN cast(sum(rev_cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) // 7 as bigint)
         END AS trend_cents
  FROM daily
),
seasonal AS (
  SELECT day, rev_cents, trend_cents,
         dayofweek(day) + 1 AS dow,
         rev_cents - trend_cents AS detr
  FROM trended WHERE trend_cents IS NOT NULL
)
SELECT day, rev_cents, trend_cents,
       cast(sum(detr) OVER (PARTITION BY dow) // (count(*) OVER (PARTITION BY dow)) as bigint) AS seasonal_cents,
       rev_cents - trend_cents
         - cast(sum(detr) OVER (PARTITION BY dow) // (count(*) OVER (PARTITION BY dow)) as bigint) AS residual_cents
FROM seasonal ORDER BY day
"""

# --------------------------------------------------------------------
# mom_revenue_growth — month-over-month revenue growth per nation in
# exact basis points (lag + truncating DIV): the growth-reporting shape
# every BI layer ships. Month-grain frames after one fact aggregate.


def _mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    monthly = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "c_nationkey",
            F.expr("year(o_orderdate) * 100 + month(o_orderdate)").alias("ym"),
        )
        .agg(
            F.expr("sum(cast(floor(o_totalprice * 100 + 0.5) as bigint))").alias(
                "rev_cents"
            )
        )
    )
    return (
        monthly.select(
            "c_nationkey",
            "ym",
            "rev_cents",
            F.expr(
                "lag(rev_cents) over (partition by c_nationkey order by ym)"
            ).alias("prev_cents"),
        )
        .filter("prev_cents IS NOT NULL AND prev_cents > 0")
        .select(
            "c_nationkey",
            "ym",
            "rev_cents",
            F.expr(
                "(rev_cents - prev_cents) * 10000 DIV prev_cents"
            ).alias("growth_bp"),
        )
        .orderBy("c_nationkey", "ym")
    )


_MOM_ORACLE = """
WITH monthly AS (
  SELECT c_nationkey, year(o_orderdate) * 100 + month(o_orderdate) AS ym,
         cast(sum(cast(floor(o_totalprice * 100 + 0.5) as bigint)) as bigint) AS rev_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, year(o_orderdate) * 100 + month(o_orderdate)
),
lagged AS (
  SELECT c_nationkey, ym, rev_cents,
         lag(rev_cents) OVER (PARTITION BY c_nationkey ORDER BY ym) AS prev_cents
  FROM monthly
)
SELECT c_nationkey, ym, rev_cents,
       (rev_cents - prev_cents) * 10000 // prev_cents AS growth_bp
FROM lagged WHERE prev_cents IS NOT NULL AND prev_cents > 0
ORDER BY c_nationkey, ym
"""

# --------------------------------------------------------------------
# event_volume_control_chart — XmR (individuals / moving-range) control
# chart over daily event volume per type: mean count, mean |moving
# range|, and the out-of-control days beyond mean ± 2.66·MR̄ (the SPC
# constant, applied as an exact integer comparison: |x−x̄|·1000·n_mr
# vs 2660·ΣMR·n — no float division at all). The ops-monitoring shape.


def _event_volume_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type")
    daily = ev.groupBy(
        "event_type", F.expr("cast(ts as date)").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    with_mr = daily.select(
        "event_type",
        "day",
        "n",
        F.expr(
            "abs(n - lag(n) over (partition by event_type order by day))"
        ).alias("mr"),
    )
    stats = with_mr.groupBy("event_type").agg(
        F.sum("n").alias("sum_n"),
        F.count("n").alias("cnt"),
        F.sum("mr").alias("sum_mr"),
        F.count("mr").alias("cnt_mr"),
    )
    # out-of-control: |x - mean| > 2.66 * mean_mr, cross-multiplied to
    # integers: |x*cnt - sum_n| * 1000 * cnt_mr > 2660 * sum_mr * cnt
    return (
        with_mr.join(F.broadcast(stats), "event_type")
        .filter(
            "mr IS NOT NULL AND "
            "abs(n * cnt - sum_n) * 1000 * cnt_mr > 2660 * sum_mr * cnt"
        )
        .select(
            "event_type",
            "day",
            "n",
            F.expr("sum_n DIV cnt").alias("mean_n"),
            F.expr("CASE WHEN cnt_mr > 0 THEN sum_mr DIV cnt_mr END").alias(
                "mean_mr"
            ),
        )
        .orderBy("event_type", "day")
    )


_XMR_ORACLE = """
WITH daily AS (
  SELECT event_type, cast(ts as date) AS day, count(*) AS n
  FROM events GROUP BY event_type, cast(ts as date)
),
with_mr AS (
  SELECT event_type, day, n,
         abs(n - lag(n) OVER (PARTITION BY event_type ORDER BY day)) AS mr
  FROM daily
),
stats AS (
  SELECT event_type,
         cast(sum(n) as bigint) AS sum_n, count(n) AS cnt,
         cast(sum(mr) as bigint) AS sum_mr, count(mr) AS cnt_mr
  FROM with_mr GROUP BY event_type
)
SELECT w.event_type AS event_type, day, n,
       sum_n // cnt AS mean_n,
       CASE WHEN cnt_mr > 0 THEN sum_mr // cnt_mr END AS mean_mr
FROM with_mr w JOIN stats s ON w.event_type = s.event_type
WHERE mr IS NOT NULL
  AND abs(n * cnt - sum_n) * 1000 * cnt_mr > 2660 * sum_mr * cnt
ORDER BY event_type, day
"""

# --------------------------------------------------------------------
# price_iqr_fences — Tukey-fence outlier census per order priority:
# exact p25/p75 on integer cents (interpolated percentiles of integers
# are exact dyadic/quarter fractions — engine-identical doubles),
# fences at ±1.5·IQR, and the count + share of orders outside. The
# box-plot/outlier-gate shape feature pipelines run per segment.


def _price_iqr_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    cents = orders.select(
        "o_orderpriority",
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias("cents"),
    )
    q = cents.groupBy("o_orderpriority").agg(
        F.expr("percentile(cents, 0.25)").alias("q1"),
        F.expr("percentile(cents, 0.75)").alias("q3"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return (
        cents.join(F.broadcast(q), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.max("n_orders").alias("n_orders"),
            F.max(F.expr("q1 - 1.5 * (q3 - q1)")).alias("lo_fence"),
            F.max(F.expr("q3 + 1.5 * (q3 - q1)")).alias("hi_fence"),
            F.sum(
                F.expr(
                    "CASE WHEN cents < q1 - 1.5 * (q3 - q1) "
                    "OR cents > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END"
                )
            ).alias("n_outliers"),
        )
        .withColumn(
            "outlier_bp", F.expr("n_outliers * 10000 DIV n_orders")
        )
        .orderBy("o_orderpriority")
    )


_IQR_ORACLE = """
WITH cents AS (
  SELECT o_orderpriority,
         cast(floor(o_totalprice * 100 + 0.5) as bigint) AS cents
  FROM orders
),
q AS (
  SELECT o_orderpriority,
         quantile_cont(cents, 0.25) AS q1,
         quantile_cont(cents, 0.75) AS q3,
         count(*) AS n_orders
  FROM cents GROUP BY o_orderpriority
)
SELECT c.o_orderpriority AS o_orderpriority,
       max(n_orders) AS n_orders,
       max(q1 - 1.5 * (q3 - q1)) AS lo_fence,
       max(q3 + 1.5 * (q3 - q1)) AS hi_fence,
       cast(sum(CASE WHEN cents < q1 - 1.5 * (q3 - q1)
                      OR cents > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) as bigint) AS n_outliers,
       cast(sum(CASE WHEN cents < q1 - 1.5 * (q3 - q1)
                      OR cents > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) * 10000
            // max(n_orders) as bigint) AS outlier_bp
FROM cents c JOIN q ON c.o_orderpriority = q.o_orderpriority
GROUP BY c.o_orderpriority ORDER BY o_orderpriority
"""


SUITE: dict[str, QuerySpec] = {
    "semantic_dedup_capped": QuerySpec(
        "semantic_dedup_capped",
        _semantic_dedup_capped,
        similarity.cosine_dedup_capped_sql(_CAP),
        "degree-bounded SRP-LSH cosine near-dup pairs (linear candidate volume)",
    ),
    "discount_elimination_revenue": QuerySpec(
        "discount_elimination_revenue",
        _discount_elimination_revenue,
        _Q6_ORACLE,
        "TPC-H Q6: scan-local predicate stack + one quantized-sum aggregate",
    ),
    "brand_lift_rules": QuerySpec(
        "brand_lift_rules",
        _brand_lift_rules,
        _LIFT_ORACLE,
        "association rules: support/confidence/lift in exact basis points",
    ),
    "ngram_containment_pairs": QuerySpec(
        "ngram_containment_pairs",
        _ngram_containment_pairs,
        _CONT_ORACLE,
        "asymmetric containment pairs (near-superset dedup axis)",
    ),
    "doc_tf_cosine_pairs": QuerySpec(
        "doc_tf_cosine_pairs",
        _doc_tf_cosine_pairs,
        _TFC_ORACLE,
        "sparse TF cosine pairs via inverted index (lexical similarity tier)",
    ),
    "theil_sen_nation_trend": QuerySpec(
        "theil_sen_nation_trend",
        _theil_sen_nation_trend,
        _TS_ORACLE,
        "robust Theil-Sen monthly revenue trend per nation (bounded pairwise slopes)",
    ),
    "position_attribution": QuerySpec(
        "position_attribution",
        _position_attribution,
        _ATTR_ORACLE,
        "U-shaped 40/20/40 multi-touch attribution in exact basis points",
    ),
    "bounce_dwell_report": QuerySpec(
        "bounce_dwell_report",
        _bounce_dwell_report,
        _BD_ORACLE,
        "per-day session quality: bounces, bounce rate bp, dwell seconds",
    ),
    "rolling_7d_actives": QuerySpec(
        "rolling_7d_actives",
        _rolling_7d_actives,
        _R7_ORACLE,
        "exact trailing-7-day distinct users via explode (no theta join)",
    ),
    "supplier_balance_percentile": QuerySpec(
        "supplier_balance_percentile",
        _supplier_balance_percentile,
        _PCT_ORACLE,
        "within-nation percent-rank position in integer bp",
    ),
    "curriculum_shards": QuerySpec(
        "curriculum_shards",
        _curriculum_shards,
        _CUR_ORACLE,
        "curriculum-ordered fixed-token-budget training shards",
    ),
    "l_diversity_audit": QuerySpec(
        "l_diversity_audit",
        _l_diversity_audit,
        _LDIV_ORACLE,
        "l-diversity privacy audit: QI groups with too-uniform sensitive values",
    ),
    "brand_price_ties": QuerySpec(
        "brand_price_ties",
        _brand_price_ties,
        _TIES_ORACLE,
        "dense_rank top-3 with ties (rank-semantics counterpart of row_number)",
    ),
    "balance_gap_to_leader": QuerySpec(
        "balance_gap_to_leader",
        _balance_gap_to_leader,
        _GAP_ORACLE,
        "first_value/lag leaderboard deltas per nation in exact cents",
    ),
    "grouping_id_report": QuerySpec(
        "grouping_id_report",
        _grouping_id_report,
        _GSETS_ORACLE,
        "explicit GROUPING SETS with grouping() subtotal flags",
    ),
    "nation_top3_brand_bundle": QuerySpec(
        "nation_top3_brand_bundle",
        _nation_top3_brand_bundle,
        _BUNDLE_ORACLE,
        "collect/sort/slice array aggregation into an ordered bundle string",
    ),
    "dup_key_audit": QuerySpec(
        "dup_key_audit",
        _dup_key_audit,
        _DUPKEY_ORACLE,
        "duplicate-business-key audit (same customer+day multi-orders)",
    ),
    "conversion_hazard_table": QuerySpec(
        "conversion_hazard_table",
        _conversion_hazard_table,
        _HAZARD_ORACLE,
        "discrete-time survival (KM input): at-risk, conversions, hazard bp per day lag",
    ),
    "template_prefix_groups": QuerySpec(
        "template_prefix_groups",
        _template_prefix_groups,
        _TPL_ORACLE,
        "boilerplate detection: identical-prefix template groups",
    ),
    "zipf_rank_table": QuerySpec(
        "zipf_rank_table",
        _zipf_rank_table,
        _ZIPF_ORACLE,
        "Zipf diagnostic: top-100 token ranks with rank*freq",
    ),
    "nonalpha_noise_score": QuerySpec(
        "nonalpha_noise_score",
        _nonalpha_noise_score,
        _NOISE_ORACLE,
        "OCR/mojibake noise score in bp; top-50 noisiest docs",
    ),
    "power_users_pareto": QuerySpec(
        "power_users_pareto",
        _power_users_pareto,
        _PARETO_ORACLE,
        "cumulative event-share concentration curve at decile marks",
    ),
    "inter_event_gap_histogram": QuerySpec(
        "inter_event_gap_histogram",
        _inter_event_gap_histogram,
        _GAPH_ORACLE,
        "log2-bucketed inter-event gap histogram (integer bit-length buckets)",
    ),
    "discount_quantity_corr": QuerySpec(
        "discount_quantity_corr",
        _discount_quantity_corr,
        _CORR_ORACLE,
        "exact-moment Pearson correlation per brand in quantized bp",
    ),
    "regional_hhi": QuerySpec(
        "regional_hhi",
        _regional_hhi,
        _HHI_ORACLE,
        "Herfindahl concentration index per region (exact bp shares)",
    ),
    "segment_priority_chi2": QuerySpec(
        "segment_priority_chi2",
        _segment_priority_chi2,
        _CHI2_ORACLE,
        "chi-square independence cell contributions (exact-integer moments)",
    ),
    "session_funnel": QuerySpec(
        "session_funnel",
        _session_funnel,
        _SFUN_ORACLE,
        "strict within-session view->click->purchase funnel (no self-joins)",
    ),
    "weekly_seasonality": QuerySpec(
        "weekly_seasonality",
        _weekly_seasonality,
        _SEAS_ORACLE,
        "STL-lite additive decomposition: trend/seasonal/residual in exact cents",
    ),
    "mom_revenue_growth": QuerySpec(
        "mom_revenue_growth",
        _mom_revenue_growth,
        _MOM_ORACLE,
        "month-over-month growth per nation in exact basis points",
    ),
    "event_volume_control_chart": QuerySpec(
        "event_volume_control_chart",
        _event_volume_control_chart,
        _XMR_ORACLE,
        "XmR control chart: out-of-control days by cross-multiplied integer test",
    ),
    "price_iqr_fences": QuerySpec(
        "price_iqr_fences",
        _price_iqr_fences,
        _IQR_ORACLE,
        "Tukey IQR outlier fences + outlier share per priority",
    ),
}
