"""Round-15 queries: spend concentration and RFM segmentation.

- ``nation_spend_gini`` — exact Gini coefficient of customer spend per
  nation, from the rank formula G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx)
  over ascending spend ranks. All sums are int64 (spend in cents); the
  final ratio is quantized by the two-step truncating division both
  engines compute identically (numerator DIV (denominator DIV SCALE)),
  the same discipline as acf_daily. The concentration audit a sampling
  pipeline runs before trusting per-group quotas — a nation where one
  customer is 90% of spend needs different treatment than a uniform
  one (companion to key_skew_stats, which sees only row counts).
- ``rfm_segments`` — the classic Recency/Frequency/Monetary quartile
  coding, computed WITHIN nation (partitioned ntile windows — no
  global single-partition sort; within-group quartiles are also the
  analytically right comparison set). Output is the census of
  3-digit RFM codes.

Reference parity: none (intel-ai/timedf has no inequality or
segmentation surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# nation_spend_gini

_GINI_SCALE = 1_000_000


def nation_spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("x"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_nationkey", "o_custkey", "x")
    )
    w = Window.partitionBy("c_nationkey").orderBy("x", "o_custkey")
    ranked = spend.withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("x").alias("_s"),
            F.sum(F.col("i") * F.col("x")).alias("_ix"),
        )
        .select(
            "c_nationkey",
            "n_customers",
            F.expr(
                f"(2 * _ix - (n_customers + 1) * _s) "
                f"DIV greatest((n_customers * _s) DIV {_GINI_SCALE}, 1)"
            ).alias("gini_scaled"),
        )
        .orderBy("c_nationkey")
    )


_GINI_ORACLE = f"""
WITH spend AS (
  SELECT c_nationkey, o_custkey,
         cast(sum(cast(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS x
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
), ranked AS (
  SELECT c_nationkey, x,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY x, o_custkey) AS i
  FROM spend
)
SELECT c_nationkey, count(*) AS n_customers,
       cast((2 * sum(i * x) - (count(*) + 1) * sum(x))
            // greatest((count(*) * sum(x)) // {_GINI_SCALE}, 1) AS BIGINT)
         AS gini_scaled
FROM ranked GROUP BY c_nationkey ORDER BY c_nationkey
"""

# --------------------------------------------------------------------
# rfm_segments


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-nation RFM quartiles: recency (days since the customer's
    last order, global anchor date from a 1-row broadcast), frequency
    (order count), monetary (spend cents). Code = R*100 + F*10 + M with
    quartile 4 best; census per code."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("_last"),
            F.count(F.lit(1)).alias("_f"),
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("_m"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    anchor = orders.agg(F.max("o_orderdate").alias("_anchor"))
    per = per.join(F.broadcast(anchor)).withColumn(
        "_r_days", F.datediff("_anchor", "_last").cast("long")
    )
    # quartile 4 = best: most recent (smallest _r_days), most frequent,
    # highest spend — so recency orders DESC by staleness.
    nt = lambda order: F.ntile(4).over(  # noqa: E731
        Window.partitionBy("c_nationkey").orderBy(*order)
    ).cast("long")
    coded = (
        per.withColumn("_rq", nt([F.desc("_r_days"), F.asc("o_custkey")]))
        .withColumn("_fq", nt([F.asc("_f"), F.asc("o_custkey")]))
        .withColumn("_mq", nt([F.asc("_m"), F.asc("o_custkey")]))
        .withColumn("rfm_code", F.expr("_rq * 100 + _fq * 10 + _mq"))
    )
    return (
        coded.groupBy("rfm_code")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("rfm_code")
    )


_RFM_ORACLE = """
WITH per AS (
  SELECT c_nationkey, o_custkey,
         max(o_orderdate) AS last_o,
         count(*) AS f,
         cast(sum(cast(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS m
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_nationkey, o_custkey
), anchor AS (
  SELECT max(o_orderdate) AS a FROM orders
), coded AS (
  SELECT
    ntile(4) OVER (PARTITION BY c_nationkey
                   ORDER BY datediff('day', last_o, a) DESC, o_custkey) * 100
    + ntile(4) OVER (PARTITION BY c_nationkey ORDER BY f, o_custkey) * 10
    + ntile(4) OVER (PARTITION BY c_nationkey ORDER BY m, o_custkey)
      AS rfm_code
  FROM per CROSS JOIN anchor
)
SELECT cast(rfm_code AS BIGINT) AS rfm_code, count(*) AS n_customers
FROM coded GROUP BY rfm_code ORDER BY rfm_code
"""

# --------------------------------------------------------------------

SUITE = {
    "nation_spend_gini": QuerySpec(
        "nation_spend_gini",
        nation_spend_gini,
        _GINI_ORACLE,
        "exact rank-formula Gini per nation, integer sums, two-step truncating quantization",
    ),
    "rfm_segments": QuerySpec(
        "rfm_segments",
        rfm_segments,
        _RFM_ORACLE,
        "within-nation RFM quartile coding (partitioned ntile, no global sort); code census",
    ),
}
