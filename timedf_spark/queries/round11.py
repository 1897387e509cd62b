"""Round-11 queries: planner statistics, link analysis, multi-objective
selection, and exact time-series diagnostics.

Six operators a curation/planning layer needs that none of the earlier
suites cover:

- ``join_size_report`` — exact join-output cardinality WITHOUT running
  the join (sum over keys of count products), the statistic a
  cost-based planner estimates and a pipeline author uses to predict
  shuffle volume before committing to a 100 TB join.
- ``supplier_affinity_links`` — Resource-Allocation link prediction
  over the customer→supplier incidence graph (operators/linkpred.py).
- ``part_skyline`` — exact 2-D Pareto skyline, cheap-AND-large parts
  (operators/skyline.py); oracle is an independent NOT-EXISTS
  dominance formulation, so the bucket-pruned distributed plan is
  checked against the textbook definition.
- ``ewma_user_trend`` — per-user truncated exponentially-weighted
  moving average with dyadic weights (alpha=1/2, 8 lags) on quantized
  values: exact int64, no float accumulation drift.
- ``cusum_changepoint`` — per-series CUSUM changepoint (Page 1954)
  with the mean multiplied through: S_t = n·prefix_t − t·total is
  integer-exact (bound at sf10: 2e6·1.1e12 ≈ 2e18 < int64 max;
  re-quantize or re-group beyond that).
- ``rank_fusion_customers`` — Reciprocal Rank Fusion (Cormack et al.
  SIGIR'09) of two top-K customer rankings, the hybrid-retrieval merge
  (BM25 ∪ ANN) expressed engine-level: distributed TakeOrdered per
  signal, tiny-frame ranking, full-outer fuse with truncating-division
  reciprocal terms so the score is exact int64.

Reference parity: none of these exist in intel-ai/timedf (pandas-API
benchmark harness); they extend the engine per the large-scale
training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.operators.linkpred import (
    resource_allocation_pairs,
    resource_allocation_sql,
)
from timedf_spark.operators.skyline import skyline_2d
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# join_size_report


def join_size_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact |A JOIN B| per candidate join from per-key count frames:
    Σ_k c_A(k)·c_B(k). The key-count aggregates shuffle only distinct
    keys (not rows), so the report costs a fraction of the joins it
    sizes — the planner-statistics move for choosing join order and
    shuffle partitioning before touching 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    part = load_table(spark, sf_dir, "part")

    def est(name: str, left: DataFrame, lk: str, right: DataFrame, rk: str) -> DataFrame:
        lc = left.groupBy(F.col(lk).alias("k")).agg(F.count(F.lit(1)).alias("cl"))
        rc = right.groupBy(F.col(rk).alias("k")).agg(F.count(F.lit(1)).alias("cr"))
        return (
            lc.join(rc, "k")
            .agg(
                F.sum(F.col("cl") * F.col("cr")).alias("join_rows"),
                F.count(F.lit(1)).alias("matched_keys"),
            )
            .select(F.lit(name).alias("join_name"), "join_rows", "matched_keys")
        )

    out = (
        est("lineitem_orders", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(est("orders_customer", orders, "o_custkey", cust, "c_custkey"))
        .unionAll(est("lineitem_part", li, "l_partkey", part, "p_partkey"))
    )
    return out.orderBy("join_name")


_JOIN_SIZE_ORACLE = """
WITH est AS (
  SELECT 'lineitem_orders' AS join_name,
         cast(sum(cl * cr) AS BIGINT) AS join_rows,
         count(*) AS matched_keys
  FROM (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem GROUP BY 1) a
  JOIN (SELECT o_orderkey AS k, count(*) AS cr FROM orders GROUP BY 1) b USING (k)
  UNION ALL
  SELECT 'orders_customer',
         cast(sum(cl * cr) AS BIGINT), count(*)
  FROM (SELECT o_custkey AS k, count(*) AS cl FROM orders GROUP BY 1) a
  JOIN (SELECT c_custkey AS k, count(*) AS cr FROM customer GROUP BY 1) b USING (k)
  UNION ALL
  SELECT 'lineitem_part',
         cast(sum(cl * cr) AS BIGINT), count(*)
  FROM (SELECT l_partkey AS k, count(*) AS cl FROM lineitem GROUP BY 1) a
  JOIN (SELECT p_partkey AS k, count(*) AS cr FROM part GROUP BY 1) b USING (k)
)
SELECT join_name, join_rows, matched_keys FROM est ORDER BY join_name
"""

# --------------------------------------------------------------------
# supplier_affinity_links

_RA_MAX_DEG = 50
_RA_MIN_COMMON = 3
_RA_TOPN = 25

_RA_EDGES_SQL = (
    "SELECT o_custkey AS _c, l_suppkey AS _n "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
)


def supplier_affinity_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier pairs by Resource-Allocation score over shared
    customers — 'these two suppliers serve the same rare demand', the
    link-prediction primitive for seed expansion on curation graphs."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_custkey", "l_suppkey"
    )
    ra = resource_allocation_pairs(
        edges,
        neighbor="o_custkey",
        node="l_suppkey",
        max_degree=_RA_MAX_DEG,
        min_common=_RA_MIN_COMMON,
    )
    return (
        ra.select(
            F.col("n1").alias("s1"), F.col("n2").alias("s2"), "common", "ra_scaled"
        )
        .orderBy(F.desc("ra_scaled"), F.desc("common"), "s1", "s2")
        .limit(_RA_TOPN)
    )


_RA_ORACLE = f"""
SELECT n1 AS s1, n2 AS s2, common, ra_scaled
FROM ({resource_allocation_sql(_RA_EDGES_SQL, max_degree=_RA_MAX_DEG, min_common=_RA_MIN_COMMON)})
ORDER BY ra_scaled DESC, common DESC, s1, s2
LIMIT {_RA_TOPN}
"""

# --------------------------------------------------------------------
# part_skyline


def part_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (min price, max size) Pareto frontier. The Spark
    side runs the bucket-pruned distributed skyline; the oracle is the
    quadratic NOT-EXISTS dominance definition — an independent
    formulation, so this checks the pruning logic itself."""
    part = load_table(spark, sf_dir, "part")
    pairs = skyline_2d(part, "p_retailprice", "p_size")
    return (
        part.join(F.broadcast(pairs), ["p_retailprice", "p_size"])
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")
    )


_SKYLINE_ORACLE = """
SELECT p.p_partkey, p.p_retailprice, p.p_size
FROM part p
WHERE NOT EXISTS (
  SELECT 1 FROM part q
  WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
    AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
)
ORDER BY p.p_retailprice, p.p_partkey
"""

# --------------------------------------------------------------------
# ewma_user_trend

_EWMA_LAGS = 8
_EWMA_TOPN = 100


def ewma_user_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user truncated EWMA (alpha=1/2, 8 lags) of quantized event
    values at each user's latest event. Dyadic weights 2^(7-j) keep the
    whole computation in int64 — exact, no float summation-order drift.
    One partitioned window shuffle; scales with users, not history."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    df = ev.withColumn("_vq", F.floor(F.col("value") * 1000).cast("long"))
    ewma = F.col("_vq") * F.lit(2 ** (_EWMA_LAGS - 1))
    for j in range(1, _EWMA_LAGS):
        ewma = ewma + F.lag("_vq", j).over(w) * F.lit(2 ** (_EWMA_LAGS - 1 - j))
    wd = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_rnd", F.row_number().over(wd))
        .withColumn("ewma_scaled", ewma)
        .where((F.col("_rnd") == 1) & (F.col("_rn") >= _EWMA_LAGS))
    )
    return (
        out.select("user_id", "ewma_scaled")
        .orderBy(F.desc("ewma_scaled"), "user_id")
        .limit(_EWMA_TOPN)
    )


def _ewma_oracle() -> str:
    terms = " + ".join(
        f"lag(vq, {j}) OVER w * {2 ** (_EWMA_LAGS - 1 - j)}"
        for j in range(_EWMA_LAGS)
    )
    return f"""
WITH b AS (
  SELECT user_id, ts, event_id,
         cast(floor(value * 1000) AS BIGINT) AS vq
  FROM events
), e AS (
  SELECT user_id,
         row_number() OVER w AS rn,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rnd,
         cast({terms} AS BIGINT) AS ewma_scaled
  FROM b
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, ewma_scaled FROM e
WHERE rnd = 1 AND rn >= {_EWMA_LAGS}
ORDER BY ewma_scaled DESC, user_id
LIMIT {_EWMA_TOPN}
"""

# --------------------------------------------------------------------
# cusum_changepoint


def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type CUSUM changepoint: the index t maximizing
    |n·prefix_t − t·total| (the group mean multiplied through, so the
    statistic is exact int64 — no float mean). The classical
    single-changepoint location estimate; at sf0.1 the bound is
    ~2e14 ≪ int64, at sf10 ~2e18 (still under; re-quantize beyond)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    wall = Window.partitionBy("event_type")
    df = (
        ev.withColumn("_vq", F.floor(F.col("value") * 1000).cast("long"))
        .withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "_pre", F.sum("_vq").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("_n", F.count(F.lit(1)).over(wall))
        .withColumn("_tot", F.sum("_vq").over(wall))
    )
    s_abs = F.abs(F.col("_n") * F.col("_pre") - F.col("_rn") * F.col("_tot"))
    pick = Window.partitionBy("event_type").orderBy(F.desc("_s_abs"), F.asc("_rn"))
    return (
        df.withColumn("_s_abs", s_abs)
        .withColumn("_pk", F.row_number().over(pick))
        .where(F.col("_pk") == 1)
        .select(
            "event_type",
            F.col("_rn").cast("long").alias("cp_index"),
            F.col("_s_abs").alias("cusum_abs_scaled"),
        )
        .orderBy("event_type")
    )


_CUSUM_ORACLE = """
WITH b AS (
  SELECT event_type, ts, event_id,
         cast(floor(value * 1000) AS BIGINT) AS vq
  FROM events
), s AS (
  SELECT event_type,
         row_number() OVER w AS rn,
         sum(vq) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pre,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(vq) OVER (PARTITION BY event_type) AS tot
  FROM b
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
), scored AS (
  SELECT event_type, rn,
         abs(n * pre - rn * tot) AS s_abs,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY abs(n * pre - rn * tot) DESC, rn ASC) AS pk
  FROM s
)
SELECT event_type, cast(rn AS BIGINT) AS cp_index,
       cast(s_abs AS BIGINT) AS cusum_abs_scaled
FROM scored WHERE pk = 1 ORDER BY event_type
"""

# --------------------------------------------------------------------
# rank_fusion_customers

_RRF_K = 60
_RRF_SCALE = 10**12
_RRF_SIGNAL_TOPK = 500
_RRF_TOPN = 100


def rank_fusion_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion of two customer rankings (total spend in
    cents; order count). Each signal's top-K comes from a distributed
    TakeOrdered — no global-rank single-partition window over the full
    set — then ranks are assigned on the K-row frame and fused with
    truncating-division reciprocal terms (exact int64 both engines).
    Customers absent from a list contribute 0 for it, standard RRF."""
    orders = load_table(spark, sf_dir, "orders")
    per = orders.groupBy("o_custkey").agg(
        F.sum(F.floor(F.col("o_totalprice") * 100).cast("long")).alias("spend_c"),
        F.count(F.lit(1)).alias("n_orders"),
    )

    def top_ranked(order_cols, rank_name: str) -> DataFrame:
        topk = per.orderBy(*order_cols).limit(_RRF_SIGNAL_TOPK)
        w = Window.orderBy(*order_cols)  # K rows: single partition is fine
        return topk.withColumn(rank_name, F.row_number().over(w).cast("long")).select(
            "o_custkey", rank_name
        )

    ta = top_ranked([F.desc("spend_c"), F.asc("o_custkey")], "r_spend")
    tb = top_ranked([F.desc("n_orders"), F.asc("o_custkey")], "r_orders")
    fused = ta.join(tb, "o_custkey", "full_outer")
    term = lambda c: F.coalesce(  # noqa: E731
        F.expr(f"{_RRF_SCALE} DIV ({_RRF_K} + {c})"), F.lit(0).cast("long")
    )
    return (
        fused.select(
            "o_custkey",
            "r_spend",
            "r_orders",
            (term("r_spend") + term("r_orders")).alias("rrf_scaled"),
        )
        .orderBy(F.desc("rrf_scaled"), "o_custkey")
        .limit(_RRF_TOPN)
    )


_RRF_ORACLE = f"""
WITH per AS (
  SELECT o_custkey,
         cast(sum(cast(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_c,
         count(*) AS n_orders
  FROM orders GROUP BY o_custkey
), ta AS (
  SELECT o_custkey,
         row_number() OVER (ORDER BY spend_c DESC, o_custkey) AS r_spend
  FROM per ORDER BY spend_c DESC, o_custkey LIMIT {_RRF_SIGNAL_TOPK}
), tb AS (
  SELECT o_custkey,
         row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS r_orders
  FROM per ORDER BY n_orders DESC, o_custkey LIMIT {_RRF_SIGNAL_TOPK}
)
SELECT coalesce(ta.o_custkey, tb.o_custkey) AS o_custkey,
       ta.r_spend, tb.r_orders,
       cast(coalesce({_RRF_SCALE} // ({_RRF_K} + ta.r_spend), 0)
          + coalesce({_RRF_SCALE} // ({_RRF_K} + tb.r_orders), 0) AS BIGINT)
         AS rrf_scaled
FROM ta FULL OUTER JOIN tb ON ta.o_custkey = tb.o_custkey
ORDER BY rrf_scaled DESC, o_custkey
LIMIT {_RRF_TOPN}
"""

# --------------------------------------------------------------------

SUITE = {
    "join_size_report": QuerySpec(
        "join_size_report",
        join_size_report,
        _JOIN_SIZE_ORACLE,
        "exact join cardinality from per-key count frames: planner statistics without executing the join",
    ),
    "supplier_affinity_links": QuerySpec(
        "supplier_affinity_links",
        supplier_affinity_links,
        _RA_ORACLE,
        "Resource-Allocation link prediction: hub-capped common-neighbor self-join, scaled truncating-division score",
    ),
    "part_skyline": QuerySpec(
        "part_skyline",
        part_skyline,
        _SKYLINE_ORACLE,
        "distributed bucket-pruned exact Pareto skyline vs an independent NOT-EXISTS dominance oracle",
    ),
    "ewma_user_trend": QuerySpec(
        "ewma_user_trend",
        ewma_user_trend,
        _ewma_oracle(),
        "truncated dyadic-weight EWMA: exact int64, one partitioned window shuffle",
    ),
    "cusum_changepoint": QuerySpec(
        "cusum_changepoint",
        cusum_changepoint,
        _CUSUM_ORACLE,
        "per-series CUSUM changepoint with the mean multiplied through: integer-exact argmax",
    ),
    "rank_fusion_customers": QuerySpec(
        "rank_fusion_customers",
        rank_fusion_customers,
        _RRF_ORACLE,
        "Reciprocal Rank Fusion of two TakeOrdered top-K signals, truncating-division reciprocal terms",
    ),
}
