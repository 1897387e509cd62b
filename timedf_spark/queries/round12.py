"""Round-12 queries: communities, exact autocorrelation, functional
dependencies, and a Benford first-digit audit.

- ``supplier_communities`` — label-propagation community detection
  (operators/labelprop.py) over the supplier affinity graph (edges =
  Resource-Allocation pairs with >=3 shared customers): the source-
  grouping pass a corpus mixer runs before per-community quotas.
- ``acf_daily`` — exact lag-1..3 autocorrelation per (event_type, day)
  averaged per type. The mean is multiplied through ONCE per point
  (y_t = n*x_t - S, all int64), so numerator and denominator are exact
  integer sums; the ratio is quantized by a truncating division that
  both engines compute identically. Bound at day grain: n<=1e3/day/type
  at sf0.1 -> |y|<=2n*560, sum y^2 <= n*(2n*560)^2 ~ 4e14; holds to
  ~100x before re-quantization is needed.
- ``fd_profile`` — functional-dependency discovery over a fixed
  candidate set (the TANE-style "does LHS determine RHS" check,
  Huhtala et al. 1999): per candidate, distinct-LHS count, number of
  violating LHS groups, and the max RHS fanout. The schema-inference /
  data-contract primitive a 100 TB ingest runs before declaring keys.
- ``benford_prices`` — first-significant-digit audit of order totals
  vs Benford's law. The digit comes from the INTEGER cents string (no
  double formatting, which differs across engines); expected shares
  are hard-coded basis-point constants of log10(1+1/d); the per-digit
  deviation statistic is a scaled truncating division. The classic
  fabricated-data / corrupted-feed detector.

Reference parity: none (intel-ai/timedf has no graph, profiling, or
audit surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.operators.labelprop import (
    label_propagation,
    label_propagation_sql,
)
from timedf_spark.operators.linkpred import (
    resource_allocation_pairs,
    resource_allocation_sql,
)
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# supplier_communities

_LPA_ITERS = 4
_COMM_MIN = 2
_COMM_TOPN = 20

_AFFINITY_EDGES_SQL = (
    "SELECT o_custkey AS _c, l_suppkey AS _n "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
)


def supplier_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    bip = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_custkey", "l_suppkey"
    )
    edges = resource_allocation_pairs(
        bip, neighbor="o_custkey", node="l_suppkey"
    ).select("n1", "n2")
    nodes = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("node")
    )
    labels = label_propagation(nodes, edges, iters=_LPA_ITERS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .where(F.col("n_members") >= _COMM_MIN)
        .orderBy(F.desc("n_members"), "community")
        .limit(_COMM_TOPN)
    )


def _communities_oracle() -> str:
    edges = (
        f"SELECT n1 AS a, n2 AS b FROM ({resource_allocation_sql(_AFFINITY_EDGES_SQL)})"
    )
    lpa = label_propagation_sql(
        "SELECT s_suppkey AS node FROM supplier", edges, iters=_LPA_ITERS
    )
    return f"""
SELECT label AS community, count(*) AS n_members
FROM ({lpa})
GROUP BY label
HAVING count(*) >= {_COMM_MIN}
ORDER BY n_members DESC, community
LIMIT {_COMM_TOPN}
"""

# --------------------------------------------------------------------
# acf_daily

_ACF_SCALE = 10_000
_ACF_LAGS = (1, 2, 3)


def acf_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type mean of daily lag-k autocorrelations, integer-exact."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    df = ev.withColumn("_d", F.date_trunc("day", "ts")).withColumn(
        "_vq", F.floor(F.col("value")).cast("long")
    )
    grp = Window.partitionBy("event_type", "_d")
    seq = grp.orderBy("ts", "event_id")
    df = (
        df.withColumn("_n", F.count(F.lit(1)).over(grp))
        .withColumn("_s", F.sum("_vq").over(grp))
        .withColumn("_y", F.col("_n") * F.col("_vq") - F.col("_s"))
    )
    for k in _ACF_LAGS:
        df = df.withColumn(f"_p{k}", F.col("_y") * F.lag("_y", k).over(seq))
    daily = df.groupBy("event_type", "_d").agg(
        F.sum(F.col("_y") * F.col("_y")).alias("_den"),
        *[F.sum(f"_p{k}").alias(f"_num{k}") for k in _ACF_LAGS],
    )
    acf_cols = [
        F.expr(f"_num{k} DIV greatest(_den DIV {_ACF_SCALE}, 1)").alias(f"_acf{k}")
        for k in _ACF_LAGS
    ]
    per_day = daily.select("event_type", *acf_cols)
    return (
        per_day.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            *[
                F.expr(f"sum(_acf{k}) DIV count(1)").alias(f"acf{k}_scaled")
                for k in _ACF_LAGS
            ],
        )
        .orderBy("event_type")
    )


def _acf_oracle() -> str:
    lags = ", ".join(f"lag(y, {k}) OVER w AS y{k}" for k in _ACF_LAGS)
    nums = ", ".join(
        f"cast(sum(y * y{k}) AS BIGINT) AS num{k}" for k in _ACF_LAGS
    )
    accs = ", ".join(
        f"cast(sum(num{k} // greatest(den // {_ACF_SCALE}, 1)) // count(*) AS BIGINT)"
        f" AS acf{k}_scaled"
        for k in _ACF_LAGS
    )
    return f"""
WITH b AS (
  SELECT event_type, ts, event_id,
         date_trunc('day', ts) AS d,
         cast(floor(value) AS BIGINT) AS vq
  FROM events
), y AS (
  SELECT event_type, d, ts, event_id,
         count(*) OVER (PARTITION BY event_type, d) * vq
           - sum(vq) OVER (PARTITION BY event_type, d) AS y
  FROM b
), p AS (
  SELECT event_type, d, y, {lags}
  FROM y
  WINDOW w AS (PARTITION BY event_type, d ORDER BY ts, event_id)
), daily AS (
  SELECT event_type, d,
         cast(sum(y * y) AS BIGINT) AS den,
         {nums}
  FROM p
  GROUP BY event_type, d
)
SELECT event_type, count(*) AS n_days, {accs}
FROM daily GROUP BY event_type ORDER BY event_type
"""

# --------------------------------------------------------------------
# fd_profile

_FD_CANDIDATES = [
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_linestatus"),
    ("lineitem", "l_partkey", "l_returnflag"),
    ("events", "user_id", "event_type"),
    ("documents", "source", "lang"),
]


def fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does LHS determine RHS? One distinct-count aggregate per
    candidate (key-grain shuffle only), unioned into a profile row per
    FD: violating_lhs == 0 means the dependency holds exactly."""
    out = None
    for table, lhs, rhs in _FD_CANDIDATES:
        t = load_table(spark, sf_dir, table)
        per = t.groupBy(lhs).agg(F.countDistinct(rhs).alias("_nr"))
        row = per.agg(
            F.count(F.lit(1)).alias("lhs_values"),
            F.sum(F.when(F.col("_nr") > 1, 1).otherwise(0)).alias("violating_lhs"),
            F.max("_nr").alias("max_rhs_per_lhs"),
        ).select(
            F.lit(f"{table}.{lhs}->{rhs}").alias("fd"),
            "lhs_values",
            "violating_lhs",
            "max_rhs_per_lhs",
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("fd")


def _fd_oracle() -> str:
    rows = []
    for table, lhs, rhs in _FD_CANDIDATES:
        rows.append(
            f"SELECT '{table}.{lhs}->{rhs}' AS fd, count(*) AS lhs_values, "
            "cast(sum(CASE WHEN _nr > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs, "
            "max(_nr) AS max_rhs_per_lhs FROM ("
            f"SELECT {lhs}, count(DISTINCT {rhs}) AS _nr FROM {table} GROUP BY {lhs})"
        )
    return " UNION ALL ".join(rows) + " ORDER BY fd"

# --------------------------------------------------------------------
# benford_prices

# log10(1 + 1/d) in basis points of 1e4 (hard-coded constants, so both
# engines see identical integers — no transcendental at query time).
_BENFORD_BP = {1: 3010, 2: 1761, 3: 1249, 4: 969, 5: 792, 6: 669, 7: 580, 8: 512, 9: 458}


def benford_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of order totals vs Benford's law. The
    digit is char 1 of the integer cents rendered as a string —
    int-to-string is exact and engine-identical, unlike double
    formatting. dev statistic: (obs_bp - exp_bp)^2 * 1e4 DIV exp_bp."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100).cast("long")
    digit = F.substring(cents.cast("string"), 1, 1).cast("long")
    exp_bp = F.coalesce(
        *[
            F.when(F.col("digit") == d, F.lit(bp))
            for d, bp in _BENFORD_BP.items()
        ]
    ).cast("long")
    counts = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    total = counts.agg(F.sum("n_orders").alias("_total"))
    return (
        counts.join(F.broadcast(total))
        .withColumn("obs_bp", F.expr("n_orders * 10000 DIV _total"))
        .withColumn("exp_bp", exp_bp)
        .withColumn(
            "chi_scaled",
            F.expr("(obs_bp - exp_bp) * (obs_bp - exp_bp) * 10000 DIV exp_bp"),
        )
        .select("digit", "n_orders", "obs_bp", "exp_bp", "chi_scaled")
        .orderBy("digit")
    )


def _benford_oracle() -> str:
    case = "CASE digit " + " ".join(
        f"WHEN {d} THEN {bp}" for d, bp in _BENFORD_BP.items()
    ) + " END"
    return f"""
WITH c AS (
  SELECT cast(substr(cast(cast(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
), counts AS (
  SELECT digit, count(*) AS n_orders FROM c GROUP BY digit
), t AS (SELECT sum(n_orders) AS total FROM counts)
SELECT digit, n_orders,
       cast(n_orders * 10000 // total AS BIGINT) AS obs_bp,
       cast({case} AS BIGINT) AS exp_bp,
       cast((n_orders * 10000 // total - {case})
          * (n_orders * 10000 // total - {case}) * 10000 // {case} AS BIGINT)
         AS chi_scaled
FROM counts CROSS JOIN t
ORDER BY digit
"""

# --------------------------------------------------------------------

SUITE = {
    "supplier_communities": QuerySpec(
        "supplier_communities",
        supplier_communities,
        _communities_oracle(),
        "synchronous label propagation over the RA affinity graph, unrolled-CTE twin, deterministic argmax tie-break",
    ),
    "acf_daily": QuerySpec(
        "acf_daily",
        acf_daily,
        _acf_oracle(),
        "exact integer lag-1..3 autocorrelation: mean multiplied through once, truncating-division quantization",
    ),
    "fd_profile": QuerySpec(
        "fd_profile",
        fd_profile,
        _fd_oracle(),
        "functional-dependency discovery over a candidate set: one distinct-count aggregate per FD",
    ),
    "benford_prices": QuerySpec(
        "benford_prices",
        benford_prices,
        _benford_oracle(),
        "Benford first-digit audit from integer cents strings, hard-coded basis-point expectations",
    ),
}
