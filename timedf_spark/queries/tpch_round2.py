"""Round-2 TPC-H shapes: conditional aggregation (Q12), conditional-sum
ratio (Q14), HAVING-over-fact join-back (Q18), per-group argmin join-back
(Q2) — SURVEY.md §2 C3/D16 "absent" rows, widened further.

Each query is a distinct *plan shape* the round-1 suite did not yet pin:

- Q12: CASE expressions inside aggregate functions over a fact-fact join —
  the conditional-count pattern (no Expand, no pivot; one hash aggregate).
- Q14: a ratio of two conditional sums collapsing to ONE row — the
  all-to-one aggregation where partial aggregation does all the work and
  the final reduce sees 32 rows (one per map partition).
- Q18: HAVING on a fact aggregate used as a semi-join filter back onto the
  fact⋈dim join — the "large orders" shape where the filter cardinality
  (aggregate output) is orders of magnitude below the fact.
- Q2: per-group minimum computed on an aggregate view, then an equality
  join back to recover the argmin rows — quantized averages make the
  equality exact across engines (functions/deterministic.py).

Reference basis: the reference's workloads stop at plain group-aggregates
(timedf_benchmarks/ny_taxi/ny_taxi.py:170-270); these shapes extend the
same DataFrame surface the way §2 C3/D16 flags as engine roadmap.

Scale posture:
- Q12/Q18: the orders⋈lineitem join shuffles on the order key once; the
  aggregate + HAVING side of Q18 reuses that partitioning (AQE); no
  broadcast of fact-sized data anywhere.
- Q14: partial agg reduces everything map-side; the part dimension is
  broadcast (20k rows at sf0.1, ~200k at TPC-H sf100 — still broadcast
  range).
- Q2: both the aggregate view and the per-part minima are (part, supp)- /
  part-keyed — tiny next to lineitem; the final joins are
  aggregate⋈aggregate, never fact⋈fact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import davg, dsum
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --- Q12 shape: conditional aggregation over a join ------------------------

_Q12_FILTER = (
    "l_shipdate >= timestamp '1997-01-01 00:00:00' "
    "and l_shipdate < timestamp '1998-01-01 00:00:00'"
)
_HIGH = "case when o_orderpriority in ('1-URGENT', '2-HIGH') then 1 else 0 end"
_LOW = "case when o_orderpriority not in ('1-URGENT', '2-HIGH') then 1 else 0 end"


def priority_line_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: per linestatus, how many 1997-shipped lines belong to
    high- vs low-priority orders (CASE inside SUM, single hash agg)."""
    li = load_table(spark, sf_dir, "lineitem").filter(_Q12_FILTER).select(
        "l_orderkey", "l_linestatus"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.expr(f"sum({_HIGH})").cast("long").alias("high_line_count"),
            F.expr(f"sum({_LOW})").cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


PRIORITY_LINE_ORACLE = f"""
SELECT l_linestatus,
       cast(sum({_HIGH}) as bigint) AS high_line_count,
       cast(sum({_LOW}) as bigint) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE {_Q12_FILTER}
GROUP BY l_linestatus
ORDER BY l_linestatus
"""

# --- Q14 shape: ratio of conditional sums → one row ------------------------

_Q14_FILTER = (
    "l_shipdate >= timestamp '1997-03-01 00:00:00' "
    "and l_shipdate < timestamp '1997-04-01 00:00:00'"
)
_PROMO_REV = dsum("case when p_type = 'PROMO' then l_extendedprice * (1 - l_discount) else 0e0 end")
_ALL_REV = dsum("l_extendedprice * (1 - l_discount)")


def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share of one month, as a single scalar row.
    Part side broadcast; both sums come out of one partial+final agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(_Q14_FILTER).select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.expr(f"100e0 * {_PROMO_REV} / {_ALL_REV}").alias("promo_share_pct"),
            F.expr(_ALL_REV).alias("total_revenue"),
        )
    )


PROMO_SHARE_ORACLE = f"""
SELECT 100e0 * {_PROMO_REV} / {_ALL_REV} AS promo_share_pct,
       {_ALL_REV} AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q14_FILTER}
"""

# --- Q18 shape: HAVING on a fact aggregate, joined back --------------------

_Q18_MIN_QTY = "250e0"
_QTY_SUM = dsum("l_quantity")


def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    customer attribution. The aggregate+HAVING output is small → its join
    back onto orders/customer broadcasts; lineitem shuffles once."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(_QTY_SUM).alias("total_qty"))
        .filter(F.col("total_qty") >= F.expr(_Q18_MIN_QTY))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty"
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
    )


LARGE_ORDER_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {_QTY_SUM} AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {_QTY_SUM} >= {_Q18_MIN_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey ASC
"""

# --- Q2 shape: per-group argmin on an aggregate view, joined back ----------

_UNIT_COST = davg("l_extendedprice / l_quantity")


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each part, the supplier(s) with the minimum average
    unit price. The (part, supplier) aggregate view is computed once; the
    per-part minimum is a second (much smaller) aggregate; the equality
    join back is exact because the average is quantized-deterministic."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.expr(_UNIT_COST).alias("unit_cost")
    )
    mins = cost.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    )
    return (
        cost.join(
            mins, (cost.l_partkey == mins.pk) & (cost.unit_cost == mins.min_cost)
        )
        .join(supp, cost.l_suppkey == supp.s_suppkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "s_nationkey",
            F.col("unit_cost").alias("min_unit_cost"),
        )
        .orderBy("p_partkey", "s_suppkey")
    )


MIN_COST_ORACLE = f"""
WITH cost AS (
  SELECT l_partkey, l_suppkey, {_UNIT_COST} AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
mins AS (SELECT l_partkey AS pk, min(unit_cost) AS min_cost FROM cost GROUP BY l_partkey)
SELECT c.l_partkey AS p_partkey, s_suppkey, s_name, s_nationkey,
       c.unit_cost AS min_unit_cost
FROM cost c
JOIN mins m ON c.l_partkey = m.pk AND c.unit_cost = m.min_cost
JOIN supplier ON c.l_suppkey = s_suppkey
ORDER BY p_partkey, s_suppkey
"""


# --- Q20 shape: correlated scalar threshold inside a semi-join chain -------
#
# TPC-H Q20 finds suppliers whose stocked quantity of a part exceeds half
# of what they shipped of it in a year (correlated scalar subquery inside
# IN inside IN). The schema has no partsupp (TESTDATA.md), so the adapted
# predicate compares the same (supplier, part) pair at two granularities:
# 1997 shipments vs all-time shipments — same decorrelated plan shape:
# two aggregates over the same key, an equality join between them (both
# sides pre-reduced → aggregate⋈aggregate, never fact⋈fact), then a
# semi-join up to the supplier dimension.

_Q20_YEAR = (
    "l_shipdate >= timestamp '1997-01-01 00:00:00' "
    "and l_shipdate < timestamp '1998-01-01 00:00:00'"
)
_Q20_QTY = dsum("l_quantity")


def concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers with some part for which 1997 shipments exceed half of
    their all-time shipments of that part (Q20's decorrelated shape)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity", "l_shipdate"
    )
    year_qty = (
        li.filter(_Q20_YEAR)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.expr(_Q20_QTY).alias("qty_1997"))
    )
    total_qty = (
        li.groupBy(F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk"))
        .agg(F.expr(_Q20_QTY).alias("qty_all"), F.count(F.lit(1)).alias("n_ship"))
        # concentration is only meaningful for repeatedly-shipped pairs —
        # single-shipment pairs pass the ratio trivially
        .filter(F.col("n_ship") >= 3)
    )
    hot = (
        year_qty.join(
            total_qty,
            (year_qty.l_suppkey == total_qty.sk) & (year_qty.l_partkey == total_qty.pk),
        )
        .filter(F.col("qty_1997") > F.col("qty_all") * F.lit(0.5))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        supp.join(hot, supp.s_suppkey == hot.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name", "s_nationkey")
        .orderBy("s_suppkey")
    )


CONCENTRATED_ORACLE = f"""
WITH year_qty AS (
  SELECT l_suppkey, l_partkey, {_Q20_QTY} AS qty_1997
  FROM lineitem WHERE {_Q20_YEAR}
  GROUP BY l_suppkey, l_partkey
),
total_qty AS (
  SELECT l_suppkey AS sk, l_partkey AS pk, {_Q20_QTY} AS qty_all
  FROM lineitem GROUP BY l_suppkey, l_partkey
  HAVING count(*) >= 3
),
hot AS (
  SELECT DISTINCT l_suppkey FROM year_qty
  JOIN total_qty ON l_suppkey = sk AND l_partkey = pk
  WHERE qty_1997 > qty_all * 0.5
)
SELECT s_suppkey, s_name, s_nationkey
FROM supplier WHERE s_suppkey IN (SELECT l_suppkey FROM hot)
ORDER BY s_suppkey
"""


SUITE = {
    "concentrated_suppliers": QuerySpec(
        "concentrated_suppliers",
        concentrated_suppliers,
        CONCENTRATED_ORACLE,
        "TPC-H Q20: correlated scalar threshold decorrelated into aggregate⋈aggregate + semi-join",
    ),
    "priority_line_counts": QuerySpec(
        "priority_line_counts",
        priority_line_counts,
        PRIORITY_LINE_ORACLE,
        "TPC-H Q12: conditional CASE aggregation over a fact-fact join",
    ),
    "promo_revenue_share": QuerySpec(
        "promo_revenue_share",
        promo_revenue_share,
        PROMO_SHARE_ORACLE,
        "TPC-H Q14: conditional-sum ratio collapsing to one scalar row",
    ),
    "large_order_customers": QuerySpec(
        "large_order_customers",
        large_order_customers,
        LARGE_ORDER_ORACLE,
        "TPC-H Q18: HAVING over fact aggregate joined back to dims",
    ),
    "min_cost_supplier": QuerySpec(
        "min_cost_supplier",
        min_cost_supplier,
        MIN_COST_ORACLE,
        "TPC-H Q2: per-group argmin on an aggregate view, equality join-back",
    ),
}
