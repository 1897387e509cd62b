"""OLAP suite over the full star schema — joins, semi/anti joins, windows,
pivots, distincts (SURVEY.md §2 C, D7-D16, F5, G4).

These queries exercise the operator surface the reference delegates to its
backends (and the gaps §2 marks "absent": semi/anti joins, top-k, pivot,
distinct-agg), expressed in shapes that survive a 100 TB scale-up:

- dimension joins carry explicit ``broadcast()`` hints (region/nation/
  customer/part are small in any TPC-H-shaped world; broadcasting removes
  the fact-side shuffle entirely);
- the fact-fact join (orders⋈lineitem) is a plain equi-join on the natural
  key — AQE picks shuffle-hash/sort-merge and handles skew splitting;
- top-k per group is a window row_number + filter: one shuffle on the
  partition key, no global sort;
- the pricing summary (flagship) is scan -> pushed filter -> one hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import davg, dsum
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --- pricing summary (flagship; TPC-H Q1 shape) ---------------------------

_PS_AGGS = {
    "sum_qty": dsum("l_quantity"),
    "sum_base_price": dsum("l_extendedprice"),
    "sum_disc_price": dsum("l_extendedprice * (1 - l_discount)"),
    "sum_charge": dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)"),
    "avg_qty": davg("l_quantity"),
    "avg_price": davg("l_extendedprice"),
    "avg_disc": davg("l_discount"),
    "count_order": "count(*)",
}
_PS_FILTER = "l_shipdate <= timestamp '2001-09-02 00:00:00'"


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(_PS_FILTER)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*[F.expr(sql).alias(n) for n, sql in _PS_AGGS.items()])
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {', '.join(f'{sql} AS {n}' for n, sql in _PS_AGGS.items())}
FROM lineitem
WHERE {_PS_FILTER}
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# --- segment revenue: 3-way join through the star (TPC-H Q3/Q5 shape) -----

_REV = dsum("l_extendedprice * (1 - l_discount)")


def segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, revenue per market segment / priority.

    customer is a dimension → broadcast (no shuffle of orders);
    orders⋈lineitem shuffles both sides on orderkey once, and the groupBy
    reuses nothing downstream (tiny output)."""
    cust = F.broadcast(load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"))
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.expr(_REV).alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


SEGMENT_REVENUE_ORACLE = f"""
SELECT c.c_mktsegment, o.o_orderpriority,
       {_REV} AS revenue, count(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment, o.o_orderpriority
"""

# --- nation revenue: 5-way dimension chain (TPC-H Q5 shape) ---------------


def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region→nation→customer→orders→lineitem; every dimension broadcast, so
    the only shuffle is orders⋈lineitem + the final tiny aggregation."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    dim = F.broadcast(
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(dim, orders.o_custkey == dim.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(F.expr(_REV).alias("revenue"))
    )


NATION_REVENUE_ORACLE = f"""
SELECT r.r_name, n.n_name, {_REV} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
"""

# --- semi join (G/C gap: EXISTS), anti join (NOT EXISTS) ------------------


def priority_with_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: orders having at least one late line (TPC-H Q4 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    late = load_table(spark, sf_dir, "lineitem").filter("l_shipdate > timestamp '1998-01-01 00:00:00'")
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


PRIORITY_SEMI_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > timestamp '1998-01-01 00:00:00'
)
GROUP BY o_orderpriority
"""


def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders at all (TPC-H Q22 shape)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


CUST_ANTI_ORACLE = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""

# --- top-k per group (F5 gap) via window ----------------------------------

TOPK_SQL_BODY = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rn
FROM (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
         ) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
) t
WHERE rn <= 5
"""


def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders by price per segment. Window + filter: one shuffle on the
    partition key; ties broken by o_orderkey so results are deterministic.
    Executed from the same SQL text as the oracle (Spark SQL ≡ ANSI here)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(TOPK_SQL_BODY)


# --- distincts (D9-D12) and pivot (D14) -----------------------------------


def column_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column distinct counts (ref: df.nunique(), report_xlsx.py:17-20).
    Single-row result; exact counts (approx_count_distinct is the 100 TB
    variant, kept out of the oracle path)."""
    df = load_table(spark, sf_dir, "orders")
    return df.select(
        F.countDistinct("o_orderstatus").cast("long").alias("n_status"),
        F.countDistinct("o_orderpriority").cast("long").alias("n_priority"),
        F.countDistinct("o_custkey").cast("long").alias("n_custkey"),
    )


CARDINALITIES_ORACLE = """
SELECT count(DISTINCT o_orderstatus) AS n_status,
       count(DISTINCT o_orderpriority) AS n_priority,
       count(DISTINCT o_custkey) AS n_custkey
FROM orders
"""


def approx_cardinalities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counts — the 100 TB variant of
    column_cardinalities: one pass, constant memory per column (a ~KB
    sketch vs a hash set of every key), mergeable across partitions so the
    shuffle carries sketches, not values (rsd=0.02 → ±2% typical error).

    The sketch ESTIMATE is engine-specific by construction, so the
    hash-checkable surface is the exact counts plus an in-query
    attestation that the sketch landed within 5% of them (``ok_*``
    flags; bound matches the local tolerance test) — a deterministic-
    bound oracle instead of a permanent rows-only row. Production
    callers at 100 TB use ``F.approx_count_distinct`` alone; here the
    exact twin shares the single aggregate pass."""
    df = load_table(spark, sf_dir, "orders")
    cols = {
        "status": "o_orderstatus",
        "priority": "o_orderpriority",
        "custkey": "o_custkey",
    }
    # r11: exact and approx in SEPARATE aggregates. Fused, the
    # multi-distinct Expand made the planner evaluate
    # partial_approx_count_distinct per (col-values, gid) GROUP — one
    # HLL++ buffer per distinct custkey (~100k × 3 sketches allocated
    # and merged per run, measured 1.74 s for a 150k-row table). Split,
    # the HLL branch is a plain global agg (one buffer per partition per
    # column) and the exact branch is the standard Expand multi-distinct;
    # the 1-row frames cross-join for free. Values are identical: HLL++
    # register-max merge is order-independent, exact counts unchanged.
    exact = df.agg(
        *[F.countDistinct(c).cast("long").alias(f"n_{n}") for n, c in cols.items()]
    )
    est = df.agg(
        *[
            F.approx_count_distinct(c, rsd=0.02).alias(f"est_{n}")
            for n, c in cols.items()
        ]
    )
    agg = exact.crossJoin(est)
    return agg.select(
        *[F.col(f"n_{n}") for n in cols],
        *[
            (
                F.abs(F.col(f"est_{n}") - F.col(f"n_{n}"))
                <= F.greatest(F.lit(1.0), F.lit(0.05) * F.col(f"n_{n}"))
            ).alias(f"ok_{n}")
            for n in cols
        ],
    )


APPROX_CARDINALITIES_ORACLE = """
SELECT count(DISTINCT o_orderstatus) AS n_status,
       count(DISTINCT o_orderpriority) AS n_priority,
       count(DISTINCT o_custkey) AS n_custkey,
       TRUE AS ok_status, TRUE AS ok_priority, TRUE AS ok_custkey
FROM orders
"""

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long→wide pivot (ref: benchmark_db.py:174 pivot). Fixed pivot values —
    at scale, never let Spark run the extra distinct-scan to discover them."""
    df = load_table(spark, sf_dir, "events")
    return (
        df.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(F.count(F.lit(1)))
        .na.fill(0, _EVENT_TYPES)
        .select("user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES])
    )


EVENT_PIVOT_ORACLE = f"""
SELECT user_id,
       {', '.join(f"count(*) FILTER (WHERE event_type = '{t}') AS n_{t}" for t in _EVENT_TYPES)}
FROM events GROUP BY user_id
"""



# --- fact-fact shuffle join: top unshipped orders (TPC-H Q3 shape) ---------
#
# orders ⋈ lineitem is the suite's large-×-large join: neither side fits a
# broadcast at real scale, so the plan is a shuffle hash/sort-merge join on
# o_orderkey — hash-partitioned on the join key, linear, and AQE splits any
# skewed key at runtime (skewJoin on in session profiles). The top-k is a
# TakeOrdered over the aggregated (small) result, never a global sort of
# the fact table.

_TOPN_UNSHIPPED = 10


def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        "o_orderdate < date '1995-03-15'"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").filter(
        "l_shipdate > date '1995-03-15'"
    )
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.expr(_REV).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(_TOPN_UNSHIPPED)
    )


TOP_UNSHIPPED_ORACLE = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority, {_REV} AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT {_TOPN_UNSHIPPED}
"""

# --- agg-join-back with correlated-average filter (TPC-H Q17 shape) -------
#
# "Lines whose quantity is below half the part's average quantity" — the
# canonical decorrelated form: the per-part average is computed once as an
# ordinary aggregate and equi-joined back, never evaluated per outer row.
# Scale shape: lineitem shuffles on l_partkey once for the average; the
# join-back hits the same partitioning so AQE reuses the exchange; part is
# a broadcast dimension. The threshold average uses the deterministic
# quantized sum so the strict `<` comparison cannot flip between engines.

_AVG_QTY = davg("l_quantity")


def small_parcel_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_brand"))
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.expr(_AVG_QTY).alias("avg_qty")
    )
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small"),
            F.expr(dsum("l_extendedprice")).alias("small_revenue"),
        )
    )


SMALL_PARCEL_ORACLE = f"""
WITH pa AS (
  SELECT l_partkey AS pk, {_AVG_QTY} AS avg_qty FROM lineitem GROUP BY l_partkey
)
SELECT p_brand, count(*) AS n_small, {dsum('l_extendedprice')} AS small_revenue
FROM lineitem l
JOIN pa ON pa.pk = l.l_partkey
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < 0.5 * pa.avg_qty
GROUP BY p_brand
"""

# --- left-outer join + two-level aggregation (TPC-H Q13 shape) ------------
#
# Distribution of customers by order count, zero-order customers included.
# Spark side uses the partial-agg-pushdown form: orders collapse to one row
# per custkey BEFORE the join (the shuffle carries |customers| rows, not
# |orders|), then a left join preserves order-less customers. The oracle is
# the plain LEFT JOIN + count(o_orderkey) form — same result by definition
# of count-of-nonnull.


def order_count_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


ORDER_HISTOGRAM_ORACLE = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
GROUP BY n_orders
"""

SUITE = {
    "pricing_summary": QuerySpec(
        "pricing_summary", pricing_summary, PRICING_SUMMARY_ORACLE,
        "flagship: filter→8-agg groupBy→sort (TPC-H Q1 shape)",
    ),
    "segment_revenue": QuerySpec(
        "segment_revenue", segment_revenue, SEGMENT_REVENUE_ORACLE,
        "3-way star join + agg (C1/C2)",
    ),
    "top_unshipped_orders": QuerySpec(
        "top_unshipped_orders", top_unshipped_orders, TOP_UNSHIPPED_ORACLE,
        "fact-fact shuffle join + top-k (TPC-H Q3 shape)",
    ),
    "nation_revenue": QuerySpec(
        "nation_revenue", nation_revenue, NATION_REVENUE_ORACLE,
        "5-way dimension chain join (C1)",
    ),
    "priority_semi_join": QuerySpec(
        "priority_semi_join", priority_with_lineitems, PRIORITY_SEMI_ORACLE,
        "left-semi join / EXISTS (C3 gap)",
    ),
    "customers_anti_join": QuerySpec(
        "customers_anti_join", customers_without_orders, CUST_ANTI_ORACLE,
        "left-anti join / NOT EXISTS (C3 gap)",
    ),
    "topk_per_segment": QuerySpec(
        "topk_per_segment", topk_orders_per_segment, TOPK_SQL_BODY,
        "top-k per group via window (F5, E gap)",
    ),
    "column_cardinalities": QuerySpec(
        "column_cardinalities", column_cardinalities, CARDINALITIES_ORACLE,
        "distinct counts (D9-D12)",
    ),
    "approx_cardinalities": QuerySpec(
        "approx_cardinalities", approx_cardinalities,
        APPROX_CARDINALITIES_ORACLE,
        "HLL++ distinct counts attested within 5% of the exact twin (D9 at scale, deterministic-bound oracle)",
    ),
    "event_type_pivot": QuerySpec(
        "event_type_pivot", event_type_pivot, EVENT_PIVOT_ORACLE,
        "long→wide pivot (D14)",
    ),
    "small_parcel_revenue": QuerySpec(
        "small_parcel_revenue", small_parcel_revenue, SMALL_PARCEL_ORACLE,
        "decorrelated agg-join-back with average-threshold filter (TPC-H Q17 shape)",
    ),
    "order_count_histogram": QuerySpec(
        "order_count_histogram", order_count_histogram, ORDER_HISTOGRAM_ORACLE,
        "left-outer join + two-level aggregation (TPC-H Q13 shape)",
    ),
}
