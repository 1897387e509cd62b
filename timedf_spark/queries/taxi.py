"""ny_taxi query suite (SURVEY.md §2 D1-D4, F1, H1, H4) on the testdata star
schema.

The reference's four OLAP queries (timedf_benchmarks/ny_taxi/ny_taxi.py:170-270,
SQL stated in its comments at :166-242) are defined over a 51-column trips
table; the driver's testdata has no trips table, so each query is re-expressed
with identical *operator shape* over lineitem/orders:

  Q1  group-count, 1 key                 (cab_type      -> l_returnflag)
  Q2  group-avg,   1 key                 (passenger_cnt -> o_orderpriority)
  Q3  group-count, 2 keys w/ year()      (pickup year   -> year(o_orderdate))
  Q4  group-count, 3 keys + cast + sort  (trip_distance -> l_quantity)

Scale notes: all four are single-shuffle partial+final hash aggregates with
map-side combine; group-key cardinality is tiny (≤ a few hundred), so the
reduce side is trivial at any data size. Q4's ORDER BY is a global sort of
only the aggregated rows (range partition over ~hundreds of rows — free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import davg
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# Q4's truncate-toward-zero cast (pandas ``astype('int64')``,
# ny_taxi.py:249,261): floor() on the non-negative quantity matches pandas
# truncation AND behaves identically in DuckDB, whose direct double->bigint
# CAST *rounds* instead of truncating.
_QTY_BUCKET = "cast(floor(l_quantity) as bigint)"
_YEAR_O = "cast(year(o_orderdate) as bigint)"
_YEAR_L = "cast(year(l_shipdate) as bigint)"


def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT key, count(*) GROUP BY key (ny_taxi.py:170-177)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


Q1_ORACLE = """
SELECT l_returnflag, count(*) AS cnt
FROM lineitem GROUP BY l_returnflag
"""


def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT key, avg(x) GROUP BY key (ny_taxi.py:180-193); avg via exact
    decimal sum so the double matches the oracle bit-for-bit."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.expr(davg("o_totalprice")).alias("avg_total"))
    )


Q2_ORACLE = f"""
SELECT o_orderpriority, {davg("o_totalprice")} AS avg_total
FROM orders GROUP BY o_orderpriority
"""


def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-key group-count with a derived year key (ny_taxi.py:196-218)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.expr(_YEAR_O).alias("o_year"), "o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


Q3_ORACLE = f"""
SELECT {_YEAR_O} AS o_year, o_orderstatus, count(*) AS cnt
FROM orders GROUP BY 1, 2
"""


def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-key group-count (flag, year, int-cast quantity) + mixed-direction
    global sort (ny_taxi.py:221-270)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(
            "l_returnflag",
            F.expr(_YEAR_L).alias("l_year"),
            F.expr(_QTY_BUCKET).alias("qty_bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.asc("l_year"), F.desc("cnt"))
    )


Q4_ORACLE = f"""
SELECT l_returnflag, {_YEAR_L} AS l_year, {_QTY_BUCKET} AS qty_bucket,
       count(*) AS cnt
FROM lineitem GROUP BY 1, 2, 3
ORDER BY l_year ASC, cnt DESC
"""


SUITE = {
    "taxi_q1": QuerySpec("taxi_q1", q1, Q1_ORACLE, "group-count, 1 key (D1)"),
    "taxi_q2": QuerySpec("taxi_q2", q2, Q2_ORACLE, "group-avg, 1 key (D2)"),
    "taxi_q3": QuerySpec("taxi_q3", q3, Q3_ORACLE, "group-count, derived year key (D3)"),
    "taxi_q4": QuerySpec("taxi_q4", q4, Q4_ORACLE, "group-count, 3 keys + cast + sort (D4, F1, H4)"),
}
