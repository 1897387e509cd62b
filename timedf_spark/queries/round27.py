"""Round-27 queries: iterative proportional fitting (survey raking),
double-entry reconciliation, rolling-origin forecast backtesting, and
price-heaping data-quality audits.

Scale posture (the 100 TB lens, per query):

- ``ipf_raking`` — two unrolled sweeps of iterative proportional
  fitting (raking) of the (nation × return-flag) order-count table
  toward revenue-share margins: the classic survey-weighting algorithm.
  The fact table aggregates to the 75-cell grain FIRST; every IPF sweep
  is then arithmetic over that tiny grid (row-margin scale, column-
  margin scale — each a groupBy over ≤75 rows joined back broadcast).
  Cell weights live as INTEGER milli-units re-quantized after each
  scaling step, so every cross-cell sum is exact in any accumulation
  order (a float sum would be partial-agg-order-nondeterministic even
  between two Spark runs); the scaling ratios themselves are
  mirrored-double (×, ÷ only). A fixed unroll depth (2 sweeps) keeps
  the oracle a straight CTE chain — the convergence loop a production
  raker runs is this same sweep body iterated.

- ``order_reconciliation_report`` — double-entry reconciliation of the
  order header total vs the sum of its line extensions
  (price·(1−disc)·(1+tax), all quantized to exact cents with the
  shared floor(x·100) rule): per-order deltas land in sign/magnitude
  buckets and the report carries counts + total absolute drift per
  bucket. One join at order grain (the natural co-partition key), one
  aggregation — the reconciliation shape every finance pipeline runs.

- ``forecast_backtest_naive`` — rolling-origin backtest of the two
  baseline forecasters every real forecast must beat: naive (ŷ_t =
  y_{t−1}) and seasonal-naive (ŷ_t = y_{t−7}); total absolute error in
  exact cents per method over the daily-revenue series. The series
  aggregates to day grain first; both lags ride ONE global-order window
  over ≤ span-days rows.

- ``price_heaping_audit`` — price-heaping detection (the data-quality
  cousin of Benford): distribution of cents-mod-100 mass at .00 / .50 /
  .99 / other vs the uniform 1% expectation, in scaled-integer basis
  points with per-bucket lift. One aggregation at mod-100 grain.

Reference parity: none of these exist in intel-ai/timedf (no raking,
reconciliation, backtest, or heaping surface; SURVEY.md §2 extension
rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# ipf_raking


def ipf_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderkey"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    base = o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    ).select(
        "c_nationkey",
        "o_orderstatus",
        F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    # seed table: order counts per (nation, status); targets: revenue
    # shares per nation (row margin) and per status (column margin),
    # scaled to the same grand total as the seed counts
    # r11: the <=75-row grid is checkpointed ONCE — the unrolled sweep
    # chain below references it (and frames derived from it) dozens of
    # times, and lazy, every reference re-planned the fact-table join +
    # aggregate (94 parquet scans / 93 Exchanges in the before-plan,
    # plans/r11/ipf_raking_before.txt). Same k-row-checkpoint discipline
    # as operators/kmeans.py's Lloyd rounds; values are bit-identical
    # (localCheckpoint is semantically a no-op).
    cells = base.groupBy("c_nationkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("seed"),
        F.sum("cents").alias("rev"),
    ).localCheckpoint(eager=True)
    grand = cells.agg(
        F.sum("seed").alias("n_total"), F.sum("rev").alias("rev_total")
    )
    # margins in mirrored double: target_row = n_total · rev_row/rev_total
    with_t = cells.crossJoin(F.broadcast(grand))
    row_m = with_t.groupBy("c_nationkey").agg(
        F.sum("rev").alias("rev_row"), F.min("n_total").alias("n_total"),
        F.min("rev_total").alias("rev_total"),
    ).selectExpr(
        "c_nationkey",
        "CAST(n_total AS DOUBLE) * (CAST(rev_row AS DOUBLE)"
        " / CAST(rev_total AS DOUBLE)) AS t_row",
    )
    col_m = with_t.groupBy("o_orderstatus").agg(
        F.sum("rev").alias("rev_col"), F.min("n_total").alias("n_total"),
        F.min("rev_total").alias("rev_total"),
    ).selectExpr(
        "o_orderstatus",
        "CAST(n_total AS DOUBLE) * (CAST(rev_col AS DOUBLE)"
        " / CAST(rev_total AS DOUBLE)) AS t_col",
    )
    # weights live as INTEGER milli-units: every sweep's row/column sum
    # is then exact in any accumulation order — a float sum over the
    # grid would be partial-aggregation-order-dependent (nondeterministic
    # even between two Spark runs, let alone vs DuckDB). Each scaling
    # step applies the double ratio and re-quantizes via floor.
    # margins are <=25/<=3 rows each, referenced once per sweep:
    # checkpoint so the sweep chain never re-plans their aggregates
    row_m = row_m.localCheckpoint(eager=True)
    col_m = col_m.localCheckpoint(eager=True)
    w = cells.selectExpr(
        "c_nationkey", "o_orderstatus", "seed * 1000 AS wq"
    )
    for _ in (1, 2):
        rsum = w.groupBy("c_nationkey").agg(F.sum("wq").alias("r_sum"))
        # each scaling step references the previous w TWICE (the margin
        # sum and the scaled projection): checkpoint per step keeps the
        # unrolled plan linear instead of exponential in sweep count
        w = (
            w.join(F.broadcast(rsum), "c_nationkey")
            .join(F.broadcast(row_m), "c_nationkey")
            .selectExpr(
                "c_nationkey", "o_orderstatus",
                "CAST(floor(CAST(wq AS DOUBLE)"
                " * (t_row / (CAST(r_sum AS DOUBLE) / 1000.0))) AS BIGINT)"
                " AS wq",
            )
            .localCheckpoint(eager=True)
        )
        csum = w.groupBy("o_orderstatus").agg(F.sum("wq").alias("c_sum"))
        w = (
            w.join(F.broadcast(csum), "o_orderstatus")
            .join(F.broadcast(col_m), "o_orderstatus")
            .selectExpr(
                "c_nationkey", "o_orderstatus",
                "CAST(floor(CAST(wq AS DOUBLE)"
                " * (t_col / (CAST(c_sum AS DOUBLE) / 1000.0))) AS BIGINT)"
                " AS wq",
            )
            .localCheckpoint(eager=True)
        )
    return (
        w.join(cells.select("c_nationkey", "o_orderstatus", "seed"),
               ["c_nationkey", "o_orderstatus"])
        .selectExpr("c_nationkey", "o_orderstatus", "seed",
                    "wq AS raked_w_milli")
        .orderBy("c_nationkey", "o_orderstatus")
    )


IPF_ORACLE = """
WITH base AS (
  SELECT c_nationkey, o_orderstatus,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
), cells AS (
  SELECT c_nationkey, o_orderstatus, count(*) AS seed, sum(cents) AS rev
  FROM base GROUP BY 1, 2
), grand AS (
  SELECT sum(seed) AS n_total, sum(rev) AS rev_total FROM cells
), row_m AS (
  SELECT c_nationkey,
         CAST(n_total AS DOUBLE) * (CAST(sum(rev) AS DOUBLE)
           / CAST(rev_total AS DOUBLE)) AS t_row
  FROM cells CROSS JOIN grand GROUP BY c_nationkey, n_total, rev_total
), col_m AS (
  SELECT o_orderstatus,
         CAST(n_total AS DOUBLE) * (CAST(sum(rev) AS DOUBLE)
           / CAST(rev_total AS DOUBLE)) AS t_col
  FROM cells CROSS JOIN grand GROUP BY o_orderstatus, n_total, rev_total
), w0 AS (
  SELECT c_nationkey, o_orderstatus, seed * 1000 AS wq
  FROM cells
), s1r AS (
  SELECT w0.c_nationkey, o_orderstatus,
         CAST(floor(CAST(wq AS DOUBLE) * (t_row /
           (CAST(sum(wq) OVER (PARTITION BY w0.c_nationkey) AS DOUBLE)
            / 1000.0))) AS BIGINT) AS wq
  FROM w0 JOIN row_m ON w0.c_nationkey = row_m.c_nationkey
), s1c AS (
  SELECT c_nationkey, s1r.o_orderstatus,
         CAST(floor(CAST(wq AS DOUBLE) * (t_col /
           (CAST(sum(wq) OVER (PARTITION BY s1r.o_orderstatus) AS DOUBLE)
            / 1000.0))) AS BIGINT) AS wq
  FROM s1r JOIN col_m ON s1r.o_orderstatus = col_m.o_orderstatus
), s2r AS (
  SELECT s1c.c_nationkey, o_orderstatus,
         CAST(floor(CAST(wq AS DOUBLE) * (t_row /
           (CAST(sum(wq) OVER (PARTITION BY s1c.c_nationkey) AS DOUBLE)
            / 1000.0))) AS BIGINT) AS wq
  FROM s1c JOIN row_m ON s1c.c_nationkey = row_m.c_nationkey
), s2c AS (
  SELECT c_nationkey, s2r.o_orderstatus,
         CAST(floor(CAST(wq AS DOUBLE) * (t_col /
           (CAST(sum(wq) OVER (PARTITION BY s2r.o_orderstatus) AS DOUBLE)
            / 1000.0))) AS BIGINT) AS wq
  FROM s2r JOIN col_m ON s2r.o_orderstatus = col_m.o_orderstatus
)
SELECT cells.c_nationkey, cells.o_orderstatus,
       CAST(seed AS BIGINT) AS seed, wq AS raked_w_milli
FROM s2c JOIN cells ON s2c.c_nationkey = cells.c_nationkey
                   AND s2c.o_orderstatus = cells.o_orderstatus
ORDER BY cells.c_nationkey, cells.o_orderstatus
"""

# --------------------------------------------------------------------
# order_reconciliation_report


def order_reconciliation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey",
        "CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)"
        " AS BIGINT) AS line_cents",
    )
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "CAST(floor(o_totalprice * 100) AS BIGINT) AS header_cents"
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("line_cents").alias("lines_cents")
    )
    recon = o.join(
        per_order, o.o_orderkey == per_order.l_orderkey, "inner"
    ).selectExpr("header_cents - lines_cents AS delta_cents")
    return (
        recon.selectExpr(
            "CASE WHEN delta_cents = 0 THEN 'exact'"
            " WHEN abs(delta_cents) <= 100 THEN 'within_1'"
            " WHEN delta_cents > 0 THEN 'header_over'"
            " ELSE 'lines_over' END AS bucket",
            "delta_cents",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.abs(F.col("delta_cents"))).alias("abs_drift_cents"),
            F.max(F.abs(F.col("delta_cents"))).alias("max_abs_cents"),
        )
        .orderBy("bucket")
    )


RECON_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 100)
             AS BIGINT)) AS lines_cents
  FROM lineitem GROUP BY l_orderkey
), recon AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) - lines_cents AS delta_cents
  FROM orders JOIN per_order ON o_orderkey = l_orderkey
)
SELECT CASE WHEN delta_cents = 0 THEN 'exact'
            WHEN abs(delta_cents) <= 100 THEN 'within_1'
            WHEN delta_cents > 0 THEN 'header_over'
            ELSE 'lines_over' END AS bucket,
       count(*) AS n_orders,
       CAST(sum(abs(delta_cents)) AS BIGINT) AS abs_drift_cents,
       CAST(max(abs(delta_cents)) AS BIGINT) AS max_abs_cents
FROM recon
GROUP BY 1
ORDER BY bucket
"""

# --------------------------------------------------------------------
# forecast_backtest_naive

_SEASON_DAYS = 7


def forecast_backtest_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").selectExpr(
        "CAST(o_orderdate AS DATE) AS day",
        "CAST(floor(o_totalprice * 100) AS BIGINT) AS cents",
    )
    daily = o.groupBy("day").agg(F.sum("cents").alias("rev"))
    w = Window.orderBy("day")
    scored = daily.select(
        "day",
        "rev",
        F.lag("rev", 1).over(w).alias("naive_pred"),
        F.lag("rev", _SEASON_DAYS).over(w).alias("snaive_pred"),
    ).where(F.col("snaive_pred").isNotNull())
    return scored.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.abs(F.col("rev") - F.col("naive_pred"))).alias("naive_abs_err"),
        F.sum(F.abs(F.col("rev") - F.col("snaive_pred"))).alias("snaive_abs_err"),
    ).selectExpr(
        "n_days",
        "naive_abs_err",
        "snaive_abs_err",
        # MASE-style ratio of the two baselines in basis points
        "snaive_abs_err * 10000 DIV greatest(naive_abs_err, 1)"
        " AS snaive_vs_naive_bp",
    )


BACKTEST_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS rev
  FROM orders GROUP BY 1
), scored AS (
  SELECT day, rev,
         lag(rev, 1) OVER (ORDER BY day) AS naive_pred,
         lag(rev, {_SEASON_DAYS}) OVER (ORDER BY day) AS snaive_pred
  FROM daily
), agg AS (
  SELECT count(*) AS n_days,
         sum(abs(rev - naive_pred)) AS naive_abs_err,
         sum(abs(rev - snaive_pred)) AS snaive_abs_err
  FROM scored WHERE snaive_pred IS NOT NULL
)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(naive_abs_err AS BIGINT) AS naive_abs_err,
       CAST(snaive_abs_err AS BIGINT) AS snaive_abs_err,
       CAST(snaive_abs_err * 10000 // greatest(naive_abs_err, 1) AS BIGINT)
         AS snaive_vs_naive_bp
FROM agg
"""

# --------------------------------------------------------------------
# price_heaping_audit


def price_heaping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(floor(l_extendedprice * 100) AS BIGINT) % 100 AS cc"
    )
    bucketed = li.selectExpr(
        "CASE WHEN cc = 0 THEN 'ends_00' WHEN cc = 50 THEN 'ends_50'"
        " WHEN cc = 99 THEN 'ends_99' ELSE 'other' END AS bucket"
    )
    counts = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.agg(F.sum("n").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(totals))
        .selectExpr(
            "bucket",
            "n",
            "n * 10000 DIV n_total AS share_bp",
            # lift vs uniform cents: expected share is 1/100 per ending
            # (97/100 for 'other'); lift in bp of observed/expected
            "CASE WHEN bucket = 'other'"
            " THEN (n * 100 * 10000 DIV 97) DIV n_total"
            " ELSE (n * 100 * 10000) DIV n_total END AS lift_bp",
        )
        .orderBy("bucket")
    )


HEAPING_ORACLE = """
WITH b AS (
  SELECT CASE WHEN cc = 0 THEN 'ends_00' WHEN cc = 50 THEN 'ends_50'
              WHEN cc = 99 THEN 'ends_99' ELSE 'other' END AS bucket
  FROM (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) % 100 AS cc
        FROM lineitem)
), counts AS (
  SELECT bucket, count(*) AS n FROM b GROUP BY bucket
), totals AS (SELECT sum(n) AS n_total FROM counts)
SELECT bucket, n,
       CAST(n * 10000 // n_total AS BIGINT) AS share_bp,
       CAST(CASE WHEN bucket = 'other'
                 THEN (n * 100 * 10000 // 97) // n_total
                 ELSE (n * 100 * 10000) // n_total END AS BIGINT) AS lift_bp
FROM counts CROSS JOIN totals
ORDER BY bucket
"""


SUITE = {
    "ipf_raking": QuerySpec(
        "ipf_raking",
        ipf_raking,
        IPF_ORACLE,
        "iterative proportional fitting (2 unrolled sweeps) of nation×status counts toward revenue-share margins at 75-cell grain",
    ),
    "order_reconciliation_report": QuerySpec(
        "order_reconciliation_report",
        order_reconciliation_report,
        RECON_ORACLE,
        "double-entry header-vs-lines reconciliation in exact cents; sign/magnitude drift buckets",
    ),
    "forecast_backtest_naive": QuerySpec(
        "forecast_backtest_naive",
        forecast_backtest_naive,
        BACKTEST_ORACLE,
        "rolling-origin backtest of naive vs seasonal-naive daily-revenue forecasts, exact cents errors",
    ),
    "price_heaping_audit": QuerySpec(
        "price_heaping_audit",
        price_heaping_audit,
        HEAPING_ORACLE,
        "price-heaping audit: .00/.50/.99 cents-ending mass vs uniform expectation, scaled-integer lifts",
    ),
}
