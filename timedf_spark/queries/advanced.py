"""Advanced relational coverage: rollup/cube (D16 gap), set ops (G4 gap),
exact median (D7), argmax/group-last (D8), as-of join and range join (C3
gap) — each SURVEY.md §2 "absent" row implemented Spark-first with a DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import davg, dsum
from timedf_spark.operators.asof import asof_join
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# ---- rollup (D16) ---------------------------------------------------------

_REV = dsum("l_extendedprice * (1 - l_discount)")


def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical totals (flag → flag+status → grand total) in one pass —
    Spark expands rollup to a single partial-agg + shuffle, not 3 scans."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.expr(_REV).alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
    )


ROLLUP_ORACLE = f"""
SELECT l_returnflag, l_linestatus, {_REV} AS revenue, count(*) AS n_rows
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations of (returnflag, linestatus) in one
    pass — Spark expands the grouping sets before the single partial-agg
    shuffle, so the cost is one scan regardless of the set count."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.expr(_REV).alias("revenue"), F.count(F.lit(1)).alias("n_rows"))
    )


CUBE_ORACLE = f"""
SELECT l_returnflag, l_linestatus, {_REV} AS revenue, count(*) AS n_rows
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

# ---- per-group OLS regression (distributed ML fit, closed form) -----------
#
# slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²); every Σ is the quantized decimal
# sum, so the whole fit is a single partial+final aggregation pass that is
# bit-identical across engines and partitionings — the one-pass distributed
# normal-equations pattern ml.py::fit_ridge uses, here SQL-expressible and
# oracle-checked. x = quantity, y = extendedprice, grouped by returnflag.

_SX = dsum("l_quantity")
_SY = dsum("l_extendedprice")
_SXY = dsum("l_quantity * l_extendedprice")
_SXX = dsum("l_quantity * l_quantity")

_OLS_BODY = f"""
SELECT l_returnflag,
       count(*) AS n_rows,
       (count(*) * {_SXY} - {_SX} * {_SY})
         / (count(*) * {_SXX} - {_SX} * {_SX}) AS slope,
       ({_SY} - (count(*) * {_SXY} - {_SX} * {_SY})
         / (count(*) * {_SXX} - {_SX} * {_SX}) * {_SX}) / count(*) AS intercept
FROM lineitem
GROUP BY l_returnflag
"""


def linreg_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_OLS_BODY)

# ---- set operations (G4) --------------------------------------------------


def repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers ordering in both 1995 and 1996."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter("year(o_orderdate) = 1995").select("o_custkey")
    y96 = orders.filter("year(o_orderdate) = 1996").select("o_custkey")
    return y95.intersect(y96)


REPEAT_ORACLE = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""


def churned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: ordered in 1995, never in 1996."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter("year(o_orderdate) = 1995").select("o_custkey")
    y96 = orders.filter("year(o_orderdate) = 1996").select("o_custkey")
    # subtract = SQL EXCEPT (set semantics); exceptAll would keep custkeys
    # appearing in both years whenever 1995 had more orders than 1996
    return y95.subtract(y96)


CHURNED_ORACLE = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
"""

# ---- exact median (D7: the reference's median aggregation policy) ---------


def median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per group (ref: report agg policy 'median',
    report_xlsx.py:111-117). Spark percentile() == DuckDB quantile_cont —
    l_quantity is integral so interpolation lands on .0/.5 exactly.
    At 100 TB use approx_percentile instead (single-pass sketch)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.expr("percentile(l_quantity, 0.5)").alias("median_qty"))
    )


MEDIAN_ORACLE = """
SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty
FROM lineitem GROUP BY l_returnflag
"""


def quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p25/p50/p75/p95 per group in one aggregation pass (the full
    D7 quantile policy, not just the median). l_quantity is integral, so
    linear interpolation hits exact .0/.25/.5/.75 grid values in both
    engines. At 100 TB swap for approx_percentile (t-digest sketch,
    single-pass, mergeable) — the query shape is unchanged."""
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_quantity, {v})").alias(n)
                for n, v in qs.items()
            ]
        )
    )


QUANTILE_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       quantile_cont(l_quantity, 0.95) AS p95
FROM lineitem GROUP BY l_returnflag
"""


def approx_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB twin of quantile_profile: approx_percentile's sketch
    (GK-style, error ≤ 1/accuracy rank fraction) is single-pass and
    MERGEABLE — partial sketches combine map-side, so the shuffle carries
    one sketch per group per partition, never the values.

    The sketch output is engine-specific by construction, so the
    hash-checkable surface is the exact per-group percentiles plus an
    in-query attestation that the sketch landed within 2% relative
    (floor 1.0) of each — ``ok_*`` flags matching the local tolerance
    test's bound; a deterministic-bound oracle instead of a permanent
    rows-only row. Production callers use ``approx_percentile`` alone;
    here the exact twin shares the single grouped aggregate pass."""
    qs = {"p25": 0.25, "p50": 0.5, "p75": 0.75, "p95": 0.95}
    agg = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            *[
                F.expr(f"percentile(l_quantity, {v})").alias(n)
                for n, v in qs.items()
            ],
            *[
                F.expr(f"approx_percentile(l_quantity, {v}, 10000)").alias(f"est_{n}")
                for n, v in qs.items()
            ],
        )
    )
    return agg.select(
        "l_returnflag",
        *[F.col(n) for n in qs],
        *[
            (
                F.abs(F.col(f"est_{n}") - F.col(n))
                <= F.greatest(F.lit(1.0), F.lit(0.02) * F.abs(F.col(n)))
            ).alias(f"ok_{n}")
            for n in qs
        ],
    )


APPROX_QUANTILE_ORACLE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.5)  AS p50,
       quantile_cont(l_quantity, 0.75) AS p75,
       quantile_cont(l_quantity, 0.95) AS p95,
       TRUE AS ok_p25, TRUE AS ok_p50, TRUE AS ok_p75, TRUE AS ok_p95
FROM lineitem GROUP BY l_returnflag
"""


# ---- group-last / argmax (D8) ---------------------------------------------


def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by with a composite (date, key) ordering — deterministic
    'last row per group' (ref groupby().last(), report_xlsx.py:150,164 —
    which is order-sensitive; the composite key makes it well-defined).
    The ordering key is a sortable string date||zero-padded-key because
    DuckDB's arg_max (the oracle) cannot order by struct."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.expr(
                "max_by(o_orderkey, concat(date_format(o_orderdate, 'yyyyMMddHHmmss'),"
                " lpad(cast(o_orderkey as string), 12, '0')))"
            ).alias("last_orderkey"),
            F.expr("max(o_orderdate)").alias("last_orderdate"),
        )
    )


LATEST_ORDER_ORACLE = """
SELECT o_custkey,
       arg_max(o_orderkey, concat(strftime(o_orderdate, '%Y%m%d%H%M%S'),
                                  lpad(cast(o_orderkey as varchar), 12, '0'))) AS last_orderkey,
       max(o_orderdate) AS last_orderdate
FROM orders GROUP BY o_custkey
"""

# ---- as-of join (C3) ------------------------------------------------------


def asof_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase at-or-before it."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = (
        events.filter("event_type = 'purchase'")
        .groupBy("user_id", "ts")  # unique (key, ts) — ASOF tie rule
        .agg(
            F.expr("max(event_id)").alias("purchase_id"),
            F.expr("max_by(value, event_id)").alias("purchase_value"),
        )
    )
    out = asof_join(clicks, purchases, key="user_id", ts="ts", carry_cols=["purchase_id", "purchase_value"])
    return out.select(
        "click_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        "purchase_id",
        "purchase_value",
    )


ASOF_ORACLE = """
WITH clicks AS (
  SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, max(event_id) AS purchase_id,
         arg_max(value, event_id) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.click_id, c.user_id, c.ts AS click_ts, p.purchase_id, p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""

# ---- range join (C3) ------------------------------------------------------


def clicks_before_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: count of same-user clicks in the preceding 10 min.
    Equi-key (user_id) + range predicate → Spark executes a hash join with
    the range as a post-filter; no cartesian explosion. (Pure interval
    joins without an equi-key would use bucketized time-bin keys.)"""
    events = load_table(spark, sf_dir, "events")
    errors = events.filter("event_type = 'error'").select(
        "user_id", F.col("event_id").alias("error_id"), F.col("ts").alias("err_ts")
    )
    clicks = events.filter("event_type = 'click'").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    joined = errors.join(
        clicks,
        (errors.user_id == clicks.user_id)
        & (clicks.click_ts >= F.expr("err_ts - INTERVAL 10 MINUTE"))
        & (clicks.click_ts < F.col("err_ts")),
        "left",
    )
    return joined.groupBy("error_id").agg(F.count("click_id").alias("n_recent_clicks"))


RANGE_JOIN_ORACLE = """
WITH errors AS (
  SELECT user_id, event_id AS error_id, ts AS err_ts FROM events WHERE event_type = 'error'
),
clicks AS (
  SELECT user_id, event_id AS click_id, ts AS click_ts FROM events WHERE event_type = 'click'
)
SELECT e.error_id, count(c.click_id) AS n_recent_clicks
FROM errors e LEFT JOIN clicks c
  ON e.user_id = c.user_id
 AND c.click_ts >= e.err_ts - INTERVAL 10 MINUTE
 AND c.click_ts < e.err_ts
GROUP BY e.error_id
"""


# --- forward as-of join (merge_asof direction='forward') -------------------
#
# The mirror of asof_click_purchase: for every click, the user's NEXT
# error at-or-after it — the time-to-failure shape. Same union-window
# implementation (operators/asof.py, direction='forward'), same single
# key shuffle. The oracle is the decorrelated min-over-range twin.


def asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter("event_type = 'click'").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    errors = (
        events.filter("event_type = 'error'")
        .groupBy("user_id", "ts")  # unique (key, ts) — ASOF tie rule
        .agg(F.expr("min_by(value, event_id)").alias("err_value"))
        .withColumn("err_ts", F.col("ts"))
    )
    out = asof_join(
        clicks, errors, key="user_id", ts="ts",
        carry_cols=["err_ts", "err_value"], direction="forward",
    )
    return out.select(
        "click_id", "user_id", F.col("ts").alias("click_ts"), "err_ts", "err_value"
    )


ASOF_FORWARD_ORACLE = """
WITH errors_d AS (
  SELECT user_id, ts, arg_min(value, event_id) AS err_value
  FROM events WHERE event_type = 'error' GROUP BY user_id, ts
),
clicks AS (
  SELECT user_id, ts, event_id AS click_id FROM events WHERE event_type = 'click'
),
nxt AS (
  SELECT c.user_id, c.ts, c.click_id, min(e.ts) AS err_ts
  FROM clicks c LEFT JOIN errors_d e
    ON e.user_id = c.user_id AND e.ts >= c.ts
  GROUP BY c.user_id, c.ts, c.click_id
)
SELECT n.click_id, n.user_id, n.ts AS click_ts, n.err_ts, e.err_value
FROM nxt n LEFT JOIN errors_d e ON e.user_id = n.user_id AND e.ts = n.err_ts
"""


# --- rank-based winsorized mean (robust statistics, two-pass) --------------
#
# Winsorization clamps a metric to its per-group [p05, p95] before
# averaging — the standard robust-mean used in metric pipelines where a
# handful of corrupt rows would otherwise drag the mean. The bounds are
# defined by RANK (the value at position ceil(q*n) of the sorted group),
# not by interpolated percentile: interpolation arithmetic is
# formula-dependent across engines for non-representable fractions, while
# "the k-th smallest value" is a pure multiset position — engine-exact for
# any value distribution. ceil(0.05*n) itself is one IEEE multiply of an
# integer + ceil: identical everywhere.
#
# Plan: one window sort per group (rank + count), bounds extracted by two
# equality filters (tiny one-row-per-group frames, broadcast back), clamp
# + quantized mean. At 100 TB the window sort is the cost — same shape as
# any per-group ranking; for sketch-tolerant uses swap bounds for
# approx_percentile and keep the clamp/mean stages unchanged.

_WINS_LO_Q = "0.05"
_WINS_HI_Q = "0.95"


def winsorized_price_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = li.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("l_returnflag"))
    )
    lo = ranked.filter(
        F.expr(f"rn = greatest(1e0, ceil({_WINS_LO_Q} * n))")
    ).select(F.col("l_returnflag").alias("g_lo"), F.col("l_extendedprice").alias("lo"))
    hi = ranked.filter(F.expr(f"rn = ceil({_WINS_HI_Q} * n)")).select(
        F.col("l_returnflag").alias("g_hi"), F.col("l_extendedprice").alias("hi")
    )
    bounded = (
        li.join(F.broadcast(lo), li.l_returnflag == lo.g_lo)
        .join(F.broadcast(hi), li.l_returnflag == hi.g_hi)
        .select(
            "l_returnflag",
            F.expr("greatest(least(l_extendedprice, hi), lo)").alias("clamped"),
            "lo",
            "hi",
        )
    )
    return bounded.groupBy("l_returnflag").agg(
        F.expr(davg("clamped")).alias("winsorized_mean"),
        F.first("lo").alias("p05_bound"),
        F.first("hi").alias("p95_bound"),
    )


WINSORIZED_ORACLE = f"""
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem
),
lo AS (SELECT l_returnflag AS g_lo, l_extendedprice AS lo FROM ranked
       WHERE rn = greatest(1e0, ceil({_WINS_LO_Q} * n))),
hi AS (SELECT l_returnflag AS g_hi, l_extendedprice AS hi FROM ranked
       WHERE rn = ceil({_WINS_HI_Q} * n))
SELECT l.l_returnflag,
       {davg("greatest(least(l_extendedprice, hi), lo)")} AS winsorized_mean,
       first(lo) AS p05_bound,
       first(hi) AS p95_bound
FROM lineitem l
JOIN lo ON l.l_returnflag = g_lo
JOIN hi ON l.l_returnflag = g_hi
GROUP BY l.l_returnflag
"""

# --- hot-key skew report (cluster-planning introspection) ------------------
#
# The first question before running a big join at 100 TB: how skewed is
# the key? This op reports the heaviest keys with their share of the
# table — the direct input to the broadcast / salt / AQE-skew-join
# decision (operators/skew.py). Counts are exact integers; the share is
# one IEEE division — engine-exact.

_SKEW_TOP_K = 20


def key_skew_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    counts = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_rows"))
    total = F.broadcast(counts.agg(F.sum("n_rows").cast("long").alias("total")))
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n_rows"), F.asc("user_id"))
    return (
        counts.crossJoin(total)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _SKEW_TOP_K)
        .select(
            "rank",
            "user_id",
            "n_rows",
            F.expr("cast(n_rows as double) / cast(total as double)").alias("share"),
        )
    )


KEY_SKEW_ORACLE = f"""
WITH counts AS (SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id),
tot AS (SELECT cast(sum(n_rows) as bigint) AS total FROM counts),
ranked AS (
  SELECT row_number() OVER (ORDER BY n_rows DESC, user_id ASC) AS rank,
         user_id, n_rows, cast(n_rows as double) / cast(total as double) AS share
  FROM counts, tot
)
SELECT rank, user_id, n_rows, share FROM ranked WHERE rank <= {_SKEW_TOP_K}
"""


SUITE = {
    "rollup_revenue": QuerySpec("rollup_revenue", rollup_revenue, ROLLUP_ORACLE, "ROLLUP hierarchy totals (D16)"),
    "asof_next_error": QuerySpec(
        "asof_next_error", asof_next_error, ASOF_FORWARD_ORACLE,
        "forward as-of join: next error per click (merge_asof direction=forward)",
    ),
    "winsorized_price_mean": QuerySpec(
        "winsorized_price_mean", winsorized_price_mean, WINSORIZED_ORACLE,
        "rank-based winsorized mean (robust statistics; engine-exact bounds)",
    ),
    "key_skew_stats": QuerySpec(
        "key_skew_stats", key_skew_stats, KEY_SKEW_ORACLE,
        "hot-key skew report: top-20 keys with exact share of table",
    ),
    "cube_revenue": QuerySpec("cube_revenue", cube_revenue, CUBE_ORACLE, "CUBE grouping sets (D16)"),
    "linreg_by_flag": QuerySpec(
        "linreg_by_flag", linreg_by_flag, _OLS_BODY,
        "per-group OLS fit via one-pass quantized normal equations (K)",
    ),
    "repeat_customers": QuerySpec("repeat_customers", repeat_customers, REPEAT_ORACLE, "INTERSECT (G4)"),
    "churned_customers": QuerySpec("churned_customers", churned_customers, CHURNED_ORACLE, "EXCEPT (G4)"),
    "median_quantity": QuerySpec("median_quantity", median_quantity, MEDIAN_ORACLE, "exact median (D7)"),
    "approx_quantile_profile": QuerySpec(
        "approx_quantile_profile", approx_quantile_profile,
        APPROX_QUANTILE_ORACLE,
        "mergeable-sketch percentiles attested within 2% of the exact profile (D7 at scale, deterministic-bound oracle)",
    ),
    "quantile_profile": QuerySpec(
        "quantile_profile", quantile_profile, QUANTILE_ORACLE, "exact multi-quantile profile (D7)"
    ),
    "latest_order_per_customer": QuerySpec(
        "latest_order_per_customer", latest_order_per_customer, LATEST_ORDER_ORACLE, "argmax / group-last (D8)"
    ),
    "asof_click_purchase": QuerySpec(
        "asof_click_purchase", asof_click_purchase, ASOF_ORACLE, "as-of join via union-window (C3)"
    ),
    "clicks_before_errors": QuerySpec(
        "clicks_before_errors", clicks_before_errors, RANGE_JOIN_ORACLE, "range join w/ equi-key (C3)"
    ),
}
