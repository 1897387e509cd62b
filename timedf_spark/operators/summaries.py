"""Mergeable distribution summaries: exact equi-depth histograms from a
mergeable per-value count store, and Misra-Gries heavy-hitter summaries
(Misra & Gries '82; merge rule per Agarwal et al., "Mergeable
Summaries", PODS 2012).

Both follow the pattern proven by the HLL sketch store and the exact
rollup store (``functions/sketches.py``, ``operators/rollup.py``): the
STORED state is mergeable by construction (per-value counts merge by
addition; MG summaries merge by add-then-threshold-reduce), so a
streaming maintenance loop folds delta batches without fact rescans,
and the batch finisher is a pure function of the state.

Scale notes
-----------
* Equi-depth boundaries need a cumulative sum over the DISTINCT-VALUE
  frame ordered by value — a single-partition window, deliberately: the
  frame is value-grain, bounded by the quantization the caller applies
  (e.g. whole currency units), not row-grain. At 100 TB the row scan is
  the distributed aggregation into per-value counts; the boundary pass
  touches only the (small) count table.
* The MG reduction needs only the top k+1 counts — implemented as
  ``orderBy().limit(k+1)`` (Spark TakeOrdered: per-partition top-(k+1)
  then a tiny driver merge, never a global sort shuffle); survivors are
  a subset of the top k by construction, so the full count table is
  never windowed.

No reference counterpart: intel-ai/timedf has no histogram or
heavy-hitter surface (SURVEY.md §2 D16/H11 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "equidepth_from_counts",
    "equidepth_histogram",
    "equidepth_sql",
    "mg_reduce",
    "mg_merge",
    "mg_summary_sql",
]


def equidepth_from_counts(counts: DataFrame, k: int) -> DataFrame:
    """(v, n) per-value counts → k equi-depth buckets
    (bucket, lo, hi, n_rows).

    Bucket assignment is EXACT integer arithmetic on the cumulative
    count: value v lands in bucket ``(rows_before_v * k) div total`` —
    every duplicate of a value shares its bucket, so bucket populations
    are equal up to value multiplicity (the classical equi-depth
    semantics for discrete data). Identical expression on the DuckDB
    side; no float division anywhere near a bucket boundary."""
    w_cum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    b = counts.select(
        "v",
        "n",
        F.coalesce(F.sum("n").over(w_cum), F.lit(0)).alias("cum"),
        F.sum("n").over(w_all).alias("tot"),
    )
    return (
        b.withColumn("bucket", F.expr(f"(cum * {k}) div tot"))
        .groupBy("bucket")
        .agg(
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.sum("n").alias("n_rows"),
        )
    )


def equidepth_histogram(df: DataFrame, value_expr: str, k: int) -> DataFrame:
    """Equi-depth histogram of ``value_expr`` (a SQL expression yielding
    an integral value — quantize floats first) over ``df``."""
    counts = df.select(F.expr(value_expr).alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("n")
    )
    return equidepth_from_counts(counts, k)


def equidepth_sql(table: str, value_expr_sql: str, k: int) -> str:
    """DuckDB twin of equidepth_histogram — same integer bucket math.
    HUGEINT-sensitive aggregates are cast back to bigint (the harness is
    Arrow-dtype-strict)."""
    return f"""
WITH c AS (
  SELECT {value_expr_sql} AS v, count(*) AS n FROM {table} GROUP BY 1
),
b AS (
  SELECT v, n,
         coalesce(sum(n) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS cum,
         sum(n) OVER () AS tot
  FROM c
)
SELECT cast((cum * {k}) // tot AS bigint) AS bucket,
       min(v) AS lo, max(v) AS hi, cast(sum(n) AS bigint) AS n_rows
FROM b GROUP BY 1
"""


def mg_reduce(counts: DataFrame, k: int) -> DataFrame:
    """Reduce an (item, cnt) count table to a Misra-Gries summary of at
    most ``k`` counters: subtract the (k+1)-th largest count from every
    counter and keep the strictly positive ones — the one-shot form of
    the classical decrement loop, and exactly the reduction step of the
    PODS'12 mergeable-summaries construction. Underestimates only:
    ``est <= true`` and ``true - est <= n_total/(k+1)`` after any merge
    sequence.

    Only the top k+1 counts can survive or set the threshold, so the
    plan is a TakeOrdered + a 1-row broadcast threshold join — the full
    count table is scanned once (for the top-k+1) and never sorted
    globally."""
    top = counts.orderBy(F.desc("cnt"), F.asc("item")).limit(k + 1)
    w = Window.orderBy(F.desc("cnt"), F.asc("item"))
    ranked = top.withColumn("rk", F.row_number().over(w))
    thr = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == k + 1, F.col("cnt"))), F.lit(0).cast("long")
        ).alias("thr")
    )
    return (
        ranked.crossJoin(F.broadcast(thr))
        .filter(F.col("cnt") > F.col("thr"))
        .select("item", (F.col("cnt") - F.col("thr")).alias("est_count"))
    )


def mg_merge(base: DataFrame, delta_counts: DataFrame, k: int) -> DataFrame:
    """Merge an MG summary (item, est_count) with a delta count table
    (item, cnt): add counters, re-reduce. Exact counts ARE an MG summary
    with zero error, so folding per-batch exact counts through this is
    the streaming maintenance step; each merge adds at most
    n_batch/(k+1) undercount."""
    combined = (
        base.select("item", F.col("est_count").alias("cnt"))
        .unionByName(delta_counts.select("item", "cnt"))
        .groupBy("item")
        .agg(F.sum("cnt").alias("cnt"))
    )
    return mg_reduce(combined, k)


def mg_summary_sql(k: int, tokens_sql: str, item_filter: str = "TRUE") -> str:
    """DuckDB twin of the one-shot (single-batch) MG summary over a
    token stream subquery yielding one ``token`` column; ``item_filter``
    is applied to the token rows before counting."""
    return f"""
WITH tok AS ({tokens_sql}),
c AS (SELECT token AS item, count(*) AS cnt FROM tok WHERE {item_filter} GROUP BY 1),
r AS (SELECT item, cnt, row_number() OVER (ORDER BY cnt DESC, item) AS rk FROM c),
t AS (SELECT coalesce(max(CASE WHEN rk = {k + 1} THEN cnt END), 0) AS thr
      FROM r WHERE rk <= {k + 1})
SELECT item, cast(cnt - thr AS bigint) AS est_count
FROM r, t WHERE cnt > thr
"""
