"""Count-min sketch (Cormode & Muthukrishnan, J. Algorithms '05) —
deterministic, mergeable, and (unusually) ORACLE-CHECKABLE.

The d hash rows use md5 60-bit prefixes of ``row || '|' || item`` —
the same engine-portable construction as the MinHash/SimHash lanes —
so Spark and DuckDB build BIT-IDENTICAL sketches and the driver's
value-hash gate can check the sketch and its estimates exactly, not
just within tolerance. Every count is an exact integer.

Guarantees (pinned in tests): ``est >= true`` always (counts only ever
add), and ``est <= true + N/w`` in expectation per row, taken as a min
over d rows — the classical CMS bound.

Mergeability: sketches merge by cell-wise ADDITION — so the persisted
store (``streaming/cms_apply.py``) folds per-batch sketches and the
result is bit-identical to the one-shot corpus sketch (an EQUALITY
guarantee, stronger than the MG store's bounded-undercount). Addition
is not idempotent, so the store carries the same replay guard as the
rollup store.

Scale posture: the build is one pass over the exploded items with
map-side combine into at most d*w cells (the shuffle is d*w rows
regardless of corpus size); estimation joins a broadcast probe set
against the d*w-row sketch. Nothing is proportional to the corpus but
the scan. At 100 TB, w scales with the error budget (eps = e/w of
total mass), not with the data.

No reference counterpart: intel-ai/timedf has no sketch surface
(SURVEY.md §2 D9 extension row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_build", "cms_build_from_counts", "cms_merge", "cms_estimate", "cms_estimates_sql"]


def _hash_spark(item_sql: str) -> str:
    return (
        "cast(conv(substring(md5(concat(cast(r as string), '|', "
        f"{item_sql})), 1, 15), 16, 10) as bigint)"
    )


def _hash_duck(item_sql: str) -> str:
    return (
        "(('0x' || substr(md5(cast(r as varchar) || '|' || "
        f"{item_sql}), 1, 15))::BIGINT)"
    )


def cms_build(items: DataFrame, item_col: str, d: int, w: int) -> DataFrame:
    """(r, c, cnt) sketch cells over the ``item_col`` column — at most
    d*w rows.

    r11: aggregate to per-item counts BEFORE the d-way explode + md5
    lanes. The lane hash depends only on (r, item), so summing per-item
    counts into cells is cell-identical to counting exploded rows — but
    the md5 work drops from d×rows to d×distinct(items) (30x on zipfian
    token streams, 4x on lineitem keys) and the first shuffle carries
    map-side-combined per-key counts instead of d exploded rows per
    input row."""
    assert d >= 1 and w >= 1
    counts = items.groupBy(F.col(item_col).alias("item")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return cms_build_from_counts(counts, d, w)


def cms_build_from_counts(counts: DataFrame, d: int, w: int) -> DataFrame:
    """Sketch cells from a precomputed per-item count frame (item, n) —
    cell-identical to :func:`cms_build` over the expanded multiset, since
    the lane hash depends only on (r, item). Callers that already compute
    per-key counts (join_size_sketch's exact branch) pass them here so
    the count aggregate is planned ONCE and Spark's exchange reuse shares
    the shuffle between the sketch and the exact consumer — the r11
    eager-checkpoint variant of this sharing serialized the critical path
    and was reverted; identical-subtree reuse costs nothing."""
    assert d >= 1 and w >= 1
    return (
        counts.select(
            "item",
            "n",
            F.explode(F.expr(f"sequence(0, {d - 1})")).alias("r"),
        )
        .withColumn("c", F.expr(f"{_hash_spark('item')} % {w}"))
        .groupBy("r", "c")
        .agg(F.sum("n").alias("cnt"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Cell-wise addition — the PODS'12 mergeable-summary rule for CMS.
    Folding batch sketches this way is bit-identical to sketching the
    concatenated corpus."""
    return (
        a.unionByName(b)
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, d: int, w: int) -> DataFrame:
    """(item, cms_est) for each probe item: min over the d cells, with
    absent cells counting 0. The probe side is exploded to d rows and
    broadcast; the sketch is at most d*w rows."""
    cells = probes.select(
        "item", F.explode(F.expr(f"sequence(0, {d - 1})")).alias("r")
    ).withColumn("c", F.expr(f"{_hash_spark('item')} % {w}"))
    return (
        F.broadcast(cells)
        .join(sketch, ["r", "c"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )


def cms_estimates_sql(
    d: int, w: int, items_sql: str, probe_limit: int
) -> str:
    """DuckDB twin of build + estimate over the exact top-``probe_limit``
    items of ``items_sql`` (a subquery yielding one ``item`` column):
    returns (item, exact_n, cms_est, overcount) — the self-evaluating
    report shape. Identical md5 lanes, identical integer arithmetic."""
    h = _hash_duck("item")
    return f"""
WITH tok AS ({items_sql}),
rows_ AS (SELECT unnest(range(0, {d})) AS r),
cells AS (
  SELECT r, {h} % {w} AS c, count(*) AS cnt
  FROM tok CROSS JOIN rows_ GROUP BY r, c
),
probes AS (
  SELECT item, count(*) AS exact_n FROM tok
  GROUP BY item ORDER BY exact_n DESC, item LIMIT {probe_limit}
),
pcells AS (
  SELECT item, exact_n, r, {h} % {w} AS c FROM probes CROSS JOIN rows_
)
SELECT item, exact_n,
       min(coalesce(cells.cnt, 0)) AS cms_est,
       min(coalesce(cells.cnt, 0)) - exact_n AS overcount
FROM pcells LEFT JOIN cells USING (r, c)
GROUP BY item, exact_n
"""


def cms_inner_product(a: DataFrame, b: DataFrame, d: int) -> DataFrame:
    """1-row (est_rows) estimate of the equi-join output size between
    the two key multisets the sketches summarize: est = min over the d
    rows of Σ_c A[r][c]·B[r][c] (Cormode & Muthukrishnan §4.2 — the
    inner product dominates the true join size, so est >= truth, with
    expected overcount N_a·N_b/w per row). Both sketches are <= d*w
    rows, so this never touches the fact tables."""
    from pyspark.sql import functions as F  # local: keep module header lean

    prod = (
        a.join(b.withColumnRenamed("cnt", "cnt_b"), ["r", "c"])
        .groupBy("r")
        .agg(F.sum(F.expr("cnt * cnt_b")).alias("ip"))
    )
    rows = a.sparkSession.range(d).select(F.col("id").alias("r"))
    return (
        rows.join(prod, "r", "left")
        .agg(F.min(F.coalesce("ip", F.lit(0))).alias("est_rows"))
    )


def cms_join_size_sql(d: int, w: int, a_keys_sql: str, b_keys_sql: str) -> str:
    """DuckDB twin of build(A) + build(B) + inner product: returns one
    row (est_rows). Identical md5 lanes and integer arithmetic."""
    h = _hash_duck("item")
    return f"""
WITH rows_ AS (SELECT unnest(range(0, {d})) AS r),
a_cells AS (
  SELECT r, {h} % {w} AS c, count(*) AS cnt
  FROM ({a_keys_sql}) CROSS JOIN rows_ GROUP BY r, c
),
b_cells AS (
  SELECT r, {h} % {w} AS c, count(*) AS cnt
  FROM ({b_keys_sql}) CROSS JOIN rows_ GROUP BY r, c
),
prod AS (
  SELECT a_cells.r, sum(a_cells.cnt * b_cells.cnt) AS ip
  FROM a_cells JOIN b_cells USING (r, c) GROUP BY a_cells.r
)
SELECT cast(min(coalesce(prod.ip, 0)) AS BIGINT) AS est_rows
FROM rows_ LEFT JOIN prod USING (r)
"""
