"""As-of (most-recent-event) join — C3 roadmap operator (absent from both
the reference and vanilla Spark).

Implementation is the scalable union-window technique, not a pairwise
range join: tag left/right rows, union, then one window pass per key
carries the latest right-side attributes forward in time order. Cost is a
single shuffle on the key (the window's partitioning) — O(n log n_partition)
— versus the quadratic blowup of a naive non-equi join; this is how you'd
do it for a 100 TB trade/quote alignment.

Tie rules match DuckDB's ASOF JOIN (the oracle): right row with the
greatest ts ≤ left ts wins; right rows sort before left rows at equal ts
(>= semantics); right side must be unique per (key, ts) — callers dedupe
with max_by first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    carry_cols: list[str],
) -> DataFrame:
    """For each left row, attach ``carry_cols`` of the latest right row with
    right.ts <= left.ts on the same key. Left rows keep NULL carries when no
    right row precedes them (left-outer semantics)."""
    lcols = [c for c in left.columns]
    # Carry ONE struct of all carry_cols, not each column independently:
    # last(col, ignorenulls) per column would skip over a matching right
    # row whose attribute is NULL (carrying a stale value, and potentially
    # mixing attributes from different right rows) — diverging from DuckDB
    # ASOF JOIN, which always takes every attribute from the single
    # greatest-ts-<= right row, NULLs included.
    tagged_r = right.select(
        key, ts, F.lit(0).alias("__src"),
        F.struct(*[F.col(c) for c in carry_cols]).alias("__carry"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, ts)],
    )
    carry_struct_t = tagged_r.schema["__carry"].dataType
    tagged_l = left.select(
        key, ts, F.lit(1).alias("__src"),
        F.lit(None).cast(carry_struct_t).alias("__carry"),
        *[F.col(c) for c in lcols if c not in (key, ts)],
    )
    unioned = tagged_r.unionByName(tagged_l)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__carry", ignorenulls=True).over(w).alias("__carried")
    )
    out = carried.filter(F.col("__src") == 1).select(
        key,
        ts,
        *[F.col(c) for c in lcols if c not in (key, ts)],
        *[F.col(f"__carried.{c}").alias(c) for c in carry_cols],
    )
    return out
