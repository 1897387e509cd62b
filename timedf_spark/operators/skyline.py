"""Distributed exact 2-D Pareto skyline (minimize x, maximize y).

The classical skyline operator (Börzsönyi et al., ICDE'01 "The Skyline
Operator") — the multi-objective shortlist move a data-curation pass
uses to pick documents that are simultaneously short AND high-quality,
or parts that are cheap AND large, without collapsing the objectives
into one weighted score.

Plan shape (exact at any scale, no all-pairs comparison):

1. ``groupBy(x).max(y)`` — within one x, only the max-y row can be
   non-dominated (equal x, strictly larger y dominates). One key
   shuffle; output is |distinct x|.
2. **Bucket prune**: bucket the distinct-x frame into ``bucket_count``
   fixed-width ranges of x (range from a 1-row broadcast agg), compute
   per-bucket max y, and a running max over strictly-earlier buckets
   (window over ≤ bucket_count rows — driver-tiny). A point survives
   only if its y exceeds every earlier bucket's max: anything pruned is
   provably dominated (earlier bucket ⇒ strictly smaller x, and the
   bucket max has ≥ y). This is the distributed local-skyline/merge
   pattern: the survivor set is ~skyline-sized, not data-sized.
3. **Final exact pass**: running max of y over survivors ordered by x
   (single-partition window over the skyline-sized survivor frame —
   bounded by step 2, documented here as the sequential merge every
   exact skyline needs).

Dominance uses the standard strict definition: q dominates p iff
q.x <= p.x AND q.y >= p.y AND (q.x < p.x OR q.y > p.y). Ties on both
coordinates are mutually non-dominating; all such rows are kept.

Reference parity: none (intel-ai/timedf has no multi-objective
operator surface); skyline is a first-class curation primitive here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skyline_2d"]


def skyline_2d(
    df: DataFrame,
    x: str,
    y: str,
    bucket_count: int = 1000,
) -> DataFrame:
    """Exact (x, y) skyline pairs minimizing ``x`` and maximizing ``y``.

    Returns one row per surviving (x, y): per distinct x the max y,
    filtered to non-dominated pairs. Join back to the source frame on
    (x, y) equality to recover full rows (all rows at a skyline pair
    are mutually non-dominating and belong to the skyline).
    """
    pts = df.select(x, y).where(F.col(x).isNotNull() & F.col(y).isNotNull())
    best = pts.groupBy(x).agg(F.max(y).alias(y))

    rng = best.agg(F.min(x).alias("_lo"), F.max(x).alias("_hi"))
    width = (F.col("_hi") - F.col("_lo")) / F.lit(bucket_count)
    bucketed = (
        best.join(F.broadcast(rng))
        .withColumn(
            "_b",
            F.when(
                F.col("_hi") > F.col("_lo"),
                F.least(
                    F.lit(bucket_count - 1),
                    F.floor((F.col(x) - F.col("_lo")) / width).cast("int"),
                ),
            ).otherwise(F.lit(0)),
        )
        .drop("_lo", "_hi")
    )
    # <= bucket_count rows: the window below is single-partition by
    # construction and bounded, not a scale hazard.
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    bucket_prev = (
        bucketed.groupBy("_b")
        .agg(F.max(y).alias("_by"))
        .withColumn("_prev", F.max("_by").over(wb))
        .select("_b", "_prev")
    )
    survivors = bucketed.join(F.broadcast(bucket_prev), "_b").where(
        F.col("_prev").isNull() | (F.col(y) > F.col("_prev"))
    )

    # Survivor frame is ~skyline-sized (step-2 bound); the sequential
    # merge every exact skyline requires runs here, on the small frame.
    wf = Window.orderBy(x).rowsBetween(Window.unboundedPreceding, -1)
    return (
        survivors.withColumn("_rm", F.max(y).over(wf))
        .where(F.col("_rm").isNull() | (F.col(y) > F.col("_rm")))
        .select(x, y)
    )
