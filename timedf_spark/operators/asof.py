"""As-of (most-recent-event) join — C3 roadmap operator (absent from both
the reference and vanilla Spark), all three pandas ``merge_asof``
directions.

Implementation is the scalable union-window technique, not a pairwise
range join: tag left/right rows, union, then one window pass per key
carries the latest right-side attributes forward in time order. Cost is a
single shuffle on the key (the window's partitioning) — O(n log n_partition)
— versus the quadratic blowup of a naive non-equi join; this is how you'd
do it for a 100 TB trade/quote alignment. ``nearest`` evaluates the
backward and forward carries as two window frames over the SAME hash
partitioning (one exchange, two sorts) and picks per-row by distance.

Tie rules match DuckDB's ASOF JOIN (the oracle) for backward: right row
with the greatest ts <= left ts wins; right rows sort before left rows at
equal ts (>= semantics). Forward mirrors it (smallest ts >= left ts);
nearest prefers backward on equal distance (pandas behavior, pinned by
the merge_asof parity test). Right side must be unique per (key, ts) —
callers dedupe with max_by first.
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
    direction: str = "backward",
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row, attach ``carry_cols`` of the matched right row:
    direction='backward' → latest right with right.ts <= left.ts,
    'forward' → earliest right with right.ts >= left.ts,
    'nearest' → the closer of the two (backward wins ties).
    Left rows keep NULL carries when no right row matches (left-outer).

    ``tolerance_us`` (pandas ``merge_asof(tolerance=...)`` parity): a
    candidate further than this many integer microseconds is no match —
    the row keeps NULL carries. Applied per-side before the nearest pick
    (pandas semantics: both sides out of range ⇒ no match). Exact int64
    µs comparison, zero extra shuffle (a projection gate on the already
    carried struct)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = [c for c in left.columns]
    # Carry ONE struct of (ts + all carry_cols), not each column
    # independently: last(col, ignorenulls) per column would skip over a
    # matching right row whose attribute is NULL (carrying a stale value,
    # and potentially mixing attributes from different right rows) —
    # diverging from DuckDB ASOF JOIN, which always takes every attribute
    # from the single matched right row, NULLs included. The ts lives in
    # the struct so 'nearest' can compare distances.
    tagged_r = right.select(
        key, ts, F.lit(0).alias("__src"),
        F.struct(F.col(ts).alias("__rts"), *[F.col(c) for c in carry_cols]).alias("__carry"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (key, ts)],
    )
    carry_struct_t = tagged_r.schema["__carry"].dataType
    tagged_l = left.select(
        key, ts, F.lit(1).alias("__src"),
        F.lit(None).cast(carry_struct_t).alias("__carry"),
        *[F.col(c) for c in lcols if c not in (key, ts)],
    )
    unioned = tagged_r.unionByName(tagged_l)

    # backward: right rows sort BEFORE left at equal ts (src asc) so the
    # unbounded-preceding frame includes exact matches; forward mirrors it
    # (src desc + unbounded-following frame).
    w_bwd = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("__src").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )

    def _gate(col: F.Column, dist: F.Column) -> F.Column:
        """NULL out a carried match beyond the tolerance."""
        if tolerance_us is None:
            return col
        return F.when(dist <= F.lit(tolerance_us), col)

    if direction == "backward":
        m = F.last("__carry", ignorenulls=True).over(w_bwd)
        dist = F.unix_micros(F.col(ts)) - F.unix_micros(m["__rts"])
        carried = unioned.select("*", _gate(m, dist).alias("__m"))
    elif direction == "forward":
        m = F.first("__carry", ignorenulls=True).over(w_fwd)
        dist = F.unix_micros(m["__rts"]) - F.unix_micros(F.col(ts))
        carried = unioned.select("*", _gate(m, dist).alias("__m"))
    else:  # nearest
        both = unioned.select(
            "*",
            F.last("__carry", ignorenulls=True).over(w_bwd).alias("__b0"),
            F.first("__carry", ignorenulls=True).over(w_fwd).alias("__f0"),
        )
        # exact integer microsecond timeline — a double epoch would not
        # represent microsecond timestamps exactly, so equal-distance
        # tie-breaks at fine granularity could diverge from pandas'
        # integer-nanosecond arithmetic
        bwd_dist = F.unix_micros(F.col(ts)) - F.unix_micros(F.col("__b0.__rts"))
        fwd_dist = F.unix_micros(F.col("__f0.__rts")) - F.unix_micros(F.col(ts))
        both = both.select(
            "*",
            _gate(F.col("__b0"), bwd_dist).alias("__b"),
            _gate(F.col("__f0"), fwd_dist).alias("__f"),
        )
        pick = (
            F.when(F.col("__b").isNull(), F.col("__f"))
            .when(F.col("__f").isNull(), F.col("__b"))
            .when(bwd_dist <= fwd_dist, F.col("__b"))  # tie → backward
            .otherwise(F.col("__f"))
        )
        carried = both.select("*", pick.alias("__m"))

    return carried.filter(F.col("__src") == 1).select(
        key,
        ts,
        *[F.col(c) for c in lcols if c not in (key, ts)],
        *[F.col(f"__m.{c}").alias(c) for c in carry_cols],
    )
