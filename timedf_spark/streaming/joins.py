"""Watermarked stream-stream interval join (SURVEY.md §2.I — absent from
the reference; extension layer).

Attribution joins — every click followed by a purchase from the same user
within an attribution window — are the canonical stream-stream case: both
sides are unbounded, so the join is only computable because watermarks +
the time-range condition bound how long either side's rows stay in state.
Spark derives the state retention from the condition itself: a click can
only match purchases up to ``window`` later, so clicks older than
(watermark − window) are evicted, keeping state O(active window), not
O(stream length).

One shuffle per side (hash on user_id); the range predicate is evaluated
within co-partitioned state.

Batch twin for validation: the same join on static frames (Spark planners
share the semantics; only state management differs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "attribution_join",
    "attribution_join_batch",
    "attribution_join_left",
    "attribution_join_left_batch",
    "enrichment_join",
    "user_dim",
]

WATERMARK = "10 minutes"
ATTRIBUTION_WINDOW_MIN = 30


def _sides(events: DataFrame) -> tuple[DataFrame, DataFrame]:
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    return clicks, purchases


def _condition():
    return (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW_MIN} MINUTES")
        )
    )


_OUT_COLS = ["c_user", "click_id", "click_ts", "purchase_id", "purchase_ts", "purchase_value"]


def attribution_join(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """Streaming click→purchase attribution. ``events`` is a *streaming*
    (ts, user_id, event_id, event_type, value) frame; both derived sides
    carry the watermark, and the time-range condition bounds state."""
    clicks, purchases = _sides(events)
    return (
        clicks.withWatermark("click_ts", watermark)
        .join(purchases.withWatermark("purchase_ts", watermark), _condition(), "inner")
        .select(*_OUT_COLS)
    )


def attribution_join_batch(events: DataFrame) -> DataFrame:
    """Batch twin: identical condition on static frames."""
    clicks, purchases = _sides(events)
    return clicks.join(purchases, _condition(), "inner").select(*_OUT_COLS)


def attribution_join_left(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """LEFT OUTER stream-stream attribution: every click appears exactly
    once per matching purchase, and clicks with NO purchase inside the
    window are emitted NULL-extended — but only once the watermark has
    passed ``click_ts + window``, the earliest moment "no match" is a
    fact rather than a race.

    This is the semantics an unconverted-click funnel needs (inner join
    silently drops exactly the rows it is about to analyze). State and
    eviction are identical to the inner form — the outer behavior costs
    nothing extra: a click's state row was retained until
    watermark > click_ts + window anyway; on eviction it either produced
    matches already or emits its NULL row. Replay caveat: a single
    ``availableNow`` pass leaves the final watermark at
    max(event_ts) − watermark, so the trailing clicks' NULL rows emit on
    the NEXT trigger — exactly-once overall, never early, never wrong
    (the test pins both directions of that contract).
    """
    clicks, purchases = _sides(events)
    return (
        clicks.withWatermark("click_ts", watermark)
        .join(purchases.withWatermark("purchase_ts", watermark), _condition(), "leftOuter")
        .select(*_OUT_COLS)
    )


def attribution_join_left_batch(events: DataFrame) -> DataFrame:
    """Batch twin of the left-outer form."""
    clicks, purchases = _sides(events)
    return clicks.join(purchases, _condition(), "left").select(*_OUT_COLS)


# --- stream-static enrichment join ----------------------------------------
#
# The other canonical streaming join: an unbounded fact stream enriched
# against a bounded dimension table. No watermark is required — the static
# side is not stateful; Spark re-plans it per micro-batch and (dimension-
# sized) broadcasts it, so the stream side never shuffles for the join.
# At 100 TB/day stream rates this is THE join shape to prefer whenever the
# dimension fits the broadcast threshold; the stream-stream interval join
# above is the fallback when both sides are unbounded.

_USER_SEGMENTS = 8


def user_dim(spark, n_users: int = 10_000) -> DataFrame:
    """Deterministic synthetic user dimension (user_id, segment, tier) —
    stands in for any slowly-changing dimension loaded from a table."""
    return spark.range(n_users).select(
        F.col("id").alias("user_id"),
        (F.col("id") % _USER_SEGMENTS).cast("int").alias("segment"),
        F.when(F.col("id") % 100 < 5, "premium").otherwise("standard").alias("tier"),
    )


def enrichment_join(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Streaming events ⋈ static user dimension (left join keeps events
    whose user is missing from the dimension — NULL-extended, matching
    the batch twin). Works identically on a batch ``events`` frame."""
    return events.join(F.broadcast(dim), "user_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        "segment",
        "tier",
    )
