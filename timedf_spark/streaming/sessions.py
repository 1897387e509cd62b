"""Structured Streaming operators over the events stream (SURVEY.md §2.I —
absent from the reference; extension layer).

Each builder takes a *streaming* DataFrame with (ts, user_id, event_type,
value) and returns the windowed aggregation; tests drive them with the
rate source / file source replaying events.parquet. The same builders work
on a Kafka source in production — the plan is source-agnostic.

Scale notes: watermarks bound state (late rows beyond 10 min are dropped —
state store size is O(active windows), not O(stream length)); the RocksDB
state store (set in session profiles) keeps large session state off-heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tumbling_counts", "sliding_value_sums", "session_rollup"]

WATERMARK = "10 minutes"


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per-event-type counts in tumbling windows (late data handled by
    watermark; output mode append once the watermark passes window end)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", width).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("win.start", "win.end", "event_type", "n_events")
    )


def sliding_value_sums(
    events: DataFrame, width: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Sliding-window sum of ``value`` per user."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", width, slide).alias("win"), "user_id")
        .agg(F.sum("value").alias("value_sum"))
        .select("win.start", "win.end", "user_id", "value_sum")
    )


def session_rollup(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Native session windows — the streaming twin of
    operators/sessionize.py (same gap semantics, incremental state)."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("value_sum"))
        .select("win.start", "win.end", "user_id", "n_events", "value_sum")
    )
