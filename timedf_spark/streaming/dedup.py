"""Streaming exact deduplication — the batch dedup tier's streaming twin.

For a continuously-arriving corpus (the realistic shape of a training-data
pipeline: documents land on a queue, not in a finished table), exact dedup
must be incremental. Spark's ``dropDuplicatesWithinWatermark`` keeps one
state entry per key and — unlike plain ``dropDuplicates`` on a stream —
EVICTS entries once the watermark passes them, so state is bounded by the
duplicate-arrival horizon instead of growing with the stream forever. At
100 TB/day that bound is the difference between a working pipeline and an
OOM: state = O(keys per watermark window), stored in RocksDB off-heap (set
in session profiles).

The key is a digest of the content columns (16-byte state key, same
convention as the batch tier's md5 hash-groupBy in operators/dedup.py) —
never the raw text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["exact_dedup_stream"]

WATERMARK = "10 minutes"
_SEP = "\x1f"  # unit separator: cannot collide with data in concat_ws


def exact_dedup_stream(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("user_id", "event_type", "value", "ts"),
    ts_col: str = "ts",
    watermark: str = WATERMARK,
) -> DataFrame:
    """First occurrence of each content key wins; re-arrivals within the
    watermark horizon are dropped, state for older keys is evicted."""
    keyed = events.withColumn(
        "dedup_key",
        F.md5(F.concat_ws(_SEP, *[F.col(c).cast("string") for c in key_cols])),
    )
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["dedup_key"])
        .drop("dedup_key")
    )
