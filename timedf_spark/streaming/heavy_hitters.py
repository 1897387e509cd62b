"""Streaming heavy hitters under BOUNDED state: per-bucket Misra-Gries
summaries via ``applyInPandasWithState`` (SURVEY.md §2.I extension layer —
the sketch class of streaming operator, complementing the exact
windowed/stateful ops).

Why a sketch: exact streaming key counts keep one state row per distinct
key — unbounded when keys are user ids, URLs, or n-grams at corpus scale.
Misra-Gries (1982) keeps at most ``capacity`` counters per partition and
guarantees every key with true frequency > N/ (capacity+1) survives, with
undercount ≤ total_decrements ≤ N/(capacity+1).

Sharding: keys are hash-partitioned into ``n_buckets`` groups (the state
key), each holding an independent summary. A key lives in EXACTLY one
bucket, so per-key results need no cross-bucket merging and the
per-bucket guarantee applies with N = that bucket's row count. State is
O(n_buckets × capacity) regardless of distinct-key cardinality — the
whole point at 100 TB.

Emission: update mode — each micro-batch that touches a bucket re-emits
the bucket's full summary (capacity rows, tiny); downstream sinks upsert
by (bucket, key). ``decrements`` rides along so consumers can bound the
undercount without a second pass. Validated against exact batch counts:
containment (every true-heavy key present) + error bound, in
tests/test_multimodal_streaming.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["heavy_hitters_state", "DEFAULT_CAPACITY", "DEFAULT_BUCKETS"]

DEFAULT_CAPACITY = 16
DEFAULT_BUCKETS = 8

OUTPUT_SCHEMA = StructType(
    [
        StructField("bucket", LongType()),
        StructField("key", StringType()),
        StructField("count_est", LongType()),
        StructField("n_seen", LongType()),
        StructField("decrements", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("keys", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("n_seen", LongType()),
        StructField("decrements", LongType()),
    ]
)


def _mg_group(capacity: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        if state.exists:
            keys, counts, n_seen, decr = state.get
            summary = dict(zip(keys, counts))
        else:
            summary, n_seen, decr = {}, 0, 0
        for pdf in pdfs:
            for k in pdf["key"]:
                n_seen += 1
                if k in summary:
                    summary[k] += 1
                elif len(summary) < capacity:
                    summary[k] = 1
                else:
                    # decrement-all step: every counter drops by 1, zeros
                    # evicted — the Misra-Gries invariant
                    decr += 1
                    for kk in list(summary):
                        summary[kk] -= 1
                        if summary[kk] == 0:
                            del summary[kk]
        state.update((list(summary), [int(v) for v in summary.values()], n_seen, decr))
        if summary:
            yield pd.DataFrame(
                {
                    "bucket": bucket,
                    "key": list(summary),
                    "count_est": [int(v) for v in summary.values()],
                    "n_seen": n_seen,
                    "decrements": decr,
                }
            )

    return fn


def heavy_hitters_state(
    events: DataFrame,
    key_col: str = "event_type",
    capacity: int = DEFAULT_CAPACITY,
    n_buckets: int = DEFAULT_BUCKETS,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming (ts, key) frame → continuously updated per-bucket
    Misra-Gries summaries. One shuffle (groupBy bucket); state bounded by
    n_buckets × capacity counters total."""
    keyed = events.withWatermark("ts", watermark).select(
        F.col("ts"),
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets)).alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _mg_group(capacity),
        OUTPUT_SCHEMA,
        _STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )
