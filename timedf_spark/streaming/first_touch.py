"""Streaming first-touch attribution via ``applyInPandasWithState`` in
UPDATE mode (SURVEY.md §2.I extension layer — streaming twin of the batch
``first_touch_attribution`` query).

Semantics: per user, maintain the FIRST event (by (ts, event_id) — the
same total order as the batch twin) and whether any 'purchase' has been
seen. Every micro-batch that changes a user's attribution row re-emits it
(update mode) — downstream sinks upsert by user_id, so the table converges
to the batch answer as data arrives, INCLUDING corrections from late
events: a late row that predates the current first touch *replaces* it,
which an append-mode pipeline could never retract.

State: one 5-field tuple per user ever seen — O(users), the natural grain
of the question (an attribution table is per-user by definition). No
event-time timeout: attribution has no idle horizon; bound state at scale
by partitioning users across executors (state is keyed, RocksDB-backed
under the session's streaming profile).

Validation: tests stream the events table in time-ordered chunks and
assert each user's LAST emission (max n_seen) equals the batch twin row
exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["first_touch_state", "first_touch_batch"]

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("first_ts", TimestampType()),
        StructField("first_touch", StringType()),
        StructField("converted", LongType()),
        StructField("n_seen", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("first_us", LongType()),
        StructField("first_event_id", LongType()),
        StructField("first_type", StringType()),
        StructField("converted", LongType()),
        StructField("n_seen", LongType()),
    ]
)


def _first_touch_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    rows = []
    for pdf in pdfs:
        rows.extend(pdf[["ts", "event_id", "event_type"]].to_dict("records"))
    if not rows:  # pragma: no cover — update mode without timeouts
        return

    cur = tuple(state.get) if state.exists else None
    first_us, first_eid, first_type, converted, n_seen = cur or (None, None, None, 0, 0)
    for r in rows:
        ts_us = int(pd.Timestamp(r["ts"]).value // 1000)
        eid = int(r["event_id"])
        n_seen += 1
        # late-data correction: strictly earlier (ts, event_id) replaces
        # the current first touch — same total order as the batch twin
        if first_us is None or (ts_us, eid) < (first_us, first_eid):
            first_us, first_eid, first_type = ts_us, eid, r["event_type"]
        if r["event_type"] == "purchase":
            converted = 1
    state.update((first_us, first_eid, first_type, converted, n_seen))
    # n_seen advanced, so this batch always changes the user's row —
    # re-emit it (update-mode upsert downstream)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "first_touch": [first_type],
            "converted": [converted],
            "n_seen": [n_seen],
        }
    )


def first_touch_state(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming (ts, user_id, event_id, event_type) frame → continuously
    corrected per-user attribution rows. One shuffle (groupBy user_id)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _first_touch_group,
            OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def first_touch_batch(events: DataFrame) -> DataFrame:
    """Batch twin: per-user first event + conversion flag + event count
    (the pre-aggregation frame of queries.analytics_round3.
    first_touch_attribution, plus n_seen)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    wu = Window.partitionBy("user_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "converted",
            F.max(F.expr("case when event_type = 'purchase' then 1 else 0 end")).over(wu).cast("long"),
        )
        .withColumn("n_seen", F.count(F.lit(1)).over(wu))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("ts").alias("first_ts"),
            F.col("event_type").alias("first_touch"),
            "converted",
            "n_seen",
        )
    )
