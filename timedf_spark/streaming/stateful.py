"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.I — absent from the reference; extension layer).

``session_window`` covers plain per-session aggregates; the moment a
session rollup needs *order-dependent* state — the first and last event
type of the session, entry/exit pages, funnel progress — built-in windowed
aggregation can't express it and the custom-state API is the idiomatic
Spark tool. This module implements gap-based sessionization carrying
(first_event_type, last_event_type) through per-user state.

Execution model: rows arrive grouped by user_id in Arrow batches; state is
one open session per user (a 7-field tuple, O(active users) total — bounded
by the event-time timeout, not by stream length). Sessions are emitted when
a gap closes them in-batch, or by timeout once the watermark passes
last_ts + gap. RocksDB state store (session profile) keeps state off-heap
at scale.

Batch twin for validation: ``batch_sessions_with_types`` — the
operators/sessionize.py construction plus min_by/max_by for the
first/last event types; tests assert the streamed output converges to it.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["stateful_sessionize", "batch_sessions_with_types", "GAP_MINUTES"]

GAP_MINUTES = 30
_GAP = dt.timedelta(minutes=GAP_MINUTES)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("t_start", TimestampType()),
        StructField("t_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("first_event_type", StringType()),
        StructField("last_event_type", StringType()),
    ]
)

# open-session state: start, last_ts (µs epoch), n, sum, first/last type
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_sum", DoubleType()),
        StructField("first_type", StringType()),
        StructField("last_type", StringType()),
    ]
)

_US = 1_000_000


def _emit(user_id: int, s: tuple) -> pd.DataFrame:
    start_us, last_us, n, vsum, ftype, ltype = s
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "t_start": [pd.Timestamp(start_us, unit="us")],
            "t_end": [pd.Timestamp(last_us, unit="us")],
            "n_events": [n],
            "value_sum": [vsum],
            "first_event_type": [ftype],
            "last_event_type": [ltype],
        }
    )


def _sessionize_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        if state.exists:
            yield _emit(user_id, tuple(state.get))
        state.remove()
        return

    rows: list[dict[str, Any]] = []
    for pdf in pdfs:
        rows.extend(pdf[["ts", "event_id", "event_type", "value"]].to_dict("records"))
    # (ts, event_id) — the same total order as the batch twin's
    # min_by/max_by struct key, so same-timestamp events resolve
    # identically in both paths
    rows.sort(key=lambda r: (r["ts"], r["event_id"]))

    cur: tuple | None = tuple(state.get) if state.exists else None
    for r in rows:
        ts_us = int(pd.Timestamp(r["ts"]).value // 1000)
        val = float(r["value"]) if r["value"] is not None else 0.0
        etype = r["event_type"]
        if cur is not None and ts_us - cur[1] > _GAP // dt.timedelta(microseconds=1):
            yield _emit(user_id, cur)
            cur = None
        if cur is None:
            cur = (ts_us, ts_us, 1, val, etype, etype)
        else:
            cur = (cur[0], ts_us, cur[2] + 1, cur[3] + val, cur[4], etype)

    if cur is not None:
        state.update(cur)
        # close by timeout once the watermark passes last_ts + gap
        state.setTimeoutTimestamp((cur[1] // 1000) + GAP_MINUTES * 60 * 1000)
    else:  # pragma: no cover — rows is never empty when not timed out
        state.remove()


def stateful_sessionize(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Order-dependent sessionization over a *streaming* (ts, user_id,
    event_id, event_type, value) frame — event_id is required as the
    deterministic tie-break for same-timestamp events. One shuffle
    (groupBy user_id); state is one open session per active user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def batch_sessions_with_types(events: DataFrame) -> DataFrame:
    """Batch twin: lag → gap flag → running-sum session id → rollup with
    min_by/max_by carrying first/last event types. Same single-shuffle
    structure as operators/sessionize.py."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn(
        "is_new",
        F.when(F.lag("ts").over(w).isNull(), 1)
        .when(
            F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")
            > GAP_MINUTES * 60,
            1,
        )
        .otherwise(0),
    ).withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return flagged.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
        F.expr("min_by(event_type, struct(ts, event_id))").alias("first_event_type"),
        F.expr("max_by(event_type, struct(ts, event_id))").alias("last_event_type"),
    )
