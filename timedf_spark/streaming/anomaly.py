"""Streaming anomaly detection: causal per-key z-scores in bounded state.

The monitoring twin of the batch ``zscore_outliers`` query
(queries/analytics_round3.py): score each event against the distribution
of its key's PRIOR events — causal, so a detector can fire the moment the
event arrives, and deterministic, because the score never depends on
events that haven't happened yet.

State per key is three numbers (n, Σx, Σx²) — Welford-free sufficient
statistics, updated AFTER scoring the batch, so every event in a batch is
scored against strictly-earlier history. State size is O(distinct keys):
fine for typed keys (event types, service names); for unbounded key
domains bucket the key first (the ``heavy_hitters`` sharding pattern) or
add a timeout to expire idle keys.

Emission: append mode — only anomalies (|z| ≥ threshold with at least
``min_n`` prior observations) are emitted, so downstream sinks receive
the alert stream, not the firehose.

Equivalence contract (tests): replaying the events table through the
detector yields exactly the rows the batch twin computes with a
ROWS-BETWEEN-UNBOUNDED-PRECEDING-AND-1-PRECEDING window over the same
(ts, event_id) order.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = ["zscore_anomaly_stream", "batch_zscore_anomalies", "Z_THRESHOLD", "MIN_PRIOR"]

Z_THRESHOLD = 3.0
MIN_PRIOR = 30  # observations required before the estimate is trusted

OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("z", DoubleType()),
        StructField("n_prior", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s1", DoubleType()),
        StructField("s2", DoubleType()),
    ]
)


def _score_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, s1, s2 = state.get
    else:
        n, s1, s2 = 0, 0.0, 0.0
    out_rows = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        for row in pdf.itertuples(index=False):
            v = float(row.value)
            if n >= MIN_PRIOR:
                mean = s1 / n
                var = s2 / n - mean * mean
                if var > 0:
                    z = (v - mean) / (var ** 0.5)
                    if abs(z) >= Z_THRESHOLD:
                        out_rows.append(
                            (key[0], int(row.event_id), row.ts, v, z, n)
                        )
            n, s1, s2 = n + 1, s1 + v, s2 + v * v
    state.update((n, s1, s2))
    yield pd.DataFrame(
        out_rows,
        columns=["event_type", "event_id", "ts", "value", "z", "n_prior"],
    )


def zscore_anomaly_stream(stream: DataFrame) -> DataFrame:
    """events stream (event_id, ts, user_id, event_type, value) →
    anomaly stream. No timeout: typed keys are a bounded domain."""
    return (
        stream.groupBy("event_type")
        .applyInPandasWithState(
            _score_group,
            OUTPUT_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def batch_zscore_anomalies(events: DataFrame) -> DataFrame:
    """Batch twin: the identical causal score via a preceding-rows window
    (same Σx/Σx² arithmetic in the same (ts, event_id) order, so the two
    implementations agree exactly, not approximately)."""
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    n = F.count("value").over(w)
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    mean = s1 / n
    var = s2 / n - mean * mean
    return (
        events.select(
            "event_type", "event_id", "ts", "value",
            n.alias("n_prior"), mean.alias("m"), var.alias("v"),
        )
        .withColumn("z", (F.col("value") - F.col("m")) / F.sqrt("v"))
        .filter(
            (F.col("n_prior") >= MIN_PRIOR)
            & (F.col("v") > 0)
            & (F.abs("z") >= Z_THRESHOLD)
        )
        .select("event_type", "event_id", "ts", "value", "z",
                F.col("n_prior").cast("long").alias("n_prior"))
    )
