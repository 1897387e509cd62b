"""Time-series extension queries over the events table: linear
interpolation of gaps in a resampled series, and per-group mode.

The reference models time series as plain rows with a timestamp column and
never fills gaps (SURVEY.md §1.1, §2.E); a production metrics/feature
pipeline needs both resampling (windows_suite.resample_hourly) and
*interpolation* of the holes the resample exposes. Mode (most-frequent
value per group) is the canonical categorical summary pandas offers as
``Series.mode`` and SQL as a two-level aggregate.

Plan shapes:
- interpolate_hourly: one hourly aggregate (shuffle on (event_type, hour)),
  a per-type dense grid (sequence+explode — rows generated, not shuffled),
  one left join, then TWO frame-bounded window passes over the same
  (event_type, hour) ordering — Spark evaluates both window specs in a
  single sort since they share partitioning and ordering. No self-joins:
  the classic gap-fill-by-join is O(gaps × rows); the window form is one
  linear pass.
- modal_event_type: two chained hash aggregates — (user, type) counts,
  then argmax per user via row_number on (count DESC, type ASC). The
  deterministic tie-break makes the result engine-independent (max_by/mode
  leave ties unspecified in both Spark and DuckDB — unusable under a
  value-hash gate).

Determinism: hourly means are quantized (functions/deterministic.davg);
the interpolation weight uses integer row positions (row_number over the
grid — identical ordering both engines), so the arithmetic tree
``prev + (next - prev) * ((rn - prev_rn) / (next_rn - prev_rn))`` sees
bit-identical inputs and IEEE-exact ops on both engines.

At 100 TB: the grid is bounded by (types × hours-in-span) — independent of
event count; window state is one row per frame edge (last/first over
unbounded frames stream in one pass). Skewed types (one type = half the
events) are absorbed by the partial aggregation before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import davg
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# interpolation formula — shared text contract with the oracle (inputs are
# bit-identical in both engines; every op is IEEE-exactly-rounded)
_INTERP = (
    "prev_v + (next_v - prev_v) * "
    "((cast(rn - prev_rn as double)) / (cast(next_rn - prev_rn as double)))"
)


def interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly mean `value` per event_type with gap hours linearly
    interpolated between the nearest observed neighbours (edge gaps take
    the nearest observed value)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", "ts").alias("h"), "value"
    )
    agg = ev.groupBy("event_type", "h").agg(F.expr(davg("value")).alias("val"))
    spans = agg.groupBy("event_type").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = spans.select(
        "event_type",
        F.explode(F.sequence("h0", "h1", F.expr("interval 1 hour"))).alias("h"),
    )
    g = grid.join(agg, ["event_type", "h"], "left")

    order = Window.partitionBy("event_type").orderBy("h")
    past = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    future = order.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    rn_col = F.row_number().over(order)
    # carry the (position, value) of the nearest observed row in each
    # direction; NULL hours contribute nothing thanks to ignorenulls
    obs_rn = F.when(F.col("val").isNotNull(), F.col("rn"))
    g = (
        g.withColumn("rn", rn_col)
        .withColumn("prev_v", F.last("val", ignorenulls=True).over(past))
        .withColumn("prev_rn", F.last(obs_rn, ignorenulls=True).over(past))
        .withColumn("next_v", F.first("val", ignorenulls=True).over(future))
        .withColumn("next_rn", F.first(obs_rn, ignorenulls=True).over(future))
    )
    filled = (
        F.when(F.col("val").isNotNull(), F.col("val"))
        .when(F.col("prev_v").isNull(), F.col("next_v"))
        .when(F.col("next_v").isNull(), F.col("prev_v"))
        .otherwise(F.expr(_INTERP))
    )
    return g.select(
        "event_type",
        F.col("h").alias("hour_ts"),
        filled.alias("value"),
        F.col("val").isNull().alias("is_interpolated"),
    )


INTERPOLATE_ORACLE = f"""
WITH agg AS (
  SELECT event_type, date_trunc('hour', ts) AS h, {davg('value')} AS val
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
spans AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM agg GROUP BY event_type),
grid AS (
  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM spans
),
g AS (
  SELECT grid.event_type, grid.h, agg.val FROM grid
  LEFT JOIN agg ON agg.event_type = grid.event_type AND agg.h = grid.h
),
numbered AS (
  SELECT event_type, h, val,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM g
),
win AS (
  SELECT event_type, h, val, rn,
    last_value(val IGNORE NULLS) OVER past AS prev_v,
    last_value(CASE WHEN val IS NOT NULL THEN rn END IGNORE NULLS)
      OVER past AS prev_rn,
    first_value(val IGNORE NULLS) OVER fut AS next_v,
    first_value(CASE WHEN val IS NOT NULL THEN rn END IGNORE NULLS)
      OVER fut AS next_rn
  FROM numbered
  WINDOW
    past AS (PARTITION BY event_type ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    fut AS (PARTITION BY event_type ORDER BY h
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, h AS hour_ts,
  CASE WHEN val IS NOT NULL THEN val
       WHEN prev_v IS NULL THEN next_v
       WHEN next_v IS NULL THEN prev_v
       ELSE {_INTERP} END AS value,
  val IS NULL AS is_interpolated
FROM win
"""

# --- per-group mode ---------------------------------------------------------


def modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent event_type per user (deterministic tie-break: higher
    count first, then lexicographically smaller type)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_event_type"), "n_events")
    )


MODAL_ORACLE = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n_events
  FROM events GROUP BY user_id, event_type
),
ranked AS (
  SELECT user_id, event_type, n_events,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY n_events DESC, event_type ASC) AS rn
  FROM counts
)
SELECT user_id, event_type AS modal_event_type, n_events
FROM ranked WHERE rn = 1
"""


# --- SCD2 history build (gaps-and-islands) ---------------------------------
#
# Build a type-2 slowly-changing-dimension history from an event log:
# treat each user's event_type as an attribute whose changes over time
# must become validity intervals [valid_from, valid_to). Two classic
# sub-shapes compose:
#   islands — collapse runs of consecutive identical values with the
#     lag-compare + running-sum trick (a change flag per row, summed to an
#     island id) — NO self-join per run;
#   intervals — valid_to = lead(valid_from) over the user, NULL for the
#     open current row.
# All three window functions share the (user_id, ts) sort — one shuffle,
# one sort. Engine-exact: timestamps, strings, and integer island ids
# only. At 100 TB this is the standard CDC-to-dimension compaction; the
# window state is O(1) per partition stream.

_TIE = "event_id"  # total order within equal timestamps


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("state")
    )
    order = Window.partitionBy("user_id").orderBy("ts", _TIE)
    changed = F.when(
        F.lag("state").over(order).isNull()
        | (F.lag("state").over(order) != F.col("state")),
        1,
    ).otherwise(0)
    islands = ev.withColumn("chg", changed).withColumn(
        "island",
        F.sum("chg").over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    spans = islands.groupBy("user_id", "island").agg(
        F.first("state").alias("state"),  # constant within the island
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    seq = Window.partitionBy("user_id").orderBy("valid_from", "island")
    return spans.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(seq).alias("valid_to"),
        "n_events",
        (F.lead("valid_from").over(seq).isNull()).alias("is_current"),
    )


SCD2_ORACLE = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type AS state,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, {_TIE})
),
islands AS (
  SELECT user_id, ts, state,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, {_TIE}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
spans AS (
  SELECT user_id, island, first(state) AS state, min(ts) AS valid_from,
         count(*) AS n_events
  FROM islands GROUP BY user_id, island
)
SELECT user_id, state, valid_from,
       lead(valid_from) OVER s AS valid_to,
       n_events,
       lead(valid_from) OVER s IS NULL AS is_current
FROM spans
WINDOW s AS (PARTITION BY user_id ORDER BY valid_from, island)
"""


SUITE = {
    "scd2_history": QuerySpec(
        "scd2_history",
        scd2_history,
        SCD2_ORACLE,
        "SCD2 history from an event log: gaps-and-islands collapse + lead() validity intervals",
    ),
    "interpolate_hourly": QuerySpec(
        "interpolate_hourly",
        interpolate_hourly,
        INTERPOLATE_ORACLE,
        "linear interpolation of gaps in a resampled hourly series (window pass, no self-joins)",
    ),
    "modal_event_type": QuerySpec(
        "modal_event_type",
        modal_event_type,
        MODAL_ORACLE,
        "per-group mode with deterministic tie-break (two-level aggregate)",
    ),
}
