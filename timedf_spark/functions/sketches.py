"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark's
``hll_sketch_agg`` family).

``approx_cardinalities`` already demonstrates one-shot HLL++
(approx_count_distinct). What THAT cannot do is the 100 TB operational
pattern: compute per-partition/per-day sketches ONCE, persist them as
binary columns, and answer any coarser rollup later — union of sketches,
never a rescan of the fact. Exact distinct counts cannot roll up
(distinct is not additive); sketches are the standard fix
(Flajolet et al. HLL '07; the lossless-union DataSketches HLL variant
Spark 3.5+ ships).

Scale posture: a sketch row is O(KB) regardless of group size; the
rollup aggregates sketch bytes at parent-key cardinality. Error is the
configured HLL standard error (~1.04/sqrt(2^lgK) ≈ 1.6% at the default
lgK=12), pinned by tolerance tests — there is deliberately no DuckDB
oracle (engine-specific binary), mirroring approx_cardinalities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "group_sketches",
    "rollup_estimate",
    "daily_sketches",
    "rolling_from_daily",
    "rolling_distinct_estimate",
]


def group_sketches(df: DataFrame, group_cols: list[str], id_col: str) -> DataFrame:
    """Per-group HLL sketch of ``id_col`` + its point estimate. The
    ``sketch`` binary column is persistable (parquet) and unionable."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(id_col).alias("sketch"),
        F.hll_sketch_estimate(F.hll_sketch_agg(id_col)).alias("estimate"),
    )


def rollup_estimate(sketches: DataFrame, parent_cols: list[str]) -> DataFrame:
    """Union child sketches up to ``parent_cols`` grain and estimate —
    no access to the original fact rows. Empty ``parent_cols`` gives the
    grand total."""
    agg = F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
    if parent_cols:
        return sketches.groupBy(*parent_cols).agg(agg)
    return sketches.agg(agg)


def daily_sketches(df: DataFrame, ts_col: str, id_col: str) -> DataFrame:
    """(day, sketch): one HLL sketch row per calendar day — the
    persistable, mergeable representation both the batch and the
    streaming rolling-distinct build on."""
    return df.groupBy(
        F.expr(f"cast(date_trunc('DAY', {ts_col}) as date)").alias("day")
    ).agg(F.hll_sketch_agg(id_col).alias("sketch"))


def rolling_from_daily(daily: DataFrame, window_days: int = 7) -> DataFrame:
    """(day, estimate) from a (day, sketch) table: trailing-window union
    of the day sketches — zero access to the original fact rows."""
    from pyspark.sql import Window

    # Timezone-free day index: datediff counts calendar days, so the
    # trailing frame is exactly window_days rows of day-grain no matter
    # the session timezone. (A day→timestamp→epoch-seconds index with
    # fixed 86400-s multiples breaks in DST-observing session timezones,
    # where day gaps are 82800/90000 s at transitions.)
    w = (
        Window.orderBy(F.datediff(F.col("day"), F.lit("1970-01-01")))
        .rangeBetween(-(window_days - 1), 0)
    )
    return daily.select(
        "day", F.hll_sketch_estimate(F.hll_union_agg("sketch").over(w)).alias("estimate")
    )


def rolling_distinct_estimate(
    df: DataFrame, ts_col: str, id_col: str, window_days: int = 7
) -> DataFrame:
    """(day, estimate): trailing ``window_days`` distinct ``id_col`` per
    day — the rolling-actives metric exact count-distinct cannot compute
    incrementally (distinct does not slide: each day's exact answer
    re-touches the whole window's raw rows).

    Shape: ONE pass folds the fact to per-day sketches (a sketch row per
    day, KBs); the trailing union is a RANGE window over those day rows
    — 365 sketch unions per year of data, zero further fact access. The
    window's single-ordering shuffle moves day-grain sketch rows only.
    """
    return rolling_from_daily(daily_sketches(df, ts_col, id_col), window_days)
