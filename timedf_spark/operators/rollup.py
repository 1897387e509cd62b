"""Mergeable exact aggregates: maintain a grouped rollup through delta
batches with NO fact rescan, bit-for-bit equal to a full recompute.

The representation is the trick: counts and INTEGER QUANTIZED sums
(functions/deterministic.py) are associative, so a stored aggregate row
and a delta aggregate row combine by plain addition — at any data split,
in any order, on any engine. A float-sum accumulator could not do this
(order-dependent rounding), which is why incremental float rollups in
practice drift from their recompute; here equality is exact and
oracle-checkable.

Used by ``queries/round6.incremental_daily_rollup`` (one delta batch)
and ``streaming/rollup_apply.py`` (a stream of delta batches). At scale
the stored rollup is aggregate-grain (tiny vs the fact); each delta
aggregation touches only new data; the combine is a full-outer join at
aggregate grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantized_rollup", "merge_rollups", "finish_rollup"]

_SCALE_MULT = "10000.0"


def quantized_rollup(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """(keys..., n_rows, sum_q): the mergeable representation — exact row
    count + integer quantized sum of ``value_col`` (scale 1e-4, the dsum
    envelope; see functions/deterministic.py for the <2^53 contract)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.expr(f"cast(floor(({value_col}) * {_SCALE_MULT} + 0.5) as bigint)")
        ).alias("sum_q"),
    )


def merge_rollups(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Combine two rollups in the mergeable representation: full-outer
    join on the keys, add the accumulators (missing side contributes 0).
    Associative and commutative — fold any number of deltas in any
    order and the result equals one aggregation of the union."""
    b, d = base.alias("b"), delta.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    return b.join(d, cond, "full_outer").select(
        *[F.coalesce(F.col(f"b.{k}"), F.col(f"d.{k}")).alias(k) for k in keys],
        (
            F.coalesce(F.col("b.n_rows"), F.lit(0))
            + F.coalesce(F.col("d.n_rows"), F.lit(0))
        ).alias("n_rows"),
        (
            F.coalesce(F.col("b.sum_q"), F.lit(0))
            + F.coalesce(F.col("d.sum_q"), F.lit(0))
        ).alias("sum_q"),
    )


def finish_rollup(rollup: DataFrame, value_name: str = "value_sum") -> DataFrame:
    """Present the mergeable representation: one exact int→double
    conversion + one division (the dsum finish)."""
    return rollup.withColumn(
        value_name, F.expr(f"cast(sum_q as double) / {_SCALE_MULT}")
    ).drop("sum_q")
