"""Per-group ordinary-least-squares trend — exact rational arithmetic.

OLS over integer (x, y) needs only five sufficient statistics per group
(n, Σx, Σy, Σxy, Σx²), all exact integer sums with map-side combine —
one aggregation pass, no window, no sort. The slope is returned as an
exact integer fraction

    slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

plus a fixed-point rendering ``slope_scaled = floor(scale · num / den)``.
Both Spark's DIV and DuckDB's integer // TRUNCATE toward zero, so both
sides subtract the (positive) remainder first — the numerator becomes
exactly divisible and truncation equals floor on either engine (the
kmeans.py convention; the denominator is ≥ 0 by Cauchy-Schwarz). No
floats anywhere, so the driver gate hash-checks the regression itself;
run-to-run and partitioning invariance follow.

Overflow bounds (LOUD): with |x| ≤ X, |y| ≤ Y, n rows per group, the
largest intermediate is ``scale · n · Σxy ≤ scale · n² · X · Y``; keep
that under 2^63. At scale = 10⁴ that means n²·X·Y < 9.2e14 — day-grain
series over years of cents-quantized revenue FAILS it; aggregate to a
coarser grain (monthly dollars passes comfortably) or lower the scale.
:func:`group_ols` asserts the caller-declared bounds instead of
wrapping silently.

The degenerate group (all x equal → den = 0) yields NULL slope fields
on both engines via nullif.

No reference counterpart: intel-ai/timedf has no regression surface
(closest is XGBoost training, SURVEY.md §2 K4 — a different tool).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["group_ols", "group_ols_sql", "sufficient_stats", "slopes_from_stats"]


def sufficient_stats(
    df: DataFrame, group_cols: list[str], x_col: str, y_col: str
) -> DataFrame:
    """(group..., n, sx, sy, sxy, sxx) — mergeable by group-wise
    addition (the streaming trend store's unit, streaming/trend_apply)."""
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x_col).alias("sx"),
        F.sum(y_col).alias("sy"),
        F.sum(F.expr(f"{x_col} * {y_col}")).alias("sxy"),
        F.sum(F.expr(f"{x_col} * {x_col}")).alias("sxx"),
    )


def slopes_from_stats(
    stats: DataFrame, group_cols: list[str], scale: int = 10_000
) -> DataFrame:
    """(group..., n, slope_num, slope_den, slope_scaled) derived from
    sufficient statistics — the pure finisher (mod-subtract floor
    division; NULLs on degenerate groups)."""
    num, den = "(n * sxy - sx * sy)", "(n * sxx - sx * sx)"
    snum = f"({num} * {scale})"
    return stats.select(
        *group_cols,
        "n",
        F.expr(num).alias("slope_num"),
        F.expr(f"nullif({den}, 0)").alias("slope_den"),
        F.expr(
            f"CASE WHEN {den} = 0 THEN NULL ELSE "
            f"({snum} - ((({snum} % {den}) + {den}) % {den})) DIV {den} END"
        ).alias("slope_scaled"),
    )


def group_ols(
    df: DataFrame,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 10_000,
    x_bound: int = 1_000,
    y_bound: int = 100_000,
    n_bound: int = 1_000,
) -> DataFrame:
    """(group..., n, slope_num, slope_den, slope_scaled) per group.
    ``x_col``/``y_col`` must be integral columns (quantize floats
    upstream). Bounds declare the worst case for the int64 overflow
    assert: scale * n^2 * X * Y must fit."""
    assert scale * n_bound**2 * x_bound * y_bound < 2**63, (
        "scale * n^2 * X * Y exceeds int64: coarsen the grain, rescale, "
        f"or lower scale (scale={scale}, n<={n_bound}, X<={x_bound}, "
        f"Y<={y_bound})"
    )
    return slopes_from_stats(
        sufficient_stats(df, group_cols, x_col, y_col), group_cols, scale
    )


def group_ols_sql(
    inner_sql: str,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    scale: int = 10_000,
) -> str:
    """DuckDB twin over ``inner_sql`` (a subquery yielding the group
    columns plus integral ``x_col``/``y_col``)."""
    gc = ", ".join(group_cols)
    return f"""
WITH pts AS ({inner_sql}),
g AS (
  SELECT {gc}, count(*) AS n,
         sum({x_col}) AS sx, sum({y_col}) AS sy,
         sum({x_col} * {y_col}) AS sxy, sum({x_col} * {x_col}) AS sxx
  FROM pts GROUP BY {gc}
)
SELECT {gc}, n,
       cast(n * sxy - sx * sy AS BIGINT) AS slope_num,
       cast(nullif(n * sxx - sx * sx, 0) AS BIGINT) AS slope_den,
       cast(CASE WHEN n * sxx - sx * sx = 0 THEN NULL ELSE
            (((n * sxy - sx * sy) * {scale})
             - ((((n * sxy - sx * sy) * {scale}) % (n * sxx - sx * sx)
                 + (n * sxx - sx * sx)) % (n * sxx - sx * sx)))
            // (n * sxx - sx * sx)
       END AS BIGINT) AS slope_scaled
FROM g
"""
