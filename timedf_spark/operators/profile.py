"""One-pass table profiler: per-column null fraction, min/max, distinct
count — the standard pre-ingest data-quality screen (engine utility; the
reference's closest surface is its per-column aggregation policies,
timedf/report — generalized here to arbitrary frames).

Shape: ONE aggregation computes every column's statistics as parallel
aggregate expressions (count, count(col), min, max, count(distinct col))
— a single scan with map-side combine, regardless of column count — then
the 1-row wide result is unpivoted driver-free via ``stack`` into the
long (column, stats) form analysts expect. min/max are cast to string so
heterogeneous column types share one output schema (casts are applied to
the already-aggregated scalar, not per row).

Exact distinct counts make the profile oracle-checkable; at 100 TB swap
``approx_count_distinct`` per column (single-pass HLL++, mergeable) — the
surrounding shape is unchanged (see approx_cardinalities for the sketch
twin's tolerance contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_columns"]


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __min_{c}, __max_{c}, __nd_{c}" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(col_name, n_non_null, min_value, max_value, n_distinct)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "col_name",
        "n_rows",
        "n_non_null",
        F.expr("(n_rows - n_non_null) / n_rows").alias("null_frac"),
        "min_value",
        "max_value",
        "n_distinct",
    )


def profile_sql(table: str, columns: list[str]) -> str:
    """DuckDB oracle: the same long-form profile via per-column UNION ALL
    (DuckDB aggregates each leg over one scan; values must match the
    one-pass Spark plan exactly)."""
    legs = [
        f"""SELECT '{c}' AS col_name, count(*) AS n_rows, count({c}) AS n_non_null,
       (count(*) - count({c})) / count(*) AS null_frac,
       cast(min({c}) AS varchar) AS min_value, cast(max({c}) AS varchar) AS max_value,
       count(DISTINCT {c}) AS n_distinct
FROM {table}"""
        for c in columns
    ]
    return "\nUNION ALL\n".join(legs)
