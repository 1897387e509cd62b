"""Training-data governance audits: k-anonymity and l-diversity.

Before a table (or a metadata sidecar of a training corpus) is
released, the standard re-identification screens are k-anonymity
(every quasi-identifier combination is shared by ≥ k rows — Sweeney
'02) and l-diversity (each combination carries ≥ l distinct sensitive
values — Machanavajjhala '07). Both reduce to ONE aggregation pass at
quasi-identifier grain: count(*) and count(distinct sensitive) per
group, then a threshold filter — the same O(1 scan) shape as the
declarative expectations operator (operators/expect.py).

The report returns the VIOLATING groups with their sizes/diversity —
the actionable artifact (what to generalize or suppress), not just a
pass/fail bit. Exact integers throughout; hash-checkable.

Scale posture: one shuffle keyed on the quasi-identifier tuple with
map-side combine; the distinct-sensitive count rides the same exchange
(two-level aggregate). Output is bounded by the number of violating
groups, never the table.

No reference counterpart: intel-ai/timedf has no governance surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anonymity_report", "anonymity_report_sql"]


def anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int,
    l: int,
) -> DataFrame:
    """(quasi..., n_rows, n_sensitive) for every group violating
    k-anonymity (n_rows < k) or l-diversity (n_sensitive < l)."""
    assert k >= 1 and l >= 1
    g = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct(sensitive_col).alias("n_sensitive"),
    )
    return g.where((F.col("n_rows") < k) | (F.col("n_sensitive") < l))


def anonymity_report_sql(
    table: str, quasi_cols: list[str], sensitive_sql: str, k: int, l: int
) -> str:
    qc = ", ".join(quasi_cols)
    return f"""
SELECT {qc}, count(*) AS n_rows,
       count(DISTINCT {sensitive_sql}) AS n_sensitive
FROM {table}
GROUP BY {qc}
HAVING count(*) < {k} OR count(DISTINCT {sensitive_sql}) < {l}
"""
