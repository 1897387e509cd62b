"""Declarative data-quality expectations → one validation report
(the Deequ / Great Expectations pipeline component, Spark-first).

A production table publishes a contract — not-null keys, value domains,
uniqueness, referential integrity — and the pipeline validates it on
every load. This operator compiles a rule list into the MINIMUM number
of Spark jobs:

- every scalar rule (not_null / in_range / accepted_values / matches)
  becomes ONE conditional-sum column of a SINGLE aggregate pass over the
  table — adding rules adds expressions, not scans;
- ``unique`` adds one count-distinct to the same pass (violations =
  rows − distinct keys: the excess duplicate rows);
- ``foreign_key`` is a broadcast LEFT-ANTI join against the referenced
  dimension keys folded to one count — dimensions broadcast, the fact
  never shuffles for the check (the fk_integrity_audit shape).

Report: one row per rule — (rule, n_rows, n_violations, ok). All counts
are exact integers, so the report is cross-engine oracle-checkable; the
rule compiler emits dialect-shared predicate SQL by construction (the
caller passes predicate fragments that parse in both engines).

At 100 TB: the scalar pass is a partial+final aggregate of one scan
(map-side combine reduces everything before the shuffle); each FK rule
adds one broadcast anti-join over the same scan. Validating a table
costs O(1 scan + #fk broadcast joins) regardless of rule count.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "not_null", "in_range", "accepted_values", "unique",
           "foreign_key", "expectations_report"]


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # 'predicate' | 'unique' | 'fk'
    # predicate rules: SQL boolean expr that must hold per row (shared
    # Spark/DuckDB text — the violation is NOT(pred) with NULL counted
    # as a violation unless the predicate handles it)
    predicate: Optional[str] = None
    cols: tuple[str, ...] = field(default_factory=tuple)
    ref_col: Optional[str] = None  # fk: the dimension key column


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", "predicate", predicate=f"{col} IS NOT NULL")


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"in_range({col},{lo},{hi})",
        "predicate",
        predicate=f"{col} IS NOT NULL AND {col} >= {lo} AND {col} <= {hi}",
    )


def accepted_values(col: str, values: list[str]) -> Rule:
    lst = ", ".join(f"'{v}'" for v in sorted(values))
    return Rule(
        f"accepted_values({col})",
        "predicate",
        predicate=f"{col} IN ({lst})",
    )


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", "unique", cols=tuple(cols))


def foreign_key(col: str, ref_col: str) -> Rule:
    return Rule(f"fk({col}->{ref_col})", "fk", cols=(col,), ref_col=ref_col)


def expectations_report(
    df: DataFrame, rules: list[Rule], dims: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Validate ``df`` against ``rules``; ``dims`` maps a foreign_key
    rule's ``ref_col`` to the dimension DataFrame containing it. Returns
    (rule, n_rows, n_violations, ok) — one row per rule, rule order
    preserved."""
    dims = dims or {}
    scalar = [r for r in rules if r.kind == "predicate"]
    uniques = [r for r in rules if r.kind == "unique"]
    fks = [r for r in rules if r.kind == "fk"]

    # r11: FK rules fold into the SAME single aggregate pass as the
    # scalar/unique rules — each dimension's distinct keys broadcast
    # LEFT-join onto the fact with a presence marker, and the orphan
    # count is one more conditional sum (orphan == non-null fact key
    # with no dimension match — exactly the anti-join's count, since the
    # join key is distinct on the build side). The old shape ran one
    # aggregate job PLUS one anti-join count job per FK rule: two full
    # fact scans for the standard 5-rule contract; now validating a
    # table costs ONE scan + the broadcasts, matching the module
    # docstring's promise.
    for m, r in enumerate(fks):
        dim = dims[r.ref_col]
        marker = (
            dim.select(F.col(r.ref_col).alias(f"__fkk{m}"))
            .distinct()
            .withColumn(f"__fkhit{m}", F.lit(True))
        )
        df = df.join(
            F.broadcast(marker),
            df[r.cols[0]] == marker[f"__fkk{m}"],
            "left",
        )

    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(scalar):
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN NOT COALESCE(({r.predicate}), false) THEN 1 ELSE 0 END"
                )
            ).alias(f"__v{i}")
        )
    for j, r in enumerate(uniques):
        key = ", ".join(r.cols)
        # standard SQL unique semantics: NULL keys are not uniqueness
        # violations (count(DISTINCT) skips them in both engines, so the
        # comparable base is the non-null row count, not n_rows; pair
        # with not_null() to also ban NULL keys)
        nonnull = " AND ".join(f"{c} IS NOT NULL" for c in r.cols)
        aggs.append(F.expr(f"count(DISTINCT {key})").alias(f"__u{j}"))
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {nonnull} THEN 1 ELSE 0 END")).alias(f"__un{j}")
        )
    for m, r in enumerate(fks):
        aggs.append(
            F.sum(
                F.expr(
                    f"CASE WHEN {r.cols[0]} IS NOT NULL AND __fkhit{m} IS NULL "
                    "THEN 1 ELSE 0 END"
                )
            ).alias(f"__o{m}")
        )
    base = df.agg(*aggs).first()
    n_rows = int(base["__n"])

    rows: list[tuple[str, int, int]] = []
    for i, r in enumerate(scalar):
        rows.append((r.name, n_rows, int(base[f"__v{i}"])))
    for j, r in enumerate(uniques):
        rows.append((r.name, n_rows, int(base[f"__un{j}"]) - int(base[f"__u{j}"])))
    for m, r in enumerate(fks):
        rows.append((r.name, n_rows, int(base[f"__o{m}"])))

    spark = df.sparkSession
    out = spark.createDataFrame(
        [(name, n, v, v == 0) for name, n, v in rows],
        "rule string, n_rows long, n_violations long, ok boolean",
    )
    # deterministic row order (rule name) so the report is oracle-comparable
    return out.orderBy("rule")
