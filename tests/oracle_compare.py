"""Shared differential-oracle harness (SURVEY.md §5 item 2).

Mimics the driver's correctness gate: run the Spark query and the DuckDB
oracle on the same parquet, then compare row count, schema (column names),
and order-insensitive values (columns sorted by name, rows sorted, exact
equality after arrow normalization). Used by tests and by scripts/check.py.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
import pyarrow as pa

from timedf_spark.sources.readers import TESTDATA_TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            if getattr(df[c].dtype, "tz", None) is not None:
                # Arrow-path Spark timestamps arrive tz-aware (UTC session);
                # DuckDB's are naive UTC — align to naive UTC for comparison.
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        else:
            # floats/ints: unify integer widths for sorting stability
            if pd.api.types.is_integer_dtype(df[c]):
                df[c] = df[c].astype("int64")
            elif pd.api.types.is_float_dtype(df[c]):
                df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _type_family(t: pa.DataType) -> str:
    """Collapse an Arrow dtype to the equivalence class the DRIVER's
    value-hash comparison tolerates (verified in round 3 by a bidirectional
    sweep of all oracles): integer widths are interchangeable (Spark
    year()/levenshtein() int32 vs DuckDB BIGINT passed), date vs timestamp
    truncations pass, float widths pass — but decimal128 (DuckDB HUGEINT
    sums) vs int64 FAILS the driver hash even when values are equal.
    Keeping decimal as its own family turns that whole bug class into a
    local test failure (VERDICT r03 item 2)."""
    if pa.types.is_null(t):
        return "null"  # all-NULL column: width not observable, treat as wild
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "temporal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def _schema_issues(sp_schema: pa.Schema, du_schema: pa.Schema) -> list[str]:
    issues = []
    du_types = {f.name: f.type for f in du_schema}
    for f in sp_schema:
        if f.name not in du_types:
            continue  # column-name mismatch reported separately
        fam_sp, fam_du = _type_family(f.type), _type_family(du_types[f.name])
        if "null" in (fam_sp, fam_du):
            continue
        if fam_sp != fam_du:
            issues.append(
                f"dtype family: column {f.name} spark={f.type} ({fam_sp}) "
                f"duckdb={du_types[f.name]} ({fam_du}) — driver hash_match "
                f"would fail even with equal values; cast in the oracle/operator"
            )
    return issues


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    issues: list[str] = []
    sp_tbl = spark_df.toArrow()
    du_tbl = con.execute(oracle).fetch_arrow_table()
    # date_as_object=False: date32 → datetime64 so a date-typed oracle
    # column compares against a Spark timestamp (benign temporal pair)
    # by value, not object-vs-Timestamp identity
    sp = sp_tbl.to_pandas(date_as_object=False)
    du = du_tbl.to_pandas(date_as_object=False)
    if len(sp) != len(du):
        issues.append(f"row count: spark={len(sp)} duckdb={len(du)}")
    if sorted(sp.columns) != sorted(du.columns):
        issues.append(f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
        return issues
    issues.extend(_schema_issues(sp_tbl.schema, du_tbl.schema))
    a, b = _normalize(sp), _normalize(du)
    if len(a) != len(b):
        return issues
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            eq = (av == bv) | (av.isna() & bv.isna())
        else:
            eq = (av.astype(object) == bv.astype(object)) | (av.isna() & bv.isna())
        bad = int((~eq).sum())
        if bad:
            idx = (~eq).idxmax()
            detail = f"first diff at row {idx}: spark={av[idx]!r} duckdb={bv[idx]!r}"
            if pd.api.types.is_float_dtype(av) and not (
                isinstance(av[idx], float) and math.isnan(av[idx])
            ):
                try:
                    detail += f" (ulp-ish delta {abs(av[idx] - bv[idx]):.3e})"
                except TypeError:
                    pass
            issues.append(f"column {c}: {bad} mismatching values; {detail}")
    return issues


def run_all(sf_dir: str, names: list[str] | None = None) -> dict[str, Any]:
    from timedf_spark.queries import all_queries
    from timedf_spark.session import get_spark

    spark = get_spark()
    con = duckdb_connection(sf_dir)
    out: dict[str, Any] = {}
    for name, spec in all_queries().items():
        if names and name not in names:
            continue
        if spec.oracle is None:
            try:
                out[name] = {"rows_only": spec.fn(spark, sf_dir).count()}
            except Exception as e:  # noqa: BLE001
                out[name] = {"error": repr(e)}
            continue
        try:
            out[name] = {"issues": compare(spec.fn(spark, sf_dir), con, spec.oracle)}
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": repr(e)}
    return out


if __name__ == "__main__":
    import json
    import sys

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    results = run_all(sf, names)
    ok = all(v.get("issues") == [] or "rows_only" in v for v in results.values())
    print(json.dumps(results, indent=2, default=str))
    sys.exit(0 if ok else 1)
