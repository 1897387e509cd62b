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


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return list of mismatch descriptions (empty = match)."""
    issues: list[str] = []
    sp = spark_df.toPandas()
    du = con.execute(oracle).fetchdf()
    if len(sp) != len(du):
        issues.append(f"row count: spark={len(sp)} duckdb={len(du)}")
    if sorted(sp.columns) != sorted(du.columns):
        issues.append(f"columns: spark={sorted(sp.columns)} duckdb={sorted(du.columns)}")
        return issues
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
