"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``timedf_spark`` package; this module only
adapts its query registry (timedf_spark.queries.all_queries) to the driver
shape. Cross-engine value equality is by construction: every float
aggregate is built from the shared-SQL deterministic expressions in
timedf_spark/functions/deterministic.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from timedf_spark.queries import all_queries  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Driver-supplied sessions may lack our conf; set what matters and is
    settable at runtime (the ns-timestamp read conf for events)."""
    for k, v in [
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
    ]:
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — conf may be static in this session
            pass
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary: filter→8-agg groupBy→sort) on sf0.001."""
    _configure(spark)
    spec = all_queries()["pricing_summary"]
    return spec.fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(spec):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            return spec.fn(_configure(spark), sf_dir)

        return run

    return {name: wrap(spec) for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query; omitted for non-SQL-expressible
    ops (driver then records a rows-only check)."""
    return {
        name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None
    }
