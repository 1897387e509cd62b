"""Query suites: the reference workloads' semantics on the driver's testdata.

Each module contributes ``SUITE: dict[str, QuerySpec]``; ``all_queries()``
merges them for ``__spark_entry__``. Per the driver contract, every spec has
a (spark, sf_dir) -> DataFrame callable and (where SQL-expressible) a DuckDB
oracle string; column names are aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL over the pre-registered table views
    doc: str = ""


def all_queries() -> dict[str, QuerySpec]:
    from timedf_spark.queries import (
        advanced,
        curation_suite,
        extension,
        lakehouse,
        ml_etl,
        plasticc,
        taxi,
        timeseries,
        tpch,
        tpch_deep,
        tpch_round2,
        windows_suite,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (taxi, ml_etl, plasticc, tpch, tpch_deep, tpch_round2, advanced, windows_suite, timeseries, extension, curation_suite, lakehouse):
        for name, spec in mod.SUITE.items():
            assert name not in merged, f"duplicate query name {name}"
            merged[name] = spec
    return merged
