"""ny_taxi_ml ETL suite (SURVEY.md §2 B3-B7, H2, H3, H5, H6) on testdata.

The reference pipeline (timedf_benchmarks/ny_taxi_ml/ny_taxi_ml.py) is:
schema-normalize -> 17-predicate filter -> feature engineering (day extract,
ns-duration, 1e-4 grid cells, euclidean distance) -> predicate train/test
split. Re-expressed over lineitem/events with the same operator shapes.

Scale notes: the filter is a pure scan-side operation — every predicate is
pushed to the Parquet reader (min/max row-group skipping), no shuffle at
all. Feature engineering is row-local projection inside whole-stage
codegen. The split is two filter passes over one cached upstream — the
reference's pattern (ny_taxi_ml.py:196-215) — not a shuffle-based sampler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import dsum
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# 17-term conjunctive predicate, mirroring the reference's filter stage
# (ny_taxi_ml.py:117-159: 6 numeric range cols + 2 disjunctions + one
# inter-column comparison). The reference keeps both a boolean-mask form and
# a string form (`df.query`); Spark's SQL-expression filter IS the string
# form, and the identical text runs in the DuckDB oracle.
FILTER_17 = """
    l_quantity > 1 AND l_quantity < 50
AND l_extendedprice > 1000 AND l_extendedprice < 80000
AND l_discount >= 0.0 AND l_discount <= 0.1
AND l_tax >= 0.0 AND l_tax < 0.09
AND l_linenumber >= 1 AND l_linenumber <= 7
AND year(l_shipdate) >= 1995
AND l_shipdate > timestamp '1995-01-01 00:00:00'
AND (l_returnflag = 'N' OR l_returnflag = 'R' OR l_returnflag = 'A')
AND (l_linestatus = 'O' OR l_linestatus = 'F')
AND l_extendedprice > l_quantity
AND l_partkey > 0
AND l_suppkey > 0
"""

_KEEP = [
    "l_orderkey",
    "l_linenumber",
    "l_quantity",
    "l_extendedprice",
    "l_discount",
    "l_returnflag",
    "l_shipdate",
]


def ml_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + 17-predicate filter (B1, B5). Raw rows out — the driver
    hash-checks exact values, no aggregation involved."""
    return load_table(spark, sf_dir, "lineitem").filter(FILTER_17).select(*_KEEP)


ML_FILTER_ORACLE = f"""
SELECT {', '.join(_KEEP)} FROM lineitem WHERE {FILTER_17}
"""

# Feature engineering (ny_taxi_ml.py:171-183): day-of-month extract (H2),
# float floor-div grid cells keeping float dtype (H5 — pandas `// 1e-4`
# returns float64, hence floor()+cast-to-double, not cast-to-long), and a
# euclidean-distance feature (H6). All row-local Column arithmetic; the
# exact text is shared with the oracle so IEEE evaluation is identical.
_FEATURES = {
    "o_day": "cast(day(o_orderdate) as bigint)",
    "o_year": "cast(year(o_orderdate) as bigint)",
    "price_grid": "cast(floor(o_totalprice / 0.0001) as double)",
    "price_k": "(o_totalprice / 1000.0)",
    "dist": (
        "sqrt((o_totalprice / 1000.0 - 100.0) * (o_totalprice / 1000.0 - 100.0)"
        " + (o_custkey * 1.0) * (o_custkey * 1.0))"
    ),
}


def ml_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "orders")
    return df.select(
        "o_orderkey",
        *[F.expr(sql).alias(name) for name, sql in _FEATURES.items()],
    )


ML_FEATURES_ORACLE = (
    "SELECT o_orderkey, "
    + ", ".join(f"{sql} AS {name}" for name, sql in _FEATURES.items())
    + " FROM orders"
)

# Predicate-based train/test split (B6, ny_taxi_ml.py:196-215: day < 25).
# As a hash-checkable query we return the per-split aggregate footprint; the
# operator itself (two filters over a cached parent) is exercised in tests.
_SPLIT_KEY = "case when day(o_orderdate) < 25 then 'train' else 'test' end"


def ml_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.expr(_SPLIT_KEY).alias("split"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.expr(dsum("o_totalprice")).alias("total_sum"),
        )
    )


ML_SPLIT_ORACLE = f"""
SELECT {_SPLIT_KEY} AS split, count(*) AS cnt, {dsum("o_totalprice")} AS total_sum
FROM orders GROUP BY 1
"""


def split_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The actual two-frame split operator (cached parent, two filter passes)."""
    df = load_table(spark, sf_dir, "orders").cache()
    train = df.filter(F.dayofmonth("o_orderdate") < 25)
    test = df.filter(F.dayofmonth("o_orderdate") >= 25)
    return train, test


SUITE = {
    "ml_filter": QuerySpec("ml_filter", ml_filter, ML_FILTER_ORACLE, "17-predicate filter (B5)"),
    "ml_features": QuerySpec("ml_features", ml_features, ML_FEATURES_ORACLE, "feature engineering (H2,H5,H6)"),
    "ml_split": QuerySpec("ml_split", ml_split, ML_SPLIT_ORACLE, "predicate train/test split (B6)"),
}
