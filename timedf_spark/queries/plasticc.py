"""plasticc ETL suite (SURVEY.md §2 D5, D6, C1, H6-H8) on testdata.

The reference's ETL (timedf_benchmarks/plasticc/plasticc_pandas_modin.py:18-56)
is: one 13-aggregate groupby per object (min/max/mean/sum and the
bias-corrected pandas **skew**), flat aliased column names, derived ratio
features, then a left join to one-row-per-object metadata. Re-expressed as
lineitem-per-part aggregates joined to the part table.

Scale notes: the aggregation is a partial+final hash aggregate with
map-side combine for every agg. The bit-reproducible skew is two-pass
(see functions/deterministic.py) but executes in ONE shuffle: pass 1
(per-key mean + range) is written as window aggregates over
PARTITION BY key, so the window's hash exchange co-locates the key and
the second-pass groupBy on the same key runs with no further exchange —
plan: Scan → Exchange(key) → Sort → Window → HashAggregate. One scan of
the fact table, vs two scans + a join for the naive groupBy+join-back
form (measured ~13% faster, bit-identical). The fast non-reproducible
path is Spark's built-in one-pass ``skewness`` with the G1 correction
(functions/pandas_parity.skew_pandas). The metadata join is keyed on the
aggregation output key: broadcast at test scale via AQE, sort-merge on
co-partitioned sides at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import (
    davg,
    davg_window,
    dskew_pandas_centered,
    dsum,
    dwavg,
)
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import fan_out, load_table

# 13 aggregates in one pass (ref: plasticc_pandas_modin.py:31-40 dict-agg;
# flat names per ravel_column_names :18-21 — Spark aliases at agg time, D6).
# price_skew references the pass-1 mean column ``price_mu``.
_AGGS: dict[str, str] = {
    "line_mean": davg("l_linenumber"),
    "price_min": "min(l_extendedprice)",
    "price_max": "max(l_extendedprice)",
    "price_mean": davg("l_extendedprice"),
    "price_skew": dskew_pandas_centered("l_extendedprice", "price_mu", "price_rng"),
    "disc_min": "min(l_discount)",
    "disc_max": "max(l_discount)",
    "disc_mean": davg("l_discount"),
    "tax_mean": davg("l_tax"),
    "ship_max": "max(l_shipdate)",
    "ship_min": "min(l_shipdate)",
    "qty_sum": dsum("l_quantity"),
    "price_sum": dsum("l_extendedprice"),
}

_MEANS_SQL = (
    f"SELECT l_partkey, {davg('l_extendedprice')} AS price_mu, "
    "max(l_extendedprice) - min(l_extendedprice) AS price_rng "
    "FROM lineitem GROUP BY l_partkey"
)


def _two_pass_agg(spark: SparkSession, sf_dir: str, extra_aggs: dict[str, str] | None = None) -> DataFrame:
    # Pass 1 (mean + range per key) is expressed as WINDOW aggregates over
    # partition-by-key instead of a separate groupBy + join-back: the window
    # shuffles the fact table on l_partkey once, and the final groupBy on
    # the same key reuses that partitioning — Catalyst emits Exchange →
    # Sort → Window → HashAggregate with NO second exchange and ONE scan
    # (vs two scans + a join in the naive two-pass form). Measured ~13%
    # faster at sf0.1 and bit-identical (exceptAll both ways = 0 rows).
    # min_bytes floor (r10): the downstream is columnar arithmetic +
    # a 13-agg groupBy, not per-row-CPU lanes — at sf0.1 the fan-out
    # exchange measured a pure LOSS (plasticc_etl 0.99 s floored vs
    # 1.79 s fanned, 3-run medians); above the floor (100x+) the
    # under-split guard still engages where the serial scan is material.
    li = fan_out(load_table(spark, sf_dir, "lineitem"), min_bytes=24 << 20)
    wq = "(partition by l_partkey)"
    mu = davg_window("l_extendedprice", "l_partkey")
    rng = f"(max(l_extendedprice) over {wq} - min(l_extendedprice) over {wq})"
    li2 = li.withColumn("price_mu", F.expr(mu)).withColumn("price_rng", F.expr(rng))
    aggs = {**_AGGS, **(extra_aggs or {})}
    return li2.groupBy("l_partkey").agg(
        *[F.expr(sql).alias(name) for name, sql in aggs.items()]
    )


def _agg_oracle(extra_aggs: dict[str, str] | None = None) -> str:
    aggs = {**_AGGS, **(extra_aggs or {})}
    return f"""
WITH means AS ({_MEANS_SQL})
SELECT l.l_partkey, {', '.join(f'{sql} AS {name}' for name, sql in aggs.items())}
FROM lineitem l JOIN means m ON l.l_partkey = m.l_partkey
GROUP BY l.l_partkey
"""


def multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5: 13-aggregate single-shuffle-key groupby incl. pandas-parity skew."""
    return _two_pass_agg(spark, sf_dir)


# Derived ratio features (ref: plasticc_pandas_modin.py:44-48 flux_diff,
# flux_dif2, flux_w_mean, flux_dif3) — row-local arithmetic on aggregate
# outputs, shared text with the oracle for bit-identical doubles. dif3 runs
# inside the agg context, so it uses raw aggregate functions, not aliases.
_WMEAN = dwavg("l_extendedprice", "l_tax")
_DIF3 = f"((max(l_extendedprice) - min(l_extendedprice)) / {_WMEAN})"


def etl_features_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates + ratio features + left join to part metadata (C1)."""
    agg = _two_pass_agg(
        spark, sf_dir, extra_aggs={"price_w_mean": _WMEAN, "price_dif3": _DIF3}
    )
    agg = agg.withColumns(
        {
            "price_diff": F.expr("price_max - price_min"),
            "price_dif2": F.expr("(price_max - price_min) / price_mean"),
            "ship_span_days": F.datediff("ship_max", "ship_min").cast("long"),
        }
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_retailprice")
    # Metadata side is one-row-per-key, same situation as plasticc's
    # meta⋈agg (plasticc_pandas_modin.py:56).
    out = part.join(agg, part.p_partkey == agg.l_partkey, "left").drop("l_partkey")
    return out.select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        *list(_AGGS.keys()),
        "price_diff",
        "price_dif2",
        "price_w_mean",
        "price_dif3",
        "ship_span_days",
    )


ETL_ORACLE = f"""
WITH agg AS ({_agg_oracle({"price_w_mean": _WMEAN, "price_dif3": _DIF3})})
SELECT p.p_partkey, p.p_brand, p.p_retailprice,
       {', '.join(f'agg.{name}' for name in _AGGS)},
       agg.price_max - agg.price_min AS price_diff,
       (agg.price_max - agg.price_min) / agg.price_mean AS price_dif2,
       agg.price_w_mean, agg.price_dif3,
       CAST(date_diff('day', agg.ship_min, agg.ship_max) AS BIGINT) AS ship_span_days
FROM part p LEFT JOIN agg ON p.p_partkey = agg.l_partkey
"""


SUITE = {
    "plasticc_multi_agg": QuerySpec(
        "plasticc_multi_agg",
        multi_agg,
        _agg_oracle(),
        "13-agg groupby w/ pandas skew (D5, D6)",
    ),
    "plasticc_etl": QuerySpec(
        "plasticc_etl",
        etl_features_join,
        ETL_ORACLE,
        "agg + ratio features + left metadata join (C1, H6)",
    ),
}
