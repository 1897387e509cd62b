"""Bucketed-table layout: the pre-paid shuffle for repeated co-located
joins and aggregations.

At 100 TB the dominant cost of every fact-fact equi-join is the
exchange of both sides on the join key. Spark's bucketed tables
(`DataFrameWriter.bucketBy(n, key).sortBy(key).saveAsTable`) persist
the data ALREADY hash-partitioned (and optionally sorted) on the key:
a join between two tables bucketed on the same key with the same
bucket count satisfies the join's clustering requirement straight from
the scan — Catalyst plans a SortMergeJoin with ZERO Exchange on either
side (and with sortBy, often zero Sort too). The shuffle is paid once
at write time and amortized over every subsequent join/aggregate on
that key — the standard warehouse layout decision for hot join keys
(orders⋈lineitem on orderkey, events sessionization on user_id).

Caveats encoded here rather than left to folklore:
- both sides must agree on bucket count (Spark can coalesce mismatched
  counts when one divides the other, but the plan gate in
  tests/test_bucketed.py treats the matched layout as the contract);
- bucket pruning applies to equality predicates on the bucket key
  (`spark.sql.sources.bucketing.autoBucketedScan.enabled`);
- writing uses `saveAsTable` (bucketing metadata lives in the catalog;
  a plain parquet `save` silently drops it — the classic trap).

Reference parity: the reference's pandas backends have no physical
layout control at all (SURVEY.md §2.A); this is the extension-layer
scale surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_table"]


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed (and sorted) on
    ``key``. The write shuffles once on the key; every later join or
    aggregate on ``key`` between same-layout tables runs exchange-free."""
    w = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucketing metadata (and therefore the free
    clustering) only survives through the catalog, not a path read."""
    return spark.table(table)
