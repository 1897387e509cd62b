"""Bucketed-table support: co-located joins and aggregations without a
shuffle.

At 100 TB the dominant cost of a fact-fact join (orders ⋈ lineitem) is
shuffling both sides on the join key. Writing both tables bucketed by that
key moves the shuffle to WRITE time, once; every subsequent join or
aggregation on the key reads co-partitioned buckets and skips the exchange
entirely. This is the standard warehouse layout decision for tables that
are repeatedly joined on a stable key.

Spark specifics encoded here:
- bucketing requires ``saveAsTable`` (bucket metadata lives in the
  catalog, not in the parquet footer);
- both sides must have the same bucket count (or a multiple, with
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``);
- ``spark.sql.sources.bucketing.enabled`` is on by default — the join
  plan shows zero Exchange when it engages (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "bucketed_join"]


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    Sorting within buckets additionally enables merge-join without the
    per-task sort, and row-group skipping on the sort key.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left: str, right: str, key: str) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key; with
    matching bucket specs Catalyst plans this with NO exchange on either
    side (the tables' bucket partitioning already satisfies the join's
    distribution requirement)."""
    return spark.table(left).join(spark.table(right), key)
