"""CDC merge (MERGE INTO semantics) as pure DataFrame operations.

The lakehouse upsert: apply a change batch of (key, op, payload) rows —
op ∈ {I, U, D} — to a snapshot, producing the next snapshot. Table
formats (Delta/Iceberg/Hudi) run this as MERGE INTO; the engine-level
dataflow underneath is exactly what this operator expresses:

    kept     = snapshot ⟕ changes(U|D) on key:
                 rows with no change pass through,
                 U rows take the changed payload,
                 D rows drop
    inserts  = changes(I)
    next     = kept ∪ inserts

Scale posture: ONE equi-join keyed on the merge key (shuffle or broadcast
by change-batch size — typical CDC batches are small → broadcast, and the
snapshot never shuffles), a map-side projection for the column picks, and
a union. No window, no global sort. With the snapshot bucketed on the key
(sources/bucketing.py) the join is co-located and even the shuffle
disappears. Deletes-as-rows (op='D') rather than actual row removal is
what makes the operation expressible over immutable inputs — the same
reason the formats implement MERGE as a rewrite.

Contract: at most one change row per key per batch (CDC compaction —
last-writer-wins upstream); duplicate change keys make MERGE ambiguous in
every engine (Delta raises; so do we, cheaply, via a count check when
``strict`` is set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_changes"]


def merge_changes(
    snapshot: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "op",
    strict: bool = False,
) -> DataFrame:
    """Apply a CDC batch to a snapshot; both frames share the payload
    schema, ``changes`` carries ``op_col`` ∈ {'I','U','D'} extra. Returns
    the next snapshot with the snapshot's column order."""
    payload = [c for c in snapshot.columns if c != key]
    if strict:
        dup = (
            changes.groupBy(key).count().filter(F.col("count") > 1).limit(1).count()
        )
        if dup:
            raise ValueError("ambiguous CDC batch: multiple change rows for one key")
    ud = changes.filter(F.col(op_col).isin("U", "D")).select(
        F.col(key).alias("__ck"),
        F.col(op_col).alias("__op"),
        *[F.col(c).alias(f"__c_{c}") for c in payload],
    )
    kept = (
        snapshot.join(ud, snapshot[key] == ud.__ck, "left")
        .filter((F.col("__op").isNull()) | (F.col("__op") == "U"))
        .select(
            key,
            *[
                F.when(F.col("__op") == "U", F.col(f"__c_{c}"))
                .otherwise(F.col(c))
                .alias(c)
                for c in payload
            ],
        )
    )
    inserts = changes.filter(F.col(op_col) == "I").select(key, *payload)
    return kept.unionByName(inserts)
