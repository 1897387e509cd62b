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

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["merge_changes", "snapshot_diff"]


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


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, op_col: str = "op"
) -> DataFrame:
    """The inverse of :func:`merge_changes`: derive the minimal CDC batch
    (op, key, payload) that transforms ``old`` into ``new`` — the
    snapshot-diff every table format exposes as incremental/changelog
    read, expressed over plain frames. I = key only in new, D = key only
    in old, U = key in both with any payload difference (null-safe
    per-column compare). Unchanged rows are omitted, so
    ``merge_changes(old, snapshot_diff(old, new), key)`` reproduces
    ``new`` exactly — the round-trip law pinned in tests.

    Scale posture: ONE full-outer equi-join on the key (co-located and
    shuffle-free when both snapshots are bucketed on it), a codegen'd
    per-column compare, no window or sort. D rows carry the OLD payload
    (merge ignores it; auditors want what was deleted)."""
    payload = [c for c in old.columns if c != key]
    o = old.select(
        F.col(key).alias("__ok"), *[F.col(c).alias(f"__o_{c}") for c in payload]
    )
    n = new.select(
        F.col(key).alias("__nk"), *[F.col(c).alias(f"__n_{c}") for c in payload]
    )
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in payload],
    )
    j = o.join(n, F.col("__ok") == F.col("__nk"), "full_outer").withColumn(
        op_col,
        F.when(F.col("__ok").isNull(), F.lit("I"))
        .when(F.col("__nk").isNull(), F.lit("D"))
        .when(~same, F.lit("U")),
    )
    return j.where(F.col(op_col).isNotNull()).select(
        op_col,
        F.coalesce("__nk", "__ok").alias(key),
        *[
            F.when(F.col(op_col) == "D", F.col(f"__o_{c}"))
            .otherwise(F.col(f"__n_{c}"))
            .alias(c)
            for c in payload
        ],
    )
