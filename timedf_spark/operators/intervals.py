"""Interval overlap join: grid-bucketed candidate generation.

The naive overlap join is a theta join (``a.start <= b.end AND
b.start <= a.end``) — Catalyst can only execute it as a nested-loop /
cartesian product, quadratic in row count. The scale shape buckets time
into fixed grid cells: every interval replicates to the cells it
touches, candidates come from an EQUI-join on cell id, and the exact
overlap predicate verifies candidates. This is the standard distributed
spatial/temporal join decomposition (grid partitioning à la
SpatialSpark / GeoSpark; DuckDB's IEJoin solves the same problem
single-node with sorted offsets).

Duplicate suppression is structural, not an exchange: two overlapping
intervals share every cell in the overlap range, so a pair is emitted
ONLY from the canonical cell containing ``max(a.start, b.start)`` —
each candidate pair exists exactly once and no ``distinct`` is needed
(same first-collision trick as the SRP dedup tables in similarity.py).

Scale posture:
- Replication factor = interval length / cell size + 1; pick the cell
  near the typical interval length so replication stays O(1) per row.
- The shuffle key is the cell id — peak-hour cells are the hot keys;
  they hold actives-at-peak rows, bounded by concurrency, not table
  size, and AQE skew splitting applies to the verify join.
- All arithmetic is exact int64 microseconds (no float epoch), so the
  DuckDB oracle — which runs the plain theta join at test scale —
  matches bit-for-bit.

Reference parity: the reference has no interval/temporal join at all
(SURVEY.md §2 C — equi-key only); this is the extension-layer operator
session-concurrency and time-range analytics need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_overlap_join"]


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    cell_us: int = 3_600_000_000,
    pair_filter: str = "TRUE",
) -> DataFrame:
    """Pairs of overlapping intervals → left columns prefixed ``a_``,
    right columns prefixed ``b_``, plus exact ``overlap_us``.

    ``left``/``right`` need int64 µs columns ``start_us``/``end_us``
    (inclusive ends, ``start_us <= end_us``). ``pair_filter`` is a SQL
    predicate over the prefixed columns applied BEFORE the verify (e.g.
    ``a_user_id < b_user_id`` for unordered cross-user pairs of a
    self-join — push it here so asymmetric halves never materialize).
    """
    def cells(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.select(
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns]
        )
        # integer div, not `/`: float division of µs-scale int64s rounds
        # at the double's ulp and a boundary timestamp could land in the
        # wrong cell (same pitfall as event_bucket_dedup)
        return renamed.select(
            "*",
            F.explode(
                F.sequence(
                    F.expr(f"{prefix}start_us div {cell_us}"),
                    F.expr(f"{prefix}end_us div {cell_us}"),
                )
            ).alias("cell"),
        )

    a = cells(left, "a_")
    b = cells(right, "b_")
    start_max = F.greatest(F.col("a_start_us"), F.col("b_start_us"))
    end_min = F.least(F.col("a_end_us"), F.col("b_end_us"))
    return (
        a.join(b, "cell")
        .filter(F.expr(pair_filter))
        # canonical-cell emission: exactly the cell holding max(starts)
        .filter(F.col("cell") == F.expr(f"greatest(a_start_us, b_start_us) div {cell_us}"))
        # exact overlap verify
        .filter(start_max <= end_min)
        .drop("cell")
        .withColumn("overlap_us", end_min - start_max)
    )
