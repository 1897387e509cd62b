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
from pyspark.sql.window import Window

__all__ = ["interval_overlap_join", "interval_overlap_topk"]


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


def interval_overlap_topk(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    k: int,
    cell_us: int = 3_600_000_000,
    pair_filter: str = "TRUE",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Top-``k`` overlap partners per ``key_cols`` group (columns of the
    prefixed pair schema, e.g. ``["a_user_id", "a_session_id"]``),
    ranked by (overlap_us DESC, then ``order_cols`` ASC as deterministic
    tie-break; defaults to every b_-prefixed key column). Emits the pair
    columns of ``interval_overlap_join`` plus ``overlap_rank``.

    Why this exists: exact ALL-pairs overlap enumeration is output-bound
    — true pair count grows ~quadratically with concurrency, so no
    operator can beat ~linear-in-output. When the consumer only needs
    each interval's strongest overlaps (concurrency analysis, co-session
    attribution), the cap turns the SHUFFLED volume linear in interval
    count via per-cell pre-pruning:

    - canonical-cell emission means each candidate pair exists in
      exactly one cell, and for a pair with global rank <= k in its
      group, the same-group pairs that outrank it are < k everywhere —
      so a per-(cell, key) top-k keeps every global top-k pair (the
      partial top-k argument of distributed TopK aggregation);
    - the per-cell window's partition keys EXTEND the join key (cell),
      and hash-partitioning by a subset satisfies the window's
      clustered-distribution requirement — Catalyst inserts only a
      partition-local sort, NO new exchange (checked in tests via plan
      inspection): the quadratic candidate stream never crosses the
      wire;
    - only <= k rows per (cell, key) shuffle to the global ranking.

    In-cell pairwise verify remains proportional to candidate volume —
    bounded by peak concurrency per cell, the irreducible part — but at
    100 TB the wire and the downstream stages carry O(intervals · k),
    not O(pairs).
    """
    # inline rebuild of the pair pipeline with the cell retained
    # (interval_overlap_join drops it before this operator can prune)
    def cells(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.select(*[F.col(c).alias(f"{prefix}{c}") for c in df.columns])
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
    pairs = (
        a.join(b, "cell")
        .filter(F.expr(pair_filter))
        .filter(F.col("cell") == F.expr(f"greatest(a_start_us, b_start_us) div {cell_us}"))
        .filter(start_max <= end_min)
        .withColumn("overlap_us", end_min - start_max)
    )
    tie = order_cols or [c for c in pairs.columns if c.startswith("b_") and c.endswith(("_id",))]
    if not tie:
        # right frame has no *_id columns: an empty tie list would rank
        # by overlap_us alone — nondeterministic top-k among ties across
        # runs/partitions. Order by EVERY b_ column instead: the ranking
        # is then total up to fully-identical right rows, for which any
        # pick yields the same output set.
        tie = sorted(c for c in pairs.columns if c.startswith("b_"))
    order = [F.desc("overlap_us")] + [F.asc(c) for c in tie]
    w_cell = Window.partitionBy("cell", *key_cols).orderBy(*order)
    pruned = (
        pairs.withColumn("_cell_rank", F.row_number().over(w_cell))
        .filter(F.col("_cell_rank") <= k)
        .drop("_cell_rank", "cell")
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        pruned.withColumn("overlap_rank", F.row_number().over(w))
        .filter(F.col("overlap_rank") <= k)
        .withColumn("overlap_rank", F.col("overlap_rank").cast("long"))
    )
