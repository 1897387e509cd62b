"""Graph link prediction over a bipartite edge list.

Resource-Allocation index (Zhou, Lü & Zhang, Eur. Phys. J. B 2009):
for candidate node pair (u, v), score = Σ over common neighbors c of
1/deg(c). RA consistently beats raw common-neighbor counts because a
shared *rare* neighbor is far stronger evidence than a shared hub —
the same intuition as IDF. Used on data-curation graphs to propose
"these two sources/domains are probably related" edges for seed
expansion and near-duplicate-source discovery.

Exactness: each term is the scaled truncating division
``SCALE DIV deg(c)`` — int64 on both engines (Spark ``DIV`` and DuckDB
``//`` truncate identically on positives), so the summed score is
exact and oracle-checkable with no float drift.

Scale posture (the quadratic guard, same discipline as
``dedup.ngram_jaccard_pairs``'s ``max_doc_freq``): pair candidates
unfold from per-neighbor sorted node arrays, Σ_c deg(c)·(deg(c)−1)/2
rows — quadratic in hub degree. ``max_degree`` drops hub neighbors
BEFORE the unfold (a hub shared by everyone carries ~no RA mass
anyway: 1/deg → 0), bounding pair volume to |edges| · max_degree / 2
and per-neighbor array memory to max_degree elements. A support floor
then drops noise pairs.

Reference parity: none (intel-ai/timedf has no graph surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["resource_allocation_pairs"]


def resource_allocation_pairs(
    edges: DataFrame,
    neighbor: str,
    node: str,
    max_degree: int = 50,
    min_common: int = 3,
    scale: int = 1_000_000,
) -> DataFrame:
    """Score node pairs by Resource-Allocation over common neighbors.

    ``edges``: bipartite (neighbor, node) incidence list (deduped
    internally). Returns (n1, n2, common, ra_scaled) for pairs with at
    least ``min_common`` shared neighbors, where
    ``ra_scaled = Σ_c (scale DIV deg(c))`` over common neighbors c
    with deg ≤ ``max_degree``.
    """
    # One shuffle to the neighbor grain (collect_set dedups in-agg), then
    # i<j pair combinations unfold JVM-side from the sorted per-neighbor
    # array — no distinct pre-pass and no self-join exchange; the only
    # remaining big shuffle is the unavoidable pair-grain aggregate. The
    # sorted array gives n1 < n2 for free.
    #
    # Unfold shape (r09): posexplode the array, then explode the i<j
    # SUFFIX slice per position — two streaming Generate operators. The
    # previous one-shot nested transform+flatten built the ENTIRE
    # O(deg²) pair array per row inside interpreted HOF lambdas before
    # exploding it; the two-level shape cut supplier_communities' edge
    # stage 4.5 -> 2.8 s at sf0.1 (identical output, A/B'd).
    grouped = (
        edges.select(F.col(neighbor).alias("_c"), F.col(node).alias("_n"))
        .groupBy("_c")
        .agg(F.sort_array(F.collect_set("_n")).alias("_ns"))
        .where(F.size("_ns") <= max_degree)
        .withColumn("_deg", F.size("_ns").cast("long"))
    )
    lefts = grouped.select(
        "_deg", F.posexplode("_ns").alias("_i", "n1"), F.col("_ns")
    )
    pairs = lefts.select(
        "_deg",
        "n1",
        F.explode(F.expr("slice(_ns, _i + 2, size(_ns))")).alias("n2"),
    )
    return (
        pairs.groupBy("n1", "n2")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(F.expr(f"{int(scale)} DIV _deg")).alias("ra_scaled"),
        )
        .where(F.col("common") >= min_common)
    )


def resource_allocation_sql(
    edges_sql: str,
    max_degree: int = 50,
    min_common: int = 3,
    scale: int = 1_000_000,
) -> str:
    """DuckDB twin: identical blocking, cap, and truncating division."""
    return f"""
WITH e AS (
  SELECT DISTINCT _c, _n FROM ({edges_sql})
), deg AS (
  SELECT _c, count(*) AS _deg FROM e GROUP BY _c
), capped AS (
  SELECT e._c, e._n, deg._deg FROM e JOIN deg USING (_c)
  WHERE deg._deg <= {int(max_degree)}
)
SELECT a._n AS n1, b._n AS n2,
       count(*) AS common,
       cast(sum({int(scale)} // a._deg) AS BIGINT) AS ra_scaled
FROM capped a JOIN capped b ON a._c = b._c AND a._n < b._n
GROUP BY a._n, b._n
HAVING count(*) >= {int(min_common)}
"""
