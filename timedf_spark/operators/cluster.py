"""Connected components — near-dup *pairs* → canonical dedup *clusters*.

A dedup pipeline's last step: the pair list from any similarity tier
(Jaccard / MinHash / SimHash / cosine) is an undirected graph; each
document's canonical id is the minimum doc_id in its connected component
(keep one representative per cluster, drop the rest).

Algorithm: Pregel-style min-label propagation on DataFrames.

    label(v) ← min(label(v), min_{(u,v) ∈ E} label(u))   until fixpoint

Scale posture (this is an *iterative* dataflow — the one shape Catalyst
cannot fuse):
- each round is one equi-join (edges ⋈ labels on src) + one partial+final
  min-agg on dst + one full-outer merge — all hash-partitioned on the
  vertex id, no global sorts, no driver-side data;
- rounds = component diameter. Near-dup clusters are dense and tiny
  (diameter ≤ 3-4 in practice), so the loop converges in a handful of
  rounds; for adversarial long-chain graphs the large-star/small-star
  variant (Kiveris et al., "Connected Components in MapReduce", SoCC '14)
  drops rounds to O(log n) with the same join-shape per round — a drop-in
  upgrade that doesn't change this API;
- ``localCheckpoint`` after every round truncates lineage — without it the
  plan doubles per iteration and the driver OOMs on plan, not data (the
  classic iterative-Spark failure);
- convergence is detected with a count of changed labels (one action per
  round on an already-materialized checkpoint).

The fixpoint (min id per component) is engine-independent, so the result
is oracle-checkable: the DuckDB twin computes min-reachable-label with a
recursive CTE (tests/oracle via ``connected_components_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components"]

_MAX_ROUNDS = 50  # diameter bound; raise for adversarial chain graphs


def connected_components(
    vertices: DataFrame, edges: DataFrame, max_rounds: int = _MAX_ROUNDS
) -> DataFrame:
    """(vertex) + (src, dst) → (vertex, component) with component = min
    vertex id reachable. Vertices absent from edges keep themselves as
    their component (singleton clusters).

    ``vertices`` must have one column (the id); ``edges`` two columns
    (src, dst), undirected — both orientations are generated internally.
    """
    vcol = vertices.columns[0]
    scol, dcol = edges.columns[0], edges.columns[1]
    # undirected: propagate both ways each round
    e = edges.select(F.col(scol).alias("src"), F.col(dcol).alias("dst")).union(
        edges.select(F.col(dcol).alias("src"), F.col(scol).alias("dst"))
    )
    e = e.localCheckpoint()  # materialize once; reused every round
    labels = vertices.select(F.col(vcol).alias("v"), F.col(vcol).alias("lbl")).localCheckpoint()

    for _ in range(max_rounds):
        # min neighbour label per vertex this round
        nbr = (
            e.join(labels, e.src == labels.v)
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        merged = (
            labels.join(nbr, labels.v == nbr.v2, "left")
            .select(
                "v",
                F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("new_lbl"),
                F.col("lbl"),
            )
            .localCheckpoint()
        )
        changed = merged.filter(F.col("new_lbl") != F.col("lbl")).count()
        labels = merged.select("v", F.col("new_lbl").alias("lbl"))
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("lbl").alias("component"))


def connected_components_sql(vertices_sql: str, edges_sql: str) -> str:
    """DuckDB twin: min label over the reachability closure (recursive CTE
    with UNION dedup, so it terminates on cyclic graphs)."""
    return f"""
WITH RECURSIVE
verts AS ({vertices_sql}),
raw_edges AS ({edges_sql}),
edges AS (
  SELECT src, dst FROM raw_edges
  UNION ALL
  SELECT dst, src FROM raw_edges
),
walk(v, lbl) AS (
  SELECT v, v FROM verts
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON e.src = w.v
)
SELECT v AS vertex, min(lbl) AS component FROM walk GROUP BY v
"""
