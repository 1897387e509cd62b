"""Multi-source breadth-first search with bounded hops.

Min-distance propagation: dist_0 = 0 on the seed set; each round
extends the reached frontier one hop (dist+1 across out-edges) and
keeps the per-node minimum. After K rounds every node holds its exact
hop distance from the nearest seed, capped at K — the "crawl frontier
distance" / seed-proximity signal web-corpus curation uses to grade
pages by how far they sit from a trusted seed list (and the reach
half of the forward-backward reachability primitives).

All-integer (node ids and hop counts), so the fixed-round unrolled
DuckDB twin (:func:`multi_source_bfs_sql`) hash-matches exactly — the
same oracle discipline as pagerank/labelprop.

Scale shape per round: ONE equi-join (current distances ⋈ edges on
src) + a union with the carried distances + ONE min-aggregate at node
grain — hash-partitioned on node ids throughout; the distance frame
only ever contains REACHED nodes, so early rounds touch frontier-sized
data, not graph-sized. ``localCheckpoint`` + release per round (the
iterative-operator contract from ``operators/cluster.py``).

Reference parity: none (intel-ai/timedf has no graph surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timedf_spark.operators.cluster import _checkpoint, _release

__all__ = ["multi_source_bfs", "multi_source_bfs_sql"]


def multi_source_bfs(
    nodes: DataFrame, edges: DataFrame, seeds: DataFrame, max_hops: int = 3
) -> DataFrame:
    """(node) + directed (src, dst) + seed (node) → (node, dist) with
    dist = exact hop distance from the nearest seed if ≤ ``max_hops``,
    else NULL. Duplicate edges/seeds are collapsed internally."""
    node_col = nodes.columns[0]
    nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    e, e_ids = _checkpoint(
        edges.select(
            F.col(edges.columns[0]).alias("src"), F.col(edges.columns[1]).alias("dst")
        ).distinct()
    )
    dist, dist_ids = _checkpoint(
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
    )
    for _ in range(max_hops):
        step = dist.join(e, dist.node == e.src).select(
            F.col("dst").alias("node"), (F.col("dist") + 1).alias("dist")
        )
        nxt = dist.unionAll(step).groupBy("node").agg(F.min("dist").alias("dist"))
        nxt, nxt_ids = _checkpoint(nxt)
        _release(dist, dist_ids)
        dist, dist_ids = nxt, nxt_ids
    out = nodes.join(dist, "node", "left")
    _release(e, e_ids)
    return out


def multi_source_bfs_sql(
    nodes_sql: str, edges_sql: str, seeds_sql: str, max_hops: int = 3
) -> str:
    """DuckDB twin: the same bounded min-distance rounds, unrolled."""
    parts = [
        f"nodes AS MATERIALIZED (SELECT DISTINCT node FROM ({nodes_sql}))",
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        f"d0 AS MATERIALIZED (SELECT DISTINCT node, cast(0 AS BIGINT) AS dist "
        f"FROM ({seeds_sql}))",
    ]
    for i in range(max_hops):
        prev, cur = f"d{i}", f"d{i + 1}"
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT node, min(dist) AS dist FROM ("
            f"SELECT node, dist FROM {prev} "
            f"UNION ALL SELECT e.dst, {prev}.dist + 1 FROM {prev} "
            f"JOIN e ON {prev}.node = e.src) GROUP BY node)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT nodes.node, d{max_hops}.dist FROM nodes "
        + f"LEFT JOIN d{max_hops} ON nodes.node = d{max_hops}.node"
    )
