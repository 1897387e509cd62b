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

from timedf_spark.operators.cluster import (
    _checkpoint,
    _driver_graph_paths_enabled,
    _release,
)

__all__ = ["multi_source_bfs", "multi_source_bfs_sql"]

# Hybrid fast path (r11; same rule as connected_components / pagerank /
# labelprop): the rounds are INTEGER-only (hop counts and min), so a
# vectorized numpy frontier replay on the driver is exactly equal by
# construction — a node's distance is its first-reach hop, which is the
# min the distributed rounds converge to. Each distributed round costs a
# join + a union + a node-grain min-aggregate + a checkpoint of fixed
# overhead; on a bounded graph the replay is milliseconds. Collects are
# counted first; the distributed path is unchanged above the bound.
_DRIVER_MAX_EDGES = 2_000_000
_DRIVER_MAX_NODES = 2_000_000


def _driver_bfs(nodes_np, src, dst, seeds_np, max_hops: int):
    """dist per entry of ``nodes_np`` (-1 = unreached): min-hop BFS from
    the seed set over the directed edge list, capped at ``max_hops``.
    Propagation runs over the full endpoint universe (an off-``nodes``
    endpoint still relays distance, exactly like the distributed join);
    only the ``nodes`` rows are reported."""
    import numpy as np

    universe = np.unique(np.concatenate([nodes_np, src, dst, seeds_np]))
    dist = np.full(len(universe), -1, dtype=np.int64)
    dist[np.searchsorted(universe, np.unique(seeds_np))] = 0
    s_idx = np.searchsorted(universe, src)
    d_idx = np.searchsorted(universe, dst)
    frontier = dist == 0
    for hop in range(1, max_hops + 1):
        cand = d_idx[frontier[s_idx]]
        new = np.unique(cand[dist[cand] < 0])
        if not len(new):
            break  # same fixpoint the remaining distributed rounds keep
        dist[new] = hop
        frontier = np.zeros(len(universe), dtype=bool)
        frontier[new] = True
    return dist[np.searchsorted(universe, nodes_np)]


def multi_source_bfs(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    small_graph_edges: int = _DRIVER_MAX_EDGES,
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
    # All three bounds are counted BEFORE any collect (the labelprop
    # discipline); e and dist are already materialized so the counts are
    # block scans, and the node distinct is a node-grain aggregate.
    if (
        small_graph_edges > 0
        and _driver_graph_paths_enabled()
        and e.count() <= 2 * small_graph_edges
        and nodes.count() <= _DRIVER_MAX_NODES
        and dist.count() <= _DRIVER_MAX_NODES
    ):
        import pandas as pd

        et = e.toArrow()
        st = dist.toArrow()
        nodes_np = nodes.toArrow().column("node").to_numpy().astype("int64")
        _release(e, e_ids)
        _release(dist, dist_ids)
        nd = _driver_bfs(
            nodes_np,
            et.column("src").to_numpy().astype("int64"),
            et.column("dst").to_numpy().astype("int64"),
            st.column("node").to_numpy().astype("int64"),
            max_hops,
        )
        pdf = pd.DataFrame({"node": nodes_np, "dist": pd.array(nd, dtype="Int64")})
        pdf.loc[pdf["dist"] < 0, "dist"] = pd.NA
        return nodes.sparkSession.createDataFrame(pdf, "node bigint, dist bigint")
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
