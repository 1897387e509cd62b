"""Synchronous label propagation for community detection.

LPA (Raghavan, Albert & Kumara 2007): every node starts labeled with
its own id; each round, every node adopts the most frequent label among
its neighbors AND itself (ties → smallest label). The self-vote is the
standard "inertia" stabilization: without it, synchronous updates
oscillate 2-cycles on symmetric structures (a bare edge swaps labels
forever); with it, ties resolve toward the smaller label once and stay.
It also makes isolated nodes keep their label with no special casing.
A fixed number of synchronous rounds with the deterministic
tie-break makes the algorithm *oracle-checkable*: there is no float
arithmetic at all — counts and min-label comparisons only — so
:func:`label_propagation_sql` unrolls the identical rounds as DuckDB
CTEs and the driver's hash compare passes exactly. (Classical LPA
randomizes update order; the synchronous-deterministic variant is the
one that's reproducible across engines and cluster runs, which a
curation pipeline needs anyway.)

Why it's in a training-data engine: community detection over the
domain/source graph groups correlated sources before per-community
quota sampling (the "don't let one mirror network dominate the mix"
move), complementing PageRank's per-node authority with cluster
structure that connected components can't see (CC merges everything
touching; LPA respects density).

Scale shape per round: ONE equi-join (labels ⋈ edges on src) unioned
with the self-votes + ONE count aggregate at (node, label) grain + a
per-node argmax window partitioned by node — all hash-partitioned on
node ids, no global sort, no driver collect.
``localCheckpoint`` truncates lineage per round and releases the
previous round's blocks (the iterative-operator contract from
``operators/cluster.py``).

Reference parity: none (intel-ai/timedf has no graph surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from timedf_spark.operators.cluster import (
    _checkpoint,
    _driver_graph_paths_enabled,
    _release,
)

__all__ = ["label_propagation", "label_propagation_sql"]


# Hybrid fast path (same rule as connected_components / pagerank): the
# synchronous rounds are INTEGER-only (counts + min-label tie-breaks),
# so a vectorized numpy replay on the driver is exactly equal by
# construction — no float subtleties at all. Each distributed round
# costs a join + a (node,label) aggregate + an argmax window + a
# checkpoint of fixed overhead; on a bounded graph the numpy replay is
# milliseconds. Collects are counted first; the distributed path is
# unchanged above the bound.
_DRIVER_MAX_EDGES = 2_000_000
_DRIVER_MAX_NODES = 2_000_000


def _driver_lpa(nodes_np, src_np, dst_np, iters: int):
    """Vectorized synchronous LPA: per round, votes = self-label ∪
    neighbor labels; per-node argmax with (count DESC, label ASC).

    Matches the distributed rounds' IMPLICIT node-set growth: an edge
    endpoint absent from ``nodes`` has no initial label (contributes no
    votes), but once an in-set neighbor votes for it, it enters the
    label frame — exactly what the labels⋈edges union produces (pinned
    by the partition-invariance test, whose bipartite edges carry
    off-set endpoints)."""
    import numpy as np

    universe = np.unique(
        np.concatenate(
            [
                np.asarray(nodes_np, dtype=np.int64),
                np.asarray(src_np, dtype=np.int64),
                np.asarray(dst_np, dtype=np.int64),
            ]
        )
    )
    src = np.searchsorted(universe, src_np)
    dst = np.searchsorted(universe, dst_np)
    has = np.zeros(len(universe), dtype=bool)
    has[np.searchsorted(universe, np.unique(np.asarray(nodes_np, dtype=np.int64)))] = True
    label = universe.copy()  # meaningful only where has
    for _ in range(iters):
        sv = np.flatnonzero(has)  # labeled nodes self-vote
        em = has[src]  # labeled srcs vote for their dst
        vote_node = np.concatenate([sv, dst[em]])
        vote_label = np.concatenate([label[sv], label[src[em]]])
        order = np.lexsort((vote_label, vote_node))
        vn, vl = vote_node[order], vote_label[order]
        new_pair = np.empty(len(vn), dtype=bool)
        new_pair[0] = True
        new_pair[1:] = (vn[1:] != vn[:-1]) | (vl[1:] != vl[:-1])
        starts = np.flatnonzero(new_pair)
        counts = np.diff(np.append(starts, len(vn)))
        un, ul = vn[starts], vl[starts]
        # argmax per node: sort by (node ASC, count DESC, label ASC),
        # take the first row of each node group
        pick = np.lexsort((ul, -counts, un))
        first = np.empty(len(pick), dtype=bool)
        first[0] = True
        first[1:] = un[pick][1:] != un[pick][:-1]
        winners = pick[first]
        w_nodes, w_labels = un[winners], ul[winners]
        label[w_nodes] = w_labels  # synchronous: votes used the snapshot
        has[w_nodes] = True
    keep = has
    return universe[keep], label[keep]


def label_propagation(
    nodes: DataFrame, edges: DataFrame, iters: int = 4,
    small_graph_edges: int = _DRIVER_MAX_EDGES,
) -> DataFrame:
    """(node) + undirected (a, b) pairs → (node, label) after ``iters``
    synchronous rounds. Edges are symmetrized and deduped internally."""
    node_col = nodes.columns[0]
    nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    a, b = edges.columns[:2]
    # checkpoint BEFORE the bound check: the edge pipeline is often the
    # expensive part (e.g. resource-allocation pair generation), and the
    # count + collect below must both read the materialized frame, not
    # recompute it.
    # r12: symmetrize with ONE explode of a 2-struct array instead of
    # unionAll of two selects — the union shape planned the edge pipeline
    # once PER ORIENTATION (exchange reuse shares the pair-grain shuffle
    # write, but the post-shuffle aggregate + filter still ran twice);
    # the explode shape is a single subtree, so the edge pipeline
    # executes exactly once inside the checkpoint job. Row set identical:
    # explode emits exactly the two orientations per input row.
    e, e_ids = _checkpoint(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                    F.struct(F.col(b).alias("src"), F.col(a).alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
    )
    # Both bounds are counted BEFORE either collect (mirrors pagerank):
    # a large node frame over a sparse edge set must not become an
    # unbounded driver collect through the edge-only check.
    if (
        small_graph_edges > 0
        and _driver_graph_paths_enabled()
        and e.count() <= 2 * small_graph_edges
        and nodes.count() <= _DRIVER_MAX_NODES
    ):
        import pandas as pd

        et = e.toArrow()
        nodes_np = nodes.toArrow().column("node").to_numpy().astype("int64")
        _release(e, e_ids)
        ns, lab = _driver_lpa(
            nodes_np,
            et.column("src").to_numpy().astype("int64"),
            et.column("dst").to_numpy().astype("int64"),
            iters,
        )
        return nodes.sparkSession.createDataFrame(
            pd.DataFrame({"node": ns, "label": lab})
        )

    labels, label_ids = _checkpoint(nodes.select("node", F.col("node").alias("label")))
    pick = Window.partitionBy("node").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(iters):
        votes = labels.unionAll(
            labels.join(e, labels.node == e.src).select(
                F.col("dst").alias("node"), "label"
            )
        )
        nxt = (
            votes.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("_rk", F.row_number().over(pick))
            .where(F.col("_rk") == 1)
            .select("node", "label")
        )
        nxt, nxt_ids = _checkpoint(nxt)
        _release(labels, label_ids)
        labels, label_ids = nxt, nxt_ids
    _release(e, e_ids)
    return labels


def label_propagation_sql(nodes_sql: str, edges_sql: str, iters: int = 4) -> str:
    """DuckDB twin: the same synchronous rounds unrolled as CTEs with
    the identical (count DESC, label ASC) argmax tie-break."""
    parts = [
        f"nodes AS MATERIALIZED (SELECT DISTINCT node FROM ({nodes_sql}))",
        f"eraw AS MATERIALIZED (SELECT a, b FROM ({edges_sql}))",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ("
        "SELECT a AS src, b AS dst FROM eraw "
        "UNION ALL SELECT b AS src, a AS dst FROM eraw))",
        "l0 AS MATERIALIZED (SELECT node, node AS label FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"l{i}", f"l{i + 1}"
        parts.append(
            f"v{i} AS MATERIALIZED (SELECT node, label FROM {prev} "
            f"UNION ALL SELECT e.dst, {prev}.label FROM {prev} "
            f"JOIN e ON {prev}.node = e.src)"
        )
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT node, label FROM ("
            f"SELECT node, label, row_number() OVER (PARTITION BY node "
            f"ORDER BY count(*) DESC, label ASC) AS _rk "
            f"FROM v{i} GROUP BY node, label) WHERE _rk = 1)"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, label FROM l{iters}"
