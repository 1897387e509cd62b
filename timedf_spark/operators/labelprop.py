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

from timedf_spark.operators.cluster import _checkpoint, _release

__all__ = ["label_propagation", "label_propagation_sql"]


def label_propagation(
    nodes: DataFrame, edges: DataFrame, iters: int = 4
) -> DataFrame:
    """(node) + undirected (a, b) pairs → (node, label) after ``iters``
    synchronous rounds. Edges are symmetrized and deduped internally."""
    node_col = nodes.columns[0]
    nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    a, b = edges.columns[:2]
    fwd = edges.select(F.col(a).alias("src"), F.col(b).alias("dst"))
    e, e_ids = _checkpoint(
        fwd.unionAll(
            edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
        ).distinct()
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
