"""Distributed exact triangle counting by degree-ordered orientation
(Suri & Vassilvitskii, WWW'11; the standard scalable shape).

Orient every undirected edge from its (degree, id)-smaller endpoint to
the larger; enumerate wedges by self-joining oriented edges on their
source; close each wedge against the oriented edge set. The
orientation bounds every out-degree by O(sqrt(m)) on any graph (the
arboricity argument), so the wedge table — the only super-linear
intermediate — is at most O(m^1.5) worst case and ~sum C(d/2, 2) on
real graphs, instead of the sum C(d, 2) a naive wedge count pays on
hot nodes. Each triangle is counted exactly once (its vertices have a
unique (degree, id) total order).

Everything is exact integer arithmetic on equi-joins — no floats, no
RNG — so the DuckDB twin (:func:`triangle_stats_sql`) reproduces the
counts bit-for-bit and the driver gate hash-checks them.

Scale posture: three shuffles (edge canonicalization/distinct, degree
aggregate, wedge-close join — all equi-keyed); the wedge join is
skew-guarded by the orientation itself (a celebrity node of degree d
contributes C(sqrt(m), 2) wedges, not C(d, 2)). No collects, no
cartesian products.

No reference counterpart: intel-ai/timedf has no graph surface
(SURVEY.md §2 extension rows, alongside PageRank/CC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["triangle_stats", "triangle_stats_sql"]


def triangle_stats(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """One row (n_nodes, n_edges, n_wedges, n_triangles) over an
    undirected multigraph given as (a, b) pairs (self-loops and
    duplicate/reversed pairs tolerated — canonicalized away)."""
    # r11: edges feeds three consumers (both deg branches + the orient
    # join) and deg three more (two orient sides + node totals); without
    # materialization the upstream pair-generation executes once PER
    # consumer (exchange reuse does not unify the subtrees). Both frames
    # are linear in the edge count — materialize each once.
    edges = (
        pairs.select(
            F.least(a_col, b_col).alias("u"), F.greatest(a_col, b_col).alias("v")
        )
        .where("u <> v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .localCheckpoint(eager=True)
    )
    # orient by the (deg, id) total order; carry the destination's rank
    # so wedge endpoints can be ordered without re-joining degrees
    oriented = (
        edges.join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
        .select(
            F.expr("CASE WHEN struct(du, u) < struct(dv, v) THEN u ELSE v END").alias("src"),
            F.expr("CASE WHEN struct(du, u) < struct(dv, v) THEN v ELSE u END").alias("dst"),
            F.expr("CASE WHEN struct(du, u) < struct(dv, v) THEN dv ELSE du END").alias("ddeg"),
        )
    )
    # r11: oriented feeds THREE consumers (both wedge sides + the closing
    # set) and deg a fourth branch; without materialization the whole
    # pair-canonicalization + degree-join pipeline executes per consumer
    # (exchange reuse does not unify them). The oriented edge list is
    # m rows of three ints — materialize it once.
    oriented = oriented.localCheckpoint(eager=True)
    e1 = oriented.select("src", F.col("dst").alias("x"), F.col("ddeg").alias("dx"))
    e2 = oriented.select("src", F.col("dst").alias("y"), F.col("ddeg").alias("dy"))
    wedges = (
        e1.join(e2, "src")
        .where("struct(dx, x) < struct(dy, y)")
        .select(F.col("x").alias("src"), F.col("y").alias("dst"))
    )
    # Two aggregate branches, not four: node/edge totals both derive
    # from deg alone (n_edges = sum(deg)/2 by handshake), and the wedge
    # and triangle counts share ONE pass — a left join against the
    # oriented edge set (unique (src, dst) rows, so no fan-out) with a
    # match indicator, instead of a separate semi-join branch that
    # would re-execute the whole wedge pipeline.
    closing = oriented.select("src", "dst").withColumn("closed", F.lit(1))
    wedge_stats = wedges.join(closing, ["src", "dst"], "left").agg(
        F.count(F.lit(1)).alias("n_wedges"),
        F.count("closed").alias("n_triangles"),
    )
    node_stats = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        (F.sum("deg") / 2).cast("long").alias("n_edges"),
    )
    return node_stats.crossJoin(wedge_stats).select(
        "n_nodes", "n_edges", "n_wedges", "n_triangles"
    )


def triangle_stats_sql(pairs_sql: str) -> str:
    """DuckDB twin over ``pairs_sql`` (a subquery yielding columns a, b)."""
    return f"""
WITH raw AS ({pairs_sql}),
edges AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM raw WHERE a <> b
),
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS dst,
         CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg END AS ddeg
  FROM edges e
  JOIN deg du ON du.node = e.u
  JOIN deg dv ON dv.node = e.v
),
wedges AS (
  SELECT e1.dst AS src, e2.dst AS dst
  FROM oriented e1 JOIN oriented e2 USING (src)
  WHERE (e1.ddeg, e1.dst) < (e2.ddeg, e2.dst)
),
tri AS (
  SELECT count(*) AS n_triangles FROM wedges w
  WHERE EXISTS (SELECT 1 FROM oriented o WHERE o.src = w.src AND o.dst = w.dst)
)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       (SELECT count(*) FROM edges) AS n_edges,
       (SELECT count(*) FROM wedges) AS n_wedges,
       n_triangles
FROM tri
"""
