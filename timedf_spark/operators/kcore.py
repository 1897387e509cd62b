"""k-core decomposition by iterative peeling (Seidman '83; the
Matula-Beck peel expressed as dataflow rounds).

Each round drops every node whose current degree is below k, then the
edges incident to dropped nodes; the fixpoint is the k-core. Graph
curation uses it to isolate the mutually-reinforcing region of a
similarity / citation / co-occurrence graph (spam rings and boilerplate
families peel away; the dense core survives).

Two surfaces:

- :func:`kcore_peel` — a FIXED number of peel rounds; deterministic
  integer state, so the DuckDB twin (:func:`kcore_peel_sql`) unrolls the
  same rounds as a CTE chain and the driver hash-checks the surviving
  (node, deg) table exactly — the lloyd_sql/connected-components
  pattern: an iterative algorithm under the exact gate.
- :func:`kcore_converged` — peel until the edge count is stable (the
  true k-core), raising on non-convergence like connected_components.
  Equality with the unrolled form once converged is pinned by test.

Scale posture: per round, one degree aggregate (map-side combine) and
two semi-joins keyed on the endpoints — all equi-shuffles; the
surviving-edge frame is localCheckpoint'ed and metadata-stripped per
round (operators/cluster.py infrastructure) so plans stay flat for any
round count. Rounds needed = peel depth of the graph, typically
O(log n) on similarity graphs; each round strictly shrinks the frame.

No reference counterpart: intel-ai/timedf has no graph surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timedf_spark.operators.cluster import _checkpoint, _release

__all__ = ["kcore_peel", "kcore_converged", "kcore_peel_sql"]


def _canonical_edges(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    return (
        pairs.select(
            F.least(a_col, b_col).alias("u"), F.greatest(a_col, b_col).alias("v")
        )
        .where("u <> v")
        .distinct()
    )


def _degrees(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )


def _peel_once(edges: DataFrame, k: int) -> DataFrame:
    keep = _degrees(edges).where(F.col("deg") >= k).select("node")
    return edges.join(
        keep.withColumnRenamed("node", "u"), "u", "left_semi"
    ).join(keep.withColumnRenamed("node", "v"), "v", "left_semi").select("u", "v")


def kcore_peel(
    pairs: DataFrame, a_col: str, b_col: str, k: int, rounds: int
) -> DataFrame:
    """(node, deg) surviving after exactly ``rounds`` peel applications —
    the deterministic, oracle-checkable form. Converged when a round
    removes nothing; :func:`kcore_converged` finds that point."""
    assert k >= 1 and rounds >= 0
    edges = _canonical_edges(pairs, a_col, b_col)
    held: set[int] = set()
    for _ in range(rounds):
        nxt = _peel_once(edges, k)
        nxt, ids = _checkpoint(nxt)
        _release(nxt, held)
        edges, held = nxt, ids
    return _degrees(edges)


def kcore_converged(
    pairs: DataFrame, a_col: str, b_col: str, k: int, max_rounds: int = 100
) -> DataFrame:
    """(node, deg) of the true k-core: every surviving node has deg >= k
    within the surviving subgraph. Raises if ``max_rounds`` peels do not
    reach the fixpoint (never silently truncates)."""
    edges = _canonical_edges(pairs, a_col, b_col)
    edges, held = _checkpoint(edges)
    n = edges.count()
    for _ in range(max_rounds):
        nxt = _peel_once(edges, k)
        nxt, ids = _checkpoint(nxt)
        m = nxt.count()
        _release(edges, held)
        edges, held = nxt, ids
        if m == n:
            return _degrees(edges)
        n = m
    raise RuntimeError(f"k-core peel did not converge in {max_rounds} rounds")


def kcore_peel_sql(pairs_sql: str, k: int, rounds: int) -> str:
    """DuckDB twin of :func:`kcore_peel` — one degree/keep/edge CTE
    triple per unrolled round."""
    parts = [
        f"""e0 AS (
  SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
  FROM ({pairs_sql}) WHERE a <> b
)"""
    ]
    for t in range(rounds):
        parts.append(
            f"""d{t} AS (
  SELECT node, count(*) AS deg FROM (
    SELECT u AS node FROM e{t} UNION ALL SELECT v AS node FROM e{t}
  ) GROUP BY node
)"""
        )
        parts.append(
            f"k{t} AS (SELECT node FROM d{t} WHERE deg >= {k})"
        )
        parts.append(
            f"""e{t + 1} AS (
  SELECT u, v FROM e{t}
  WHERE u IN (SELECT node FROM k{t}) AND v IN (SELECT node FROM k{t})
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT node, count(*) AS deg FROM (
  SELECT u AS node FROM e{rounds} UNION ALL SELECT v AS node FROM e{rounds}
) GROUP BY node"""
    )
