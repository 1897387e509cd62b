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

from timedf_spark.operators.cluster import (
    _checkpoint,
    _driver_graph_paths_enabled,
    _release,
)

__all__ = ["kcore_peel", "kcore_converged", "kcore_peel_sql"]

# Hybrid fast path (r11; same rule as connected_components / pagerank /
# labelprop / bfs): peeling is INTEGER-only (degree counts, a >= k
# threshold), so a vectorized numpy replay on the driver is exactly
# equal by construction — each round derives degrees from the surviving
# edge set and keeps edges whose endpoints both meet k, the identical
# recurrence. Each distributed round costs a degree aggregate + two
# semi-joins + a checkpoint of fixed overhead that dwarfs the
# arithmetic on small graphs; the replay is milliseconds. Collects are
# counted first; the distributed path is unchanged above the bound.
_DRIVER_MAX_EDGES = 2_000_000


def _np_degrees(u, v):
    """(nodes_sorted, deg) over the canonical edge list — the numpy twin
    of :func:`_degrees` (nodes with >= 1 surviving edge only)."""
    import numpy as np

    return np.unique(np.concatenate([u, v]), return_counts=True)


def _driver_peel(u, v, k: int, rounds: int):
    """Edge set surviving ``rounds`` peel applications (early exit at the
    fixpoint — further applications are no-ops by definition)."""
    import numpy as np

    for _ in range(rounds):
        if not len(u):
            break
        nodes, deg = _np_degrees(u, v)
        keep = nodes[deg >= k]
        mask = np.isin(u, keep) & np.isin(v, keep)
        if mask.all():
            break  # fixpoint: this and every later round removes nothing
        u, v = u[mask], v[mask]
    return u, v


def _degrees_frame(spark, u, v) -> DataFrame:
    import pandas as pd

    nodes, deg = _np_degrees(u, v)
    return spark.createDataFrame(
        pd.DataFrame({"node": nodes, "deg": deg.astype("int64")}),
        "node bigint, deg bigint",
    )


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


def _integral_edge_cols(df: DataFrame) -> bool:
    """True when both edge columns are integral (byte/short/int/long) —
    the only types the numpy driver replay handles exactly. ADVICE r11:
    string keys crashed the astype and float/decimal keys silently
    truncated; non-integral graphs now stay on the distributed path,
    which handles any comparable type."""
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    ok = (ByteType, ShortType, IntegerType, LongType)
    return all(isinstance(f.dataType, ok) for f in df.schema.fields[:2])


def _collect_edges_bounded(edges: DataFrame, bound: int):
    """(u, v) numpy arrays when the materialized canonical edge frame is
    within ``bound``, the driver path is enabled, and the edge columns
    are integral — else (None, None, frame, ids) for the distributed
    path. The count runs BEFORE the collect (the labelprop discipline)
    against the checkpointed frame, so it is a block scan, not a
    recompute."""
    e, ids = _checkpoint(edges)
    if (
        bound > 0
        and _driver_graph_paths_enabled()
        and _integral_edge_cols(e)
        and e.count() <= bound
    ):
        et = e.toArrow()
        _release(e, ids)
        return (
            et.column("u").to_numpy().astype("int64"),
            et.column("v").to_numpy().astype("int64"),
            None,
            None,
        )
    return None, None, e, ids


def kcore_peel(
    pairs: DataFrame, a_col: str, b_col: str, k: int, rounds: int,
    small_graph_edges: int = _DRIVER_MAX_EDGES,
) -> DataFrame:
    """(node, deg) surviving after exactly ``rounds`` peel applications —
    the deterministic, oracle-checkable form. Converged when a round
    removes nothing; :func:`kcore_converged` finds that point."""
    assert k >= 1 and rounds >= 0
    u, v, edges, held = _collect_edges_bounded(
        _canonical_edges(pairs, a_col, b_col), small_graph_edges
    )
    if u is not None:
        spark = pairs.sparkSession
        u, v = _driver_peel(u, v, k, rounds)
        return _degrees_frame(spark, u, v)
    for _ in range(rounds):
        nxt = _peel_once(edges, k)
        nxt, ids = _checkpoint(nxt)
        _release(edges, held)
        edges, held = nxt, ids
    return _degrees(edges)


def kcore_converged(
    pairs: DataFrame, a_col: str, b_col: str, k: int, max_rounds: int = 100
) -> DataFrame:
    """(node, deg) of the true k-core: every surviving node has deg >= k
    within the surviving subgraph. Raises if ``max_rounds`` peels do not
    reach the fixpoint (never silently truncates)."""
    u, v, edges, held = _collect_edges_bounded(
        _canonical_edges(pairs, a_col, b_col), _DRIVER_MAX_EDGES
    )
    if u is not None:
        spark = pairs.sparkSession
        for _ in range(max_rounds):
            nu, nv = _driver_peel(u, v, k, 1)
            if len(nu) == len(u):
                return _degrees_frame(spark, nu, nv)
            u, v = nu, nv
        raise RuntimeError(
            f"k-core peel did not converge in {max_rounds} rounds"
        )
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
