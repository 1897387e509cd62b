"""Distributed PageRank with cross-engine-exact iterations.

Why it's in a training-data engine: web-corpus curation pipelines weight
documents by the link-graph authority of their domain (the CommonCrawl
harvest-rank idea) — PageRank over the domain graph is the standard
quality prior next to the text-level signals in ``operators/curation.py``.
The reference has no graph surface (SURVEY.md §2 extension layer, same
family as connected components in ``operators/cluster.py``).

Iteration (Page et al., "The PageRank Citation Ranking", 1999):

    rank'(v) = (1-d)/N + d * ( Σ_{u→v} rank(u)/outdeg(u) + dangling/N )

where ``dangling`` is the rank mass of nodes with no out-edges —
redistributed uniformly so total mass stays 1.

Scale shape: each iteration is ONE equi-join (ranks ⋈ edges on src, the
edges side pre-joined with out-degrees once) + ONE aggregation by dst +
a left join back to the node set — all hash-partitioned on node ids; the
dangling mass is a 1-row aggregate broadcast into the update projection.
``localCheckpoint`` truncates lineage per round and the previous round's
blocks are released immediately (the iterative-operator contract from
``operators/cluster.py``).

Determinism: every float aggregation quantizes per-row and sums exactly
in integers (``functions/deterministic.py``), so ranks are bit-identical
across partitionings AND across engines — which makes a fixed-iteration
PageRank *oracle-checkable*: :func:`pagerank_sql` renders the SAME
iteration arithmetic as unrolled DuckDB CTEs (recursive-term aggregates
are not portable SQL; unrolling k iterations is), and the driver's hash
compare passes exactly. Quantization is part of the algorithm's
semantics, not noise: scale=9 ⇒ 1e-9 per-term grid, exact-sum bound
N·10^9 < 2^53 ⇒ graphs to ~9M nodes; past that ``_fit_scale`` lowers the
scale automatically (and loudly) instead of refusing — the 100 TB regime
lives above a fixed scale-9 envelope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timedf_spark.functions.deterministic import dsum
from timedf_spark.operators.cluster import (
    _checkpoint,
    _driver_graph_paths_enabled,
    _release,
)

__all__ = [
    "pagerank",
    "pagerank_sql",
    "personalized_pagerank",
    "personalized_pagerank_sql",
]

_DAMPING = "0.85e0"  # shared literal text: both engines parse the same double
_SCALE = 9
# Hybrid fast path (same rule as cluster.connected_components): at or
# below these bounds the power iteration runs on the DRIVER in numpy —
# the distributed rounds pay 2 joins + an aggregate + a checkpoint PER
# ROUND of fixed overhead that dwarfs the arithmetic on small graphs
# (measured 4.4-5.1 s for 10 rounds over a few-thousand-node graph at
# sf0.1; the numpy solve is milliseconds). BIT-IDENTICAL results: the
# quantized-sum arithmetic (floor(x·10^s + 0.5) → exact integer sum →
# one division) and every IEEE float op reproduce exactly in float64 —
# integer sums are order-independent, so executor-vs-driver summation
# order cannot matter. Pinned by an equality test on both paths AND by
# the unchanged DuckDB oracles. Collects are BOUNDED (counted first;
# distributed path unchanged above the bounds — never a driver funnel).
_DRIVER_MAX_EDGES = 2_000_000  # ~32 MB of (src, dst) int64 via Arrow
_DRIVER_MAX_NODES = 2_000_000


def _driver_iterate(nodes_np, src_np, dst_np, iters, scale, n_value, pv_np=None):
    """numpy power iteration reproducing the distributed arithmetic bit
    for bit (vectorized throughout — inputs arrive as Arrow-collected
    numpy arrays, never Python Rows). ``pv_np`` (restart probabilities
    aligned to ``nodes_np``) switches to the personalized update; None
    means uniform PageRank."""
    import numpy as np

    order = np.argsort(nodes_np, kind="stable")
    nodes_sorted = nodes_np[order]
    n = len(nodes_sorted)
    mult = float(10**scale)
    src = np.searchsorted(nodes_sorted, src_np)
    dst = np.searchsorted(nodes_sorted, dst_np)
    deg = np.zeros(n, dtype=np.float64)
    np.add.at(deg, src, 1.0)  # distinct edges: count = out-degree
    has_out = deg > 0
    d = 0.85  # 0.85e0 — same IEEE double both engines parse
    if pv_np is None:
        pvec = None
        rank = np.full(n, 1.0 / n_value, dtype=np.float64)
    else:
        pvec = pv_np[order]
        rank = pvec.copy()
    for _ in range(iters):
        share = rank[src] / deg[src]
        q = np.floor(share * mult + 0.5).astype(np.int64)
        contrib_int = np.zeros(n, dtype=np.int64)
        np.add.at(contrib_int, dst, q)  # exact integer sums, any order
        contrib = contrib_int / mult
        dang_q = np.floor(rank[~has_out] * mult + 0.5).astype(np.int64)
        dang = dang_q.sum() / mult  # int64 sum: exact
        if pvec is None:
            rank = (1.0 - d) / n_value + d * (contrib + dang / n_value)
        else:
            rank = (1.0 - d) * pvec + d * (contrib + dang * pvec)
    return nodes_sorted, rank


def _fit_scale(n: int, scale: int) -> int:
    """Largest quantization scale ≤ ``scale`` whose exact-sum envelope
    holds (n · 10^scale < 2^53 — the float64-exact integer range the
    quantized rounds rely on). A FIXED scale=9 refuses graphs past ~9 M
    nodes, which is exactly the regime a 100 TB deployment lives in; the
    fit is a pure function of (n, scale), so results stay deterministic
    and run-to-run identical — they depend on n either way (the rank
    quantum is part of the algorithm's contract, and the DuckDB twins
    take the same scale explicitly). Lowering is LOUD (warnings.warn);
    below scale 5 the quantum is coarser than (1-d)/n for any n inside
    the envelope, so refuse instead of silently degrading."""
    fitted = scale
    while fitted > 4 and n * (10**fitted) >= (1 << 53):
        fitted -= 1
    assert n * (10**fitted) < (1 << 53), (
        f"{n} nodes exceeds the exact-sum envelope even at scale=5"
    )
    if fitted != scale:
        import warnings

        warnings.warn(
            f"pagerank: quantization scale lowered {scale} -> {fitted} to "
            f"keep exact integer sums for {n} nodes (rank quantum "
            f"1e-{fitted})",
            RuntimeWarning,
            stacklevel=3,
        )
    return fitted


def _update_expr(n_lit: str) -> str:
    """rank'(v) for one node: identical text on both sides. contrib and
    dang_m may be NULL (no in-edges / no dangling nodes)."""
    return (
        f"((1.0e0 - {_DAMPING}) / {n_lit} + {_DAMPING} * "
        f"(coalesce(contrib, 0e0) + coalesce(dang_m, 0e0) / {n_lit}))"
    )


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = 10,
    scale: int = _SCALE,
    checkpoint_every: int = 1,
    small_graph_edges: int = _DRIVER_MAX_EDGES,
) -> DataFrame:
    """(node) + directed (src, dst) → (node, rank) after ``iters`` exact
    power iterations. Duplicate edges are collapsed; every src/dst must
    appear in ``nodes``.

    ``checkpoint_every``: rounds between lineage truncations. Each round
    references the previous ranks TWICE (contribution join + dangling
    mass), so an un-checkpointed round is recomputed by both branches —
    2^k blowup for k skipped rounds (measured 5.4 → 12.5 s at sf0.1 for
    every=2). Keep 1 unless a caller interleaves its own persistence.
    Results are identical either way — checkpoint cadence is an
    execution detail, the quantized arithmetic is not."""
    node_col = nodes.columns[0]
    nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    n = nodes.count()
    assert n > 0, "empty node set"
    scale = _fit_scale(n, scale)
    n_lit = repr(float(n))  # identical literal text in both engines

    # materialize the edge pipeline ONCE; count + collect (or the
    # distributed degree join) all read the checkpoint
    e, pre_ids = _checkpoint(
        edges.select(
            F.col(edges.columns[0]).alias("src"),
            F.col(edges.columns[1]).alias("dst"),
        ).distinct()
    )
    if (
        small_graph_edges > 0
        and _driver_graph_paths_enabled()
        and n <= _DRIVER_MAX_NODES
        and e.count() <= small_graph_edges
    ):
        import pandas as pd

        et = e.toArrow()
        nodes_np = nodes.toArrow().column("node").to_numpy().astype("int64")
        _release(e, pre_ids)
        ns, rank = _driver_iterate(
            nodes_np,
            et.column("src").to_numpy().astype("int64"),
            et.column("dst").to_numpy().astype("int64"),
            iters,
            scale,
            float(n),
        )
        return nodes.sparkSession.createDataFrame(
            pd.DataFrame({"node": ns, "rank": rank})
        )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ed, ed_ids = _checkpoint(e.join(deg, "src"))  # edges carry out-degree
    _release(e, pre_ids)
    src_nodes = ed.select(F.col("src").alias("node")).distinct()

    ranks, rank_ids = _checkpoint(
        nodes.select("node", F.expr(f"1.0e0 / {n_lit}").alias("rank"))
    )
    for i in range(iters):
        contrib = (
            ranks.join(ed, ranks.node == ed.src)
            .select(F.col("dst").alias("node"), F.expr("rank / deg").alias("share"))
            .groupBy("node")
            .agg(F.expr(dsum("share", scale)).alias("contrib"))
        )
        dang = (
            ranks.join(src_nodes, "node", "left_anti")
            .agg(F.expr(dsum("rank", scale)).alias("dang_m"))
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select("node", F.expr(_update_expr(n_lit)).alias("rank"))
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            nxt, nxt_ids = _checkpoint(nxt)
            _release(ranks, rank_ids)
            ranks, rank_ids = nxt, nxt_ids
        else:
            ranks = nxt  # lazy round: folded into the next checkpoint's job
    _release(ed, ed_ids)
    return ranks


def _update_expr_ppr() -> str:
    """Personalized update: teleport and dangling mass both flow to the
    restart distribution pv instead of uniformly — identical text on
    both engines."""
    return (
        f"((1.0e0 - {_DAMPING}) * pv + {_DAMPING} * "
        f"(coalesce(contrib, 0e0) + coalesce(dang_m, 0e0) * pv))"
    )


def personalized_pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 10,
    scale: int = _SCALE,
    checkpoint_every: int = 1,
    small_graph_edges: int = _DRIVER_MAX_EDGES,
) -> DataFrame:
    """Personalized PageRank (Haveliwala, WWW'02): random walks restart
    into the SEED set instead of uniformly, so rank measures relevance
    *to the seeds* — the graph-retrieval primitive ("domains like
    these", seed-expanded curation). Identical plan shape to
    :func:`pagerank`; the restart vector rides the node frame as a
    column. Dangling mass also returns to the seeds (the standard PPR
    convention — total mass stays 1, pinned in tests)."""
    node_col = nodes.columns[0]
    nodes = nodes.select(F.col(node_col).alias("node")).distinct()
    seeds = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
    s = seeds.count()
    assert s > 0, "empty seed set"
    n = nodes.count()
    scale = _fit_scale(n, scale)
    s_lit = repr(float(s))
    nodes_p = nodes.join(
        seeds.withColumn("is_seed", F.lit(1)), "node", "left"
    ).select(
        "node",
        F.expr(f"CASE WHEN is_seed = 1 THEN 1.0e0 / {s_lit} ELSE 0e0 END").alias(
            "pv"
        ),
    )
    e, pre_ids = _checkpoint(
        edges.select(
            F.col(edges.columns[0]).alias("src"),
            F.col(edges.columns[1]).alias("dst"),
        ).distinct()
    )
    if (
        small_graph_edges > 0
        and _driver_graph_paths_enabled()
        and n <= _DRIVER_MAX_NODES
        and e.count() <= small_graph_edges
    ):
        import pandas as pd

        pvt = nodes_p.toArrow()
        et = e.toArrow()
        _release(e, pre_ids)
        ns, rank = _driver_iterate(
            pvt.column("node").to_numpy().astype("int64"),
            et.column("src").to_numpy().astype("int64"),
            et.column("dst").to_numpy().astype("int64"),
            iters,
            scale,
            float(n),
            pv_np=pvt.column("pv").to_numpy().astype("float64"),
        )
        return nodes.sparkSession.createDataFrame(
            pd.DataFrame({"node": ns, "rank": rank})
        )
    nodes_p, np_ids = _checkpoint(nodes_p)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).cast("double").alias("deg"))
    ed, ed_ids = _checkpoint(e.join(deg, "src"))
    src_nodes = ed.select(F.col("src").alias("node")).distinct()
    _release(e, pre_ids)

    ranks, rank_ids = _checkpoint(nodes_p.select("node", F.col("pv").alias("rank")))
    for i in range(iters):
        contrib = (
            ranks.join(ed, ranks.node == ed.src)
            .select(F.col("dst").alias("node"), F.expr("rank / deg").alias("share"))
            .groupBy("node")
            .agg(F.expr(dsum("share", scale)).alias("contrib"))
        )
        dang = (
            ranks.join(src_nodes, "node", "left_anti")
            .agg(F.expr(dsum("rank", scale)).alias("dang_m"))
        )
        nxt = (
            nodes_p.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select("node", F.expr(_update_expr_ppr()).alias("rank"))
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            nxt, nxt_ids = _checkpoint(nxt)
            _release(ranks, rank_ids)
            ranks, rank_ids = nxt, nxt_ids
        else:
            ranks = nxt
    _release(ed, ed_ids)
    _release(nodes_p, np_ids)
    return ranks


def personalized_pagerank_sql(
    nodes_sql: str,
    edges_sql: str,
    seeds_sql: str,
    iters: int = 10,
    scale: int = _SCALE,
) -> str:
    """DuckDB twin of :func:`personalized_pagerank` — unrolled CTEs, the
    restart probability carried on the node CTE."""
    s_lit = "(SELECT ss FROM scount)"
    parts = [
        f"nodes0 AS MATERIALIZED (SELECT DISTINCT node FROM ({nodes_sql}))",
        f"seeds AS MATERIALIZED (SELECT DISTINCT node FROM ({seeds_sql}))",
        "scount AS MATERIALIZED (SELECT cast(count(*) AS DOUBLE) AS ss FROM seeds)",
        f"nodes AS MATERIALIZED (SELECT n.node, CASE WHEN s.node IS NOT NULL "
        f"THEN 1.0e0 / {s_lit} ELSE 0e0 END AS pv "
        "FROM nodes0 n LEFT JOIN seeds s ON n.node = s.node)",
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "deg AS MATERIALIZED (SELECT src, cast(count(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        "ed AS MATERIALIZED (SELECT e.src, e.dst, deg.deg FROM e JOIN deg ON e.src = deg.src)",
        "r0 AS MATERIALIZED (SELECT node, pv AS rank FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT dst AS node, {dsum('share', scale)} AS contrib FROM ("
            f"SELECT ed.dst AS dst, {prev}.rank / ed.deg AS share "
            f"FROM {prev} JOIN ed ON {prev}.node = ed.src) GROUP BY dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT {dsum('rank', scale)} AS dang_m FROM {prev} "
            "WHERE node NOT IN (SELECT src FROM e))"
        )
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT nodes.node, {_update_expr_ppr()} AS rank "
            f"FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node CROSS JOIN d{i})"
        )
    return "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"


def pagerank_sql(
    nodes_sql: str, edges_sql: str, iters: int = 10, scale: int = _SCALE
) -> str:
    """DuckDB twin: the same iteration unrolled as chained CTEs over the
    same quantized arithmetic. ``nodes_sql``/``edges_sql`` are subqueries
    yielding (node) and (src, dst). N enters the arithmetic as a scalar
    subquery: its VALUE (an exact integer-valued double) is what the IEEE
    ops see, so it is interchangeable with the Spark side's literal —
    and the oracle stays correct at every scale factor."""
    n_lit = "(SELECT nn FROM ncount)"
    parts = [
        f"nodes AS MATERIALIZED (SELECT DISTINCT node FROM ({nodes_sql}))",
        "ncount AS MATERIALIZED (SELECT cast(count(*) AS DOUBLE) AS nn FROM nodes)",
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "deg AS MATERIALIZED (SELECT src, cast(count(*) AS DOUBLE) AS deg FROM e GROUP BY src)",
        "ed AS MATERIALIZED (SELECT e.src, e.dst, deg.deg FROM e JOIN deg ON e.src = deg.src)",
        f"r0 AS MATERIALIZED (SELECT node, 1.0e0 / {n_lit} AS rank FROM nodes)",
    ]
    for i in range(iters):
        prev, cur = f"r{i}", f"r{i + 1}"
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT dst AS node, {dsum('share', scale)} AS contrib FROM ("
            f"SELECT ed.dst AS dst, {prev}.rank / ed.deg AS share "
            f"FROM {prev} JOIN ed ON {prev}.node = ed.src) GROUP BY dst)"
        )
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT {dsum('rank', scale)} AS dang_m FROM {prev} "
            "WHERE node NOT IN (SELECT src FROM e))"
        )
        parts.append(
            f"{cur} AS MATERIALIZED (SELECT nodes.node, {_update_expr(n_lit)} AS rank "
            f"FROM nodes LEFT JOIN c{i} ON nodes.node = c{i}.node CROSS JOIN d{i})"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT node, rank FROM r{iters}"
    )
