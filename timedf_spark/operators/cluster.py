"""Connected components — near-dup *pairs* → canonical dedup *clusters*.

A dedup pipeline's last step: the pair list from any similarity tier
(Jaccard / MinHash / SimHash / cosine) is an undirected graph; each
document's canonical id is the minimum doc_id in its connected component
(keep one representative per cluster, drop the rest).

Algorithm: Pregel-style min-label propagation with POINTER JUMPING.
Each round does two steps:

    (1) neighbour step:  label(v) ← min(label(v), min_{(u,v) ∈ E} label(u))
    (2) jump step:       label(v) ← min(label(v), label(label(v)))

Step 2 is path halving (the classic PRAM pointer-jumping trick, the same
idea behind Kiveris et al.'s large-star operation in "Connected
Components in MapReduce and Beyond", SoCC '14): label chains shorten
geometrically, so convergence is O(log n) rounds even on an adversarial
path graph — neighbour propagation alone needs O(diameter) rounds, which
at 100 TB with million-node chains is the difference between ~20 rounds
and ~10^6. Verified in tests: a 400-node chain converges in ≤ 12 rounds.

Scale posture (this is an *iterative* dataflow — the one shape Catalyst
cannot fuse):
- the neighbour step is one equi-join (edges ⋈ labels on src) + one
  partial+final min-agg on dst + one merge join; the jump step is one
  self-equi-join of the label table on (label = vertex) — all
  hash-partitioned on the vertex id, no global sorts, no driver-side data;
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

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "connected_components_star", "incremental_components"]

_MAX_ROUNDS = 100  # round bound; raise for adversarial chain graphs.
# Converged runs exit early so the bound is free headroom; random graphs
# near the connectivity phase transition (the 10x-scale dup graph) took
# 43 rounds — 50 was uncomfortably tight, and exhausting the bound now
# raises instead of returning a truncated labelling.


def _driver_graph_paths_enabled() -> bool:
    """Env kill-switch (SPARK_GRAFT_GRAPH_DRIVER_PATH=0) disabling every
    bounded driver fast path in the graph tier (connected components,
    incremental components, pagerank, PPR, LPA). The scale shakeout uses
    it to measure the DISTRIBUTED rounds — the code path that actually
    runs at 100 TB, where no graph fits under the driver bounds — without
    touching the per-query call sites. Read per call (not cached) so
    tests can flip it with monkeypatch.setenv."""
    import os

    return os.environ.get("SPARK_GRAFT_GRAPH_DRIVER_PATH", "1") != "0"


def _persistent_ids(sc) -> set[int]:
    return {int(str(i)) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}


def _strip_plan_metadata(df: DataFrame) -> DataFrame:
    """Rebuild a (checkpointed) frame as a BARE LogicalRDD over its own
    block-backed InternalRow RDD, dropping the origin stats/constraints
    metadata Dataset.checkpoint carries over from the source plan.

    Why this exists (round-5 root cause, measured): in this Spark build
    the carried origin metadata COMPOUNDS through iterative checkpoint
    chains whose round plan references the previous round more than once
    (the path-halving self-join does). On a 13k-vertex near-dup graph the
    per-round driver planning cost grew ~2.4x per round from round ~16
    (1 s -> 161 s by round 21; run never converged) while every stage
    stayed under 100 ms; AQE off, constraint propagation off, and
    RELIABLE checkpoints all reproduced it — only rebuilding the frame
    without the origin metadata flattens it (0.5 s/round through
    convergence at round 43). JVM-only: reads the checkpoint's cached
    blocks, no Python serialization. Falls back to a Python-RDD
    round-trip if the internal API is unavailable."""
    spark = df.sparkSession
    try:
        jdf = df._jdf
        out_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        return DataFrame(out_jdf, spark)
    except Exception:  # noqa: BLE001 — private API moved: slow-path strip
        return spark.createDataFrame(df.rdd, df.schema)


def _checkpoint(df: DataFrame):
    """localCheckpoint + the set of persistent-RDD ids it created, so the
    caller can release them once the next round is materialized. Without
    this, every round's checkpoint blocks stay in the block manager for
    the life of the session — on a long-running cluster job the iterative
    operator slowly eats executor storage memory it no longer needs.
    The returned frame is metadata-stripped (see _strip_plan_metadata) so
    iterative chains cannot compound planner metadata round over round.

    SPARK_GRAFT_CHECKPOINT_DIR switches every iterative operator to
    RELIABLE (disk-file) checkpoints instead: localCheckpoint caches
    whole partitions through the block manager, which materializes each
    partition as one in-heap array — at the 1000x decade (16M nodes over
    a 600M-row edge build) that array construction OOMed a 100g
    single-JVM heap twice (r08). A reliable checkpoint streams the
    partition to disk files and reads it back, so peak heap stays at
    task-buffer size; on a real cluster the same switch is how an
    iterative job survives executor-storage pressure. The planner-
    metadata strip applies on both paths (the r06 blowup reproduced
    under reliable checkpoints too — it is metadata-, not
    storage-driven)."""
    sc = df.sparkSession.sparkContext
    ckdir = os.environ.get("SPARK_GRAFT_CHECKPOINT_DIR")
    if ckdir:
        cur = sc._jsc.sc().getCheckpointDir()
        if cur.isEmpty():
            sc.setCheckpointDir(ckdir)
        else:
            # ADVICE r08: setCheckpointDir nests a per-context UUID dir
            # under the requested path, so compare the PARENT of the
            # current dir (scheme-stripped) against the env value — if an
            # earlier call (or user code) pinned a different directory,
            # silently keeping it would land checkpoints on the wrong
            # volume. Re-point and warn instead.
            cur_parent = os.path.dirname(str(cur.get()).rstrip("/"))
            for scheme in ("file://", "file:"):
                if cur_parent.startswith(scheme):
                    cur_parent = cur_parent[len(scheme):]
                    break
            if os.path.abspath(cur_parent) != os.path.abspath(ckdir):
                import warnings

                warnings.warn(
                    "SPARK_GRAFT_CHECKPOINT_DIR=%r differs from the "
                    "context's current checkpoint dir %r — re-pointing to "
                    "the env value" % (ckdir, str(cur.get())),
                    stacklevel=2,
                )
                sc.setCheckpointDir(ckdir)
        out = df.checkpoint()  # eager, disk-backed, lineage-truncating
        return _strip_plan_metadata(out), set()
    before = _persistent_ids(sc)
    out = df.localCheckpoint()  # eager: materialized here
    ids = _persistent_ids(sc) - before
    return _strip_plan_metadata(out), ids


def _release(df: DataFrame, ids: set[int]) -> None:
    jsc = df.sparkSession.sparkContext._jsc.sc()
    for i in ids:
        try:
            jsc.unpersistRDD(i, False)
        except Exception:  # noqa: BLE001 — already freed / racing cleanup
            pass


def connected_components(
    vertices: DataFrame | None, edges: DataFrame, max_rounds: int = _MAX_ROUNDS,
    small_graph_edges: int = 200_000,
) -> DataFrame:
    """(vertex) + (src, dst) → (vertex, component) with component = min
    vertex id reachable. Vertices absent from edges keep themselves as
    their component (singleton clusters).

    ``vertices`` must have one column (the id); ``edges`` two columns
    (src, dst), undirected — both orientations are generated internally.
    Edge endpoints are expected to be ⊆ vertices when vertices is given.

    ``vertices=None`` restricts the computation to edge ENDPOINTS,
    derived from the already-checkpointed edge frame (zero extra
    pipeline cost). This is the shape for dedup graphs at corpus scale:
    every off-graph vertex is a singleton the caller can enumerate
    without iterating, so the O(log n) rounds run over the (small)
    duplicate graph instead of the whole corpus.

    Hybrid solve (same rule as :func:`incremental_components`): dedup
    graphs are tiny relative to their corpus — at or below
    ``small_graph_edges`` a driver union-find over the checkpointed edge
    list replaces the distributed rounds. Pointer jumping pays 2 shuffled
    joins + a convergence count PER ROUND regardless of graph size, so a
    10k-edge graph with a 15-round diameter costs ~80 s of fixed overhead
    the union-find solves in milliseconds; the collect is BOUNDED
    (counted first, ≤ ~16 bytes/edge) with the distributed path unchanged
    above the bound — never a driver funnel at scale. Identical results
    (min-id convention) on both paths, pinned by test.
    """
    scol, dcol = edges.columns[0], edges.columns[1]
    # undirected: propagate both ways each round. r12: symmetrize with
    # ONE explode of a 2-struct array — the union-of-two-selects shape
    # planned the (often expensive) pair pipeline once per orientation
    # inside the checkpoint job (exchange reuse shares the shuffle write
    # but the post-shuffle aggregate/filter ran twice); the explode shape
    # is a single subtree. Row multiset identical (two orientations per
    # input row, duplicates preserved — the min-agg rounds are
    # multiplicity-insensitive either way).
    e = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(scol).alias("src"), F.col(dcol).alias("dst")),
                    F.struct(F.col(dcol).alias("src"), F.col(scol).alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
    )
    e, e_ids = _checkpoint(e)  # materialize once; reused every round
    if (
        small_graph_edges > 0
        and _driver_graph_paths_enabled()
        and e.count() <= 2 * small_graph_edges
    ):
        relabelled_rows = _unionfind_components(
            [(r[0], r[1]) for r in e.collect()]
        )
        spark = edges.sparkSession
        relabelled = spark.createDataFrame(
            relabelled_rows, "vertex long, component long"
        )
        _release(e, e_ids)
        if vertices is None:
            return relabelled
        vcol = vertices.columns[0]
        return (
            vertices.select(F.col(vcol).alias("vertex"))
            .join(F.broadcast(relabelled), "vertex", "left")
            .select(
                "vertex",
                F.coalesce("component", F.col("vertex")).alias("component"),
            )
        )
    # Distributed-implementation routing (VERDICT r08 item 2): the
    # at-scale path DEFAULTS to the alternating large-star/small-star
    # rewrite (fixpoint-identical, property-tested + oracle-identical on
    # the dedup graph). The A/B at forced-distributed 100x
    # (SCALE_SHAKEOUT.json queries_star_100x vs queries_distributed_100x,
    # r09, same protocol) measured star at t100 114.6 s / exponent 0.69
    # vs pointer jumping's 205.0 s / 0.87 — star rewrites the edge set
    # (monotone-superset variant, bounded ~|E_sym| + O(n·rounds) — see
    # connected_components_star) with map-side-combinable min-neighbour
    # aggregates, while
    # pointer jumping re-joins the full label table twice per round, so
    # the gap widens with the decade. Star costs ~+1 s on the sf0.1
    # distributed graph (4.7 vs 3.7 s) — irrelevant, since graphs that
    # small take the driver union-find fast path above. SPARK_GRAFT_CC_IMPL
    # =jump restores pointer jumping (e.g. to re-run the A/B).
    # vertices (possibly None) passes through UNDERIVED: star derives
    # endpoints from its OWN checkpointed edge set, so releasing the
    # outer working set here cannot orphan a lazy vertex derivation
    # (releasing it under a vertices-from-e plan was a real bug: the
    # final join re-read the unpersisted localCheckpoint blocks).
    if os.environ.get("SPARK_GRAFT_CC_IMPL", "star") != "jump":
        # assume_symmetric: e above is ALREADY the checkpointed
        # union-of-both-orientations — star must not rebuild/re-checkpoint
        # it (doubling rows pre-distinct was a redundant shuffle +
        # materialization of the largest working set, ADVICE r09)
        out = connected_components_star(
            vertices, e, max_rounds=max_rounds, assume_symmetric=True
        )
        _release(e, e_ids)
        return out
    if vertices is None:
        # both orientations are in e, so src alone covers every endpoint
        vertices = e.select(F.col("src").alias("v")).distinct()
    vcol = vertices.columns[0]
    labels, label_ids = _checkpoint(
        vertices.select(F.col(vcol).alias("v"), F.col(vcol).alias("lbl"))
    )

    converged = False
    for _ in range(max_rounds):
        # (1) neighbour step: min label over incident edges
        nbr = (
            e.join(labels, e.src == labels.v)
            .groupBy(F.col("dst").alias("v2"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        stepped = labels.join(nbr, labels.v == nbr.v2, "left").select(
            "v",
            F.least(F.col("lbl"), F.coalesce(F.col("nbr_lbl"), F.col("lbl"))).alias("lbl"),
        )
        # (2) jump step (path halving): follow the label one hop —
        # label(v) ← min(label(v), label(label(v))). Labels are always
        # vertex ids, so the self-join on (lbl = v) resolves every row.
        jumped, jumped_ids = _checkpoint(
            stepped.alias("x")
            .join(stepped.alias("y"), F.col("x.lbl") == F.col("y.v"), "left")
            .select(
                F.col("x.v").alias("v"),
                F.least(
                    F.col("x.lbl"), F.coalesce(F.col("y.lbl"), F.col("x.lbl"))
                ).alias("lbl"),
            )
        )
        changed = (
            jumped.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        # this round's labels are materialized and compared — the previous
        # round's checkpoint blocks are dead; free them now
        _release(labels, label_ids)
        labels, label_ids = jumped, jumped_ids
        if changed == 0:
            converged = True
            break
    _release(e, e_ids)
    if not converged:
        # Returning an unconverged labelling would silently split true
        # components — a correctness bug no caller can detect. High-
        # diameter graphs (random graphs at the connectivity phase
        # transition take ~40 rounds at 13k vertices) need a larger
        # max_rounds, not a truncated answer.
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds; "
            "raise max_rounds (graph diameter exceeds the bound)"
        )
    return labels.select(F.col("v").alias("vertex"), F.col("lbl").alias("component"))


def connected_components_star(
    vertices: DataFrame | None,
    edges: DataFrame,
    max_rounds: int = _MAX_ROUNDS,
    assume_symmetric: bool = False,
) -> DataFrame:
    """Alternating large-star / small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC '14) —
    same contract and fixpoint as :func:`connected_components`, including
    ``vertices=None`` (labels restricted to edge ENDPOINTS, derived from
    the internally-checkpointed canonical edge set so no caller frame is
    re-read after the rounds).

    The algorithm rewrites the EDGE set instead of propagating labels:

        large-star: for each node u, connect every strictly-larger
                    neighbour to u's minimum neighbour m(u) (keeps u→m(u))
        small-star: for each node u, connect every smaller-or-equal
                    neighbour to m(u)

    Both steps are one groupBy(node) over the edge list. NOTE: this is
    the MONOTONE-SUPERSET variant, not the paper's edge-replacing one —
    each round keeps one orientation of every original edge and
    re-symmetrizes, so the working edge set only grows: bounded by the
    original symmetric set plus the u→m(u) rewire edges (≤ one per
    (node, round), and rewires collapse toward component minima as
    rounds proceed), i.e. ~|E_sym| + O(n·rounds) with rounds O(log n)
    in practice. The superset keeps the fixpoint test trivial (the edge
    multiset stops changing exactly when every node links its component
    minimum) at the cost of a working set that never shrinks below the
    input — fine for dedup graphs, whose edge volume is the duplicate
    density, not the corpus. Kiveris et al.'s shrinking property would
    require dropping the rewritten orientation; the A/B'd performance
    (SCALE_SHAKEOUT queries_star_*) is of THIS variant.
    The operational difference vs pointer jumping
    is WHERE the work lands: star rounds aggregate the full neighbour
    list per node — with Spark's partial aggregation the map-side combine
    collapses a hot node's list before the shuffle, so a power-law degree
    distribution (one node in half the edges — exactly what a boilerplate
    near-dup cluster looks like) cannot concentrate on one reducer. Label
    propagation instead re-joins the full label table every round. Offered
    as the skew-robust alternative; both implementations are
    property-tested to the identical fixpoint.

    Each round: min-neighbour agg (one shuffle on node) + edge rewrite
    (map-only) + distinct (one shuffle); localCheckpoint truncates lineage
    per round. Convergence when the edge set reaches the star fixpoint
    (every edge already points at the component minimum → rewrite changes
    nothing).

    ``assume_symmetric``: the caller guarantees ``edges`` already holds
    BOTH orientations and is checkpointed (``connected_components``'s
    routing path) — the union/distinct/checkpoint of the canonicalization
    is skipped and the caller's materialized blocks are reused directly
    (a map-only self-loop filter is all that runs before round 1).
    Duplicate input rows are tolerated: the first round's distinct
    absorbs them (at worst one phantom non-zero delta on round 1)."""
    scol, dcol = edges.columns[0], edges.columns[1]
    sym = edges.select(F.col(scol).alias("u"), F.col(dcol).alias("w"))
    if assume_symmetric:
        e, e_ids = sym.filter(F.col("u") != F.col("w")), set()
    else:
        # canonical working set: both orientations, self-loops dropped
        sym = sym.union(
            edges.select(F.col(dcol).alias("u"), F.col(scol).alias("w"))
        )
        e, e_ids = _checkpoint(sym.filter(F.col("u") != F.col("w")).distinct())
    if vertices is None:
        # endpoints from the PRE-filter symmetric set (a self-loop-only
        # vertex must still label itself), checkpointed eagerly so the
        # result never re-reads a caller frame the caller may release
        vertices, _v_ids = _checkpoint(
            sym.select(F.col("u").alias("v")).distinct()
        )
    vcol = vertices.columns[0]

    def star_round(e: DataFrame, large: bool):
        mins = e.groupBy("u").agg(F.min("w").alias("m"))
        # m(u) also considers u itself (a node can be its own minimum)
        mins = mins.select("u", F.least("u", "m").alias("m"))
        j = e.join(mins, "u")
        cond = F.col("w") > F.col("u") if large else F.col("w") <= F.col("u")
        rewired = j.filter(cond).select(F.col("w").alias("u"), F.col("m").alias("w"))
        kept = j.filter(~cond).select("u", "w")
        out = (
            rewired.union(kept)
            .union(mins.select("u", F.col("m").alias("w")))
            .filter(F.col("u") != F.col("w"))
        )
        # re-symmetrize: star steps emit directed rewires; the next round's
        # min-neighbour must see both endpoints or star-chains stall
        return _checkpoint(
            out.union(out.select(F.col("w").alias("u"), F.col("u").alias("w"))).distinct()
        )

    converged = False
    for _ in range(max_rounds):
        mid, mid_ids = star_round(e, large=True)
        e2, e2_ids = star_round(mid, large=False)
        _release(mid, mid_ids)  # consumed by the small-star checkpoint
        # fixpoint: the undirected edge multiset stopped changing
        delta = e2.exceptAll(e).limit(1).count() + e.exceptAll(e2).limit(1).count()
        _release(e, e_ids)
        e, e_ids = e2, e2_ids
        if delta == 0:
            converged = True
            break
    if not converged:
        # same contract as the pointer-jumping path: an un-fixpointed edge
        # set would silently split true components — raise, never truncate
        raise RuntimeError(
            f"connected_components_star did not converge in {max_rounds} "
            "rounds; raise max_rounds"
        )

    # at fixpoint every non-minimum vertex has an edge to its component min
    comp = e.groupBy("u").agg(F.min("w").alias("m"))
    comp = comp.select("u", F.least("u", "m").alias("m"))
    v = vertices.select(F.col(vcol).alias("vertex"))
    return v.join(comp, v.vertex == comp.u, "left").select(
        "vertex", F.coalesce("m", F.col("vertex")).alias("component")
    )


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


def incremental_components(
    assignments: DataFrame,
    new_edges: DataFrame,
    max_rounds: int = _MAX_ROUNDS,
    small_graph_edges: int = 200_000,
    delta_only: bool = False,
) -> DataFrame:
    """Maintain (vertex, component) under a batch of NEW near-dup edges
    without re-clustering the corpus — the daily-ingest companion to
    ``dedup.incremental_near_dup_pairs``.

    Insight: an existing assignment (v → c) is exactly an EDGE v—c in the
    component-contraction sense (c is itself a vertex: the component id
    is the min member id). So the updated fixpoint is plain
    ``connected_components`` over (new edges ∪ assignment edges of the
    AFFECTED components) — and only components touched by a new edge can
    change, so everything else passes through untouched.

    Hybrid solve of the affected subgraph: under ``small_graph_edges``
    a driver-side union-find (bounded collect) replaces the distributed
    rounds — per-batch latency drops ~10x at micro-batch scale; above
    the bound the distributed pointer-jumping path runs unchanged. Set
    ``small_graph_edges=0`` to force the distributed path.

    Steps (each one equi-join, no iteration outside the tiny affected
    subgraph):
    1. endpoints of new edges → their current components (left join:
       brand-new vertices are their own component);
    2. affected component ids (distinct, tiny) SEMI-join back to pull the
       affected membership rows — the corpus-sized assignment table is
       filtered by broadcast semi-join, never shuffled whole;
    3. CC over [new edges ∪ (v—component) edges of affected rows] with
       ``vertices=None`` (endpoint-restricted rounds);
    4. untouched assignments UNION the re-labelled affected ones.

    Equivalent to full recompute by construction (union of spanning
    structures preserves connectivity); pinned by the equivalence test.

    ``delta_only=True`` returns ONLY the relabelled affected rows (the
    delta a versioned assignment store appends) instead of unioning the
    untouched corpus back in — the shape the delta-assignment protocol
    (streaming/cluster_apply.py, r10) writes per batch, turning the
    per-batch assignment cost from O(corpus rewrite) to O(delta). In
    this mode ``assignments`` may be the UNRESOLVED multi-version row
    set (stale rows included): an assignment row is an edge v—c and
    merges never split components, so a stale (v, c_old) is still a
    TRUE connectivity fact — over-pulling stale rows only adds
    redundant edges to the affected subgraph and cannot change the
    min-id fixpoint. (Without delta_only, pass a RESOLVED assignment:
    the untouched-rows passthrough would duplicate stale vertices.)
    """
    va, vb = new_edges.columns[0], new_edges.columns[1]
    # Checkpoint the NEW edges FIRST: they are typically the output of an
    # expensive pipeline (LSH candidate generation + exact verify in the
    # ingest loop), and the plan below references them from FOUR branches
    # (e_new union arm, touched via endpoints, affected's broadcast, and
    # untouched's anti-join) — without materialization the upstream pair
    # work executes once per branch. The pair set itself is small (near-
    # dup edges of one micro-batch), so the checkpoint is cheap.
    e_new, new_ids = _checkpoint(
        new_edges.select(F.col(va).alias("src"), F.col(vb).alias("dst"))
    )
    vcol, ccol = assignments.columns[0], assignments.columns[1]
    asg = assignments.select(F.col(vcol).alias("v"), F.col(ccol).alias("c"))

    endpoints = (
        e_new.select(F.col("src").alias("v"))
        .union(e_new.select(F.col("dst").alias("v")))
        .distinct()
    )
    touched = (
        endpoints.join(asg, "v", "left")
        .select(F.coalesce("c", "v").alias("c"))  # new vertex = own component
        .distinct()
    )
    affected = asg.join(F.broadcast(touched), "c", "left_semi")
    # assignment rows double as edges v—c; self-loops (v = c) are harmless
    e_old = affected.select(F.col("v").alias("src"), F.col("c").alias("dst"))
    e_all, e_ids = _checkpoint(e_new.unionByName(e_old))
    # Hybrid solve: one ingest batch touches a subgraph orders of
    # magnitude smaller than the corpus (the whole point of the affected-
    # component isolation above). Under the bound, a driver union-find
    # beats 3-5 distributed rounds x 2 shuffled joins each by ~10x wall-
    # clock — the collect is BOUNDED (checked first; <= ~16 bytes/edge)
    # and falls back to distributed pointer-jumping above it, so the
    # operator never becomes a driver funnel at scale. Identical results
    # either way (equivalence pinned by tests on both paths).
    if (
        small_graph_edges > 0
        and _driver_graph_paths_enabled()
        and e_all.count() <= small_graph_edges
    ):
        relabelled_rows = _unionfind_components(
            [(r[0], r[1]) for r in e_all.collect()]
        )
        spark = assignments.sparkSession
        relabelled = spark.createDataFrame(
            relabelled_rows, "vertex long, component long"
        )
        _release(e_all, e_ids | new_ids)
        # untouched = rows whose VERTEX the solve didn't relabel. Every
        # affected row's vertex appears in e_all as a src (e_old emits one
        # edge per affected member), so the relabelled vertex set is
        # exactly the affected vertex set — anti-joining on it references
        # only the driver-local relabelled frame, letting BOTH checkpoints
        # release here instead of leaving blocks behind for the life of
        # the streaming loop.
        if delta_only:
            return relabelled
        untouched = asg.join(
            F.broadcast(relabelled.select(F.col("vertex").alias("v"))),
            "v",
            "left_anti",
        )
    else:
        relabelled = connected_components(None, e_all, max_rounds=max_rounds)
        _release(e_all, e_ids)
        if delta_only:
            return relabelled
        # distributed path: keep the no-shuffle broadcast(touched) anti-
        # join; it references the e_new checkpoint through `touched`, so
        # those (small) blocks stay alive until the caller's next sweep.
        untouched = asg.join(F.broadcast(touched), "c", "left_anti")
    return (
        untouched.select(F.col("v").alias("vertex"), F.col("c").alias("component"))
        .unionByName(relabelled)
    )


def _unionfind_components(edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Driver-side union-find with min-id roots — the small-subgraph fast
    path of :func:`incremental_components`. Union always attaches the
    larger root under the smaller, so each final root IS the min vertex
    id of its component (the same component-id convention as
    :func:`connected_components`)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for s, d in edges:
        parent.setdefault(s, s)
        parent.setdefault(d, d)
        ra, rb = find(s), find(d)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return [(v, find(v)) for v in parent]
