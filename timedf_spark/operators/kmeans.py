"""Distributed Lloyd k-means over embedding columns — exact, oracle-checkable.

MLlib's KMeans (and the driver-side helper in operators/similarity.py
that seeds the IVF tiers) is float-driven and seed-dependent — fine for
index construction, impossible to verify against an independent engine.
This operator makes the full Lloyd iteration *exact*:

- vectors are quantized once to integer grids (floor(x·10^s + 0.5) —
  IEEE-exact in every engine, the functions/deterministic.py argument);
- distances are integer sums of squares; the argmin is encoded as
  ``min(dist * k + cid)`` so ties break toward the lower cid with no
  struct comparisons (portable to any engine);
- centroid updates are exact integer floor-division means,
  ``(s - (((s % n) + n) % n)) DIV n`` — both Spark's DIV and DuckDB's
  integer // truncate toward zero, so the explicit mod-subtract makes
  the numerator exactly divisible and truncation equals floor on both;
- init is deterministic: the k vectors with the smallest 60-bit
  md5(vec_id) prefix (a reproducible pseudo-random draw, no RNG state).

Every number in the loop is an exact integer, so T rounds of Spark and T
rounds of any other engine produce bit-identical assignments —
:func:`lloyd_sql` generates the unrolled-CTE DuckDB twin and the driver
gate hash-compares the full assignment table. Run-to-run and
partitioning invariance follow for free (integer min/sum are
order-independent).

Plan shape (the 100 TB lens): per round, the k-row centroid table
collapses to ONE array-of-structs row, broadcasts onto the vector scan,
and the argmin evaluates row-locally (array_min over a transform) — no
k-way row expansion, no groupBy(vec_id) exchange, no join-back for the
member vectors (r11; both corpus-sized exchanges of the r10 shape are
gone). The only shuffle per round is the posexplode → (k × dim)-key
integer sum for the update (map-side combine collapses per-partition;
the shuffle is tasks · k · dim rows). The only loop-carried state
is the k-row centroid frame — localCheckpoint'ed and metadata-stripped
per round (operators/cluster.py infrastructure), so the logical plan
stays flat for any T. Vectors are re-scanned per round; a production
run should persist the quantized vectors once (``persist_vectors``).

Scale bounds (LOUD): per-dim sums must stay < 2^63: n_members ·
max|x| · 10^scale < 9e18 — holds to ~10^11 unit-norm vectors at
scale=4. The argmin key needs dist · k < 2^63: dist ≤ dim · (2 ·
max|x| · 10^scale)² — at scale=4, dim=64, |x|≤2 that is ~4e11·k, safe
for any practical k. Raising ``scale`` past 5 starts eating this
headroom; the constructor asserts the key bound with the caller's
parameters instead of wrapping silently.

Reference parity: the reference's ML surface is XGBoost training
(SURVEY.md §2 K4/K5); clustering is an extension row. The exactness
discipline is this repo's own (cf. operators/rollup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timedf_spark.operators.cluster import _checkpoint, _release

__all__ = [
    "lloyd_assignments",
    "lloyd_centroids",
    "assign_to_centroids",
    "assignment_stats",
    "centroids_from_stats",
    "lloyd_sql",
]

_SCALE = 4

_HASH_SPARK = "cast(conv(substring(md5(cast(vec_id as string)), 1, 15), 16, 10) as bigint)"
_HASH_DUCK = "(('0x' || substr(md5(cast(vec_id as varchar)), 1, 15))::BIGINT)"


def _quantize_spark(vec_col: str, scale: int) -> str:
    return (
        f"transform({vec_col}, x -> cast(floor(cast(x as double)"
        f" * {10.0 ** scale:.1f} + 0.5) as bigint))"
    )


def _assert_key_bound(
    k: int, scale: int, dim_bound: int, max_abs_bound: float
) -> None:
    worst_dist = dim_bound * (2 * max_abs_bound * 10**scale) ** 2
    assert worst_dist * k < 2**63, (
        f"argmin key dist*{k}+cid can exceed int64 at scale={scale}, "
        f"dim<={dim_bound}, |x|<={max_abs_bound}; lower scale or k"
    )


def _quantized(
    vectors: DataFrame, vec_col: str, id_col: str, scale: int
) -> DataFrame:
    return vectors.select(
        F.col(id_col).alias("vec_id"),
        F.expr(_quantize_spark(vec_col, scale)).alias("q"),
    )


def _argmin_keys(qv: DataFrame, centroids: DataFrame, k: int) -> DataFrame:
    """(vec_id, q, mk) where mk = min over centroids of (dist * k + cid),
    computed ROW-LOCALLY (r11): the k-row centroid table collapses to a
    single array-of-structs row and broadcasts; the argmin is an
    array_min over a transform. vs the r10 shape (broadcast k rows onto
    the scan → k-way row expansion → groupBy(vec_id) argmin → join back
    to recover q) this removes BOTH corpus-sized exchanges from every
    Lloyd round — assignment is now scan-local. The integer arithmetic
    (quantized distance, min(dist*k+cid) tie-break) is unchanged, so
    assignments stay bit-identical to the unrolled-CTE oracle."""
    cent_arr = centroids.agg(F.collect_list(F.struct("cid", "c")).alias("cents"))
    return qv.join(F.broadcast(cent_arr)).select(
        "vec_id",
        "q",
        F.expr(
            f"array_min(transform(cents, s -> "
            f"aggregate(zip_with(q, s.c, (x, y) -> (x - y) * (x - y)),"
            f" 0L, (acc, v) -> acc + v) * {k} + s.cid))"
        ).alias("mk"),
    )


def assign_to_centroids(
    vectors: DataFrame,
    centroids: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = _SCALE,
) -> DataFrame:
    """(vec_id, cid, qdist) of ``vectors`` against a FROZEN (cid, c)
    centroid table — the streaming/probe half of Lloyd (a micro-batch
    classifies against the last published fit; no corpus rescan)."""
    qv = _quantized(vectors, vec_col, id_col, scale)
    return _argmin_keys(qv, centroids, k).select(
        "vec_id",
        F.expr(f"mk % {k}").alias("cid"),
        F.expr(f"mk DIV {k}").alias("qdist"),
    )


def _stats_from_quantized(qv: DataFrame, centroids: DataFrame, k: int) -> DataFrame:
    """(cid, i, s, n): per-cluster per-dimension member sums and counts
    of ``qv`` assigned against ``centroids`` — the sufficient statistics
    of one Lloyd update. Mergeable by (cid, i)-wise addition of s and n,
    which is what the streaming stats store exploits."""
    # _argmin_keys carries q through (r11), so the member vectors need no
    # join-back — the stats aggregate reads them straight off the scan.
    members = _argmin_keys(qv, centroids, k).select(
        F.expr(f"mk % {k}").alias("cid"), "q"
    )
    return (
        members.select("cid", F.posexplode("q").alias("i", "val"))
        .groupBy("cid", "i")
        .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
    )


def assignment_stats(
    vectors: DataFrame,
    centroids: DataFrame,
    k: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = _SCALE,
) -> DataFrame:
    """Public wrapper of :func:`_stats_from_quantized` over raw vectors."""
    return _stats_from_quantized(
        _quantized(vectors, vec_col, id_col, scale), centroids, k
    )


def centroids_from_stats(stats: DataFrame) -> DataFrame:
    """(cid, c) derived from (cid, i, s, n) by the exact floor-division
    mean — identical arithmetic to a Lloyd update round, so seeding a
    store with :func:`assignment_stats` against round-T centroids and
    deriving yields EXACTLY round T+1's centroids (test-pinned)."""
    return (
        stats.withColumn("v", F.expr("(s - (((s % n) + n) % n)) DIV n"))
        .groupBy("cid")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, v))), x -> x.v)"
            ).alias("c")
        )
    )


def _fit(qv: DataFrame, k: int, iterations: int) -> tuple[DataFrame, set[int]]:
    """Run the Lloyd loop; returns the final (cid, c) frame plus its
    pinned localCheckpoint block ids (k rows — negligible)."""
    # deterministic init: k smallest hashes -> cid 0..k-1 (TakeOrdered,
    # then a k-row window — no corpus-wide sort)
    seeds = (
        qv.select("vec_id", "q", F.expr(_HASH_SPARK).alias("h"))
        .orderBy("h", "vec_id")
        .limit(k)
    )
    cent = seeds.select(
        (F.row_number().over(Window.orderBy("h", "vec_id")) - 1).alias("cid"),
        F.col("q").alias("c"),
    )
    cent_ids: set[int] = set()
    for _ in range(iterations):
        new_cent = centroids_from_stats(_stats_from_quantized(qv, cent, k))
        new_cent, new_ids = _checkpoint(new_cent)  # k rows: flat plans for any T
        _release(new_cent, cent_ids)
        cent, cent_ids = new_cent, new_ids
    return cent, cent_ids


def lloyd_centroids(
    vectors: DataFrame,
    k: int,
    iterations: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = _SCALE,
    dim_bound: int = 4096,
    max_abs_bound: float = 16.0,
) -> DataFrame:
    """The final (cid, c) integer centroid table — the publishable model
    artifact (feed to :func:`assign_to_centroids` / the streaming store).
    The k-row result stays localCheckpoint-pinned until session hygiene
    reclaims it (k x dim bigints)."""
    assert k >= 1 and iterations >= 0
    _assert_key_bound(k, scale, dim_bound, max_abs_bound)
    qv = _quantized(vectors, vec_col, id_col, scale)
    cent, _ = _fit(qv, k, iterations)
    return cent


def lloyd_assignments(
    vectors: DataFrame,
    k: int,
    iterations: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = _SCALE,
    persist_vectors: bool = False,
    dim_bound: int = 4096,
    max_abs_bound: float = 16.0,
) -> DataFrame:
    """(vec_id, cid, qdist) after ``iterations`` full Lloyd rounds.

    ``qdist`` is the exact integer squared distance (at 10^scale grid) to
    the final centroid — included so the oracle checks geometry, not just
    labels. ``persist_vectors`` localCheckpoints the quantized vectors
    once for reuse across rounds (the 100 TB default; off in oracle-gated
    queries to keep persistence out of the timed path).

    ``dim_bound``/``max_abs_bound`` declare the caller's worst case for
    the argmin-key overflow check (dist * k must fit in int64); raise
    them to match the data rather than risking silent wraparound.
    """
    assert k >= 1 and iterations >= 0
    _assert_key_bound(k, scale, dim_bound, max_abs_bound)
    qv = _quantized(vectors, vec_col, id_col, scale)
    held: set[int] = set()
    if persist_vectors:
        qv, held = _checkpoint(qv)

    cent, cent_ids = _fit(qv, k, iterations)

    out = _argmin_keys(qv, cent, k).select(
        "vec_id",
        F.expr(f"mk % {k}").alias("cid"),
        F.expr(f"mk DIV {k}").alias("qdist"),
    )
    if persist_vectors:
        # out is materialized here, so the last centroid round and the
        # vector checkpoint can be dropped before returning
        out, _ = _checkpoint(out)
        _release(qv, held)
        _release(out, cent_ids)
    # else: the final k-row centroid checkpoint stays pinned until the
    # caller's session hygiene reclaims it (k x dim bigints — negligible);
    # releasing it here would tear the blocks out from under the lazy
    # result the caller has not yet materialized
    return out


def lloyd_sql(
    table: str,
    k: int,
    iterations: int,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = _SCALE,
) -> str:
    """Unrolled-CTE DuckDB twin of :func:`lloyd_assignments` — identical
    integer arithmetic, one a/u/c CTE triple per round."""
    dist = (
        f"cast(list_sum([(q[i] - c[i]) * (q[i] - c[i])"
        f" for i in range(1, {dim + 1})]) as bigint)"
    )
    parts = [
        f"""qv AS (
  SELECT {id_col} AS vec_id,
         [cast(floor(cast(x as double) * {10.0 ** scale:.1f} + 0.5) as bigint)
          for x in {vec_col}] AS q
  FROM {table}
)""",
        f"""c0 AS (
  SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS cid, q AS c FROM (
    SELECT vec_id, q, {_HASH_DUCK} AS h FROM qv ORDER BY h, vec_id LIMIT {k}
  )
)""",
    ]
    for t in range(iterations):
        parts.append(
            f"""a{t} AS (
  SELECT vec_id, min({dist} * {k} + cid) AS mk
  FROM qv CROSS JOIN c{t} GROUP BY vec_id
)"""
        )
        parts.append(
            f"""u{t} AS (
  SELECT a.mk % {k} AS cid, idx.i,
         cast(sum(qv.q[idx.i]) as bigint) AS s,
         count(*) AS n
  FROM a{t} a JOIN qv USING (vec_id)
  CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS i) idx
  GROUP BY cid, idx.i
)"""
        )
        parts.append(
            f"""c{t + 1} AS (
  SELECT cid, list(v ORDER BY i) AS c FROM (
    SELECT cid, i, (s - (((s % n) + n) % n)) // n AS v FROM u{t}
  ) GROUP BY cid
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"""
SELECT vec_id,
       cast(mk % {k} AS BIGINT) AS cid,
       cast(mk // {k} AS BIGINT) AS qdist
FROM (
  SELECT vec_id, min({dist} * {k} + cid) AS mk
  FROM qv CROSS JOIN c{iterations} GROUP BY vec_id
)"""
    )
