"""Similarity search over ``array<float>`` embedding columns.

Two tiers:
- brute_force_topk: exact cosine top-k — one broadcast of the query set,
  one scan of the vector table, per-query top-k via window rank. At 100 TB
  the scan is embarrassingly parallel (no shuffle until the tiny top-k
  reduction); this is the correct baseline and the oracle for tier 2.
- lsh_topk: random-hyperplane LSH (Charikar SRP): vectors bucketed by a
  b-bit signature; search probes only the query's bucket (+ optional
  multi-probe neighbors). Turns the O(N·Q) scan into hash-bucket joins —
  the scale path when Q is large.

Scoring stays JVM-side: cosine via zip_with/aggregate higher-order
functions (functions/vectors.py) — no Python per row. Rank output (not raw
cosine) is the comparable surface: rank is stable under last-ulp float
divergence between engines, with vec_id as the deterministic tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timedf_spark.functions.vectors import cosine_similarity
from timedf_spark.sources import fan_out, load_table

__all__ = [
    "brute_force_topk",
    "brute_force_topk_sql",
    "lsh_topk",
    "hyperplanes",
    "cosine_dedup_pairs",
    "cosine_dedup_pairs_df",
    "srp_signature_rows",
    "cosine_dedup_sql",
    "cosine_dedup_capped_sql",
    "ivf_topk",
    "ivfpq_topk",
]

_N_QUERIES = 10
_TOP_K = 10


def brute_force_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = _N_QUERIES,
    k: int = _TOP_K,
    corpus_filter: str | None = None,
) -> DataFrame:
    """Exact top-k neighbours for the first n_queries vectors (by vec_id).
    ``corpus_filter`` restricts the searched corpus (exact twin for the
    filtered IVF tier); queries stay unfiltered."""
    # min_bytes floor (r10): the vector tier is join/window-dominated —
    # downstream exchanges re-partition anyway, so a fan-out of a sub-MB
    # embeddings scan is pure overhead (the docstring's own "measured,
    # reverted" case); the guard re-engages once the corpus is large
    # enough that a serial scan would gate the Arrow matmul.
    emb = fan_out(load_table(spark, sf_dir, "embeddings"), min_bytes=24 << 20)
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.filter(F.expr(corpus_filter)) if corpus_filter else emb
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        "q_id",
        "vec_id",
        cosine_similarity("q_emb", "embedding").alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"))
    )


def brute_force_topk_sql(n_queries: int = _N_QUERIES, k: int = _TOP_K) -> str:
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < {n_queries}
),
scored AS (
  SELECT q.q_id, e.vec_id,
         list_cosine_similarity(q.q_emb, e.embedding) AS cos
  FROM q, embeddings e
)
SELECT q_id, vec_id, cast(rank as bigint) AS rank FROM (
  SELECT q_id, vec_id,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (numpy PCG64) for SRP-LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def _bucket_col(planes: list[list[float]]) -> F.Column:
    """Fold sign bits of dot(v, plane) into one integer bucket id — pure
    HOF expressions, one pass over the array column, no shuffle."""
    planes_lit = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in planes])
    sign_bits = F.transform(
        planes_lit,
        lambda plane: F.when(
            F.aggregate(
                F.zip_with(F.col("embedding"), plane, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            > 0,
            F.lit(1).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(sign_bits, F.lit(0).cast("long"), lambda acc, x: acc * 2 + x)


def _buckets_pandas_udf(tables: list[list[list[float]]]):
    """All n_tables SRP bucket ids in ONE Arrow-vectorized pass: a single
    (batch × dim) @ (dim × tables·bits) matmul + bit packing. This is the
    scale path for the approximate tiers — numpy's SIMD matmul replaces
    per-element interpreted lambda evaluation (HOFs are not whole-stage
    codegen'd), ~100× on wide plane sets. Kept off the oracle-exact dedup
    path, where sign parity with sequential accumulation is load-bearing.
    """
    planes = np.asarray(tables, dtype=np.float64)  # T × bits × dim
    n_tables, bits, dim = planes.shape
    flat = planes.reshape(n_tables * bits, dim)
    weights = (1 << np.arange(bits - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf("array<long>")
    def buckets(emb: pd.Series) -> pd.Series:
        mat = np.array(emb.tolist(), dtype=np.float64)
        signs = (mat @ flat.T > 0).reshape(len(mat), n_tables, bits)
        return pd.Series((signs.astype(np.int64) @ weights).tolist())

    return buckets


def _pair_cosine_udf():
    """Row-wise cosine of two array columns, Arrow-vectorized.

    Zero-norm vectors yield NULL (not NaN): Spark sorts NaN *above* every
    double, so a NaN cosine would steal rank 1 under orderBy(desc) — NULLs
    sort last, matching the HOF cosine_similarity the exact baseline uses.
    """

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.array(a.tolist(), dtype=np.float64)
        mb = np.array(b.tolist(), dtype=np.float64)
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            out = np.where(den > 0, num / den, 0.0)
        # nullable Float64 so masked entries cross Arrow as NULL, not NaN
        res = pd.array(out, dtype="Float64")
        res[den <= 0] = pd.NA
        return pd.Series(res)

    return cos


def lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = _N_QUERIES,
    k: int = _TOP_K,
    bits: int = 8,
    n_tables: int = 4,
    multiprobe: bool | int = 2,
) -> DataFrame:
    """Approximate top-k: multi-table sign-random-projection LSH with
    hamming-radius multi-probe, then exact cosine within candidate
    buckets only.

    Standard SRP-LSH (Charikar '02) scaling structure:
    - ``n_tables`` independent 8-bit signatures per vector — a single scan
      computing all tables (one array column each, no shuffle);
    - candidates = equi-join on (table, bucket) — hash-partitioned, linear;
    - multi-probe expands only the QUERY side to the bit-flip neighbour
      buckets within hamming radius ``multiprobe`` (True ≡ 1) — recall of
      a much bigger table count at the cost of a slightly wider broadcast,
      the classic trade (Lv et al., VLDB '07). Radius 2 is the default
      operating point: measured recall@10 0.42 → 0.85 at 1.9× latency
      (sf0.1; the probe fan-out lives entirely on the broadcast QUERY
      side — the corpus-side scan and join volume are unchanged) —
      frontier table in the evidence block (``ann_lsh_topk``);
    - exact cosine re-rank of candidates (tiny vs corpus).

    Validated against brute force by recall in tests — approximate results
    have no equality oracle by design.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    tables = [hyperplanes(dim, bits, seed=42 + t) for t in range(n_tables)]
    buckets_udf = _buckets_pandas_udf(tables)
    with_sig = emb.select(
        "vec_id", "embedding", buckets_udf("embedding").alias("bks")
    ).select(
        "vec_id",
        "embedding",
        *[F.col("bks")[t].alias(f"bucket{t}") for t in range(n_tables)],
    )
    # corpus side: one row per (table, bucket)
    corpus = with_sig.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"bucket{t}").alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", "embedding", "tb.tbl", "tb.bucket")
    # query side: exact bucket + hamming-radius bit-flip probes per table
    radius = int(multiprobe) if multiprobe is not True else 1
    masks = [0]
    if radius >= 1:
        masks += [1 << j for j in range(bits)]
    if radius >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(bits) for j in range(i + 1, bits)
        ]
    probe_buckets = []
    for t in range(n_tables):
        for m in masks:
            probe_buckets.append(
                F.struct(
                    F.lit(t).alias("tbl"),
                    F.expr(f"bucket{t} ^ {m}").cast("long").alias("bucket"),
                )
            )
    queries = (
        with_sig.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.explode(F.array(*probe_buckets)).alias("tb"),
        )
        .select("q_id", "q_emb", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    )
    pair_cos = _pair_cosine_udf()
    # score BEFORE deduplicating: a pair found in 2 tables costs one extra
    # vectorized cosine, but the dedup exchange then moves 3 scalars per
    # row instead of two dim-wide arrays (~40x fewer shuffle bytes)
    candidates = (
        corpus.join(F.broadcast(queries), ["tbl", "bucket"])
        .select("q_id", "vec_id", pair_cos("q_emb", "embedding").alias("cos"))
        .dropDuplicates(["q_id", "vec_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


# ---- embedding-cosine near-duplicate pairs (dedup tier 5) ------------------

_DEDUP_BITS = 8
_DEDUP_TABLES = 4
_DEDUP_SEED = 142  # decoupled from lsh_topk's 42+t
_COS_THRESHOLD = 0.4


def _dedup_planes(dim: int, bits: int = _DEDUP_BITS, n_tables: int = _DEDUP_TABLES):
    return [hyperplanes(dim, bits, seed=_DEDUP_SEED + t) for t in range(n_tables)]


def cosine_dedup_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = _COS_THRESHOLD,
    bits: int = _DEDUP_BITS,
    n_tables: int = _DEDUP_TABLES,
    max_degree: int | None = None,
) -> DataFrame:
    """Table entry point — see :func:`cosine_dedup_pairs_df`."""
    # min_bytes floor (r10): measured at sf0.1 — dedup_embedding_cosine
    # 0.78 s floored vs 1.66 s fanned (isolated 3-run medians, r08-code
    # A/B); the SRP bucketing is one Arrow matmul whose cost is dwarfed
    # by the fan-out exchange until the corpus is orders larger.
    return cosine_dedup_pairs_df(
        fan_out(load_table(spark, sf_dir, "embeddings"), min_bytes=24 << 20),
        threshold=threshold,
        bits=bits,
        n_tables=n_tables,
        max_degree=max_degree,
    )


def srp_signature_rows(
    emb: DataFrame,
    bits: int = _DEDUP_BITS,
    n_tables: int = _DEDUP_TABLES,
    extra: list[str] | None = None,
) -> DataFrame:
    """(vec_id, embedding[, *extra], bucket0..bucketT−1): the
    deterministic SRP signature of each vector under the shared dedup
    hyperplane tables — one Arrow-matmul pass. This row IS the streaming
    signature store's unit (streaming/semantic_ingest.py): bucketed once
    at ingest, equality-joined forever after.

    Arrow-vectorized bucketing (matmul) — numerically this differs from
    the oracle's sequential accumulation only in the last ulp (~1e-16
    relative); a sign flip needs |dot| < ~1e-13 while dots here are O(1),
    so bucket parity holds with overwhelming margin (verified exact on
    the gate data). _bucket_col stays available as the bit-exact path."""
    from pyspark.sql.types import LongType, StructField, StructType

    extra = extra or []
    md = {"srp_bits": int(bits), "srp_tables": int(n_tables)}
    # dim probe skips NULL embeddings (ADVICE r10): a non-empty frame whose
    # FIRST row happens to carry a null embedding must not be treated as
    # empty — that silently dropped every row. Probe for any non-null
    # embedding; only a frame with zero such rows takes the empty path.
    first = (
        emb.select("embedding").where(F.col("embedding").isNotNull()).first()
    )
    if first is None:
        if emb.select("vec_id").first() is not None:
            raise ValueError(
                "srp_signature_rows: frame has rows but every embedding is "
                "NULL — cannot infer dim or sign anything; filter or fix "
                "the embedding column upstream"
            )
        # empty frame (an empty foreachBatch invocation under streaming
        # replay/recovery — ADVICE r09): there is no row to infer dim
        # from, and no row to sign; return an EMPTY frame with the exact
        # signature schema instead of crashing on first()[0]
        fields = [emb.schema[c] for c in ("vec_id", "embedding", *extra)]
        fields += [
            StructField(f"bucket{t}", LongType(), True, metadata=md)
            for t in range(n_tables)
        ]
        return emb.sparkSession.createDataFrame([], StructType(fields))
    dim = len(first[0])
    tables = _dedup_planes(dim, bits, n_tables)
    buckets_udf = _buckets_pandas_udf(tables)
    # bucket columns carry (bits, n_tables) as column metadata — the
    # pre-signed fast path in cosine_dedup_pairs_df verifies them against
    # the call's parameters (survives parquet round-trips: the store's
    # rows stay self-describing)
    return emb.select(
        "vec_id", "embedding", *extra, buckets_udf("embedding").alias("bks")
    ).select(
        "vec_id",
        "embedding",
        *extra,
        *[
            F.col("bks")[t].alias(f"bucket{t}", metadata=md)
            for t in range(n_tables)
        ],
    )


def cosine_dedup_pairs_df(
    emb: DataFrame,
    threshold: float = _COS_THRESHOLD,
    bits: int = _DEDUP_BITS,
    n_tables: int = _DEDUP_TABLES,
    max_degree: int | None = None,
    require_flag: str | None = None,
    small_batch: bool | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: SRP-LSH blocking, then exact
    cosine over candidates only.

    ``small_batch`` (require_flag callers only): enables the r10 probe
    optimizations — pre-explode literal bucket prune, cell semi-join
    prune, and late embedding fetch via broadcast — all of which assume
    the flagged side is micro-batch-sized (their broadcasts are bounded
    by it). Callers that push a CORPUS-SIZED frame through the flag path
    (the ingest seed, a backfill) must pass False: the plan then stays
    the fat single-pass one, whose exchanges are the right shape when
    most rows are flagged. Default None = True (the streaming contract).

    ``emb``: (vec_id, embedding[, <require_flag> boolean]) frame. With
    ``require_flag`` set, only pairs where at least ONE side has the flag
    true are emitted (the flag predicate joins the bucket equi-join, so
    flag-false×flag-false candidates are pruned before the cosine UDF) —
    the shape the streaming ingest probe uses: corpus rows flagged false,
    batch rows true → emitted pairs are exactly the batch-touching subset
    of the full pair set, each pair emitted once across the stream.

    Same linear-scale structure as MinHash banding (dedup.py): one scan
    computes ``n_tables`` deterministic sign-random-projection buckets per
    vector; candidate pairs come from an equi-join on (table, bucket) —
    no pairwise work outside hash buckets, so the candidate volume scales
    with the duplicate density, not N². Exact double-precision cosine then
    filters candidates to true near-dups.

    The blocking is deterministic (fixed hyperplanes, sign of a
    double-precision dot product), so the DuckDB oracle replicates the
    exact candidate set: verified bit-identical bucket assignment across
    engines. Cosine is quantized to 1e-4 in the output; at the default
    threshold the nearest candidate sits ~3e-3 from the boundary so
    last-ulp float divergence cannot flip membership.

    ``max_degree``: optional per-vector degree bound — the adversarial-
    density guard. Without it, one SRP bucket holding B mutually-similar
    vectors emits B²/2 pairs (near-dup-heavy real corpora can pile tens
    of thousands of boilerplate docs into one bucket → quadratic inside
    the bucket). With it, members of each (table, bucket) are ranked by
    vec_id and each vector links only to its next ``max_degree``
    neighbors in that order — candidate volume is bounded by
    N × n_tables × max_degree (linear), while CONNECTIVITY of a dense
    same-bucket duplicate group is preserved (consecutive links chain it
    — what the downstream component-clustering keepers actually need).
    Pairs >max_degree apart in every table that could block them are
    missed unless transitively connected; the measured recall sits in
    the evidence block (``semantic_dedup_capped``). Deterministic
    (rank by vec_id) → still oracle-exact; emit-once dedup switches from
    the first-table guard to a dropDuplicates over the (bounded)
    candidate set, because window membership is table-local and the
    guard's bucket-equality shortcut no longer implies emission there.
    """
    extra = [require_flag] if require_flag else []
    bucket_cols_probe = [f"bucket{t}" for t in range(n_tables)]
    if require_flag and small_batch is None:
        # Derived default (ADVICE r10): the probe optimizations broadcast
        # the pair-id set and flagged-side cells, bounded only by the
        # flagged-row count — a caller pushing a corpus-sized flagged
        # frame (seed/backfill) through the flag path must get the fat
        # single-pass plan, not an unbounded broadcast. One bounded count
        # (limit cap+1) decides; explicit True/False skips the probe.
        small_batch = (
            emb.filter(F.col(require_flag)).limit(100_001).count() <= 100_000
        )
    probe_opt = bool(require_flag) and bool(small_batch)
    if all(c in emb.columns for c in bucket_cols_probe):
        # pre-signed rows (the streaming signature store): skip the
        # projection — the corpus is bucketed once at ingest, never again.
        # Guard (ADVICE r09): rows signed under DIFFERENT parameters must
        # not be silently accepted — wrong blocking, no error. Two checks:
        # (a) the frame must not carry bucket columns BEYOND n_tables
        #     (rows signed with more tables than this call expects);
        # (b) srp_signature_rows stamps (bits, n_tables) as column
        #     metadata (parquet-durable) — when present it must match.
        surplus = [
            c
            for c in emb.columns
            if c.startswith("bucket")
            and c[len("bucket"):].isdigit()
            and int(c[len("bucket"):]) >= n_tables
        ]
        if surplus:
            raise ValueError(
                f"pre-signed frame carries {len(surplus) + n_tables} bucket "
                f"columns but the call expects n_tables={n_tables}: rows "
                "were signed under different parameters — re-sign or pass "
                "the store's n_tables"
            )
        md = emb.schema["bucket0"].metadata or {}
        for key, want in (("srp_bits", bits), ("srp_tables", n_tables)):
            have = md.get(key)
            if have is not None and int(have) != int(want):
                raise ValueError(
                    f"pre-signed frame was built with {key}={have} but the "
                    f"call passes {want} — re-sign the rows or match the "
                    "store's parameters"
                )
        with_sig = emb.select("vec_id", "embedding", *extra, *bucket_cols_probe)
    else:
        with_sig = srp_signature_rows(emb, bits, n_tables, extra=extra)
    bucket_cols = [f"bucket{t}" for t in range(n_tables)]
    batch_cells_local: list[tuple[int, int]] | None = None
    if probe_opt:
        # Pre-explode row prune (r10, the 1000x store-growth fix): the
        # cell semi-join below prunes AFTER the explode, by which point
        # every store signature has already been widened n_tables-fold
        # WITH its dim-double embedding — at a 2M-vector store that is
        # ~16M fat rows materialized per batch (measured: 38 s/batch,
        # store-size exponent 0.53). Collect the (tiny, trigger-bounded)
        # batch bucket set driver-side and filter store ROWS with literal
        # isin predicates per table BEFORE exploding: evaluated at the
        # scan (parquet row-group stats can skip), no shuffle, and only
        # rows sharing ≥1 bucket with the batch get exploded. Row-level
        # is safe: a dropped row shares no cell with any batch row, so
        # its pairs are all corpus×corpus — flag-discarded anyway; and
        # every member of a batch-containing cell survives (it matches
        # that cell's bucket literal), so capped-tier ranks in cells that
        # can emit are untouched. The literal lists are capped (a giant
        # "batch" falls back to the semi-join-only plan below rather
        # than compiling a megabyte predicate).
        # limit(cap+1) bounds the driver collect (ADVICE r10): a giant
        # flagged set returns exactly cap+1 rows — enough to detect the
        # overflow — instead of pulling the whole cell set only to
        # discard it.
        batch_cells_rows = (
            with_sig.filter(F.col(require_flag))
            .select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(t).alias("tbl"),
                                F.col(f"bucket{t}").alias("bucket"),
                            )
                            for t in range(n_tables)
                        ]
                    )
                ).alias("tb")
            )
            .select("tb.tbl", "tb.bucket")
            .distinct()
            .limit(65_537)
            .collect()
        )
        if len(batch_cells_rows) <= 65_536:
            batch_cells_local = [
                (int(r["tbl"]), int(r["bucket"])) for r in batch_cells_rows
            ]
            by_table: dict[int, list[int]] = {}
            for t, bkt in batch_cells_local:
                by_table.setdefault(t, []).append(bkt)
            pred = F.col(require_flag)
            for t, vals in by_table.items():
                pred = pred | F.col(f"bucket{t}").isin(vals)
            with_sig = with_sig.filter(pred)
    # Late-fetch decision (see the comment ahead of _attach_cosine): under
    # require_flag the embedding column never enters the explode or any
    # pair-formation exchange — it is re-attached to the (trigger-bounded)
    # final pair set from the store's (vec_id, embedding) projection.
    late_fetch = probe_opt
    emb_carry = [] if late_fetch else ["embedding"]
    blocked = with_sig.select(
        "vec_id",
        *emb_carry,
        *extra,
        *bucket_cols,  # full signature travels (n_tables longs — cheap)
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(t).alias("tbl"), F.col(f"bucket{t}").alias("bucket"))
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).select("vec_id", *emb_carry, *extra, *bucket_cols, "tb.tbl", "tb.bucket")
    if probe_opt:
        # Streaming-probe prune (r10): a (tbl, bucket) cell holding NO
        # flagged (batch) row can only produce corpus×corpus pairs, which
        # the flag predicate discards anyway — drop those cells with a
        # broadcast semi-join BEFORE the pair join shuffles the corpus
        # signatures. Pruning is at whole-bucket granularity, so the
        # capped path's within-bucket ranks are untouched (surviving
        # buckets keep every member) — pair output is bit-identical on
        # both tiers; the per-batch store cost drops from shuffling every
        # store signature to a scan + broadcast-hash semi-join. The
        # batch-bucket set is bounded by batch_rows × n_tables. When the
        # pre-explode prune already collected the exact cell set, reuse
        # it via createDataFrame (ADVICE r10) instead of recomputing the
        # same explode+distinct a second time distributed.
        if batch_cells_local is not None:
            batch_cells = emb.sparkSession.createDataFrame(
                batch_cells_local, "tbl int, bucket bigint"
            )
        else:
            batch_cells = (
                blocked.filter(F.col(require_flag))
                .select("tbl", "bucket")
                .distinct()
            )
        blocked = blocked.join(F.broadcast(batch_cells), ["tbl", "bucket"], "semi")
    flag_pred = (
        (F.col(f"a.{require_flag}") | F.col(f"b.{require_flag}"))
        if require_flag
        else F.lit(True)
    )
    # Late embedding fetch (r10, require_flag path only): the pair
    # formation below shuffles `blocked` (window and/or self-join). With
    # the dim-double embedding aboard, a large standing store pays
    # ~dim×8 bytes per surviving row PER EXCHANGE — measured 38-45 s per
    # 500-vector batch against a 2M-vector store. Under require_flag the
    # emitted pair set is trigger-bounded, so: form pairs THIN (ids +
    # block columns only), then attach embeddings at the end by joining
    # the store's (vec_id, embedding) projection against a BROADCAST of
    # the pair ids — two store scans, zero store shuffles. The batch
    # operators (no flag) keep the fat single-pass plan: their pair
    # volume is corpus-wide, where a broadcast of pair ids has no bound.
    def _attach_cosine(pairs_ids: DataFrame) -> DataFrame:
        emb_map = with_sig.select("vec_id", "embedding")
        pa = emb_map.join(
            F.broadcast(pairs_ids), emb_map.vec_id == F.col("id_a")
        ).select("id_a", "id_b", F.col("embedding").alias("emb_a"))
        return emb_map.join(
            F.broadcast(pa), emb_map.vec_id == F.col("id_b")
        ).select(
            "id_a",
            "id_b",
            _pair_cosine_udf()(F.col("emb_a"), F.col("embedding")).alias("cos"),
        )

    def _quantize(pairs: DataFrame) -> DataFrame:
        return pairs.filter(F.col("cos") >= threshold).select(
            "id_a",
            "id_b",
            F.expr("cast(floor(cos * 1e4 + 0.5) as double) / 1e4").alias("cos_q"),
        )

    if max_degree is not None:
        # degree-bounded linking: rank within (tbl, bucket) by vec_id,
        # join each member to its next max_degree successors — per-bucket
        # pair volume drops from B²/2 to B·max_degree. One extra window
        # shuffle over the blocked rows (N × n_tables, scalar columns).
        w = Window.partitionBy("tbl", "bucket").orderBy("vec_id")
        blocked = blocked.select(
            "vec_id", *emb_carry, *extra, "tbl", "bucket",
            F.row_number().over(w).alias("rn"),
        )
        a, b = blocked.alias("a"), blocked.alias("b")
        link_cond = (
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("b.rn") > F.col("a.rn"))
            & (F.col("b.rn") <= F.col("a.rn") + max_degree)
            & flag_pred
        )
        if late_fetch:
            pairs_ids = (
                a.join(b, link_cond)
                .select(
                    F.col("a.vec_id").alias("id_a"),
                    F.col("b.vec_id").alias("id_b"),
                )
                .dropDuplicates(["id_a", "id_b"])
            )
            return _quantize(_attach_cosine(pairs_ids))
        pairs = (
            a.join(b, link_cond)
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
                _pair_cosine_udf()(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        return _quantize(pairs)
    a, b = blocked.alias("a"), blocked.alias("b")
    # first-colliding-table emission: a pair blocked in several tables is
    # emitted ONLY by the lowest such table (for every earlier table the
    # buckets must differ) — each candidate pair exists exactly once, so
    # there is no dropDuplicates exchange and each cosine is computed once.
    # Carrying the full signature costs n_tables longs per row; the saved
    # exchange would have carried two dim-wide arrays per duplicate pair.
    first_table_guard = F.lit(True)
    for t in range(n_tables):
        first_table_guard = first_table_guard & (
            (F.col("a.tbl") <= F.lit(t)) | (F.col(f"a.bucket{t}") != F.col(f"b.bucket{t}"))
        )
    join_cond = (
        (F.col("a.tbl") == F.col("b.tbl"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.vec_id") < F.col("b.vec_id"))
        & flag_pred
    )
    if late_fetch:
        pairs_ids = (
            a.join(b, join_cond)
            .filter(first_table_guard)
            .select(
                F.col("a.vec_id").alias("id_a"),
                F.col("b.vec_id").alias("id_b"),
            )
        )
        return _quantize(_attach_cosine(pairs_ids))
    pairs = (
        a.join(b, join_cond)
        .filter(first_table_guard)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            _pair_cosine_udf()(F.col("a.embedding"), F.col("b.embedding")).alias("cos"),
        )
    )
    return _quantize(pairs)


def _duckdb_bucket_sql(plane_rows: list[list[float]], bits: int) -> str:
    """Bucket id as a sum of sign bits — same double-precision dot products
    and MSB-first bit order as _bucket_col."""
    terms = []
    for j, plane in enumerate(plane_rows):
        lit = "[" + ",".join(repr(float(x)) for x in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}) > 0 "
            f"THEN {1 << (bits - 1 - j)} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def cosine_dedup_sql(
    dim: int = 64,
    threshold: float = _COS_THRESHOLD,
    bits: int = _DEDUP_BITS,
    n_tables: int = _DEDUP_TABLES,
) -> str:
    tables = _dedup_planes(dim, bits, n_tables)
    bucket_cols = ", ".join(
        f"{_duckdb_bucket_sql(tables[t], bits)} AS bucket{t}" for t in range(n_tables)
    )
    block_rows = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, bucket{t} AS bucket FROM sig"
        for t in range(n_tables)
    )
    cos = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return f"""
WITH sig AS (SELECT vec_id, embedding, {bucket_cols} FROM embeddings),
blocked AS ({block_rows}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos
  FROM blocked a JOIN blocked b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cast(floor(cos * 1e4 + 0.5) as double) / 1e4 AS cos_q
FROM cand WHERE cos >= {threshold}
"""


def cosine_dedup_capped_sql(
    max_degree: int,
    dim: int = 64,
    threshold: float = _COS_THRESHOLD,
    bits: int = _DEDUP_BITS,
    n_tables: int = _DEDUP_TABLES,
) -> str:
    """DuckDB oracle for cosine_dedup_pairs(max_degree=...) — identical
    deterministic SRP buckets, row_number-by-vec_id window linking."""
    tables = _dedup_planes(dim, bits, n_tables)
    bucket_cols = ", ".join(
        f"{_duckdb_bucket_sql(tables[t], bits)} AS bucket{t}" for t in range(n_tables)
    )
    block_rows = " UNION ALL ".join(
        f"SELECT vec_id, embedding, {t} AS tbl, bucket{t} AS bucket FROM sig"
        for t in range(n_tables)
    )
    cos = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    return f"""
WITH sig AS (SELECT vec_id, embedding, {bucket_cols} FROM embeddings),
blocked0 AS ({block_rows}),
blocked AS (
  SELECT vec_id, embedding, tbl, bucket,
         row_number() OVER (PARTITION BY tbl, bucket ORDER BY vec_id) AS rn
  FROM blocked0
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cos
  FROM blocked a JOIN blocked b
    ON a.tbl = b.tbl AND a.bucket = b.bucket
   AND b.rn > a.rn AND b.rn <= a.rn + {max_degree}
)
SELECT id_a, id_b, cast(floor(cos * 1e4 + 0.5) as double) / 1e4 AS cos_q
FROM cand WHERE cos >= {threshold}
"""


# ---- IVF (inverted-file) ANN ----------------------------------------------


def _normed_sample(emb: DataFrame, sample_rows: int = 4096, seed: int = 17) -> np.ndarray:
    """Bounded deterministic L2-normalized training sample: a `limit` over a
    hash-ordered scan — no full sort, one pass, corpus-size-independent."""
    sample = np.array(
        [
            r[0]
            for r in emb.select("embedding")
            .orderBy(F.xxhash64(F.col("vec_id") + F.lit(seed)))
            .limit(sample_rows)
            .collect()
        ],
        dtype=np.float64,
    )
    norms = np.linalg.norm(sample, axis=1, keepdims=True)
    return sample[norms[:, 0] > 0] / norms[norms[:, 0] > 0]


def _kmeans_centroids(
    emb: DataFrame, n_cells: int, sample_rows: int = 4096, iters: int = 5, seed: int = 17,
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """Spherical k-means on a deterministic corpus sample (driver-side).

    Scale posture: the sample is a bounded `limit` over a hash-ordered scan
    (deterministic, no full sort), Lloyd iterations run on the driver over
    ≤ sample_rows × dim floats — independent of corpus size. At 100 TB the
    same code holds: sampling cost is one scan, training cost is constant.
    Empty cells are re-seeded from the lowest-assignment-count points so
    every inverted list stays non-degenerate. Callers that also train a
    second-level quantizer pass the collected ``sample`` in so the corpus
    is sampled once, not per quantizer level.
    """
    if sample is None:
        sample = _normed_sample(emb, sample_rows, seed)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for c in range(n_cells):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                n = np.linalg.norm(m)
                if n > 0:
                    cents[c] = m / n
            else:  # re-seed dead cell with the point farthest from its centroid
                far = (sims.max(axis=1)).argmin()
                cents[c] = sample[far]
    return cents


def ivf_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = _N_QUERIES,
    k: int = _TOP_K,
    n_cells: int = 48,
    nprobe: int = 16,
    corpus_filter: str | None = None,
    probe_boost: int = 1,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into ``n_cells``
    inverted lists, probe only the query's ``nprobe`` nearest cells, exact
    cosine re-rank inside probed cells.

    ``corpus_filter`` (SQL predicate over the embeddings columns, e.g.
    ``"label = 3"``) turns this into FILTERED vector search — the hybrid
    attribute+similarity query every retrieval stack needs. It is a
    PRE-filter: applied to the corpus side before the candidate join, so
    the predicate pushes into the scan and candidates are drawn only
    from qualifying rows. Post-filtering top-k instead silently starves
    recall when the filter is selective (k survivors of an unfiltered
    top-k may all fail the predicate). Selective filters thin each
    probed cell, so callers raise ``probe_boost`` (multiplies nprobe,
    capped at n_cells) to restore the candidate budget — the standard
    oversampling trade: probe_boost ~ 1/selectivity keeps expected
    candidates constant while the scan stays inverted-list-bounded.

    The classic FAISS-style scale structure on Spark primitives:
    - centroids: spherical k-means over a deterministic bounded sample
      (``_kmeans_centroids`` — driver-side Lloyd, cost independent of
      corpus size; collected once, shipped to the assignment UDF as a
      broadcast-closure matrix, so assignment is a single scan with zero
      shuffle);
    - cell assignment: argmax of cosine against every centroid via
      higher-order functions (JVM-side, codegen'd);
    - probe: the query side keeps its ``nprobe`` best cells (fraction
      probed = nprobe/n_cells — at 100 TB with 2^16 cells and nprobe=64
      that's a 1000× scan reduction); candidates come from an equi-join on
      cell id, hash-partitioned and linear;
    - exact re-rank: cosine + row_number window over the (tiny) candidate
      set.

    Approximate by construction (a true neighbour in an unprobed cell is
    missed) → validated by recall against brute_force_topk in tests;
    driver records a rows-only check.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cmat_normed = _kmeans_centroids(emb, n_cells)
    nprobe = min(n_cells, nprobe * max(1, probe_boost))

    @F.pandas_udf("array<double>")
    def cell_cos_udf(emb_s: pd.Series) -> pd.Series:
        # cosine to every centroid: ONE (batch × dim) @ (dim × cells)
        # matmul per Arrow batch — the assignment step stays a single
        # shuffle-free scan at any corpus size
        mat = np.array(emb_s.tolist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = np.where(norms > 0, mat / norms, 0.0) @ cmat_normed.T
        return pd.Series(sims.tolist())

    corpus_side = emb.filter(F.expr(corpus_filter)) if corpus_filter else emb
    scored_corpus = corpus_side.select(
        "vec_id", "embedding", cell_cos_udf("embedding").alias("cell_cos")
    )
    # query side scored separately: it is n_queries rows — re-scoring the
    # full corpus for it would undo the filter pushdown above
    scored_cells = emb.filter(F.col("vec_id") < n_queries).select(
        "vec_id", "embedding", cell_cos_udf("embedding").alias("cell_cos")
    )
    # corpus: argmax cell (deterministic: first max wins via array_position)
    corpus = scored_corpus.select(
        "vec_id",
        "embedding",
        (F.expr("array_position(cell_cos, array_max(cell_cos))") - 1)
        .cast("long")
        .alias("cell"),
    )
    # queries: nprobe best cells each
    queries = (
        scored_cells.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.posexplode("cell_cos").alias("cell_idx", "c_cos"),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("c_cos"), F.asc("cell_idx"))
            ),
        )
        .filter(F.col("probe_rank") <= nprobe)
        .select("q_id", "q_emb", F.col("cell_idx").cast("long").alias("cell"))
    )
    pair_cos = _pair_cosine_udf()
    candidates = corpus.join(F.broadcast(queries), "cell").select(
        "q_id", "vec_id", pair_cos("q_emb", "embedding").alias("cos")
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos")
    )


# --- IVF-PQ: product-quantized second level --------------------------------

_PQ_M = 8          # subspaces (dim 64 → 8 dims each)
_PQ_CODES = 64     # codewords per subspace (6-bit codes)
_PQ_RERANK = 16    # exact re-rank window = _PQ_RERANK * k ADC candidates
# Operating points (VERDICT r06 item 4) — measured recall@10 vs brute at
# sf0.1, median sec, defaults in caps:
#   IVF  (cells, nprobe): (32,6) 0.61/1.2 -> (48,16) 0.83/1.2  [DEFAULT]
#        (32,12) 0.77, (64,24) 0.82 — recall is probe-fraction-bound here;
#        at 100 TB cells scale to 2^16 and nprobe keeps the same fraction.
#   IVFPQ (cells=48, nprobe=16): rerank 4 -> 0.67/1.85, rerank 8 ->
#        0.73/1.9, rerank 16 -> 0.82/1.99 [DEFAULT — VERDICT r07 item 5:
#        +5% latency buys the IVF ceiling; PQ recall is rerank-window-
#        bound, not probe-bound — nprobe 8 vs 16 changed nothing at
#        rerank 4]. codes 64 vs 128: no recall change at this dim;
#        rerank cost is rerank*k exact fetches per query — still
#        corpus-size-independent.


def _pq_codebooks(
    sample: np.ndarray, m: int = _PQ_M, n_codes: int = _PQ_CODES,
    iters: int = 10, seed: int = 23,
) -> np.ndarray:
    """Per-subspace euclidean k-means codebooks, trained driver-side on the
    same bounded deterministic sample as the coarse quantizer — cost is
    O(sample × dim × codes × iters), independent of corpus size.
    Returns (m, n_codes, dim // m)."""
    dim = sample.shape[1]
    assert dim % m == 0, f"dim {dim} not divisible into {m} subspaces"
    ds = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, ds), dtype=np.float64)
    for sub in range(m):
        x = sample[:, sub * ds : (sub + 1) * ds]
        k_eff = min(n_codes, len(x))
        cents = x[rng.choice(len(x), size=k_eff, replace=False)]
        for _ in range(iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k_eff):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        if k_eff < n_codes:  # degenerate tiny sample: cycle the learned
            # centroids until the codebook is full (a single slice
            # under-pads whenever k_eff < n_codes - k_eff)
            reps = -(-n_codes // k_eff)  # ceil
            cents = np.tile(cents, (reps, 1))[:n_codes]
        books[sub] = cents
    return books


def _opq_rotation(sample: np.ndarray, m: int = _PQ_M) -> np.ndarray:
    """Parametric OPQ rotation (Ge et al., "Optimized Product
    Quantization", CVPR 2013, §4 — the closed-form variant): rotate into
    the PCA basis, then allocate principal directions to the M subspaces
    balancing the PRODUCT of eigenvalues per subspace, so no subquantizer
    is handed all the variance while others quantize noise. Returns an
    orthonormal (dim × dim) matrix R; vectors are encoded as R @ x.

    Rotating costs one small matmul per Arrow batch and nothing at the
    join layer — codes stay 8 bytes — while cutting quantization
    distortion on anisotropic embeddings (real text/image encoders
    concentrate variance in a few directions; plain PQ splits dims by
    position, which couples subspace quality to dimension order).
    Orthogonality preserves inner products, so ADC scores in rotated
    space estimate the same cosine.

    Deterministic: eigh on the sample covariance (symmetric — stable
    ordering), sign-canonicalized eigenvectors, greedy balanced
    allocation with index tie-breaks.
    """
    dim = sample.shape[1]
    ds = dim // m
    cov = np.cov(sample, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(-evals, kind="stable")   # descending variance
    evals, evecs = evals[order], evecs[:, order]
    # canonical sign: largest-|component| entry of each eigenvector > 0
    for j in range(dim):
        i = int(np.abs(evecs[:, j]).argmax())
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    # greedy balanced allocation: biggest eigenvalue goes to the open
    # subspace with the smallest current log-product of eigenvalues.
    # Every bucket ends with exactly ds items, so balancing Σ log λ is
    # invariant to a constant shift per item — shift logs to ≥ 0 first,
    # otherwise (all λ < 1 ⇒ all logs < 0) each assignment makes its
    # bucket MORE attractive and the greedy stuffs one subspace with
    # every high-variance direction.
    logs = np.log(np.maximum(evals, 1e-12))
    logs = logs - logs.min()
    buckets: list[list[int]] = [[] for _ in range(m)]
    logprod = np.zeros(m)
    for j in range(dim):
        open_subs = [s for s in range(m) if len(buckets[s]) < ds]
        s = min(open_subs, key=lambda s: (logprod[s], s))
        buckets[s].append(j)
        logprod[s] += float(logs[j])
    perm = [j for b in buckets for j in b]
    # row i of R is the eigenvector assigned to output coordinate i
    return evecs[:, perm].T.copy()


def ivfpq_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = _N_QUERIES,
    k: int = _TOP_K,
    n_cells: int = 48,
    nprobe: int = 16,
    opq: bool = False,
) -> DataFrame:
    """IVF-PQ approximate top-k: coarse inverted lists (as ivf_topk) with a
    product-quantized second level — candidates are scored by asymmetric
    distance computation (ADC) over 8-byte codes, and only the best
    ``_PQ_RERANK * k`` per query are re-ranked with exact cosine.

    Why this is the 100 TB tier above plain IVF: the candidate join moves
    (vec_id, cell, codes) — ~16 bytes/row instead of the 512-byte raw
    vector — so probing deep (large nprobe) stops being IO-bound; full
    vectors are touched only for the tiny re-rank set, fetched via a
    broadcast join against the corpus scan. The ADC step groups candidates
    by query and builds each query's (m × codes) lookup table ONCE, then
    scores every candidate with m table lookups — the FAISS IVFADC shape
    (Jégou et al., "Product Quantization for Nearest Neighbor Search",
    TPAMI 2011) on Spark primitives.

    Deterministic end-to-end: bounded hash-ordered training sample, seeded
    k-means, first-index argmin/argmax ties, vec_id tie-breaks in every
    rank. Approximate by construction → recall-vs-brute-force test, driver
    rows-only check (no SQL oracle can express the trained quantizer).
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # ONE bounded sample scan trains both quantizer levels (and, under
    # opq=True, the rotation — coarse cells stay in the original space;
    # only the residual-free PQ codes live in the rotated basis)
    sample = _normed_sample(emb)
    cmat = _kmeans_centroids(emb, n_cells, sample=sample)  # (cells × dim), L2-normalized
    rot = _opq_rotation(sample) if opq else None
    books = _pq_codebooks(sample @ rot.T if rot is not None else sample)
    m, n_codes, ds = books.shape

    @F.pandas_udf("struct<cell: long, codes: array<int>>")
    def encode_udf(emb_s: pd.Series) -> pd.DataFrame:
        # one Arrow batch: normalize, coarse-assign (argmax cosine), then
        # per-subspace argmin distance to the codebook — all matmuls
        mat = np.array(emb_s.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            mat = np.where(nrm > 0, mat / nrm, 0.0)
        cells = (mat @ cmat.T).argmax(axis=1)
        pq_mat = mat @ rot.T if rot is not None else mat
        codes = np.empty((len(mat), m), dtype=np.int32)
        for sub in range(m):
            x = pq_mat[:, sub * ds : (sub + 1) * ds]
            d2 = (
                (x**2).sum(axis=1, keepdims=True)
                - 2.0 * (x @ books[sub].T)
                + (books[sub] ** 2).sum(axis=1)[None, :]
            )
            codes[:, sub] = d2.argmin(axis=1)
        return pd.DataFrame({"cell": cells, "codes": list(codes)})

    encoded = emb.select(
        "vec_id", "embedding", encode_udf("embedding").alias("e")
    ).select("vec_id", "embedding", "e.cell", "e.codes")

    # query side: nprobe best cells (JVM-side HOF cosine against centroids
    # would need the raw matrix; reuse the encode scan's normalized path)
    @F.pandas_udf("array<double>")
    def cell_cos_udf(emb_s: pd.Series) -> pd.Series:
        mat = np.array(emb_s.tolist(), dtype=np.float64)
        nrm = np.linalg.norm(mat, axis=1, keepdims=True)
        with np.errstate(invalid="ignore", divide="ignore"):
            sims = np.where(nrm > 0, mat / nrm, 0.0) @ cmat.T
        return pd.Series(sims.tolist())

    queries = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("q_emb"),
            F.posexplode(cell_cos_udf("embedding")).alias("cell_idx", "c_cos"),
        )
        .withColumn(
            "probe_rank",
            F.row_number().over(
                Window.partitionBy("q_id").orderBy(F.desc("c_cos"), F.asc("cell_idx"))
            ),
        )
        .filter(F.col("probe_rank") <= nprobe)
        .select("q_id", "q_emb", F.col("cell_idx").cast("long").alias("cell"))
    )

    # candidate stream carries CODES, not vectors (the PQ memory win)
    candidates = (
        encoded.select("vec_id", "cell", "codes")
        .join(F.broadcast(queries), "cell")
        .select("q_id", "q_emb", "vec_id", "codes")
    )

    n_rerank = _PQ_RERANK * k

    def adc_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # per query: build the (m × codes) LUT once, score all candidates
        # with m gathers — the ADC shape
        q = np.array(pdf["q_emb"].iloc[0], dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn > 0:
            q = q / qn
        if rot is not None:  # orthogonal: (Rq)·(Rx) == q·x
            q = rot @ q
        lut = np.stack(
            [q[sub * ds : (sub + 1) * ds] @ books[sub].T for sub in range(m)]
        )  # (m, n_codes)
        codes = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (B, m)
        scores = lut[np.arange(m)[None, :], codes].sum(axis=1)
        out = pd.DataFrame(
            {"q_id": pdf["q_id"], "vec_id": pdf["vec_id"], "adc": scores}
        )
        out = out.sort_values(
            ["adc", "vec_id"], ascending=[False, True], kind="mergesort"
        ).head(n_rerank)
        return out

    adc = candidates.groupBy("q_id").applyInPandas(
        adc_group, "q_id long, vec_id long, adc double"
    )

    # exact re-rank: fetch raw vectors for the tiny candidate set only
    q_vecs = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pair_cos = _pair_cosine_udf()
    rerank = (
        emb.select("vec_id", "embedding")
        .join(F.broadcast(adc), "vec_id")
        .join(F.broadcast(q_vecs), "q_id")
        .select("q_id", "vec_id", pair_cos("q_emb", "embedding").alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos")
    )
