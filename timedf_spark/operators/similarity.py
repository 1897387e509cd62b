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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timedf_spark.functions.vectors import cosine_similarity
from timedf_spark.sources import load_table

__all__ = ["brute_force_topk", "brute_force_topk_sql", "lsh_topk", "hyperplanes"]

_N_QUERIES = 10
_TOP_K = 10


def brute_force_topk(
    spark: SparkSession, sf_dir: str, n_queries: int = _N_QUERIES, k: int = _TOP_K
) -> DataFrame:
    """Exact top-k neighbours for the first n_queries vectors (by vec_id)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    scored = emb.crossJoin(F.broadcast(queries)).select(
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
    import numpy as np

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


def lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = _N_QUERIES,
    k: int = _TOP_K,
    bits: int = 8,
    n_tables: int = 4,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: multi-table sign-random-projection LSH with
    hamming-1 multi-probe, then exact cosine within candidate buckets only.

    Standard SRP-LSH (Charikar '02) scaling structure:
    - ``n_tables`` independent 8-bit signatures per vector — a single scan
      computing all tables (one array column each, no shuffle);
    - candidates = equi-join on (table, bucket) — hash-partitioned, linear;
    - multi-probe expands only the QUERY side to the bit-flip neighbour
      buckets (b+1 probes/table) — recall of a much bigger table count at
      the cost of a slightly wider broadcast, the classic trade
      (Lv et al., VLDB '07);
    - exact cosine re-rank of candidates (tiny vs corpus).

    Validated against brute force by recall in tests — approximate results
    have no equality oracle by design.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()[0])
    tables = [hyperplanes(dim, bits, seed=42 + t) for t in range(n_tables)]
    with_sig = emb.select(
        "vec_id",
        "embedding",
        *[_bucket_col(tables[t]).alias(f"bucket{t}") for t in range(n_tables)],
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
    # query side: exact bucket + hamming-1 probes per table
    probe_buckets = []
    for t in range(n_tables):
        probe_buckets.append(F.struct(F.lit(t).alias("tbl"), F.col(f"bucket{t}").alias("bucket")))
        if multiprobe:
            for j in range(bits):
                probe_buckets.append(
                    F.struct(
                        F.lit(t).alias("tbl"),
                        F.expr(f"bucket{t} ^ {1 << j}").cast("long").alias("bucket"),
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
    candidates = (
        corpus.join(F.broadcast(queries), ["tbl", "bucket"])
        .select("q_id", "q_emb", "vec_id", "embedding")
        .dropDuplicates(["q_id", "vec_id"])
        .select("q_id", "vec_id", cosine_similarity("q_emb", "embedding").alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", F.col("rank").cast("long").alias("rank"), "cos")
    )
