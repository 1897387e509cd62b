"""Streaming semantic (embedding-cosine) ingest-dedup: maintain the
SRP-LSH signature store under an embedding stream and emit each arriving
batch's near-duplicate pairs — batch-internal plus batch-vs-corpus —
without ever re-bucketing the corpus embeddings against each other.

The vector-tier sibling of ``streaming/ingest_dedup.py`` (MinHash band
store over document text) and ``streaming/substring_ingest.py``
(anchor-fingerprint index over substrings): here the persisted unit is
the (vec_id, embedding, bucket0..bucketT−1) signature row of
``operators/similarity.cosine_dedup_pairs`` — deterministic
sign-random-projection buckets, so a batch's rows land in exactly the
buckets the batch operator would assign them.

Per micro-batch:

1. bucket JUST the batch (one Arrow-matmul pass over the batch's
   embeddings — the only vectors projected);
2. candidates = the batch-operator pair generation over corpus ∪ batch
   with corpus rows flagged old (``cosine_dedup_pairs_df`` with
   ``require_flag``): the flag predicate joins the (table, bucket)
   equi-join, so corpus×corpus candidates are pruned INSIDE the join —
   the corpus contributes only its stored signature rows, and the
   first-colliding-table guard still emits each global pair exactly
   once, which makes the union of per-batch outputs equal the one-shot
   batch operator's pair set (pinned by test);
3. the batch's signature rows land in the per-batch idempotent store
   (``streaming/sinks.py`` layout — replay-safe, compactable by
   ``streaming/compaction.py`` under the same manifest protocol and
   coverage-floor rules as every other store), and the pair batch lands
   in an idempotent per-batch output directory.

Replay convergence: both writes are per-batch overwrites keyed by
batch_id, and a replayed batch recomputes against the same corpus view
(the probe excludes batch_id >= current), so at-least-once delivery
converges to exactly-once state — the standard argument of
``streaming/sinks.py``.

At 100 TB: per batch, one Arrow projection of the batch + one equi-join
against the signature store partitioned by (table, bucket); the corpus
is never re-projected, and stored rows carry dim floats + n_tables
longs — the exact working set an IVF/LSH serving index would hold.

LSH PARAMETER SIZING (r10, measured): SRP blocking stays selective only
while per-bucket occupancy N / 2**bits is small. The defaults (bits=8,
n_tables=4) are the sf0.1 oracle-pinned constants — at a 2M-vector
store they pile ~7.8k vectors per bucket and the per-batch candidate
volume grows LINEARLY with the corpus regardless of plan shape
(store-growth exponent 0.34 even with every r10 prune). Size
bits ~ log2(N / target_occupancy) and buy the recall back with more
tables (P[collide] = 1 - (1 - p**bits)**n_tables, p = 1 - theta/pi);
at (bits=14, n_tables=8) the same probe is FLAT (exponent 0.03,
SCALE_SHAKEOUT store_growth_1000x). The store's column-metadata stamp
(operators/similarity.srp_signature_rows) makes a probe with mismatched
params raise instead of silently mis-blocking, so re-sizing requires an
explicit store rebuild.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.similarity import (
    _COS_THRESHOLD,
    _DEDUP_BITS,
    _DEDUP_TABLES,
    cosine_dedup_pairs_df,
    srp_signature_rows,
)
from timedf_spark.streaming.compaction import read_sink
from timedf_spark.streaming.ingest_dedup import _store_bids
from timedf_spark.streaming.sinks import write_batch_idempotent

__all__ = ["apply_semantic_batch", "semantic_ingest_sink", "read_all_pairs"]


def apply_semantic_batch(
    batch: DataFrame,
    batch_id: int,
    store_path: str,
    pairs_path: str,
    threshold: float = _COS_THRESHOLD,
    bits: int = _DEDUP_BITS,
    n_tables: int = _DEDUP_TABLES,
    max_degree: int | None = None,
) -> None:
    """One foreachBatch body over a (vec_id, embedding) vector batch."""
    spark = batch.sparkSession
    bucket_cols = [f"bucket{t}" for t in range(n_tables)]
    # bucket JUST the batch; the signature rows double as the store unit
    from timedf_spark.operators.cluster import _persistent_ids, _release

    before_ids = _persistent_ids(spark.sparkContext)
    batch_sig = srp_signature_rows(
        batch.select("vec_id", "embedding"), bits, n_tables
    ).localCheckpoint()  # one projection, reused by probe + store write
    ck_ids = _persistent_ids(spark.sparkContext) - before_ids
    covered = _store_bids(store_path, batch_id)
    if covered:
        corpus_sig = (
            read_sink(spark, store_path)
            .filter(F.col("batch_id").isin([int(b) for b in covered]))
            .select("vec_id", "embedding", *bucket_cols)
        )
    else:
        schema = "vec_id long, embedding array<double>, " + ", ".join(
            f"{c} long" for c in bucket_cols
        )
        corpus_sig = spark.createDataFrame([], schema)
    combined = corpus_sig.withColumn("is_new", F.lit(False)).unionByName(
        batch_sig.withColumn("is_new", F.lit(True))
    )
    # pre-signed rows → cosine_dedup_pairs_df skips the projection; the
    # corpus contributes only its stored signatures. small_batch gates
    # the r10 probe optimizations (literal bucket prune + late embedding
    # fetch, both broadcast-bounded by the BATCH): a micro-batch gets
    # them; a corpus-sized batch (the seed / a backfill) keeps the fat
    # single-pass plan whose broadcasts would otherwise explode. The
    # count is metadata-cheap — batch_sig is localCheckpointed above.
    pairs = cosine_dedup_pairs_df(
        combined,
        threshold=threshold,
        bits=bits,
        n_tables=n_tables,
        max_degree=max_degree,
        require_flag="is_new",
        small_batch=batch_sig.count() <= 100_000,
    )
    # pair output first, then the signature rows: a crash between the two
    # replays the batch with its own vectors NOT yet visible in the store
    # (covered excludes batch_id >= current either way), so both writes
    # recompute identically — idempotent overwrite converges.
    write_batch_idempotent(pairs, batch_id, pairs_path)
    write_batch_idempotent(batch_sig, batch_id, store_path)
    # release ONLY this batch's checkpoint blocks — the parquet store is
    # the durable copy; leaving them would accumulate across the stream
    _release(batch_sig, ck_ids)


def semantic_ingest_sink(
    vec_stream: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint: str,
    threshold: float = _COS_THRESHOLD,
    bits: int = _DEDUP_BITS,
    n_tables: int = _DEDUP_TABLES,
    max_degree: int | None = None,
):
    """DataStreamWriter running the semantic ingest-dedup loop (caller
    picks the trigger and calls .start())."""
    return vec_stream.writeStream.foreachBatch(
        lambda df, bid: apply_semantic_batch(
            df, bid, store_path, pairs_path, threshold, bits, n_tables,
            max_degree,
        )
    ).option("checkpointLocation", checkpoint)


def read_all_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """Union of every batch's emitted near-dup pairs (id_a, id_b, cos_q,
    batch_id)."""
    return spark.read.option("basePath", pairs_path).parquet(
        os.path.join(pairs_path, "batch_id=*")
    )
