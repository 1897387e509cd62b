"""Streaming ingest-time near-dup detection: a DOCUMENT stream produces
pairs and keeps the cluster assignment current — the full streaming
closure of the dedup loop.

``streaming/cluster_apply.py`` consumes pair batches; this module
produces them from raw documents, per micro-batch:

1. corpus-so-far = committed batches of the document store with
   batch_id < this batch (the idempotent per-batch sink layout from
   ``streaming/sinks.py`` / read via ``streaming/compaction.read_sink``);
2. pairs = batch-internal near-dups (MinHash-LSH over the small batch)
   ∪ batch↔corpus near-dups (``dedup.incremental_near_dup_pairs`` —
   the corpus is probed via a BROADCAST of the batch's band set and
   never self-joins or shuffles);
3. the batch's documents land in the store (idempotent overwrite of
   ``batch_id=N``), new doc_ids enter the assignment as singletons, and
   the pairs fold through ``incremental_components``; the new assignment
   publishes under the atomic-manifest protocol.

Replay convergence: the document write is an idempotent per-batch
overwrite; the assignment publish has the version guard; and — the
subtle case — a crash AFTER the document write but BEFORE the publish
replays with the batch already visible in the store, which is harmless
twice over: the probe corpus explicitly excludes batch_id ≥ current
(step 1), and even duplicated edges cannot change a connectivity
fixpoint (CC folding is idempotent to edge multiplicity).

At 100 TB: per batch the corpus contributes one broadcast-probed scan of
band signatures (precompute and store them to make it an index lookup);
the assignment moves only through the affected-component semi-joins
inside ``incremental_components``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.cluster import incremental_components
from timedf_spark.operators.dedup import (
    _minhash_bands,
    incremental_near_dup_pairs,
    incremental_near_dup_pairs_indexed,
    minhash_lsh_pairs_df,
)
from timedf_spark.streaming.cdc_apply import _current_version, _publish
from timedf_spark.streaming.cluster_apply import read_assignments, seed_assignments
from timedf_spark.streaming.compaction import read_sink
from timedf_spark.streaming.sinks import write_batch_idempotent

__all__ = ["seed_empty_assignments", "apply_ingest_batch", "ingest_dedup_sink"]


def seed_empty_assignments(spark: SparkSession, path: str) -> None:
    """Publish an empty (vertex, component) assignment as version -1."""
    empty = spark.createDataFrame([], "vertex long, component long")
    seed_assignments(empty, path)


def apply_ingest_batch(
    batch: DataFrame, batch_id: int, corpus_path: str, assign_path: str,
    sig_path: str | None = None,
) -> None:
    """One foreachBatch body over a (doc_id, text) document batch.

    With ``sig_path`` set, each batch also persists its MinHash band rows
    (doc_id, band, band_key) to an idempotent per-batch signature store,
    and the batch↔corpus probe reads THAT index instead of re-hashing the
    corpus text every micro-batch — corpus text is touched only for the
    few candidate docs' exact-Jaccard verify. Probe-path equality with
    the re-hash path is pinned by test (same deterministic hash family).
    Signature rows follow the identical idempotent-overwrite + replay
    rules as the document rows, so the convergence argument in the module
    docstring carries over unchanged."""
    import os
    import shutil

    spark = batch.sparkSession
    cur = _current_version(assign_path)
    if cur is not None and cur >= batch_id:
        return  # replay of a published batch: converged
    docs = batch.select("doc_id", "text")

    # 1. corpus so far — committed earlier batches only (a replayed
    # batch's own dir, if already written, is excluded here)
    try:
        corpus = (
            read_sink(spark, corpus_path)
            .filter(F.col("batch_id") < batch_id)
            .select("doc_id", "text")
        )
        have_corpus = not corpus.isEmpty()
    except FileNotFoundError:
        have_corpus = False

    # 2. pairs: batch-internal ∪ batch↔corpus
    pairs = minhash_lsh_pairs_df(docs).select("doc_a", "doc_b")
    if have_corpus:
        corpus_bands = None
        if sig_path is not None:
            try:
                corpus_bands = (
                    read_sink(spark, sig_path)
                    .filter(F.col("batch_id") < batch_id)
                    .select("doc_id", "band", "band_key")
                )
                if corpus_bands.isEmpty():
                    corpus_bands = None
            except FileNotFoundError:
                corpus_bands = None
        if corpus_bands is not None:
            cross = incremental_near_dup_pairs_indexed(docs, corpus, corpus_bands)
        else:
            cross = incremental_near_dup_pairs(docs, corpus)
        pairs = pairs.unionByName(
            cross.select(
                F.col("batch_id").alias("doc_a"), F.col("corpus_id").alias("doc_b")
            )
        )

    # 3. document store append (idempotent), then assignment fold + publish
    write_batch_idempotent(docs, batch_id, corpus_path)
    if sig_path is not None:
        bands_df, _sh = _minhash_bands(docs)
        write_batch_idempotent(bands_df, batch_id, sig_path)
    base = read_assignments(spark, assign_path)
    singles = docs.select(
        F.col("doc_id").alias("vertex"), F.col("doc_id").alias("component")
    ).join(base.select("vertex"), "vertex", "left_anti")
    base = base.unionByName(singles)
    # no isEmpty pre-check: incremental_components checkpoints the edge
    # union once and handles the empty case for free — a separate
    # isEmpty() would compute the LSH pair work a second time
    nxt = incremental_components(base, pairs)
    nxt.selectExpr("vertex", "component").write.mode("overwrite").parquet(
        os.path.join(assign_path, f"v={batch_id}")
    )
    _publish(assign_path, batch_id)
    if cur is not None:
        shutil.rmtree(os.path.join(assign_path, f"v={cur}"), ignore_errors=True)


def ingest_dedup_sink(
    doc_stream: DataFrame, corpus_path: str, assign_path: str, checkpoint: str,
    sig_path: str | None = None,
):
    """DataStreamWriter running the ingest-dedup loop (caller picks the
    trigger and calls .start()). Pass ``sig_path`` to maintain and probe
    the persisted band-signature index instead of re-hashing the corpus
    per batch."""
    return doc_stream.writeStream.foreachBatch(
        lambda df, bid: apply_ingest_batch(df, bid, corpus_path, assign_path, sig_path)
    ).option("checkpointLocation", checkpoint)
