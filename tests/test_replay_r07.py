"""Round-7 kill-and-replay coverage (VERDICT r06 stretch item 8) for the
streaming stores that didn't yet have it: the k-means stats store's
pre-publish crash window, and REAL checkpoint-restart recovery for the
stream-stream attribution join and applyInPandasWithState
sessionization (the Spark-managed-state modules, where the only honest
replay test is stopping a query and restarting it from its checkpoint
with more data)."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from timedf_spark.sources.readers import load_table


def test_kmeans_stats_crash_between_write_and_publish_converges(spark, tmp_path):
    """Crash window: v=N written (possibly partially) but the manifest
    still points at the old version. The replayed batch must recompute
    against the still-current stats and overwrite v=N — final state
    identical to a run with no crash."""
    from timedf_spark.operators import kmeans
    from timedf_spark.streaming import kmeans_apply

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cent = kmeans.lloyd_centroids(emb, 4, 1)
    seed = kmeans.assignment_stats(emb, cent, 4)
    b1 = emb.where("vec_id % 3 = 0")
    b2 = emb.where("vec_id % 3 = 1")

    clean = str(tmp_path / "clean")
    kmeans_apply.seed_stats_store(seed, clean)
    kmeans_apply.apply_stats_batch(b1, 1, clean, 4)
    kmeans_apply.apply_stats_batch(b2, 2, clean, 4)
    want = sorted(map(tuple, kmeans_apply.read_stats(spark, clean).collect()))

    crashed = str(tmp_path / "crashed")
    kmeans_apply.seed_stats_store(seed, crashed)
    kmeans_apply.apply_stats_batch(b1, 1, crashed, 4)
    # simulate the crash: v=2 exists with GARBAGE partial content, no
    # publish — the manifest still points at v=1
    os.makedirs(os.path.join(crashed, "v=2"), exist_ok=True)
    with open(os.path.join(crashed, "v=2", "part-garbage.parquet"), "wb") as f:
        f.write(b"\x00not parquet")
    kmeans_apply.apply_stats_batch(b2, 2, crashed, 4)  # replay
    got = sorted(map(tuple, kmeans_apply.read_stats(spark, crashed).collect()))
    assert got == want


def _run_available_now(builder_df, out, checkpoint, name):
    q = (
        builder_df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_attribution_join_restart_from_checkpoint_matches_batch(
    spark, sf_dir, tmp_path
):
    """Kill-and-replay for the stream-stream join: process the first
    half of the event files, STOP (the 'kill'), then restart from the
    SAME checkpoint once the rest has arrived. Pairs whose click sits in
    run 1's state and whose purchase arrives in run 2 only exist if the
    join state survived the restart — the final union must equal the
    batch twin exactly, with no duplicates from the replayed batch."""
    from timedf_spark.streaming.joins import attribution_join, attribution_join_batch

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    d = str(tmp_path)
    src = os.path.join(d, "events")
    lo, hi = events.agg(F.min("ts").cast("long"), F.max("ts").cast("long")).first()
    n_chunks, split = 4, 2
    step = (hi - lo) // n_chunks + 1

    def write_chunk(i):
        events.filter(
            (F.col("ts").cast("long") >= lo + i * step)
            & (F.col("ts").cast("long") < lo + (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    out = os.path.join(d, "out")
    ckpt = os.path.join(d, "ckpt")

    def stream():
        return attribution_join(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    for i in range(split):
        write_chunk(i)
    _run_available_now(stream(), out, ckpt, "attr_restart_1")  # run 1 ends = kill
    n_run1 = spark.read.parquet(out).count()
    for i in range(split, n_chunks):
        write_chunk(i)
    _run_available_now(stream(), out, ckpt, "attr_restart_2")  # restart

    got = sorted(
        map(tuple, spark.read.parquet(out).select(
            "click_id", "purchase_id", "purchase_value"
        ).collect())
    )
    want = sorted(
        map(tuple, attribution_join_batch(events).select(
            "click_id", "purchase_id", "purchase_value"
        ).collect())
    )
    assert got == want
    # the restart actually contributed rows (state crossed the kill)
    assert len(got) > n_run1 > 0


def test_stateful_sessionize_restart_from_checkpoint_no_dup_no_loss(
    spark, sf_dir, tmp_path
):
    """Kill-and-replay for applyInPandasWithState: restart from the same
    checkpoint must neither re-emit sessions already flushed in run 1
    nor lose sessions spanning the kill (open state restored). Same
    convergence contract as the single-run twin test: streamed ⊆ batch,
    exact content per session, and only each user's final session may be
    unflushed."""
    import pytest

    from timedf_spark.streaming.stateful import (
        batch_sessions_with_types,
        stateful_sessionize,
    )

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    d = str(tmp_path)
    src = os.path.join(d, "events")
    lo, hi = events.agg(F.min("ts").cast("long"), F.max("ts").cast("long")).first()
    n_chunks, split = 4, 2
    step = (hi - lo) // n_chunks + 1

    def write_chunk(i):
        events.filter(
            (F.col("ts").cast("long") >= lo + i * step)
            & (F.col("ts").cast("long") < lo + (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    out = os.path.join(d, "out")
    ckpt = os.path.join(d, "ckpt")

    def stream():
        return stateful_sessionize(
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    for i in range(split):
        write_chunk(i)
    _run_available_now(stream(), out, ckpt, "sess_restart_1")
    for i in range(split, n_chunks):
        write_chunk(i)
    _run_available_now(stream(), out, ckpt, "sess_restart_2")

    got = spark.read.parquet(out).collect()
    batch = batch_sessions_with_types(events).collect()

    def key(r):
        return (r["user_id"], r["t_start"], r["t_end"])

    got_map = {key(r): r for r in got}
    batch_map = {key(r): r for r in batch}
    assert len(got_map) == len(got), "duplicate sessions across restart"
    assert set(got_map) <= set(batch_map)
    for k, r in got_map.items():
        b = batch_map[k]
        assert r["n_events"] == b["n_events"]
        assert r["first_event_type"] == b["first_event_type"]
        assert r["last_event_type"] == b["last_event_type"]
        assert r["value_sum"] == pytest.approx(b["value_sum"])
    finals = {}
    for k in batch_map:
        uid, t_start, _ = k
        if uid not in finals or t_start > finals[uid][1]:
            finals[uid] = (k, t_start)
    must_have = set(batch_map) - {k for k, _ in finals.values()}
    missing = must_have - set(got_map)
    assert not missing, f"sessions lost across restart: {missing}"
