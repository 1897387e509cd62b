"""Tests for multimodal column plumbing and Structured Streaming operators."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from timedf_spark.operators import multimodal
from timedf_spark.sources import load_table
from timedf_spark.streaming import sessions as streaming_sessions


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return multimodal.attach_fake_payloads(docs).cache()


def test_binary_payload_roundtrip(media, spark, tmp_path_factory):
    """BinaryType survives a Parquet write/read cycle with byte equality."""
    out = str(tmp_path_factory.mktemp("media")) + "/media.parquet"
    media.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.schema["payload"].dataType.typeName() == "binary"
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in back.collect()}
    assert a == b


def test_feature_extraction_via_map_in_pandas(media):
    feats = multimodal.extract_image_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    for r in rows[:20]:
        assert r["n_bytes"] > 0
        assert 0 <= r["mean_byte"] <= 255
        assert r["entropy"] >= 0


def test_feature_extraction_matches_local_decode(media):
    row = media.orderBy("media_id").first()
    local = multimodal.decode_stub(bytes(row["payload"]))
    dist = (
        multimodal.extract_image_features(media)
        .filter(F.col("media_id") == row["media_id"])
        .first()
    )
    for k, v in local.items():
        assert dist[k] == pytest.approx(v)


def test_strict_decode_raises():
    with pytest.raises(NotImplementedError, match="codec"):
        multimodal.decode_stub(b"abc", strict=True)


def test_frame_sampling_fanout(media, spark):
    vids = media.withColumn("n_frames", F.lit(95))
    sampled = multimodal.sample_frames(vids, every_nth=10)
    per = sampled.groupBy("media_id").count().select("count").distinct().collect()
    assert [r["count"] for r in per] == [10]  # frames 0,10,...,90


def test_streaming_session_rollup_matches_batch(spark, sf_dir):
    """Replay events.parquet through a file-source stream; the session
    rollup must agree with the batch sessionizer on (user, session count).
    (Complete-mode memory sink; single micro-batch since input is static.)"""
    events = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        rolled = streaming_sessions.session_rollup(stream)
        q = (
            rolled.writeStream.format("memory")
            .queryName("sess_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select user_id, count(*) as n_sessions, sum(n_events) as n_events from sess_test group by user_id"
        ).collect()
        from timedf_spark.operators.sessionize import sessionize

        batch = (
            sessionize(spark, sf_dir)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_sessions"), F.sum("n_events").alias("n_events"))
            .collect()
        )
        got_map = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got}
        batch_map = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in batch}
        assert got_map == batch_map


def test_streaming_tumbling_counts(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        counts = streaming_sessions.tumbling_counts(stream)
        q = (
            counts.writeStream.format("memory")
            .queryName("tumble_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        total = spark.sql("select sum(n_events) as n from tumble_test").first()["n"]
        assert total == events.count()


def test_stateful_sessionize_matches_batch_twin(spark, sf_dir):
    """applyInPandasWithState sessionization must converge to the batch
    twin: every emitted session matches a batch session exactly (bounds,
    count, first/last event type); only each user's final session may be
    missing (its event-time timeout cannot fire after the stream ends)."""
    import time

    from timedf_spark.streaming.stateful import (
        batch_sessions_with_types,
        stateful_sessionize,
    )

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    lo, hi = events.agg(
        F.min("ts").cast("long"), F.max("ts").cast("long")
    ).first()
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        # sequential time-ordered appends → file mtime order == event-time
        # order, so each micro-batch advances the watermark and times out
        # earlier sessions
        n_chunks = 4
        step = (hi - lo) // n_chunks + 1
        for i in range(n_chunks):
            chunk = events.filter(
                (F.col("ts").cast("long") >= lo + i * step)
                & (F.col("ts").cast("long") < lo + (i + 1) * step)
            )
            chunk.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)  # distinct mtimes for deterministic file order
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stateful_sessionize(stream)
            .writeStream.format("memory")
            .queryName("stateful_sess")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql("select * from stateful_sess").collect()

    batch = batch_sessions_with_types(events).collect()

    def key(r):
        return (r["user_id"], r["t_start"], r["t_end"])

    got_map = {key(r): r for r in got}
    batch_map = {key(r): r for r in batch}
    assert len(got_map) == len(got), "duplicate sessions emitted"
    # every streamed session is a real batch session with identical content
    assert set(got_map) <= set(batch_map)
    for k, r in got_map.items():
        b = batch_map[k]
        assert r["n_events"] == b["n_events"]
        assert r["first_event_type"] == b["first_event_type"]
        assert r["last_event_type"] == b["last_event_type"]
        assert r["value_sum"] == pytest.approx(b["value_sum"])
    # everything except each user's (possibly unflushed) final session arrived
    finals = {}
    for k in batch_map:
        uid, t_start, _ = k
        if uid not in finals or t_start > finals[uid][1]:
            finals[uid] = (k, t_start)
    must_have = set(batch_map) - {k for k, _ in finals.values()}
    missing = must_have - set(got_map)
    assert not missing, f"non-final sessions missing from stream: {missing}"


def test_stream_stream_attribution_join_matches_batch(spark, sf_dir):
    """Watermarked stream-stream interval join must produce exactly the
    batch join's pairs: with availableNow replay of a static file the
    watermark never evicts a row before its matches arrive (single-source
    replay preserves both sides' order), so the streamed result is the
    complete set."""
    from timedf_spark.streaming.joins import attribution_join, attribution_join_batch

    events = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_id", "event_type", "value"
    )
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            attribution_join(stream)
            .writeStream.format("memory")
            .queryName("attrib")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {
            (r["click_id"], r["purchase_id"])
            for r in spark.sql("select * from attrib").collect()
        }
    want = {
        (r["click_id"], r["purchase_id"])
        for r in attribution_join_batch(events).collect()
    }
    assert len(want) > 0, "fixture yields no click->purchase pairs"
    assert got == want


def test_resize_images_plumbing(media):
    """Resize through mapInPandas: every output payload has exactly
    width*height bytes, ids are preserved, and strict mode raises where a
    real codec would plug in."""
    out = multimodal.resize_images(media, width=8, height=4).collect()
    assert {r["media_id"] for r in out} == {
        r["media_id"] for r in media.select("media_id").collect()
    }
    for r in out:
        assert len(r["payload"]) == 8 * 4
        assert (r["width"], r["height"]) == (8, 4)
    with pytest.raises(NotImplementedError):
        multimodal.resize_stub(b"xx", 8, 4, strict=True)


def test_streaming_exact_dedup_drops_replayed_rows(spark, sf_dir):
    """Replay events.parquet TWICE into the stream source (every row arrives
    two times); watermark-bounded streaming dedup must emit exactly the
    batch-distinct row set, once each."""
    from timedf_spark.streaming.dedup import exact_dedup_stream

    events = load_table(spark, sf_dir, "events")
    key_cols = ("user_id", "event_type", "value", "ts")
    expected = events.dropDuplicates(list(key_cols)).count()
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        events.write.parquet(src)
        events.write.mode("append").parquet(src)  # second copy = duplicates
        assert spark.read.parquet(src).count() == 2 * events.count()
        stream = spark.readStream.schema(events.schema).parquet(src)
        deduped = exact_dedup_stream(stream, key_cols=key_cols)
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select count(*) as n from dedup_stream_test").first()["n"]
        assert got == expected


def test_stream_static_enrichment_matches_batch(spark, sf_dir):
    """Streaming events ⋈ static dimension must equal the same join run in
    batch — including NULL-extension for users missing from the dimension
    (dimension deliberately smaller than the user-id range)."""
    from timedf_spark.streaming import joins as streaming_joins

    events = load_table(spark, sf_dir, "events")
    dim = streaming_joins.user_dim(spark, n_users=10)  # force some misses
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        events.write.parquet(src)
        stream = spark.readStream.schema(events.schema).parquet(src)
        q = (
            streaming_joins.enrichment_join(stream, dim)
            .writeStream.format("memory")
            .queryName("enrich_test")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select * from enrich_test order by event_id"
        ).collect()
        batch = (
            streaming_joins.enrichment_join(events, dim)
            .orderBy("event_id")
            .collect()
        )
        assert got == batch
        # NULL extension really exercised: some users beyond the dim range
        assert any(r["segment"] is None for r in got)


def test_idempotent_foreachbatch_sink_exactly_once(spark, sf_dir):
    """Multi-batch replay through the idempotent foreachBatch sink: total
    rows equal the source, and re-running a batch (simulated at-least-once
    redelivery) leaves the output unchanged."""
    from timedf_spark.streaming import sinks as streaming_sinks

    events = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        out = os.path.join(d, "out")
        chk = os.path.join(d, "chk")
        # several source files → several micro-batches with maxFilesPerTrigger
        events.repartition(4).write.parquet(src)
        stream = spark.readStream.schema(events.schema).option(
            "maxFilesPerTrigger", 1
        ).parquet(src)
        q = (
            streaming_sinks.idempotent_parquet_sink(stream, out, chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out)
        n_batches = got.select("batch_id").distinct().count()
        assert n_batches >= 2  # really exercised multi-batch
        assert got.count() == events.count()
        # simulate at-least-once redelivery of batch 0: same data, same id
        # (materialized first — a lazy plan would read the directory it is
        # about to overwrite, which is exactly what a replayed micro-batch
        # never does: its input comes from the source, not the sink)
        batch0_rows = got.filter("batch_id = 0").drop("batch_id").collect()
        batch0 = spark.createDataFrame(batch0_rows, events.schema)
        streaming_sinks.write_batch_idempotent(batch0, 0, out)
        again = spark.read.parquet(out)
        assert again.count() == events.count()  # no duplication


def test_first_touch_state_converges_to_batch_twin(spark, sf_dir):
    """UPDATE-mode stateful attribution: each user's LAST emission (max
    n_seen) must equal the batch twin row exactly — including first-touch
    identity, conversion flag, and total event count. Exercises the
    update + NoTimeout path (sessionize covers append + EventTimeTimeout)."""
    import time

    from timedf_spark.streaming.first_touch import first_touch_batch, first_touch_state

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    lo, hi = events.agg(F.min("ts").cast("long"), F.max("ts").cast("long")).first()
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        n_chunks = 3
        step = (hi - lo) // n_chunks + 1
        for i in range(n_chunks):
            chunk = events.filter(
                (F.col("ts").cast("long") >= lo + i * step)
                & (F.col("ts").cast("long") < lo + (i + 1) * step)
            )
            chunk.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            first_touch_state(stream)
            .writeStream.format("memory")
            .queryName("first_touch")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = spark.sql("select * from first_touch").collect()

    latest = {}
    for r in got:
        if r["user_id"] not in latest or r["n_seen"] > latest[r["user_id"]]["n_seen"]:
            latest[r["user_id"]] = r
    batch = {r["user_id"]: r for r in first_touch_batch(events).collect()}
    assert set(latest) == set(batch)
    for uid, r in latest.items():
        b = batch[uid]
        assert (r["first_ts"], r["first_touch"], r["converted"], r["n_seen"]) == (
            b["first_ts"], b["first_touch"], b["converted"], b["n_seen"]
        ), uid


def test_checkpoint_restart_resumes_without_duplicates(spark, sf_dir, tmp_path_factory):
    """Resilience: stop a checkpointed stream, add new source files,
    RESTART with the same checkpoint — the resumed query must process
    only the unseen files (offsets recovered), and the union of outputs
    must equal the batch answer with zero duplicate event_ids."""
    import time

    from timedf_spark.streaming import sinks as streaming_sinks

    base = tmp_path_factory.mktemp("restart")
    src, out, chk = str(base / "src"), str(base / "out"), str(base / "chk")
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "value")
    lo, hi = events.agg(F.min("ts").cast("long"), F.max("ts").cast("long")).first()
    step = (hi - lo) // 3 + 1
    chunks = [
        events.filter(
            (F.col("ts").cast("long") >= lo + i * step)
            & (F.col("ts").cast("long") < lo + (i + 1) * step)
        )
        for i in range(3)
    ]
    chunks[0].coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    chunks[1].coalesce(1).write.mode("append").parquet(src)

    def run_stream():
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            streaming_sinks.idempotent_parquet_sink(stream, out, chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_stream()  # first run: chunks 0-1
    n_after_first = spark.read.parquet(out).count()
    assert n_after_first == chunks[0].count() + chunks[1].count()

    time.sleep(1.1)
    chunks[2].coalesce(1).write.mode("append").parquet(src)
    run_stream()  # restart from checkpoint: must pick up ONLY chunk 2

    got = spark.read.parquet(out)
    assert got.count() == events.count()
    assert got.select("event_id").distinct().count() == events.count()
    # the resumed run added new batch directories, it did not rewrite old ones
    import os

    batch_dirs = sorted(d for d in os.listdir(out) if d.startswith("batch_id="))
    assert len(batch_dirs) >= 3, batch_dirs


def test_streaming_heavy_hitters_misra_gries_guarantees(spark, sf_dir):
    """Bounded-state sketch guarantees vs exact batch counts: every key
    whose true bucket frequency exceeds N_bucket/(capacity+1) must appear
    in the final summary, and every estimate satisfies
    count_est <= true <= count_est + decrements."""
    import time

    from timedf_spark.streaming.heavy_hitters import heavy_hitters_state

    capacity, n_buckets = 4, 2  # small enough that buckets overflow at test sf
    events = load_table(spark, sf_dir, "events").select(
        "ts", F.col("user_id").cast("string").alias("user_key")
    )
    lo, hi = events.agg(F.min("ts").cast("long"), F.max("ts").cast("long")).first()
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        step = (hi - lo) // 3 + 1
        for i in range(3):
            events.filter(
                (F.col("ts").cast("long") >= lo + i * step)
                & (F.col("ts").cast("long") < lo + (i + 1) * step)
            ).coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            heavy_hitters_state(stream, "user_key", capacity, n_buckets)
            .writeStream.format("memory")
            .queryName("hh")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        rows = spark.sql("select * from hh").collect()

    # final summary per bucket = the emission with the largest n_seen
    final_n = {}
    for r in rows:
        final_n[r["bucket"]] = max(final_n.get(r["bucket"], 0), r["n_seen"])
    summary = {
        (r["bucket"], r["key"]): r
        for r in rows
        if r["n_seen"] == final_n[r["bucket"]]
    }
    assert summary, "no summaries emitted"

    truth = {
        (r["bucket"], r["key"]): r["true_cnt"]
        for r in (
            events.select(
                F.col("user_key").alias("key"),
                F.pmod(F.xxhash64("user_key"), F.lit(n_buckets)).alias("bucket"),
            )
            .groupBy("bucket", "key")
            .agg(F.count(F.lit(1)).alias("true_cnt"))
            .collect()
        )
    }
    n_bucket = {}
    for (b, _k), c in truth.items():
        n_bucket[b] = n_bucket.get(b, 0) + c
    # state really was bounded below the key cardinality
    assert any(len([1 for (b, _) in truth if b == bb]) > capacity for bb in n_bucket)
    for (b, k), true_cnt in truth.items():
        if true_cnt > n_bucket[b] / (capacity + 1):
            assert (b, k) in summary, f"guaranteed-heavy key missing: {(b, k)}"
    for (b, k), r in summary.items():
        true_cnt = truth[(b, k)]
        assert r["count_est"] <= true_cnt <= r["count_est"] + r["decrements"], (b, k)


def test_streaming_zscore_anomalies_match_batch_twin(spark, sf_dir):
    """Causal z-score detector: replaying the events table through the
    stateful stream yields exactly the batch twin's anomaly rows (same
    preceding-history arithmetic in the same order → identical flags and
    scores), regardless of micro-batch boundaries."""
    import time

    from timedf_spark.streaming.anomaly import (
        batch_zscore_anomalies,
        zscore_anomaly_stream,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    lo, hi = events.agg(F.min("ts").cast("long"), F.max("ts").cast("long")).first()
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "ev")
        n_chunks = 3
        step = (hi - lo) // n_chunks + 1
        for i in range(n_chunks):
            chunk = events.filter(
                (F.col("ts").cast("long") >= lo + i * step)
                & (F.col("ts").cast("long") < lo + (i + 1) * step)
            )
            chunk.coalesce(1).write.mode("append").parquet(src)
            time.sleep(1.1)
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            zscore_anomaly_stream(stream)
            .writeStream.format("memory")
            .queryName("anomalies")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = {r["event_id"]: r for r in spark.sql("select * from anomalies").collect()}

    want = {r["event_id"]: r for r in batch_zscore_anomalies(events).collect()}
    assert want, "no anomalies at this sf — threshold too high for the test"
    assert set(got) == set(want)
    for eid, r in got.items():
        b = want[eid]
        assert r["event_type"] == b["event_type"]
        assert r["n_prior"] == b["n_prior"]
        assert r["z"] == pytest.approx(b["z"], abs=1e-9)


def test_streaming_cdc_apply_maintains_snapshot(spark, sf_dir, tmp_path_factory):
    """CDC change stream → foreachBatch merge loop: the published
    snapshot after the stream drains equals applying the batches
    sequentially with the batch operator; replaying an already-published
    batch is a no-op (at-least-once converges); old versions are gone."""
    import time

    from timedf_spark.operators.merge import merge_changes
    from timedf_spark.streaming import cdc_apply

    base = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(300)
        .cache()
    )
    keys = [r["o_orderkey"] for r in base.select("o_orderkey").collect()]
    chg_schema = "o_orderkey long, o_orderstatus string, o_totalprice double, op string"
    batches = [
        # batch 0: update 5, delete 3
        [(k, "X", 1.0, "U") for k in keys[:5]] + [(k, None, None, "D") for k in keys[5:8]],
        # batch 1: insert 4 new, update one of batch 0's updates again
        [(10_000_000 + i, "N", 2.0, "I") for i in range(4)] + [(keys[0], "Y", 3.0, "U")],
    ]

    d = str(tmp_path_factory.mktemp("cdc"))
    snap, chk, src = f"{d}/snap", f"{d}/chk", f"{d}/changes"
    cdc_apply.seed_snapshot(base, snap)
    for b in batches:
        spark.createDataFrame(b, chg_schema).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)  # distinct mtimes → deterministic batch order

    stream = (
        spark.readStream.schema(spark.createDataFrame([], chg_schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cdc_apply.cdc_apply_sink(stream, snap, chk, key="o_orderkey")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(tuple(r) for r in cdc_apply.read_snapshot(spark, snap).collect())
    want_df = base
    for b in batches:
        want_df = merge_changes(want_df, spark.createDataFrame(b, chg_schema), "o_orderkey")
    want = sorted(tuple(r) for r in want_df.collect())
    assert got == want
    assert len(got) == 300 - 3 + 4

    # replay convergence: re-applying the final batch changes nothing
    cdc_apply.apply_batch(
        spark.createDataFrame(batches[1], chg_schema), 1, snap, "o_orderkey"
    )
    again = sorted(tuple(r) for r in cdc_apply.read_snapshot(spark, snap).collect())
    assert again == got

    # only the published version remains on disk
    vdirs = [p for p in os.listdir(snap) if p.startswith("v=")]
    assert vdirs == ["v=1"], vdirs
    base.unpersist()


def test_streaming_cluster_maintenance_reaches_batch_fixpoint(spark, tmp_path_factory):
    """Edge stream → incrementally maintained (vertex, component) table:
    after the stream drains, the published assignments equal from-scratch
    connected components over ALL edges; replay is a no-op; brand-new
    vertices joined components mid-stream."""
    import time

    from timedf_spark.operators.cluster import connected_components
    from timedf_spark.streaming import cluster_apply

    vertices = list(range(12))
    base_edges = [(0, 1), (4, 5)]
    batches = [
        [(1, 2), (6, 7)],           # extend comp 0, new comp 6
        [(2, 4), (100, 101)],       # merge comps 0 and 4; brand-new vertices
        [(7, 100)],                 # merge 6-comp with the new one
    ]

    d = str(tmp_path_factory.mktemp("ccstream"))
    asg_path, chk, src = f"{d}/asg", f"{d}/chk", f"{d}/edges"
    vdf = spark.createDataFrame([(v,) for v in vertices], "v long")
    e0 = spark.createDataFrame(base_edges, "src long, dst long")
    cluster_apply.seed_assignments(connected_components(vdf, e0), asg_path)

    for b in batches:
        spark.createDataFrame(b, "src long, dst long").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("src long, dst long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        cluster_apply.cluster_apply_sink(stream, asg_path, chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["vertex"], r["component"])
        for r in cluster_apply.read_assignments(spark, asg_path).collect()
    }
    all_v = sorted(set(vertices) | {v for b in batches for e in b for v in e})
    all_e = base_edges + [e for b in batches for e in b]
    want = {
        (r["vertex"], r["component"])
        for r in connected_components(
            spark.createDataFrame([(v,) for v in all_v], "v long"),
            spark.createDataFrame(all_e, "src long, dst long"),
        ).collect()
    }
    assert got == want
    # replaying the last batch changes nothing
    cluster_apply.apply_edge_batch(
        spark.createDataFrame(batches[-1], "src long, dst long"), 2, asg_path
    )
    again = {
        (r["vertex"], r["component"])
        for r in cluster_apply.read_assignments(spark, asg_path).collect()
    }
    assert again == got


def test_stream_stream_left_outer_join_null_extends_unmatched(spark, sf_dir):
    """Left-outer attribution: matches must equal the batch inner join
    EXACTLY; NULL-extended clicks must (a) never have a real match
    (soundness — an early NULL is a wrong answer, not a late one) and
    (b) be COMPLETE for every click whose no-match status was decidable
    under the watermark the replay reached. Two source files replayed one
    per micro-batch force the watermark to advance between batches so
    eviction actually emits."""
    from timedf_spark.streaming.joins import (
        ATTRIBUTION_WINDOW_MIN,
        attribution_join_left,
        attribution_join_left_batch,
    )

    events = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_id", "event_type", "value"
    )
    split_ts = events.agg(
        F.expr("timestamp_micros(cast(percentile(unix_micros(ts), 0.7) as long))")
    ).first()[0]
    early_max = events.filter(F.col("ts") <= F.lit(split_ts)).agg(F.max("ts")).first()[0]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        # lexicographic file order == chronological: file source lists in
        # path order, so part-0 replays before part-1
        events.filter(F.col("ts") <= F.lit(split_ts)).coalesce(1).write.parquet(
            os.path.join(src, "t=0")
        )
        events.filter(F.col("ts") > F.lit(split_ts)).coalesce(1).write.parquet(
            os.path.join(src, "t=1")
        )
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = (
            attribution_join_left(stream)
            .writeStream.format("memory")
            .queryName("attrib_left")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        rows = spark.sql("select * from attrib_left").collect()
    got_matched = {
        (r["click_id"], r["purchase_id"]) for r in rows if r["purchase_id"] is not None
    }
    got_nulls = {r["click_id"] for r in rows if r["purchase_id"] is None}

    batch = attribution_join_left_batch(events).collect()
    want_matched = {
        (r["click_id"], r["purchase_id"]) for r in batch if r["purchase_id"] is not None
    }
    matched_clicks = {c for c, _ in want_matched}
    want_nulls = {r["click_id"] for r in batch if r["purchase_id"] is None}

    assert got_matched == want_matched
    # soundness: a NULL row for a click that has a match is wrong output
    assert not (got_nulls & matched_clicks), got_nulls & matched_clicks
    assert got_nulls <= want_nulls
    # completeness up to the reached watermark: after batch 1 the
    # watermark stands at max(early ts) - 10 min; batch 2 must emit the
    # NULL row of every unmatched click already evictable under it
    click_ts = {
        r["click_id"]: r["click_ts"]
        for r in attribution_join_left_batch(events).collect()
    }
    import datetime

    wm_after_first = early_max - datetime.timedelta(minutes=10)
    decided = {
        c
        for c in want_nulls
        if click_ts[c] + datetime.timedelta(minutes=ATTRIBUTION_WINDOW_MIN)
        < wm_after_first
    }
    assert decided, "fixture split leaves no decidable unmatched clicks"
    missing = decided - got_nulls
    assert not missing, f"{len(missing)} decidable NULL rows never emitted"
