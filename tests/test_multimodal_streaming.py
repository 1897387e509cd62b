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
