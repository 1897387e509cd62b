"""Sink compaction (streaming/compaction.py): the reader's exactly-once
view must be invariant across every step of the compaction protocol —
before, after, mid-crash, and on re-run — while the directory/file count
actually drops."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from timedf_spark.sources.readers import load_table
from timedf_spark.streaming import sinks as streaming_sinks
from timedf_spark.streaming.compaction import (
    compact_sink,
    read_sink,
    sink_stats,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


@pytest.fixture()
def sink(spark, sf_dir, tmp_path):
    """Five micro-batches of events written through the idempotent sink."""
    path = str(tmp_path / "sink")
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
        .limit(500)
    )
    batches = [ev.filter((F.col("event_id") % 5) == i) for i in range(5)]
    for i, b in enumerate(batches):
        streaming_sinks.write_batch_idempotent(b, i, path)
    return path, ev


def test_compaction_preserves_reader_view_and_drops_files(spark, sink):
    path, ev = sink
    before = _rows(read_sink(spark, path).drop("batch_id"))
    assert before == _rows(ev)

    s0 = sink_stats(path)
    assert s0["batch_dirs"] == 5

    # writer quiesced → fold everything including the max batch id
    stats = compact_sink(spark, path, include_max_live=True)
    assert stats["compacted"] and stats["folded_batches"] == 5
    assert stats["covered"] == 4 and stats["epoch"] == 0

    after = _rows(read_sink(spark, path).drop("batch_id"))
    assert after == before
    s1 = sink_stats(path)
    assert s1["batch_dirs"] == 0
    assert s1["data_files"] < s0["data_files"]
    assert s1["data_files"] == 1  # target_files=1

    # batch_id provenance survives compaction as a real column
    ids = {r[0] for r in read_sink(spark, path).select("batch_id").distinct().collect()}
    assert ids == {0, 1, 2, 3, 4}


def test_recompaction_noop_then_folds_new_batches(spark, sink):
    path, ev = sink
    compact_sink(spark, path, include_max_live=True)
    # nothing new → no-op, manifest unchanged
    again = compact_sink(spark, path, include_max_live=True)
    assert not again["compacted"] and again["new_batches"] == 0

    # two fresh batches (a replayed 5 and a new 6) appear in the view...
    extra = ev.limit(40).withColumn("value", F.col("value") * 2)
    streaming_sinks.write_batch_idempotent(extra, 5, path)
    streaming_sinks.write_batch_idempotent(extra, 6, path)
    view = read_sink(spark, path)
    assert view.count() == ev.count() + 80

    # ...and fold into epoch=1, covering batch 6
    stats = compact_sink(spark, path, include_max_live=True)
    assert stats["compacted"] and stats["epoch"] == 1 and stats["covered"] == 6
    assert read_sink(spark, path).count() == ev.count() + 80
    assert sink_stats(path)["data_files"] == 1


def test_crash_before_publish_is_invisible_and_retryable(spark, sink):
    path, ev = sink
    baseline = _rows(read_sink(spark, path).drop("batch_id"))

    # simulate a compactor that died after step 2 (data written) but
    # before step 3 (manifest publish): an orphaned epoch dir exists
    orphan = os.path.join(path, "_compaction", "epoch=0")
    read_sink(spark, path).repartition(1).write.parquet(orphan)
    assert _rows(read_sink(spark, path).drop("batch_id")) == baseline  # unreferenced

    # the retry overwrites the orphan and publishes normally
    stats = compact_sink(spark, path)
    assert stats["compacted"] and stats["epoch"] == 0
    assert _rows(read_sink(spark, path).drop("batch_id")) == baseline


def test_min_batches_guard(spark, sink):
    path, _ = sink
    res = compact_sink(spark, path, min_batches=6)
    assert not res["compacted"]
    assert sink_stats(path)["batch_dirs"] == 5


def test_maybe_compact_threshold_policy(spark, sink):
    """Below the dir-count threshold: O(listing) no-op. Above: compacts,
    and the reader view is unchanged either way."""
    from timedf_spark.streaming.compaction import maybe_compact

    path, ev = sink  # 5 batch dirs
    before = _rows(read_sink(spark, path).drop("batch_id"))
    res = maybe_compact(spark, path, max_batch_dirs=10)
    assert not res["compacted"] and res["reason"] == "below_threshold"
    assert sink_stats(path)["batch_dirs"] == 5

    # concurrent-safe default: the max live batch id (4) stays unfolded —
    # it's the only batch Structured Streaming could still replay
    res = maybe_compact(spark, path, max_batch_dirs=3)
    assert res["compacted"] and res["folded_batches"] == 4
    assert res["covered"] == 3
    assert sink_stats(path)["batch_dirs"] == 1
    assert _rows(read_sink(spark, path).drop("batch_id")) == before


def test_concurrent_writer_safety_gates(spark, sink):
    """The two rules that make compaction loss-free beside a live writer:
    (1) a dir without _SUCCESS (in-flight write or mid-replay rewrite) is
    neither folded nor visible to the reader, and covered never advances
    past it; (2) the max live batch id is never folded by default."""
    path, ev = sink  # batches 0..4, all committed
    before = _rows(read_sink(spark, path).drop("batch_id"))

    # simulate an in-flight batch 5: dir exists, no _SUCCESS yet
    inflight = os.path.join(path, "batch_id=5")
    ev.limit(10).write.parquet(inflight)
    os.remove(os.path.join(inflight, "_SUCCESS"))

    # invisible to the reader (no partial rows)
    assert _rows(read_sink(spark, path).drop("batch_id")) == before

    # compaction folds the committed 0..4 (batch 4 is no longer replayable
    # once 5 exists) but covered stops hard at the uncommitted 5 — even
    # with include_max_live, which cannot skip past an existing
    # uncommitted dir
    stats = compact_sink(spark, path, include_max_live=True)
    assert stats["compacted"] and stats["folded_batches"] == 5
    assert stats["covered"] == 4
    assert _rows(read_sink(spark, path).drop("batch_id")) == before

    # still uncommitted → nothing foldable, covered unchanged
    again = compact_sink(spark, path, min_batches=1, include_max_live=True)
    assert not again["compacted"] and again["new_batches"] == 0

    # the in-flight batch commits → appears in the view; the default
    # (concurrent-safe) mode still refuses the max live id, the quiesced
    # mode folds it
    with open(os.path.join(inflight, "_SUCCESS"), "w"):
        pass
    assert len(_rows(read_sink(spark, path).drop("batch_id"))) == len(before) + 10
    stats = compact_sink(spark, path, min_batches=1)
    assert not stats["compacted"]  # batch 5 is max-live: left for the writer
    stats = compact_sink(spark, path, min_batches=1, include_max_live=True)
    assert stats["compacted"] and stats["covered"] == 5
