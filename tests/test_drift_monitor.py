"""Streaming drift monitor: batch-twin equality + replay guard."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from timedf_spark.sources import load_table
from timedf_spark.streaming import drift_monitor as dm
from timedf_spark.streaming.cdc_apply import _current_version

_BUCKET = 50_000_00


def _bucketed(df):
    return df.select(
        F.expr(f"cast(floor(o_totalprice * 100) AS BIGINT) DIV {_BUCKET}").alias(
            "bucket"
        )
    )


def test_drift_store_equals_batch_twin_and_tvd_exact(spark, sf_dir, tmp_path):
    """Replaying the late half through the sink must (a) leave the
    store equal to one aggregation of all late rows, (b) log a final
    TVD identical to the batch twin's arithmetic recomputed in Python,
    and (c) ignore a redelivered batch id."""
    orders = load_table(spark, sf_dir, "orders")
    early = orders.where("o_orderdate < timestamp'1996-01-01'")
    late = orders.where("o_orderdate >= timestamp'1996-01-01'")
    ref = _bucketed(early).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))

    store = str(tmp_path / "drift")
    dm.seed_drift_monitor(spark, store, ref)

    stream_src = _bucketed(late)
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "late")
        stream_src.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(stream_src.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            dm.drift_sink(stream, store, os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    got_store = {
        r["bucket"]: r["n"] for r in dm._read_store(spark, store).collect()
    }
    want_store = {
        r["bucket"]: r["n"]
        for r in _bucketed(late).groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_store == want_store

    # final TVD from the log == Python recomputation of the twin formula
    log = {r["batch_id"]: r for r in dm.read_drift_log(spark, store).collect()}
    last = log[max(log)]
    ref_counts = {r["bucket"]: r["n"] for r in ref.collect()}
    tc, tr = sum(want_store.values()), sum(ref_counts.values())
    tvd2 = sum(
        abs(want_store.get(b, 0) * 10_000 // tc - ref_counts.get(b, 0) * 10_000 // tr)
        for b in set(want_store) | set(ref_counts)
    )
    assert last["tvd_bp"] == tvd2 // 2
    assert last["n_current"] == tc

    # redelivery guard
    v = _current_version(store)
    dm.apply_drift_batch(_bucketed(late).limit(100), v, store)
    assert _current_version(store) == v
    after = {r["bucket"]: r["n"] for r in dm._read_store(spark, store).collect()}
    assert after == got_store


def test_drift_redelivery_backfills_lost_log(spark, sf_dir, tmp_path):
    """Crash window between _publish and the log write: on redelivery of
    the published batch id, the missing log/batch=<id> reading is
    recomputed from the store (not skipped) and matches the original."""
    import shutil

    orders = load_table(spark, sf_dir, "orders")
    ref = _bucketed(orders.limit(2000)).groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    store = str(tmp_path / "drift2")
    dm.seed_drift_monitor(spark, store, ref)
    batch = _bucketed(orders.limit(5000))
    dm.apply_drift_batch(batch, 0, store)
    orig = dm.read_drift_log(spark, store).collect()
    assert len(orig) == 1

    # simulate the crash: the store advanced but the log write was lost
    shutil.rmtree(os.path.join(store, "log", "batch=0"))
    dm.apply_drift_batch(batch, 0, store)  # redelivery
    again = dm.read_drift_log(spark, store).collect()
    assert len(again) == 1
    assert again[0]["tvd_bp"] == orig[0]["tvd_bp"]
    assert again[0]["n_current"] == orig[0]["n_current"]
    # and the store was NOT double-counted
    total = dm._read_store(spark, store).agg(F.sum("n")).collect()[0][0]
    assert total == batch.count()
