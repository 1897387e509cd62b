"""Round-8 kill-and-replay coverage (VERDICT r07 item 7) for the last
streaming stores without it: the CMS and trend stores' pre-publish crash
window (v=N written — possibly partially/garbage — but the manifest
still points at the old version), and REAL checkpoint-restart recovery
for the Misra-Gries heavy-hitters operator (applyInPandasWithState —
the only honest replay test is stopping the query and restarting it
from its checkpoint with more data)."""

from __future__ import annotations

import os
import time

import pyspark.sql.functions as F

from timedf_spark.sources.readers import load_table


def _garbage_version_dir(store: str, v: int) -> None:
    os.makedirs(os.path.join(store, f"v={v}"), exist_ok=True)
    with open(os.path.join(store, f"v={v}", "part-garbage.parquet"), "wb") as f:
        f.write(b"\x00not parquet")


def test_cms_store_crash_between_write_and_publish_converges(spark, sf_dir, tmp_path):
    """Crash window: v=2 exists with garbage partial content, manifest at
    v=1. The replayed batch must merge against the still-current sketch
    and overwrite v=2 — final cells bit-identical to a crash-free run
    (CMS merge is exact addition, so equality, not a bound)."""
    from timedf_spark.streaming import cms_apply

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("item")
    )
    b1 = tok.where("doc_id % 3 = 0")
    b2 = tok.where("doc_id % 3 = 1")

    clean = str(tmp_path / "clean")
    cms_apply.seed_cms_store(spark, clean)
    cms_apply.apply_cms_batch(b1, 1, clean, "item", 4, 128)
    cms_apply.apply_cms_batch(b2, 2, clean, "item", 4, 128)
    want = sorted(map(tuple, cms_apply.read_cms(spark, clean).collect()))

    crashed = str(tmp_path / "crashed")
    cms_apply.seed_cms_store(spark, crashed)
    cms_apply.apply_cms_batch(b1, 1, crashed, "item", 4, 128)
    _garbage_version_dir(crashed, 2)
    cms_apply.apply_cms_batch(b2, 2, crashed, "item", 4, 128)  # replay
    got = sorted(map(tuple, cms_apply.read_cms(spark, crashed).collect()))
    assert got == want and len(want) > 0


def test_trend_store_crash_between_write_and_publish_converges(
    spark, sf_dir, tmp_path
):
    """Same crash window for the OLS sufficient-statistics store: the
    replayed batch folds against the still-current stats; final store —
    and the slopes derived from it — equal the crash-free run exactly."""
    from timedf_spark.operators.trend import sufficient_stats
    from timedf_spark.streaming import trend_apply

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.col("ts").cast("long") % 1_000_000).alias("x"),
        F.floor("value").cast("long").alias("y"),
        "event_id",
    )
    b0 = ev.where("event_id % 3 = 0")
    b1 = ev.where("event_id % 3 = 1")
    b2 = ev.where("event_id % 3 = 2")

    def run(store: str, crash: bool) -> list[tuple]:
        trend_apply.seed_trend_store(
            sufficient_stats(b0, ["event_type"], "x", "y"), store
        )
        trend_apply.apply_trend_batch(b1, 1, store, ["event_type"], "x", "y")
        if crash:
            _garbage_version_dir(store, 2)
        trend_apply.apply_trend_batch(b2, 2, store, ["event_type"], "x", "y")
        stats = trend_apply.read_trend_stats(spark, store)
        slopes = trend_apply.derive_slopes(stats, ["event_type"])
        return sorted(map(tuple, slopes.collect()))

    want = run(str(tmp_path / "clean"), crash=False)
    got = run(str(tmp_path / "crashed"), crash=True)
    assert got == want and len(want) > 0


def test_heavy_hitters_restart_from_checkpoint_keeps_state(spark, sf_dir, tmp_path):
    """Kill-and-replay for the bounded-state Misra-Gries operator:
    process half the files, STOP, restart from the SAME checkpoint with
    the rest. n_seen is an exact per-bucket row count carried in state —
    after the restart the final emission's n_seen must equal the FULL
    per-bucket truth (state lost at the kill would count run-2 rows
    only), and the MG containment/undercount guarantees must hold vs
    exact batch counts over ALL events."""
    from timedf_spark.streaming.heavy_hitters import heavy_hitters_state

    capacity, n_buckets = 4, 2
    events = load_table(spark, sf_dir, "events").select(
        "ts", F.col("user_id").cast("string").alias("user_key")
    )
    d = str(tmp_path)
    src = os.path.join(d, "events")
    ckpt = os.path.join(d, "ckpt")
    out = os.path.join(d, "out")
    lo, hi = events.agg(F.min("ts").cast("long"), F.max("ts").cast("long")).first()
    n_chunks, split = 4, 2
    step = (hi - lo) // n_chunks + 1

    def write_chunk(i):
        events.filter(
            (F.col("ts").cast("long") >= lo + i * step)
            & (F.col("ts").cast("long") < lo + (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    def run(name: str) -> None:
        # memory sink can't recover from a checkpoint; foreachBatch →
        # append-parquet can, and keeps every emission for inspection
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            heavy_hitters_state(stream, "user_key", capacity, n_buckets)
            .writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for i in range(split):
        write_chunk(i)
    run("hh_restart_1")  # run 1 ends = the kill
    for i in range(split, n_chunks):
        write_chunk(i)
    run("hh_restart_2")  # restart from the same checkpoint
    rows = spark.read.parquet(out).collect()
    assert rows, "no emissions after restart"

    truth = {
        (r["bucket"], r["key"]): r["true_cnt"]
        for r in events.select(
            F.col("user_key").alias("key"),
            F.pmod(F.xxhash64("user_key"), F.lit(n_buckets)).alias("bucket"),
        )
        .groupBy("bucket", "key")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .collect()
    }
    bucket_totals = {}
    for (b, _), c in truth.items():
        bucket_totals[b] = bucket_totals.get(b, 0) + c

    # final run-2 emission per bucket = largest n_seen
    final_n = {}
    for r in rows:
        final_n[r["bucket"]] = max(final_n.get(r["bucket"], 0), r["n_seen"])
    summary = {
        (r["bucket"], r["key"]): r
        for r in rows
        if r["n_seen"] == final_n[r["bucket"]]
    }
    # the restart proof: cumulative exact row count per bucket survived
    for b, n in final_n.items():
        assert n == bucket_totals[b], (
            f"bucket {b}: n_seen {n} != full truth {bucket_totals[b]} — "
            "state lost across restart"
        )
    # Misra-Gries guarantees vs ALL events
    for (b, k), r in summary.items():
        true = truth[(b, k)]
        assert r["count_est"] <= true <= r["count_est"] + r["decrements"], (b, k)
    for (b, k), true in truth.items():
        if true > bucket_totals[b] / (capacity + 1):
            assert (b, k) in summary, f"true-heavy key missing: {(b, k)}"
