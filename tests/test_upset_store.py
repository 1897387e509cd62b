"""Streaming engagement-mask store: batch-twin equality, OR idempotence."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from timedf_spark.queries.round14 import _TYPE_BITS
from timedf_spark.sources import load_table
from timedf_spark.streaming import upset_store as us
from timedf_spark.streaming.cdc_apply import _current_version


def test_streaming_upset_store_equals_batch_recompute(spark, sf_dir, tmp_path):
    """Replaying events through the sink must publish exactly the
    masks one batch aggregation produces, and re-merging ANY batch —
    even a DIFFERENT subset under an old id — must not change the
    store (OR idempotence, stronger than the rollup's guard)."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    store = str(tmp_path / "upset_store")
    us.seed_upset_store(spark, store)

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "events")
        ev.repartition(3).write.parquet(src)
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            us.upset_sink(stream, store, _TYPE_BITS, os.path.join(d, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    got = {r["user_id"]: r["mask"] for r in us.read_upset(spark, store).collect()}
    want = {
        r["user_id"]: r["mask"]
        for r in us.batch_masks(ev, _TYPE_BITS).collect()
    }
    assert got == want

    # Redelivery of an already-applied version: no-op by guard.
    v = _current_version(store)
    us.apply_upset_batch(ev.limit(100), v, store, _TYPE_BITS)
    assert _current_version(store) == v
    # Re-merging already-seen rows under a NEW version: unchanged masks
    # (idempotence of OR — the property the module docstring claims).
    us.apply_upset_batch(ev.limit(100), v + 1, store, _TYPE_BITS)
    after = {r["user_id"]: r["mask"] for r in us.read_upset(spark, store).collect()}
    assert after == got


def test_batch_masks_matches_census_query(spark, sf_dir):
    """The store's per-user masks aggregate to the same census as the
    oracle-checked engagement_upset query."""
    from timedf_spark.queries.round14 import engagement_upset

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    census = (
        us.batch_masks(ev, _TYPE_BITS)
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .collect()
    )
    got = {r["mask"]: r["n_users"] for r in census}
    want = {
        r["mask"]: r["n_users"] for r in engagement_upset(spark, sf_dir).collect()
    }
    assert got == want
