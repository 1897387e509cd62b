"""Round-20: A/B report and seasonal outliers — independent checks."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from timedf_spark.queries.round20 import ab_test_report, seasonal_outliers
from timedf_spark.sources import load_table


def test_ab_assignment_matches_python_md5(spark, sf_dir):
    """Recompute the bucket assignment and conversion report in Python
    from raw events — including the md5-prefix lane."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    conv: dict = {}
    for r in rows:
        conv[r["user_id"]] = conv.get(r["user_id"], 0) or (
            1 if r["event_type"] == "purchase" else 0
        )
    buckets: dict = {}
    for uid, c in conv.items():
        h = int(hashlib.md5(f"exp7|{uid}".encode()).hexdigest()[:15], 16) % 2
        n, k = buckets.get(h, (0, 0))
        buckets[h] = (n + 1, k + c)
    expect = {
        b: (n, k, k * 10_000 // n) for b, (n, k) in buckets.items()
    }
    got = {
        r["bucket"]: (r["n_users"], r["n_converters"], r["conv_bp"])
        for r in ab_test_report(spark, sf_dir).collect()
    }
    assert got == expect
    assert set(got) == {0, 1}


def test_seasonal_outliers_z2_property(spark, sf_dir):
    """Every reported row's z2 must match the integer formula
    recomputed from the full (type, hour) cell stats."""
    base = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "event_type", F.hour("ts").alias("hour"), "value")
        .collect()
    )
    cells: dict = {}
    vq = {}
    for r in base:
        v = int(r["value"] // 1)
        vq[r["event_id"]] = (r["event_type"], r["hour"], v)
        n, s, q = cells.get((r["event_type"], r["hour"]), (0, 0, 0))
        cells[(r["event_type"], r["hour"])] = (n + 1, s + v, q + v * v)
    rows = seasonal_outliers(spark, sf_dir).collect()
    assert rows
    prev = None
    for r in rows:
        et, hour, v = vq[r["event_id"]]
        assert (et, hour, v) == (r["event_type"], r["hour"], r["v_q"])
        n, s, q = cells[(et, hour)]
        den = max((n * q - s * s) // 10_000, 1)
        num = n * (n * v - s) * (n * v - s)
        assert r["z2_scaled"] == num // den  # num, den >= 0: trunc == floor
        if prev is not None:
            assert r["z2_scaled"] <= prev
        prev = r["z2_scaled"]
