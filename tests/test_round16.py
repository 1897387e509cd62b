"""Round-16: conversion latency — independent Python recomputation."""

from __future__ import annotations

from timedf_spark.queries.round16 import conversion_latency
from timedf_spark.sources import load_table


def test_conversion_latency_python_recomputation(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .collect()
    )
    per: dict = {}
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        c, p, n = per.get(r["user_id"], (None, None, 0))
        if r["event_type"] == "click":
            c = us if c is None else min(c, us)
        elif r["event_type"] == "purchase":
            p = us if p is None else min(p, us)
        per[r["user_id"]] = (c, p, n + 1)
    cohorts: dict = {}
    for c, p, n in per.values():
        if c is None or p is None or p <= c:
            continue
        lat = (p - c) // 1_000_000  # positive: trunc == floor
        key = (
            "ge128" if n >= 128 else "64to127" if n >= 64 else
            "32to63" if n >= 32 else "lt32"
        )
        cohorts.setdefault(key, []).append(lat)
    expect = {}
    for key, lats in cohorts.items():
        lats.sort()
        t = len(lats)
        med = next(x for i, x in enumerate(lats) if 2 * (i + 1) >= t)
        p90 = next(x for i, x in enumerate(lats) if 10 * (i + 1) >= 9 * t)
        expect[key] = (t, med, p90, lats[0], lats[-1])
    got = {
        r["cohort"]: (
            r["n_converters"], r["median_lat_s"], r["p90_lat_s"],
            r["min_lat_s"], r["max_lat_s"],
        )
        for r in conversion_latency(spark, sf_dir).collect()
    }
    assert got == expect
