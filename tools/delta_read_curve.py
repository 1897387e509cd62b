"""Delta-assignment READ amplification curve (VERDICT r10 item 5).

The r10 delta-assignment protocol (streaming/cluster_apply.py) removed the
per-batch O(store) WRITE: a fold publishes only its delta, and
``read_assignments`` resolves latest-version-wins over base + up to
``_COMPACT_EVERY - 1`` deltas. The write win is measured
(SCALE_SHAKEOUT.json store_growth_*); this tool measures the READ side as
deltas accumulate between compactions — the cost a downstream consumer
(keeper selection, membership pulls) pays for the write savings.

Protocol: seed a store-growth-sized assignment store (5M vertices — the
1000x decade's document grain), fold K small edge batches (500 edges each,
delta ~1k rows — the incremental_near_dup grain), and time a full
``read_assignments`` materialization (noop sink) at k = 0 / 4 / 8 / 15
accumulated deltas, 3 reps each, median.  k=0 is the pure-snapshot read
(also the post-compaction read); k=15 is the worst case under the default
``_COMPACT_EVERY=16``.

Merges a "delta_read_amplification" section into SCALE_SHAKEOUT.json.

Usage: python tools/delta_read_curve.py [N_VERTICES]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timedf_spark.session import get_spark  # noqa: E402
from timedf_spark.streaming import cluster_apply as ca  # noqa: E402

EDGES_PER_BATCH = 500
READ_REPS = 3
CHECKPOINTS = (0, 4, 8, 15)  # deltas accumulated when we time the read


def _timed_read(spark, path: str) -> float:
    t0 = time.perf_counter()
    ca.read_assignments(spark, path).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    spark = get_spark(app_name="delta_read_curve")
    sc = spark.sparkContext
    out: dict[str, dict] = {}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "assign")
        sc.setJobDescription("delta_read_curve: seed")
        base = spark.range(n).select(
            F.col("id").alias("vertex"), F.col("id").alias("component")
        )
        t0 = time.perf_counter()
        ca.seed_assignments(base, path)
        seed_sec = time.perf_counter() - t0
        fold_secs: list[float] = []
        batch_id = 0
        for k in CHECKPOINTS:
            while batch_id < k:
                # 500 disjoint (x, x+1) edges inside a per-batch slice:
                # the delta stays ~1k relabelled rows, the grain an
                # incremental_near_dup batch actually produces
                lo = batch_id * 10_000
                edges = spark.range(lo, lo + EDGES_PER_BATCH).select(
                    (F.col("id") * 2).alias("src"),
                    (F.col("id") * 2 + 1).alias("dst"),
                )
                sc.setJobDescription(f"delta_read_curve: fold v={batch_id}")
                t0 = time.perf_counter()
                ca.fold_edges_delta(spark, path, batch_id, edges)
                fold_secs.append(time.perf_counter() - t0)
                batch_id += 1
            sc.setJobDescription(f"delta_read_curve: read @k={k}")
            reps = [_timed_read(spark, path) for _ in range(READ_REPS)]
            out[f"k={k}"] = {
                "read_median_sec": round(statistics.median(reps), 3),
                "read_max_sec": round(max(reps), 3),
            }
            print(f"k={k}", out[f"k={k}"], flush=True)
    k0 = out["k=0"]["read_median_sec"]
    k15 = out["k=15"]["read_median_sec"]
    row = {
        "n_vertices": n,
        "edges_per_batch": EDGES_PER_BATCH,
        "compact_every": ca._COMPACT_EVERY,
        "reads": out,
        "fold_median_sec": round(statistics.median(fold_secs), 3),
        "seed_sec": round(seed_sec, 3),
        "amplification_k15_over_k0": round(k15 / max(k0, 1e-3), 2),
        "conf": "5M-vertex store (the 1000x decade's document grain); "
        "500-edge folds (~1k-row deltas); read = full read_assignments "
        "materialization to the noop sink, median of 3",
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SHAKEOUT.json",
    )
    try:
        with open(out_path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    merged["delta_read_amplification"] = row
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(row, indent=1))


if __name__ == "__main__":
    main()
