"""Store-growth shakeout (VERDICT r09 item 3): for each streaming ingest
store, measure the per-batch PROBE median against a standing store seeded
at 1x (sf0.1) vs Nx (a tools/gen_scale.py corpus) — same fixed-size probe
batches on both sides, so the ratio isolates the store-size term of the
batch cost. The 100 TB promise under test: "the corpus is
bucketed/fingerprinted exactly once — an arriving batch's cost is
governed by the BATCH, with the standing store contributing only its
(bounded) index rows to one equi-join". Exponent log(tN/t1)/log(N) ≈ 0
is a flat probe; a value near 1 would mean each batch re-pays the
corpus.

Stores covered (the ingest trio):
  - ingest_dedup   (MinHash band + shingle index, document grain)
  - substring      (anchor-sampled k-gram fingerprint index)
  - semantic       (SRP signature store, vector grain)

Seeding uses each store's OWN batch path (batch 0 = the whole corpus),
so the standing state is byte-identical to what a real stream would have
accumulated; seed time is reported separately (one-time build, not the
serving metric).

Usage: python tools/store_growth_shakeout.py [NX_DIR] [FACTOR]
       (defaults: /tmp/scale100x  100)
Merges a "store_growth_{N}x" section into SCALE_SHAKEOUT.json.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timedf_spark.session import get_spark  # noqa: E402
from timedf_spark.sources import load_table  # noqa: E402

N_PROBE_BATCHES = 4
DOC_BATCH = 500  # docs per probe batch (fixed on both sides)
VEC_BATCH = 500
ID_SHIFT = 10**12  # probe ids never collide with seed corpus ids


def _probe_doc_batches(spark, base_dir):
    docs = load_table(spark, base_dir, "documents").select(
        (F.col("doc_id") + ID_SHIFT).alias("doc_id"), "text"
    )
    return [
        docs.filter(F.col("doc_id") % 10 == b).limit(DOC_BATCH).localCheckpoint()
        for b in range(N_PROBE_BATCHES)
    ]


def _probe_vec_batches(spark, base_dir):
    vecs = load_table(spark, base_dir, "embeddings").select(
        (F.col("vec_id") + ID_SHIFT).alias("vec_id"), "embedding"
    )
    return [
        vecs.filter(F.col("vec_id") % 4 == b).limit(VEC_BATCH).localCheckpoint()
        for b in range(N_PROBE_BATCHES)
    ]


def _run_ingest_dedup(spark, corpus_dir: str, batches) -> dict:
    from timedf_spark.streaming import ingest_dedup as idd

    seed = load_table(spark, corpus_dir, "documents").select("doc_id", "text")
    with tempfile.TemporaryDirectory() as d:
        corpus, assign = f"{d}/corpus", f"{d}/assign"
        sig, shingle = f"{d}/sig", f"{d}/shingle"
        idd.seed_empty_assignments(spark, assign)
        t0 = time.perf_counter()
        idd.apply_ingest_batch(
            seed, 0, corpus, assign, sig_path=sig, shingle_path=shingle
        )
        seed_sec = time.perf_counter() - t0
        lat = []
        for b, part in enumerate(batches, start=1):
            t0 = time.perf_counter()
            idd.apply_ingest_batch(
                part, b, corpus, assign, sig_path=sig, shingle_path=shingle
            )
            lat.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    return {
        "seed_sec": round(seed_sec, 2),
        "batch_median_sec": round(statistics.median(lat), 3),
        "batch_max_sec": round(max(lat), 3),
    }


def _run_substring(spark, corpus_dir: str, batches) -> dict:
    from timedf_spark.streaming import substring_ingest as ssi

    seed = load_table(spark, corpus_dir, "documents").select("doc_id", "text")
    with tempfile.TemporaryDirectory() as d:
        fp, pairs = f"{d}/fp", f"{d}/pairs"
        t0 = time.perf_counter()
        ssi.apply_substring_batch(seed, 0, fp, pairs)
        seed_sec = time.perf_counter() - t0
        lat = []
        for b, part in enumerate(batches, start=1):
            t0 = time.perf_counter()
            ssi.apply_substring_batch(part, b, fp, pairs)
            lat.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    return {
        "seed_sec": round(seed_sec, 2),
        "batch_median_sec": round(statistics.median(lat), 3),
        "batch_max_sec": round(max(lat), 3),
    }


# LSH sizing for the semantic store (r10): SRP blocking is selective only
# while per-bucket occupancy N / 2**bits stays small — at the default
# (bits=8, 256 buckets/table) a 2M-vector store piles ~7.8k vectors into
# every bucket and candidate volume grows LINEARLY with the corpus (the
# measured 0.53 exponent). Scale rule: bits ~ log2(N / target_occupancy);
# recall lost to the narrower per-table collision probability is bought
# back with more tables (1 - (1 - p**bits)**n_tables). These values size
# for the 2M-vector decade at ~120 occupancy; both sides of the A/B run
# the SAME params (cold-Nx protocol). The sf0.1 oracle-checked queries
# keep (8, 4) — their semantics are pinned cross-engine.
SEM_BITS = int(os.environ.get("STORE_GROWTH_SEM_BITS", "14"))
SEM_TABLES = int(os.environ.get("STORE_GROWTH_SEM_TABLES", "8"))


def _run_semantic(spark, corpus_dir: str, batches) -> dict:
    from timedf_spark.streaming import semantic_ingest as smi

    seed = load_table(spark, corpus_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    with tempfile.TemporaryDirectory() as d:
        store, pairs = f"{d}/store", f"{d}/pairs"
        t0 = time.perf_counter()
        # degree-capped seed: the uncapped batch-internal pair set over a
        # dense Nx corpus is the known quadratic tier — the store rows
        # (signatures) are identical either way
        smi.apply_semantic_batch(
            seed, 0, store, pairs, bits=SEM_BITS, n_tables=SEM_TABLES,
            max_degree=8,
        )
        seed_sec = time.perf_counter() - t0
        lat = []
        for b, part in enumerate(batches, start=1):
            t0 = time.perf_counter()
            smi.apply_semantic_batch(
                part, b, store, pairs, bits=SEM_BITS, n_tables=SEM_TABLES,
                max_degree=8,
            )
            lat.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    return {
        "seed_sec": round(seed_sec, 2),
        "batch_median_sec": round(statistics.median(lat), 3),
        "batch_max_sec": round(max(lat), 3),
    }


def main() -> None:
    nx_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale100x"
    factor = float(sys.argv[2]) if len(sys.argv) > 2 else 100.0
    base_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="store_growth_shakeout",
        extra_conf={
            "spark.cleaner.periodicGC.interval": "30s",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=2g",
            "spark.network.timeout": "600s",
            "spark.executor.heartbeatInterval": "60s",
        },
    )
    runners = {
        "streaming_ingest_dedup": (_run_ingest_dedup, _probe_doc_batches),
        "streaming_substring_ingest": (_run_substring, _probe_doc_batches),
        "streaming_semantic_ingest": (_run_semantic, _probe_vec_batches),
    }
    sel = os.environ.get("STORE_GROWTH_STORES")
    if sel:
        keep = {s.strip() for s in sel.split(",")}
        runners = {k: v for k, v in runners.items() if k in keep}
    out: dict[str, dict] = {}
    for name, (runner, mk_batches) in runners.items():
        try:
            batches = mk_batches(spark, base_dir)
            r1 = runner(spark, base_dir, batches)
            rn = runner(spark, nx_dir, batches)
            exp = round(
                math.log(
                    max(rn["batch_median_sec"], 1e-3)
                    / max(r1["batch_median_sec"], 1e-3)
                )
                / math.log(factor),
                2,
            )
            out[name] = {
                "store_1x": r1,
                f"store_{int(factor)}x": rn,
                "batch_exponent": exp,
                "conf": "fixed probe batches (4x500 rows) on both sides; "
                "seed = whole corpus as batch 0 via the store's own path",
            }
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": repr(exc)[:200]}
        print(name, out[name], flush=True)
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SHAKEOUT.json",
    )
    try:
        with open(out_path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    key = f"store_growth_{int(factor)}x"
    merged[f"nx_dir_store_growth_{int(factor)}x"] = nx_dir
    merged.setdefault(key, {}).update(out)
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps({key: out}))


if __name__ == "__main__":
    main()
