"""Quantitative evidence for the no-oracle queries (VERDICT r03 item 7).

Twelve registry entries are approximate or trained by construction — ANN
tiers, HLL cardinalities, tree/linear model training, BPE, multimodal
plumbing — so the driver's gate records only a rows-only check for them,
while the *real* evidence (recall vs brute force, tolerance vs exact,
held-out metrics, determinism invariants) lives in pytest. This module
computes that evidence as one compact ``{query: {metric, value, bound,
ok}}`` block that bench.py appends to its stdout tail, so each round's
driver record carries the quantitative story, not just row counts.

Every metric here is the SAME contract its pytest twin pins (bounds
match the test assertions); the bench run just re-measures it at the
bench scale factor. Each entry is individually exception-guarded — a
failed metric reports ``{"error": ...}`` rather than sinking the block.
"""

from __future__ import annotations

import math
from typing import Any, Callable

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

__all__ = ["collect_evidence"]


def _pairs(df) -> set:
    return {(r[0], r[1]) for r in df.select(df.columns[0], df.columns[1]).collect()}


def _recall(exact: set, approx: set) -> float:
    return round(len(exact & approx) / max(1, len(exact)), 4)


def collect_evidence(spark: SparkSession, sf_dir: str) -> dict[str, dict[str, Any]]:
    from timedf_spark.operators import bpe, quality_model as qm, similarity
    from timedf_spark.queries import all_queries
    from timedf_spark.sources import fan_out, load_table

    qs = all_queries()
    out: dict[str, dict[str, Any]] = {}

    def guard(name: str, fn: Callable[[], dict[str, Any]]) -> None:
        try:
            e = fn()
            bound, value = e.get("bound"), e.get("value")
            if isinstance(bound, (int, float)) and isinstance(value, (int, float)):
                e["ok"] = bool(
                    value >= bound if e.get("dir", "ge") == "ge" else value <= bound
                )
            out[name] = e
        except Exception as exc:  # noqa: BLE001 — evidence must not sink bench
            out[name] = {"error": repr(exc)[:120]}

    # --- ANN tiers: recall@k vs the exact brute-force baseline ------------
    exact = _pairs(similarity.brute_force_topk(spark, sf_dir))
    guard("ann_lsh_topk", lambda: {
        "metric": "recall_at_10_vs_brute",
        "value": _recall(exact, _pairs(similarity.lsh_topk(spark, sf_dir))),
        "bound": 0.6,
        # measured probe-radius frontier at sf0.1 (recall@10, median sec):
        # the fan-out is broadcast-query-side only, so latency grows far
        # slower than probe count (r0: 1+0 probes, r1: +8/table, r2:
        # +28/table). r2 is the default operating point.
        "frontier": {"r0": [0.17, 1.12], "r1": [0.42, 1.22],
                     "r2": [0.85, 2.36]},
    })
    guard("ann_ivf_topk", lambda: {
        "metric": "recall_at_10_vs_brute",
        "value": _recall(exact, _pairs(similarity.ivf_topk(spark, sf_dir))),
        "bound": 0.7,
        # measured (cells, nprobe) frontier at sf0.1 (recall@10, median
        # sec) — VERDICT r06 item 4; (48, 16) is the default:
        "frontier": {"c32p6": [0.61, 1.22], "c32p12": [0.77, 1.22],
                     "c48p16": [0.83, 1.16], "c64p24": [0.82, 1.16]},
    })
    guard("ann_ivfpq_topk", lambda: {
        "metric": "recall_at_10_vs_brute",
        "value": _recall(exact, _pairs(similarity.ivfpq_topk(spark, sf_dir))),
        "bound": 0.75,
        # rerank-window frontier at sf0.1, cells=48/nprobe=16 (recall@10,
        # median sec); rerank×k exact fetches per query, corpus-size-
        # independent. PQ recall is rerank-bound, not probe-bound
        # (nprobe 8 vs 16 changed nothing at rerank 4). rerank=16 default
        # (VERDICT r07 item 5): +5% latency buys the IVF ceiling:
        "frontier": {"rr4": [0.67, 1.85], "rr8": [0.73, 1.9],
                     "rr16": [0.82, 1.99]},
    })
    exact_filtered = _pairs(
        similarity.brute_force_topk(spark, sf_dir, corpus_filter="label = 3")
    )
    guard("ann_ivf_filtered", lambda: {
        "metric": "recall_at_10_vs_filtered_brute",
        "value": _recall(
            exact_filtered,
            _pairs(
                similarity.ivf_topk(
                    spark, sf_dir, corpus_filter="label = 3", probe_boost=3
                )
            ),
        ),
        "bound": 0.5,
    })

    # --- semantic-dedup degree cap: recall of the bounded pair generator --
    # The cap (VERDICT r05 item 4) keeps one dense SRP bucket from going
    # quadratic; this row measures what it costs — pair-level recall vs
    # the uncapped tier AND keeper-set agreement (the downstream artifact
    # component clustering actually consumes).
    def _dedup_cap_recall() -> dict[str, Any]:
        from timedf_spark.operators.cluster import connected_components

        full = similarity.cosine_dedup_pairs(spark, sf_dir)
        capped = similarity.cosine_dedup_pairs(spark, sf_dir, max_degree=8)
        p_full, p_cap = _pairs(full), _pairs(capped)

        def _keepers(pairs_df):
            comp = connected_components(
                None, pairs_df.select("id_a", "id_b")
            )
            return {
                r[0]
                for r in comp.groupBy("component")
                .agg(F.min("vertex").alias("keep"))
                .collect()
            }

        k_full, k_cap = _keepers(full), _keepers(capped)
        k_agree = round(
            len(k_full & k_cap) / max(1, len(k_full | k_cap)), 4
        )
        return {"metric": "pair_recall_vs_uncapped_at_degree8",
                "value": _recall(p_full, p_cap), "bound": 0.85,
                "keeper_jaccard": k_agree,
                "pairs_uncapped": len(p_full), "pairs_capped": len(p_cap)}

    guard("semantic_dedup_capped", _dedup_cap_recall)

    # --- HLL cardinalities: max relative error vs the exact counts --------
    def _cardinalities() -> dict[str, Any]:
        ex = qs["column_cardinalities"].fn(spark, sf_dir).first()
        ap = qs["approx_cardinalities"].fn(spark, sf_dir).first()
        err = max(
            abs(ap[c] - ex[c]) / max(1, ex[c]) for c in ex.asDict()
        )
        return {"metric": "max_rel_error_vs_exact", "value": round(err, 4),
                "bound": 0.05, "dir": "le"}

    guard("approx_cardinalities", _cardinalities)

    # --- trained quality classifier: held-out accuracy --------------------
    def _quality() -> dict[str, Any]:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
        featured = qm.classifier_features(docs).cache()
        theta = qm.train_quality_classifier(featured.filter("doc_id % 5 < 4"))
        held = qm.score_documents(featured.filter("doc_id % 5 = 4"), theta)
        r = held.select(
            F.avg(
                (
                    (F.col("quality_prob") > 0.5)
                    == (F.col("quality_score") >= F.lit(0.58))
                ).cast("double")
            ).alias("acc")
        ).first()
        featured.unpersist()
        return {"metric": "heldout_accuracy", "value": round(float(r["acc"]), 4),
                "bound": 0.9}

    guard("quality_classifier", _quality)

    # --- tree trainers: their own summary rows carry the metric -----------
    def _gbt() -> dict[str, Any]:
        # the query's own summary row carries both the model RMSE and the
        # constant-mean baseline (stddev_pop of the target on the same
        # test rows) — the model must beat predicting the mean
        row = qs["gbt_taxi_train"].fn(spark, sf_dir).first()
        return {"metric": "rmse_over_constant_baseline",
                "value": round(float(row["rmse"]) / float(row["baseline_rmse"]), 4),
                "bound": 1.0, "dir": "le"}

    guard("gbt_taxi_train", _gbt)

    def _forest() -> dict[str, Any]:
        row = qs["plasticc_forest_train"].fn(spark, sf_dir).first()
        return {"metric": "weighted_logloss_vs_uniform_ln4",
                "value": round(float(row["logloss"]), 4),
                "bound": round(math.log(4), 4), "dir": "le"}

    guard("plasticc_forest_train", _forest)

    # --- BPE: trained-state determinism + end-to-end encode volume --------
    def _bpe_vocab() -> dict[str, Any]:
        docs = fan_out(load_table(spark, sf_dir, "documents"))
        m1 = bpe.train_bpe(docs, n_merges=50)
        m2 = bpe.train_bpe(docs.repartition(7), n_merges=50)
        return {"metric": "merge_table_partition_invariant",
                "value": 1.0 if m1 == m2 else 0.0, "bound": 1.0,
                "n_merges": len(m1)}

    guard("bpe_vocab", _bpe_vocab)

    def _bpe_counts() -> dict[str, Any]:
        total = (
            qs["bpe_token_counts"].fn(spark, sf_dir)
            .agg(F.sum("total")).first()[0]
        )
        return {"metric": "top20_token_occurrences", "value": int(total),
                "bound": 1}

    guard("bpe_token_counts", _bpe_counts)

    # --- multimodal plumbing: every input row produces typed features -----
    def _multimodal() -> dict[str, Any]:
        feats = qs["multimodal_features"].fn(spark, sf_dir)
        r = feats.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("entropy").isNull().cast("int")).alias("null_entropy"),
        ).first()
        return {"metric": "rows_with_nonnull_features",
                "value": int(r["n"] - r["null_entropy"]), "bound": 1,
                "rows": int(r["n"])}

    guard("multimodal_features", _multimodal)

    # --- streaming end-to-end latency: median foreachBatch wall-time ------
    # The equivalence tests pin WHAT the streaming loops compute; these
    # numbers pin HOW FAST a micro-batch clears them. Timing wraps the
    # foreachBatch body itself (apply_*_batch) — the part that scales with
    # data; Structured Streaming's trigger overhead is engine-constant.
    # Bounds are sanity ceilings, not targets.
    def _streaming_ingest_latency() -> dict[str, Any]:
        import statistics
        import tempfile
        import time

        from timedf_spark.streaming import ingest_dedup as idd

        docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_batches = 4
        with tempfile.TemporaryDirectory() as d:
            corpus = f"{d}/corpus"
            assign = f"{d}/assign"
            sig = f"{d}/sig"
            shingle = f"{d}/shingle"
            idd.seed_empty_assignments(spark, assign)
            lat = []
            for b in range(n_batches):
                part = docs.filter(F.col("doc_id") % n_batches == b)
                t0 = time.perf_counter()
                idd.apply_ingest_batch(
                    part, b, corpus, assign,
                    sig_path=sig, shingle_path=shingle,
                )
                lat.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
        return {"metric": "median_batch_sec_ingest_dedup_with_sig_index",
                "value": round(statistics.median(lat), 3), "bound": 30.0,
                "dir": "le", "batches": n_batches,
                "max_batch_sec": round(max(lat), 3)}

    guard("streaming_ingest_dedup", _streaming_ingest_latency)

    def _streaming_rollup_latency() -> dict[str, Any]:
        import statistics
        import tempfile
        import time

        from timedf_spark.streaming import rollup_apply as ra

        fact = load_table(spark, sf_dir, "orders").select(
            F.col("o_orderdate").alias("day"), "o_totalprice"
        )
        n_batches = 5
        with tempfile.TemporaryDirectory() as d:
            store = f"{d}/rollup"
            ra.seed_rollup_store(spark, store, "day timestamp")
            lat = []
            for b in range(n_batches):
                part = fact.filter(F.col("o_totalprice").cast("long") % n_batches == b)
                t0 = time.perf_counter()
                ra.apply_rollup_batch(
                    part, b, store, ["day"], "day timestamp", "o_totalprice"
                )
                lat.append(time.perf_counter() - t0)
        return {"metric": "median_batch_sec_exact_rollup_maintenance",
                "value": round(statistics.median(lat), 3), "bound": 10.0,
                "dir": "le", "batches": n_batches,
                "max_batch_sec": round(max(lat), 3)}

    guard("streaming_rollup", _streaming_rollup_latency)

    def _streaming_upset_latency() -> dict[str, Any]:
        import statistics
        import tempfile
        import time

        from timedf_spark.queries.round14 import _TYPE_BITS
        from timedf_spark.streaming import upset_store as us

        ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
        n_batches = 5
        with tempfile.TemporaryDirectory() as d:
            store = f"{d}/upset"
            us.seed_upset_store(spark, store)
            lat = []
            for b in range(n_batches):
                part = ev.filter(F.col("user_id") % n_batches == b)
                t0 = time.perf_counter()
                us.apply_upset_batch(part, b, store, _TYPE_BITS)
                lat.append(time.perf_counter() - t0)
        return {"metric": "median_batch_sec_upset_mask_maintenance",
                "value": round(statistics.median(lat), 3), "bound": 10.0,
                "dir": "le", "batches": n_batches,
                "max_batch_sec": round(max(lat), 3)}

    guard("streaming_upset", _streaming_upset_latency)

    def _streaming_drift_latency() -> dict[str, Any]:
        import statistics
        import tempfile
        import time

        from timedf_spark.streaming import drift_monitor as dmon

        orders = load_table(spark, sf_dir, "orders")
        bucketed = orders.select(
            F.expr("cast(floor(o_totalprice * 100) AS BIGINT) DIV 5000000").alias(
                "bucket"
            ),
            (F.expr("o_orderkey % 5")).alias("_b"),
        )
        ref = bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
        n_batches = 5
        with tempfile.TemporaryDirectory() as d:
            store = f"{d}/drift"
            dmon.seed_drift_monitor(spark, store, ref)
            lat = []
            for b in range(n_batches):
                part = bucketed.where(F.col("_b") == b).select("bucket")
                t0 = time.perf_counter()
                dmon.apply_drift_batch(part, b, store, )
                lat.append(time.perf_counter() - t0)
        return {"metric": "median_batch_sec_tvd_drift_monitor",
                "value": round(statistics.median(lat), 3), "bound": 10.0,
                "dir": "le", "batches": n_batches,
                "max_batch_sec": round(max(lat), 3)}

    guard("streaming_drift", _streaming_drift_latency)

    def _zorder_pruning() -> dict[str, Any]:
        """Measured file-skipping benefit of the z-ordered layout: the
        fraction of parquet files whose footer min/max admit a selective
        2-D box predicate, z-ordered vs plain write of the SAME rows
        into the SAME file count. Footer stats are what any engine's
        scan pruning consumes, so this is engine-neutral evidence."""
        import glob
        import tempfile

        import pyarrow.parquet as pq

        from timedf_spark.sources.zorder import write_zordered

        li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
        n_files = 16
        # selective box: ~1/8 of each dimension
        box = {"l_partkey": (0, 2500), "l_suppkey": (0, 125)}

        def admitted(path: str) -> int:
            n = 0
            for f in glob.glob(f"{path}/part-*.parquet"):
                md = pq.ParquetFile(f).metadata
                hit = True
                for ci in range(md.num_columns):
                    col = md.row_group(0).column(ci)
                    name = col.path_in_schema
                    if name in box:
                        lo, hi = box[name]
                        # across ALL row groups of the file
                        mn = min(md.row_group(g).column(ci).statistics.min
                                 for g in range(md.num_row_groups))
                        mx = max(md.row_group(g).column(ci).statistics.max
                                 for g in range(md.num_row_groups))
                        if mx < lo or mn > hi:
                            hit = False
                n += 1 if hit else 0
            return n

        with tempfile.TemporaryDirectory() as d:
            write_zordered(li, f"{d}/z", ["l_partkey", "l_suppkey"], n_files=n_files)
            li.repartition(n_files).write.mode("overwrite").parquet(f"{d}/plain")
            az, ap = admitted(f"{d}/z"), admitted(f"{d}/plain")
        return {"metric": "files_admitted_zorder_vs_plain",
                "value": az, "plain": ap, "n_files": n_files,
                "bound": ap, "dir": "le"}

    guard("zorder_pruning", _zorder_pruning)

    return out


if __name__ == "__main__":
    import json
    import os
    import sys

    from timedf_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    print(json.dumps({"evidence": collect_evidence(get_spark(), sf)}))
