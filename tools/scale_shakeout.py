"""Scale shakeout (VERDICT r04 item 2): measure the headline extension
tier at sf0.1 (1x) vs a generated N-x dataset (tools/gen_scale.py) and
report per-query wall-times plus the observed scaling exponent
``log(tN/t1) / log(N)`` — ~1.0 is linear, values well above the query's
documented complexity flag a scale bug.

Usage: python tools/scale_shakeout.py [NX_DIR] [FACTOR]
       (defaults: /tmp/scale10x  10)

Prints one JSON line and writes SCALE_SHAKEOUT.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timedf_spark.queries import all_queries  # noqa: E402
from timedf_spark.session import get_spark  # noqa: E402
from timedf_spark.sources import trigger  # noqa: E402

# The tier that carries the 100 TB claims (VERDICT r04 names the first
# seven; the rest are round-5 additions that fit the same lens).
QUERIES = [
    "dedup_ngram_jaccard",
    "dedup_jaccard_prefix",
    "dedup_minhash_lsh",
    "incremental_dedup_clusters",
    "curate_corpus",
    "ann_ivf_topk",
    "context_pack",
    "dedup_exact",
    "semantic_dedup_keepers",
    "charlm_score",
    "mg_token_summary",
    "equidepth_prices",
    # events tier (windows / sessions / temporal joins)
    "sessionize",
    "session_paths",
    "markov_transitions",
    "first_touch_attribution",
    "purchase_state_lookup",
    "overlapping_sessions",
    "rolling_median_value",
    "interpolate_hourly",
    # round-9 tier (retrieval / selection / clustering / sketches)
    "bm25_search",
    "dsir_importance",
    "vocab_growth",
    "kmeans_assign",
    "cluster_balanced_sample",
    "cms_term_estimates",
    # round-11 tier (planner stats / link analysis / skyline / series)
    "join_size_report",
    "supplier_affinity_links",
    "part_skyline",
    "ewma_user_trend",
    "cusum_changepoint",
    "rank_fusion_customers",
    # round-12/13 tier (graph iteration / profiling / audits)
    "supplier_communities",
    "supply_reach",
    "acf_daily",
    "fd_profile",
    "benford_prices",
    "loo_segment_outliers",
    "bot_cadence_audit",
    # round-14..18 tier (censuses / medians / wavelets / drift / RFM)
    "engagement_upset",
    "weighted_median_price",
    "haar_energy",
    "layout_advisor",
    "nation_spend_gini",
    "rfm_segments",
    "conversion_latency",
    "readability_by_source",
    "price_drift_tvd",
    "stickiness_dau_wau",
    "join_size_sketch",
    "ab_test_report",
    "seasonal_outliers",
    "funnel_deadline",
    # round-6: the iterative graph tier (VERDICT r05 item 2 — the
    # planner-blowup bug class lived here; every top-10-cost iterative
    # query gets the 10x treatment)
    "nation_seed_ppr",
    "supplier_pagerank",
    "copurchase_kcore",
    "copurchase_triangles",
    "orders_snapshot_diff",
    "semantic_dedup_capped",
    # round-7: interval top-k + the round23 additions
    "overlapping_sessions_capped",
    "supplier_copart_links",
    "price_band_revenue",
    "customer_ltv_cohorts",
    "daily_revenue_anomaly",
    "order_priority_aging",
    "nation_lead_time_profile",
    "event_hour_grid",
    "brand_basket_triples",
    "user_acquisition_curve",
    "customer_value_migration",
    "split_drift_report",
    "supplier_share_of_wallet",
    "repeat_purchase_intervals",
    "brand_seasonality_index",
    "discount_return_rates",
    "customer_concentration",
    # round-8 session: sequence/finance/IVM/ER tier (round24) and the
    # hypothesis-test/audit tier (round25)
    "event_type_trigrams",
    "customer_drawdown",
    "twap_value",
    "ivm_join_delta",
    "sorted_neighborhood_pairs",
    "fano_burstiness",
    "price_divergence_report",
    "mann_whitney_discount",
    "corr_matrix_lineitem",
    "keyness_odds_terms",
    "blocking_profile",
    "simpson_slope_audit",
    "nelson_aalen_conversion",
    "cuped_adjusted_ab",
    "fs_match_scores",
    "neyman_allocation",
    "ipf_raking",
    "order_reconciliation_report",
    "forecast_backtest_naive",
    "price_heaping_audit",
    # round-9 session: gaps-and-islands + the persisted-IVF serving path
    "activity_streaks",
    "ann_ivf_persisted",
]

# Optional subset: SHAKEOUT_QUERIES="a,b,c" runs only those names.
_sel = os.environ.get("SHAKEOUT_QUERIES")
if _sel:
    QUERIES = [q.strip() for q in _sel.split(",") if q.strip()]

ITERS = int(os.environ.get("SHAKEOUT_ITERS", "2"))

# SHAKEOUT_NX_WARMUP=0 skips the warm-up execution for the Nx (scaled)
# measurement ONLY — the t1 baseline always warms up. At the 1000x decade
# a single execution runs ~30 min, so JIT/scan warm-up is amortized into
# noise and a cold single-shot is the honest measurement; warming up
# would double a multi-hour run to shave <1% off the reading. Skipping
# warm-up can only INFLATE tN, so the reported exponent is conservative.
NX_WARMUP = os.environ.get("SHAKEOUT_NX_WARMUP", "1") != "0"


def _median_time(spark, fn, sf_dir: str, warmup: bool = True) -> float:
    if warmup:
        trigger(fn(spark, sf_dir))
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        trigger(fn(spark, sf_dir))
        times.append(time.perf_counter() - t0)
    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc.sc()
    for rdd_id in list(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()):
        try:
            jsc.unpersistRDD(int(str(rdd_id)), False)
        except Exception:  # noqa: BLE001
            pass
    return round(statistics.median(times), 3)


def main() -> None:
    nx_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale10x"
    factor = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    base_dir = "/root/testdata/sf0.1"
    spark = get_spark(
        app_name="scale_shakeout",
        extra_conf={
            "spark.cleaner.periodicGC.interval": "30s",
            "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=2g",
            # 1000x decade: a full-GC pause under a 600M-row checkpoint
            # exceeded the default 120 s executor-liveness window
            # (HeartbeatReceiver removed the LOCAL executor — in local
            # mode that tears down the scheduler; observed r08: 135 s
            # pause, 'Cannot find endpoint: CoarseGrainedScheduler').
            # On a real cluster the same setting protects against
            # stop-the-world pauses on hot executors.
            "spark.network.timeout": "600s",
            "spark.executor.heartbeatInterval": "60s",
            # with SPARK_GRAFT_CHECKPOINT_DIR (reliable disk checkpoints
            # for the iterative tier) old checkpoint files must be GC'd
            # as their frames go out of scope, or a multi-query run
            # fills the disk
            "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
        },
    )
    qs = all_queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        spec = qs[name]
        try:
            t1 = _median_time(spark, spec.fn, base_dir)
            tn = _median_time(spark, spec.fn, nx_dir, warmup=NX_WARMUP)
            exp = round(math.log(max(tn, 1e-3) / max(t1, 1e-3)) / math.log(factor), 2)
            out[name] = {"t1_sec": t1, f"t{int(factor)}_sec": tn, "exponent": exp}
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": repr(exc)[:160]}
        print(name, out[name], flush=True)
    # merge into the existing report so subset runs (SHAKEOUT_QUERIES)
    # extend rather than clobber prior results
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_SHAKEOUT.json",
    )
    # factor 10 keeps the original layout ("queries"); other factors land
    # in their own section ("queries_100x", ...) so a second scale step
    # never clobbers the 10x rows.
    try:
        with open(out_path) as f:
            merged = json.load(f)
    except (OSError, ValueError):
        merged = {}
    # SHAKEOUT_TAG names a separate section (e.g. "distributed" for the
    # forced-distributed graph rows measured with
    # SPARK_GRAFT_GRAPH_DRIVER_PATH=0) so variant runs never clobber the
    # default-path rows.
    tag = os.environ.get("SHAKEOUT_TAG")
    if tag:
        key = f"queries_{tag}_{int(factor)}x"
        merged[f"nx_dir_{tag}_{int(factor)}x"] = nx_dir
        merged.setdefault(key, {}).update(out)
    elif factor == 10.0:
        if merged.get("factor") != factor:
            merged["queries"] = {}
        merged["factor"], merged["nx_dir"] = factor, nx_dir
        merged.setdefault("queries", {}).update(out)
    else:
        key = f"queries_{int(factor)}x"
        merged[f"nx_dir_{int(factor)}x"] = nx_dir
        merged.setdefault(key, {}).update(out)
    # write BEFORE printing: a consumer like `| head -1` SIGPIPEs the
    # print, and the file write must not be collateral damage
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1)
    print(json.dumps(merged))


if __name__ == "__main__":
    main()
