"""Regenerate PLANS.md: the formatted physical plans of headline queries.

Run: PYTHONPATH=. python tools/gen_plans.py
The file is evidence, not documentation — it is produced from the live
query objects so it cannot drift from the code.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timedf_spark.queries import all_queries  # noqa: E402
from timedf_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# Queries whose plan shape carries the scale argument, with the property
# each plan is meant to exhibit.
HEADLINERS = {
    "pricing_summary": "filter pushed to parquet scan; single partial+final hash agg",
    "segment_revenue": "dimension broadcast; one fact-fact shuffle",
    "top_unshipped_orders": "fact-fact shuffle join under AQE; TakeOrdered top-k (no global sort)",
    "small_parcel_revenue": "decorrelated per-part average, joined back; part broadcast",
    "order_count_histogram": "orders pre-aggregated BELOW the left join",
    "dedup_minhash_lsh": "signatures via one groupBy; candidates via equi-join (no cartesian)",
    "ann_ivf_topk": "centroid assignment scan; probe join on cell id; window re-rank",
    "resample_hourly": "grid generation shuffle-free; left join fill",
    "plasticc_multi_agg": (
        "two-pass skew in ONE shuffle: window mean/range over partition key, "
        "final groupBy reuses the window's exchange (no second Exchange)"
    ),
    "interpolate_hourly": (
        "both unbounded-frame window passes share one sort; no gap self-joins"
    ),
    "min_cost_supplier": "argmin join-back: aggregate⋈aggregate, never fact⋈fact",
    "market_share": "6-way star: every dimension broadcast, one fact-fact shuffle, share-of-total in one agg pass",
    "supplier_part_counts": "broadcast ANTI exclusion; count-distinct over pre-deduplicated pairs",
    "zscore_outliers": "groupBy moments + broadcast join-back: zero raw-row shuffles (no low-cardinality window)",
    "tfidf_top_terms": "tf -> df-of-tf; vocabulary joins broadcast; per-doc window rank",
    "repetition_stats": "fully row-local: sorted-run fold replaces explode+join (zero hash exchange)",
    "top_bigrams": "array-side bigram formation; TakeOrdered top-k",
    "ann_ivfpq_topk": "PQ codes (not vectors) through the candidate join; ADC group scoring; broadcast re-rank fetch",
    "incremental_near_dup": "batch band set broadcast-probes the corpus: no corpus self-join or shuffle",
    "lineitem_profile": "row stats in one agg; per-column pruned distincts (no multi-distinct Expand); stack unpivot",
    "event_bucket_dedup": "bucketed dedup as ONE min-struct aggregate (partial_min map-side combine), no window",
    "null_skew_enrich": "null keys split out of the outer join: isnotnull on the joined branch, null stratum never shuffles for the join",
    "diverse_sample": "medoid assignment as a joinless broadcast-closure Arrow scan; only the quota rank shuffles",
    "source_reputation": "per-source distinct over md5 digests: the exchange never carries document text",
    "fuzzy_part_names": "edit-distance join at vocabulary grain: equi-join on prefix grams; only the bounded short branch nest-loops",
    "brand_basket_pairs": "co-occurrence without a fact self-join: one lineitem scan, array-side pair emission, TakeOrdered",
    "overlapping_sessions": "interval overlap as an equi-join on grid cells (no theta nested-loop); canonical-cell single emission",
    "weighted_doc_sample": "race key computed inside the scan; TakeOrdered bottom-k, zero hash exchange",
    "diverse_sample_scaled": "no per-cluster sort: assignment scan + broadcast count join + hash-threshold filter",
    "fuzzy_name_probe": "batch prefixes broadcast-probe the corpus prefix index; no corpus self-join",
    "session_paths": "path aggregate reuses the session window's user_id exchange; TakeOrdered top-k",
    "source_lang_drift": "one fact scan; marginals via ReusedExchange of the (source,lang) aggregate",
    "fk_integrity_audit": "seven FK branches: dims broadcast, 1-row aggregates before the union",
    "dedup_ngram_jaccard": "hot-shingle guard: broadcast anti-join strips df-heavy shingles before the inverted-index self-join",
    "markov_transitions": "sessions + lead() ride ONE user_id exchange; transition agg at event-type² grain",
    "incremental_daily_rollup": "delta aggregated alone; combine is a full-outer join at day grain (no fact rescan)",
    "context_pack": "per-language running sum (no global sort); bin aggregate at (lang × bins) grain",
    "purchase_state_lookup": "temporal lookup anchored on the user_id equi-key; validity interval as residual (no nested loop)",
    "join_size_report": "every join input is a key-grain aggregate: no fact row ever crosses a join",
    "supplier_affinity_links": "pairs unfold from hub-capped per-neighbor arrays (Generate) — no edge self-join exchange",
    "part_skyline": "bucket prune via 1-row range + bucket-max broadcasts; the sequential merge window sees only survivors",
    "ewma_user_trend": "8 lags and both row_numbers ride ONE user_id exchange",
    "cusum_changepoint": "prefix, count and total windows share the event_type exchange",
    "rank_fusion_customers": "two distributed TakeOrdered; rank windows on K-row frames only; full-outer fuse",
    "acf_daily": "partition stats and all three lags ride one (type, day) exchange",
    "benford_prices": "digit-grain aggregate + 1-row total broadcast: scan never shuffles raw rows",
    "fd_profile": "per-FD distinct-count at key grain; 1-row profile unions",
    "loo_segment_outliers": "segment window carries only (n, S); TakeOrdered top deviations",
    "bot_cadence_audit": "gap lag, modal argmax and totals all on user_id partitioning",
    "engagement_upset": "distinct (user, bit) then two stacked aggregates — no window",
    "weighted_median_price": "two-pass bracketing: (flag,price) hash aggregate, bucket crossing scan, exact window only inside the bracket bucket (no fact-grain sort)",
    "haar_energy": "three pair-grain aggregates; the frame HALVES at each level",
    "layout_advisor": "one scan per table: key-grain aggregate then 1-row stats union",
    "nation_spend_gini": "rank window and final aggregate share the nation grain; all-integer sums",
    "rfm_segments": "three ntile windows ride one nation exchange (three in-partition sorts, no global sort)",
    "conversion_latency": "fact rows touched once (per-user min-agg); crossing windows at converter grain",
    "readability_by_source": "scoring is fully scan-local; one source-grain aggregate",
    "price_drift_tvd": "bucket-grain counts + 1-row totals broadcast; raw rows never shuffle",
    "stickiness_dau_wau": "(day,user) distinct then EXPLODED equi-grain groupBy — no theta join on day keys",
    "ab_test_report": "user-grain conversion agg; md5 bucket computed in-scan; two tiny aggregates",
    "seasonal_outliers": "one (type,hour) cell aggregate joined back to the scan; TakeOrdered top-k",
    "join_size_sketch": "one per-key count aggregate per side feeds sketch lanes AND exact branch (AQE exchange reuse); inner product joins d*w-cell frames",
    # round-6: the iterative graph tier + substring headliner (VERDICT
    # r05 item 2). For iterative operators the returned frame's plan is
    # the FINAL round over checkpointed inputs — the per-round shape; the
    # checkpoint scan proves lineage is truncated round-over-round (the
    # r05 planner-blowup class cannot recur).
    "supplier_communities": "LPA round shape: one equi-join + (node,label) count + per-node argmax window, all hash-partitioned over a checkpointed frontier (no lineage growth)",
    "nation_seed_ppr": "PPR round shape: integer-quantized mass join + dangling mass via 1-row broadcast; checkpoint scan (lineage truncated per round)",
    "supply_reach": "BFS under the bounded-graph driver fast path (r11): counted-first Arrow collect + numpy frontier replay; the hop histogram aggregates a LogicalRDD (distributed frontier⋈edges rounds above the bound)",
    "substring_tier_report": "per-position k-gram hashes: ONE exchange of corpus bytes at gram grain; tier report is aggregate-grain only",
    "semantic_dedup_capped": "SRP buckets in-scan (Arrow matmul); window rank within (table,bucket); degree-bounded range join — candidate volume linear, no all-pairs",
    # round-8 session: statistics / ER-audit / survival / raking tiers
    "price_divergence_report": "KS + EMD in one pass: the only global-order window runs over the post-aggregation $1000 grid (~500 rows); totals join back as 1-row broadcasts",
    "corr_matrix_lineitem": "all 15 co-moments from ONE partial+final aggregate; 6 corr rows unfold via stack (Generate) — no join, no window",
    "fs_match_scores": "all 3x4 leads ride ONE (size)-partitioned window; candidates unfold via stack — no self-join, one sort",
    "nelson_aalen_conversion": "user-grain duration agg, then both risk-set windows over the day-grain grid (<= span-days rows)",
    "ipf_raking": "75-cell grid aggregated once; every IPF sweep joins margins back as broadcasts (no shuffled join in the sweep chain)",
    "blocking_profile": "block-grain groupBy per scheme; candidate-pair volume computed WITHOUT materializing any pair (no Generate, no join)",
}


def _render() -> str:
    spark = get_spark(app_name="gen_plans")
    qs = all_queries()
    out = [
        "# PLANS — formatted physical plans of headline queries",
        "",
        f"Generated by `tools/gen_plans.py` at sf_dir={SF_DIR} "
        "(plans are data-size-dependent only in join-strategy choices AQE "
        "makes at runtime; the *shapes* asserted in tests/test_plans.py "
        "hold at every scale).",
        "",
    ]
    for name, claim in HEADLINERS.items():
        df = qs[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
        out += [f"## {name}", "", f"*{claim}*", "", "```", tree.strip(), "```", ""]
    return "\n".join(out)


def main() -> None:
    path = os.path.join(os.path.dirname(__file__), "..", "PLANS.md")
    text = _render()
    if "--check" in sys.argv[1:]:
        # Freshness guard (VERDICT r10 item 2): compare the committed file
        # against a live regeneration, ignoring expression-id drift
        # (#NNN counters shift whenever ANY earlier plan changes). A
        # mismatch means a plan-touching change shipped without
        # regenerating PLANS.md — rerun this tool without --check.
        import re

        def norm(s: str) -> str:
            return re.sub(r"#\d+", "#x", s)

        try:
            with open(path) as f:
                committed = f.read()
        except OSError:
            print("PLANS.md missing — run tools/gen_plans.py")
            sys.exit(1)
        if norm(committed) != norm(text):
            got, want = norm(committed).splitlines(), norm(text).splitlines()
            stale = sum(1 for a, b in zip(got, want) if a != b) + abs(
                len(got) - len(want)
            )
            print(f"PLANS.md STALE ({stale} differing lines) — "
                  "rerun tools/gen_plans.py and commit the result")
            sys.exit(1)
        print("PLANS.md fresh")
        return
    with open(path, "w") as f:
        f.write(text)
    print("PLANS.md written")


if __name__ == "__main__":
    main()
