"""Query suites: the reference workloads' semantics on the driver's testdata.

Each module contributes ``SUITE: dict[str, QuerySpec]``; ``all_queries()``
merges them for ``__spark_entry__``. Per the driver contract, every spec has
a (spark, sf_dir) -> DataFrame callable and (where SQL-expressible) a DuckDB
oracle string; column names are aliased identically on both sides.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL over the pre-registered table views
    doc: str = ""


# Queries the driver's CORRECTNESS gate already validated (cumulative over
# rounds; keys of CORRECTNESS_r0{1,2,3}.json that hash-matched). The driver
# only checks the FIRST 50 registry entries, so all_queries() rotates these
# to the back: queries the driver has never checked (plus anything added
# this round, plus the four r03 hash-fails re-fixed this round) occupy the
# front of the window. The local differential suite still covers every
# query regardless of position.
_R03_DRIVER_GREEN = frozenset({
    "market_share", "product_profit", "returned_item_report",
    "supplier_part_counts", "lang_source_matrix", "tfidf_top_terms",
    "spend_deciles", "retention_cohorts", "top_bigrams",
    "doc_embedding_quality", "trigram_lang_profile", "monthly_priority_trend",
    "supplier_balance_rank", "event_bucket_dedup", "source_reputation",
    "user_event_downsample", "null_skew_enrich", "supplier_pagerank",
    "diverse_sample", "mad_quantity", "nation_region_share",
    "diverse_sample_scaled", "fuzzy_part_names", "fuzzy_name_probe",
    "brand_basket_pairs", "overlapping_sessions", "fk_integrity_audit",
    "session_paths", "weighted_doc_sample", "source_lang_drift",
    "json_props_stats", "balance_quartiles", "order_price_histogram",
    "scd2_history", "interpolate_hourly", "modal_event_type",
    "curate_corpus", "token_budget_pack", "dedup_embedding_cosine",
    "token_counts", "embedding_stats", "label_centroids",
    "stratified_split", "sessionize", "top_first_word",
    "incremental_dedup_clusters",
})

_R02_DRIVER_CHECKED = frozenset({
    "taxi_q1", "taxi_q2", "taxi_q3", "taxi_q4", "ml_filter", "ml_features",
    "ml_split", "plasticc_multi_agg", "plasticc_etl", "pricing_summary",
    "segment_revenue", "top_unshipped_orders", "nation_revenue",
    "priority_semi_join", "customers_anti_join", "topk_per_segment",
    "column_cardinalities", "approx_cardinalities", "event_type_pivot",
    "small_parcel_revenue", "order_count_histogram", "top_supplier_revenue",
    "disjunctive_revenue", "sole_late_supplier", "idle_customer_balance",
    "important_parts", "nation_pair_volume", "concentrated_suppliers",
    "priority_line_counts", "promo_revenue_share", "large_order_customers",
    "min_cost_supplier", "rollup_revenue", "asof_next_error",
    "winsorized_price_mean", "key_skew_stats", "cube_revenue",
    "linreg_by_flag", "repeat_customers", "churned_customers",
    "median_quantity", "approx_quantile_profile", "quantile_profile",
    "latest_order_per_customer", "asof_click_purchase",
    "clicks_before_errors", "rolling_revenue", "cumulative_value",
    "order_gaps", "resample_hourly",
})


def all_queries() -> dict[str, QuerySpec]:
    from timedf_spark.queries import (
        advanced,
        analytics_round3,
        curation_suite,
        extension,
        lakehouse,
        ml_etl,
        ml_train,
        plasticc,
        round4,
        round5,
        round6,
        round7,
        round8,
        round9,
        round10,
        round11,
        round12,
        round13,
        round14,
        round15,
        round16,
        round17,
        round18,
        round19,
        round20,
        round21,
        round22,
        round23,
        round24,
        round25,
        round26,
        round27,
        round28,
        taxi,
        timeseries,
        tpch,
        tpch_deep,
        tpch_round2,
        tpch_round3,
        windows_suite,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (taxi, ml_etl, plasticc, tpch, tpch_deep, tpch_round2, tpch_round3, analytics_round3, round4, round5, round6, round7, round8, round9, round10, round11, round12, round13, round14, round15, round16, round17, round18, round19, round20, round21, round22, round23, round24, round25, round26, round27, round28, advanced, windows_suite, timeseries, extension, curation_suite, lakehouse, ml_train):
        for name, spec in mod.SUITE.items():
            assert name not in merged, f"duplicate query name {name}"
            merged[name] = spec
    # Driver-unchecked queries first (window management — see comment above).
    # New no-oracle entries also rotate back: a rows-only check would spend
    # one of the 50 hash-checked slots on a query the local recall tests
    # already cover.
    # rows-only (no-oracle) entries all rotate back: each is pinned by a
    # stronger local test (recall vs brute force, GBT-beats-linear, Arrow
    # plumbing asserts) than the driver's rows-only check, and the freed
    # slots go to hash-checked queries instead.
    # r01-green queries unchanged since round 1 also rotate back (their
    # CORRECTNESS_r01 rows stand).
    _R01_GREEN_UNCHANGED = {
        "funnel_counts", "text_stats", "lang_id", "doc_fingerprint",
        "dedup_exact", "dedup_minhash_lsh",
        "dedup_simhash", "dedup_clusters", "corpus_mix", "ann_brute_topk",
    }
    # Round-5 window: every r04-checked oracle query hash-matched
    # (CORRECTNESS_r04.json: 49/50 green, the 50th is the by-design
    # no_oracle approx_cardinalities row). Fold the r04 greens into the
    # cumulative rotation EXCEPT near_dup_tier_report, whose round-5
    # edit changed the ratio EXPRESSIONS on both engines (nullif
    # zero-div guard) — it stays front for driver re-validation.
    # charlm_score / dedup_jaccard_prefix / curation_funnel also changed
    # in round 5, but persistence-only (cache hygiene moved off the
    # timed path; identical oracles and semantics, r04 greens stand), so
    # they rotate back — round 5 added 52 new/changed queries and the
    # 50-slot window must go to entries the driver has never hashed.
    _R04_DRIVER_GREEN = frozenset({
        "zscore_outliers", "first_touch_attribution", "temperature_mix",
        "doc_length_histogram", "salted_segment_spend", "duplicate_paragraphs",
        "lineitem_profile", "order_expectations", "purchase_state_lookup",
        "lang_confusion", "context_pack", "markov_transitions",
        "incremental_daily_rollup", "dedup_ngram_jaccard",
        "semantic_dedup_keepers", "doc_chunks", "repetition_stats",
        "pii_redact", "contamination_probe", "incremental_ingest",
        "incremental_near_dup", "decontaminate_spans", "cdc_merge_orders",
        # round-5 persistence-only changes (see comment above)
        "charlm_score", "dedup_jaccard_prefix", "curation_funnel",
    })
    rotate_back = _R02_DRIVER_CHECKED | _R01_GREEN_UNCHANGED | _R03_DRIVER_GREEN | _R04_DRIVER_GREEN | {
        # no-oracle entries: each pinned by a stronger local test
        # (recall vs brute force, merge-table exactness, trained-model
        # metrics) than a rows-only driver check would add
        "ann_ivf_persisted",
        "ann_ivf_filtered",
        "ann_ivfpq_topk",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "multimodal_features",
        "quality_classifier",
        "gbt_taxi_train",
        "plasticc_forest_train",
        "bpe_vocab",
        "bpe_token_counts",
    }
    # Round-6 window: CORRECTNESS_r05.json was 50/50 green — fold all of
    # round 5's checked queries into the cumulative rotation.
    _R05_DRIVER_GREEN = frozenset({
        "near_dup_tier_report", "forecast_revenue", "equidepth_prices",
        "mg_token_summary", "mg_tokens_per_lang", "rolling_median_value",
        "duplicate_substring_spans", "strip_duplicate_spans",
        "source_cap_sample", "corpus_shard_plan", "substring_candidates",
        "substring_tier_report", "incremental_substring_probe",
        "nation_revenue_trend", "customer_anonymity_audit",
        "price_decile_bin", "orders_snapshot_diff", "copurchase_triangles",
        "copurchase_kcore", "cms_term_estimates", "kmeans_assign",
        "cluster_balanced_sample", "cluster_label_purity", "bm25_search",
        "dsir_importance", "vocab_growth", "nation_seed_ppr", "collocations",
        "join_size_report", "supplier_affinity_links", "part_skyline",
        "ewma_user_trend", "cusum_changepoint", "rank_fusion_customers",
        "supplier_communities", "acf_daily", "fd_profile", "benford_prices",
        "supply_reach", "loo_segment_outliers", "bot_cadence_audit",
        "engagement_upset", "weighted_median_price", "haar_energy",
        "layout_advisor", "nation_spend_gini", "rfm_segments",
        "readability_by_source", "join_size_sketch",
        "incremental_near_dup_indexed",
    })
    rotate_back |= _R05_DRIVER_GREEN
    # Round-7 window: CORRECTNESS_r06.json was 50/50 green — fold round
    # 6's checked queries into the cumulative rotation.
    _R06_DRIVER_GREEN = frozenset({
        "stickiness_dau_wau", "price_drift_tvd", "ab_test_report",
        "seasonal_outliers", "funnel_deadline", "conversion_latency",
        "semantic_dedup_capped", "discount_elimination_revenue",
        "brand_lift_rules", "ngram_containment_pairs", "doc_tf_cosine_pairs",
        "theil_sen_nation_trend", "position_attribution",
        "bounce_dwell_report", "rolling_7d_actives",
        "supplier_balance_percentile", "curriculum_shards",
        "l_diversity_audit", "brand_price_ties", "balance_gap_to_leader",
        "grouping_id_report", "nation_top3_brand_bundle", "dup_key_audit",
        "conversion_hazard_table", "template_prefix_groups",
        "zipf_rank_table", "nonalpha_noise_score", "power_users_pareto",
        "inter_event_gap_histogram", "discount_quantity_corr",
        "regional_hhi", "segment_priority_chi2", "session_funnel",
        "weekly_seasonality", "mom_revenue_growth",
        "event_volume_control_chart", "price_iqr_fences",
    })
    rotate_back |= _R06_DRIVER_GREEN
    # Round-8 window: CORRECTNESS_r07.json was 48/50 hash-green (the 2
    # 'err' rows were the by-design no_oracle approx sketches) — fold the
    # r07 greens into the cumulative rotation.
    _R07_DRIVER_GREEN = frozenset({
        "supplier_communities", "supplier_pagerank", "nation_seed_ppr",
        "semantic_dedup_keepers", "substring_candidates",
        "substring_tier_report", "incremental_substring_probe",
        "duplicate_substring_spans", "strip_duplicate_spans",
        "incremental_near_dup_indexed", "dedup_minhash_lsh",
        "dedup_clusters", "incremental_dedup_clusters", "curation_funnel",
        "dedup_exact", "dedup_embedding_cosine", "dedup_simhash",
        "dedup_ngram_jaccard", "dedup_jaccard_prefix",
        "near_dup_tier_report", "incremental_near_dup",
        "copurchase_triangles", "copurchase_kcore", "curate_corpus",
        "overlapping_sessions_capped", "supplier_copart_links",
        "price_band_revenue", "customer_ltv_cohorts",
        "daily_revenue_anomaly", "order_priority_aging",
        "nation_lead_time_profile", "event_hour_grid",
        "brand_basket_triples", "user_acquisition_curve",
        "customer_value_migration", "split_drift_report",
        "supplier_share_of_wallet", "repeat_purchase_intervals",
        "brand_seasonality_index", "discount_return_rates",
        "customer_concentration", "ann_brute_topk", "corpus_mix",
        "doc_fingerprint", "funnel_counts", "lang_id", "text_stats",
        "asof_click_purchase",
    })
    rotate_back |= _R07_DRIVER_GREEN
    # Round-9 window: CORRECTNESS_r08.json was 50/50 hash-green (the
    # first perfect window) — fold every r08-checked query into the
    # cumulative rotation.
    _R08_DRIVER_GREEN = frozenset({
        "approx_cardinalities", "approx_quantile_profile",
        "overlapping_sessions", "overlapping_sessions_capped",
        "dedup_clusters", "incremental_dedup_clusters",
        "substring_candidates", "substring_tier_report",
        "incremental_substring_probe", "duplicate_substring_spans",
        "strip_duplicate_spans", "event_type_trigrams",
        "customer_drawdown", "twap_value", "ivm_join_delta",
        "sorted_neighborhood_pairs", "fano_burstiness",
        "price_divergence_report", "mann_whitney_discount",
        "corr_matrix_lineitem", "keyness_odds_terms", "blocking_profile",
        "simpson_slope_audit", "nelson_aalen_conversion",
        "cuped_adjusted_ab", "fs_match_scores", "neyman_allocation",
        "ipf_raking", "order_reconciliation_report",
        "forecast_backtest_naive", "price_heaping_audit",
        "activity_streaks", "asof_next_error", "churned_customers",
        "clicks_before_errors", "column_cardinalities",
        "concentrated_suppliers", "cube_revenue", "cumulative_value",
        "customers_anti_join", "disjunctive_revenue", "event_type_pivot",
        "idle_customer_balance", "important_parts", "key_skew_stats",
        "large_order_customers", "latest_order_per_customer",
        "linreg_by_flag", "median_quantity", "min_cost_supplier",
    })
    rotate_back |= _R08_DRIVER_GREEN
    # Round-10 window: CORRECTNESS_r09.json was 50/50 hash-green (second
    # consecutive perfect window) — fold every r09-checked query into the
    # cumulative rotation.
    _R09_DRIVER_GREEN = frozenset({
        "blocking_profile", "join_size_sketch", "contamination_probe",
        "doc_fingerprint", "trigram_lang_profile", "text_stats", "lang_id",
        "token_counts", "doc_chunks", "repetition_stats", "pii_redact",
        "charlm_score", "duplicate_paragraphs", "token_budget_pack",
        "dedup_simhash", "dedup_ngram_jaccard", "dedup_minhash_lsh",
        "dedup_clusters", "incremental_dedup_clusters", "plasticc_etl",
        "plasticc_multi_agg", "semantic_dedup_keepers", "ann_brute_topk",
        "dedup_embedding_cosine", "curate_corpus", "top_unshipped_orders",
        "supplier_pagerank", "nation_pair_volume", "order_count_histogram",
        "order_gaps", "priority_line_counts", "priority_semi_join",
        "promo_revenue_share", "quantile_profile", "repeat_customers",
        "resample_hourly", "rolling_revenue", "rollup_revenue",
        "small_parcel_revenue", "sole_late_supplier", "top_supplier_revenue",
        "topk_per_segment", "winsorized_price_mean", "balance_quartiles",
        "brand_basket_pairs", "diverse_sample", "diverse_sample_scaled",
        "doc_embedding_quality", "embedding_stats", "event_bucket_dedup",
    })
    rotate_back |= _R09_DRIVER_GREEN
    # Round-11/12 windows: CORRECTNESS_r10 (50/50 hash-green) and
    # CORRECTNESS_r11 (48/48 oracle-bearing green; quality_classifier /
    # ann_ivf_persisted no-oracle by design) fold into the cumulative
    # rotation so the staleness ordering keeps cycling (VERDICT r11
    # item 8: the 26 queries r11's big front rotated out re-enter the
    # window here via their older stamps).
    _R10_DRIVER_GREEN = frozenset({
        "brand_lift_rules", "cdc_merge_orders", "charlm_score",
        "cluster_label_purity", "context_pack", "decontaminate_spans",
        "dedup_clusters", "dedup_embedding_cosine",
        "doc_length_histogram", "duplicate_paragraphs",
        "fk_integrity_audit", "fuzzy_name_probe", "fuzzy_part_names",
        "incremental_dedup_clusters", "incremental_substring_probe",
        "interpolate_hourly", "json_props_stats", "kmeans_assign",
        "label_centroids", "lang_source_matrix", "mad_quantity",
        "market_share", "modal_event_type", "monthly_priority_trend",
        "nation_region_share", "null_skew_enrich",
        "order_price_histogram", "plasticc_etl", "plasticc_multi_agg",
        "product_profit", "retention_cohorts", "returned_item_report",
        "scd2_history", "semantic_dedup_capped",
        "semantic_dedup_keepers", "session_paths", "sessionize",
        "source_lang_drift", "source_reputation", "spend_deciles",
        "stratified_split", "supplier_affinity_links",
        "supplier_balance_rank", "supplier_communities",
        "supplier_part_counts", "tfidf_top_terms", "top_bigrams",
        "top_first_word", "user_event_downsample", "weighted_doc_sample"
    })
    rotate_back |= _R10_DRIVER_GREEN
    _R11_DRIVER_GREEN = frozenset({
        "ann_ivf_persisted", "approx_cardinalities", "bm25_search",
        "brand_basket_triples", "brand_lift_rules",
        "cluster_balanced_sample", "cluster_label_purity",
        "cms_term_estimates", "contamination_probe", "copurchase_kcore",
        "copurchase_triangles", "curate_corpus", "curation_funnel",
        "decontaminate_spans", "dedup_embedding_cosine",
        "dsir_importance", "fk_integrity_audit", "fuzzy_name_probe",
        "fuzzy_part_names", "incremental_near_dup",
        "incremental_near_dup_indexed", "interpolate_hourly",
        "ipf_raking", "join_size_sketch", "json_props_stats",
        "kmeans_assign", "label_centroids", "lang_source_matrix",
        "mad_quantity", "market_share", "modal_event_type",
        "monthly_priority_trend", "nation_region_share",
        "near_dup_tier_report", "null_skew_enrich",
        "order_expectations", "order_price_histogram",
        "overlapping_sessions", "overlapping_sessions_capped",
        "product_profit", "quality_classifier", "retention_cohorts",
        "returned_item_report", "semantic_dedup_capped",
        "semantic_dedup_keepers", "strip_duplicate_spans",
        "substring_candidates", "substring_tier_report",
        "supplier_copart_links", "supply_reach"
    })
    rotate_back |= _R11_DRIVER_GREEN
    # Round-9 front (VERDICT r08 items 1/5): every query whose plan or
    # semantics changed since its last driver hash.
    #  - blocking_profile: r09 made the lang_len block key's NULL
    #    semantics explicit on BOTH engines (ADVICE r08) — expression
    #    change, re-hash first.
    #  - the fan_out retune (min_bytes floor now opt-in, VERDICT r08
    #    item 1) re-plans every per-row-CPU documents/lineitem pipeline:
    #    all fan_out call-site queries go front.
    #  - cluster.py gained the SPARK_GRAFT_CC_IMPL routing knob (r09) and
    #    dedup.py the explicit jaccard/minhash floors after the
    #    dedup-cluster pair's r08 hash.
    #  - r08 edited tpch.py / extension.py / pagerank.py / similarity.py
    #    after these queries' last hashes: top_unshipped_orders,
    #    curate_corpus, supplier_pagerank, semantic_dedup_keepers,
    #    dedup_embedding_cosine.
    # Round-10 front (VERDICT r09 item 5): every query whose operator
    # code changed since its last driver hash.
    #  - r09's linkpred pair-unfold rewrite (operators/linkpred.py,
    #    round5.py, round22.py) re-planned supplier_affinity_links,
    #    supplier_communities, brand_lift_rules — none were in the r09
    #    window; cluster_label_purity / kmeans_assign share the edited
    #    kmeans/cluster code paths.
    #  - r10 edits cluster.py (star assume_symmetric reuse of the outer
    #    checkpoint) → the CC consumers dedup_clusters /
    #    incremental_dedup_clusters / semantic_dedup_keepers re-hash
    #    first, and similarity.py (pre-signed guard + signature metadata
    #    stamp) → dedup_embedding_cosine / semantic_dedup_capped.
    #  - r10 also re-plans incremental_substring_probe (the broadcast
    #    semi-join gram prune in operators/substring.py) and the fan_out
    #    floor sites plasticc_etl / plasticc_multi_agg /
    #    duplicate_paragraphs / charlm_score — all re-hash first.
    # Round-12 front (optimization round 2/2): every query re-planned by
    # the r12 pass goes first — the explode symmetrization in
    # labelprop/cluster re-plans supplier_communities and every
    # connected_components consumer (dedup_clusters,
    # incremental_dedup_clusters, semantic_dedup_keepers, curate_corpus,
    # curation_funnel); the shared count aggregate + isNotNull re-plans
    # join_size_sketch; the bucket bracketing re-plans
    # weighted_median_price; the bm25 revert re-plans bm25_search; the
    # selection.py checkpoint routing touches dsir_importance; the kcore
    # dtype gate and the dedup materialize param touch copurchase_kcore
    # and the incremental_near_dup pair (defaults unchanged — fronted
    # out of caution). Everything else rotates by staleness, which
    # brings the r10-rotated-out names back through the window
    # (VERDICT r11 item 8).
    _FORCE_FRONT = (
        "supplier_communities",
        "dedup_clusters",
        "incremental_dedup_clusters",
        "semantic_dedup_keepers",
        "curate_corpus",
        "curation_funnel",
        "join_size_sketch",
        "weighted_median_price",
        "bm25_search",
        "dsir_importance",
        "copurchase_kcore",
        "incremental_near_dup",
        "incremental_near_dup_indexed",
    )
    front: dict[str, QuerySpec] = {}
    for n in _FORCE_FRONT:
        if n in merged:
            front[n] = merged[n]
    for n, s in merged.items():
        if n not in rotate_back and n not in front:
            front[n] = s
    # Window slots left after the forced/new entries go to the STALEST
    # driver hashes first: order the rotated-back tail by last-checked
    # round ascending, so every driver round refreshes the oldest
    # records instead of re-hashing last round's. The 13 r02 queries the
    # r06 window re-checked count as r06; the no-oracle entries (pinned
    # by stronger local tests than a rows-only check) stay absolute last.
    _R06_RECHECKED = {
        "taxi_q1", "taxi_q2", "taxi_q3", "taxi_q4", "ml_filter",
        "ml_features", "ml_split", "plasticc_multi_agg", "plasticc_etl",
        "pricing_summary", "segment_revenue", "top_unshipped_orders",
        "nation_revenue",
    }
    _NO_ORACLE_BACK = {
        "ann_ivf_filtered", "ann_ivfpq_topk", "ann_lsh_topk", "ann_ivf_topk",
        "ann_ivf_persisted",  # result == ann_ivf_topk, equality pinned by test
        "multimodal_features", "quality_classifier", "gbt_taxi_train",
        "plasticc_forest_train", "bpe_vocab", "bpe_token_counts",
    }

    def _last_checked(n: str) -> int:
        if n in _NO_ORACLE_BACK:
            return 99
        if n in _R11_DRIVER_GREEN:
            return 11
        if n in _R10_DRIVER_GREEN:
            return 10
        if n in _R09_DRIVER_GREEN:
            return 9
        if n in _R08_DRIVER_GREEN:
            return 8
        if n in _R07_DRIVER_GREEN:
            return 7
        if n in _R06_RECHECKED or n in _R06_DRIVER_GREEN:
            return 6
        if n in _R05_DRIVER_GREEN:
            return 5
        if n in _R04_DRIVER_GREEN:
            return 4
        if n in _R03_DRIVER_GREEN:
            return 3
        if n in _R02_DRIVER_CHECKED:
            return 2
        return 1  # _R01_GREEN_UNCHANGED
    back_names = [n for n in merged if n in rotate_back and n not in front]
    back_names.sort(key=lambda n: (_last_checked(n), n))
    back = {n: merged[n] for n in back_names}
    return {**front, **back}
