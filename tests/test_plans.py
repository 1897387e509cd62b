"""Physical-plan audits: assert the scale-critical properties of the
executed plans — these are what make the queries viable at 100 TB, and a
regression here (a lost broadcast, a filter that stops reaching the scan,
an extra shuffle) is a performance bug even while results stay correct.

Checks run on the *executed* plan string at sf0.001 (AQE finalizes join
strategies at runtime, so the executed plan is the honest artifact).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from timedf_spark.queries import all_queries

# honor the same override every other test module gets via conftest
SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _executed_plan(spark, name: str) -> str:
    spark.catalog.clearCache()  # cached tables would hide the parquet scan
    df = all_queries()[name].fn(spark, SF_SMALL)
    df.collect()  # let AQE finalize
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan prints the final plan followed by the initial one;
    # audit only what actually executed
    return plan.split("== Initial Plan ==")[0]


def _formatted(spark, name: str) -> str:
    spark.catalog.clearCache()  # cached tables would hide the parquet scan
    df = all_queries()[name].fn(spark, SF_SMALL)
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_single_key_groupby_is_one_shuffle(spark):
    """taxi_q1 (groupBy.count) must be partial-agg → ONE exchange → final
    agg; a second exchange would mean the partial aggregation was lost."""
    plan = _executed_plan(spark, "taxi_q1")
    assert plan.count("Exchange") <= 1, plan
    assert "HashAggregate" in plan


def test_filter_pushdown_reaches_parquet_scan(spark):
    """pricing_summary's shipdate predicate must appear in PushedFilters on
    the parquet scan — at 100 TB this is row-group skipping vs a full read."""
    plan = _formatted(spark, "pricing_summary")
    scan = plan[plan.index("Scan parquet") :]
    assert "PushedFilters: [" in scan
    assert "l_shipdate" in scan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_parquet_scan(spark):
    """taxi_q2 touches 2 of lineitem's 16 columns; ReadSchema must not
    contain untouched wide columns (l_comment)."""
    plan = _formatted(spark, "taxi_q2")
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema, read_schema


def test_dimension_joins_broadcast(spark):
    """segment_revenue's dim-table joins must be broadcast, not sort-merge:
    shipping a few-KB dimension beats shuffling the fact table."""
    plan = _executed_plan(spark, "segment_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_pure_filter_has_no_shuffle(spark):
    """ml_filter (17-predicate conjunctive filter) is map-only: zero
    exchanges in the executed plan."""
    plan = _executed_plan(spark, "ml_filter")
    assert plan.count("Exchange") == 0, plan


def test_plasticc_multi_agg_single_aggregation_pass(spark):
    """The 13-aggregate groupBy incl. two-pass skew must execute in ONE
    key shuffle: pass 1 (mean/range) is a window over PARTITION BY key and
    the final groupBy reuses the window's exchange. Allowed exchanges:
    the window's hash exchange + fan_out's bounded round-robin. No join
    anywhere — the naive two-pass form joins the means back."""
    plan = _executed_plan(spark, "plasticc_multi_agg")
    assert plan.count("Exchange") <= 2, plan
    assert "Window" in plan, plan
    assert "Join" not in plan, plan


def test_sessionize_single_partition_shuffle(spark):
    """Both window functions and the rollup share the user_id partitioning:
    Spark must evaluate them over ONE exchange (+1 for the final agg at
    most)."""
    plan = _executed_plan(spark, "sessionize")
    assert plan.count("Exchange") <= 2, plan


def test_minhash_no_cartesian(spark):
    """LSH candidate generation must be an equi-join on (band, band_key) —
    never a cartesian/broadcast-nested-loop over doc pairs."""
    plan = _executed_plan(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_dedup_no_cartesian(spark):
    """Embedding near-dup blocking likewise: equi-join on (tbl, bucket)."""
    plan = _executed_plan(spark, "dedup_embedding_cosine")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_markov_windows_share_user_exchange(spark):
    """Both session windows and the within-session lead() must evaluate
    over the single user_id exchange (hashpartitioning(user_id) satisfies
    the (user_id, session_id) clustered distribution); the transition
    aggregate and row-probability window then run at event-type² grain."""
    plan = _executed_plan(spark, "markov_transitions")
    import re

    user_exchanges = re.findall(r"Exchange hashpartitioning\(user_id[^)]*\)", plan)
    assert len(user_exchanges) == 1, plan


def test_context_pack_no_global_sort_window(spark):
    """The packing cumsum must partition by lang — a windowless global
    running sum would funnel the corpus through one reducer
    (Exchange SinglePartition) at any scale."""
    plan = _executed_plan(spark, "context_pack")
    assert "SinglePartition" not in plan, plan
    assert "hashpartitioning(lang" in plan, plan


def test_pit_lookup_join_is_key_anchored(spark):
    """The temporal lookup must plan as a hash/sort-merge join ON THE
    user_id EQUI-KEY with the validity interval as a residual predicate —
    a nested-loop over (facts × intervals) would be quadratic at scale."""
    plan = _executed_plan(spark, "purchase_state_lookup")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "user_id" in plan and ("BroadcastHashJoin" in plan or "SortMergeJoin" in plan), plan


def test_ngram_jaccard_hot_shingle_guard_in_plan(spark):
    """The standalone exact-Jaccard query must run WITH the hot-shingle
    guard (VERDICT r03 item 5): a broadcast anti-join strips df-heavy
    shingles before the inverted-index self-join, bounding per-shingle
    pairing at O(max_doc_freq²) instead of O(docs²). The operator caches
    the guarded shingle frame, so the executed plan shows an
    InMemoryRelation — assert the anti-join + broadcast hint on the
    optimized logical plan (pre-cache-substitution) and the physical
    no-cartesian property on the executed plan."""
    spark.catalog.clearCache()
    df = all_queries()["dedup_ngram_jaccard"].fn(spark, SF_SMALL)
    logical = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in logical, logical
    assert "broadcast" in logical.lower(), logical
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_whole_stage_codegen_covers_scan_and_agg(spark):
    """The hot path of taxi_q3 (scan → project → partial agg) must sit
    inside WholeStageCodegen spans."""
    plan = _executed_plan(spark, "taxi_q3")
    # codegen'd operators carry the `*(n)` stage marker in plan strings
    assert "*(1) HashAggregate" in plan or "*(1) Project" in plan, plan


@pytest.mark.parametrize("name", ["taxi_q4", "nation_revenue", "rolling_revenue"])
def test_no_query_reads_all_columns(spark, name):
    """Every scan must project a subset schema (Catalyst column pruning
    active end-to-end)."""
    plan = _formatted(spark, name)
    for seg in plan.split("ReadSchema:")[1:]:
        schema_line = seg.splitlines()[0]
        assert "comment" not in schema_line, (name, schema_line)


def test_q17_shape_aggregates_before_join_back(spark):
    """small_parcel_revenue must decorrelate: the per-part average is ONE
    aggregation whose (small) result joins back — part is broadcast, and
    no cartesian/nested-loop appears anywhere."""
    plan = _executed_plan(spark, "small_parcel_revenue")
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan  # part dimension


def test_q13_shape_preaggregates_below_left_join(spark):
    """order_count_histogram's orders-side aggregation must happen BEFORE
    the left join (partial-agg pushdown: the join input is one row per
    customer, not one per order). In plan terms: the HashAggregate on
    o_custkey appears under the join, so the exchange on orders carries
    aggregated rows."""
    plan = _formatted(spark, "order_count_histogram")
    tree = plan.split("== Physical Plan ==")[1].split("\n\n")[0]
    join_line = next(i for i, l in enumerate(tree.splitlines()) if "LeftOuter" in l)
    below_join = tree.splitlines()[join_line + 1 :]
    assert any("HashAggregate" in l for l in below_join), (
        "orders pre-agg missing below the join:\n" + tree
    )


def test_connected_components_round_is_linear(spark):
    """One propagation round of dedup_clusters must stay equi-join +
    hash-agg — no cartesian/nested-loop blowup on the edge list."""
    plan = _executed_plan(spark, "dedup_clusters")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_q2_argmin_join_back_broadcasts_aggregates(spark):
    """min_cost_supplier: the per-part minima and the supplier dimension
    join as broadcasts onto the (part, supplier) aggregate — the fact
    table shuffles only for its own aggregation, never for a join."""
    plan = _executed_plan(spark, "min_cost_supplier")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_q14_scalar_aggregation_is_partial_final(spark):
    """promo_revenue_share collapses to one row: the plan must be a
    partial+final agg over the broadcast part join — a SortMergeJoin or a
    global sort here would shuffle the fact for no reason."""
    plan = _executed_plan(spark, "promo_revenue_share")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "HashAggregate" in plan, plan


def test_interpolation_windows_share_one_sort(spark):
    """interpolate_hourly evaluates both unbounded-frame window passes
    (past carry + future carry) over the same (event_type, h) ordering —
    Spark must not re-sort or re-shuffle between them."""
    plan = _executed_plan(spark, "interpolate_hourly")
    # the grid join needs its exchanges; the two window frames over the
    # grid must add at most ONE more (their shared partitioning)
    assert plan.count("Window") >= 2, plan
    grid_and_windows = plan.split("Window")[0]
    assert grid_and_windows.count("Sort") <= 2, plan


def test_charlm_corpus_never_shuffles_for_model_join(spark):
    """charlm_score joins the vocabulary-sized model onto the exploded
    corpus bigrams as a broadcast — a shuffle of the bigram stream would
    move the whole corpus over the network. Audited on the OPERATOR
    (release=False): the query wrapper localCheckpoints the result to
    free the bigram cache (round-4 ADVICE), which collapses its executed
    plan to a checkpoint scan and would hide the join."""
    from timedf_spark.operators import lm
    from timedf_spark.sources.readers import load_table

    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    df = lm.charlm_doc_scores(docs)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_curate_corpus_near_dup_is_lsh_banded(spark):
    """curate_corpus's near-dup stage must be the LSH tier: candidate
    generation via equi-join on (band, band_key). The round-2 composition
    used the exact inverted-index self-join — quadratic per hot shingle —
    which is banned from this pipeline at scale. The downstream
    connected-components checkpoint hides the pair subplan from the
    end-to-end executed plan, so the audit targets the named stage
    (curate_near_dup_pairs) plus a source-level composition check."""
    import inspect

    from timedf_spark.queries import extension
    from timedf_spark.sources import load_table

    # (1) composition: the pipeline calls the LSH stage, not the exact tier
    body = inspect.getsource(extension._curate_corpus)
    assert "curate_near_dup_pairs" in body
    assert "ngram_jaccard_pairs_df" not in body  # the exact quadratic tier

    # (2) plan shape of that stage: banded equi-join, no cartesian, and the
    # only sh=sh join is the candidate-bounded verification join
    spark.catalog.clearCache()
    docs = load_table(spark, SF_SMALL, "documents")
    pairs = extension.curate_near_dup_pairs(docs)
    pairs.collect()
    plan = pairs._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "band_key" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re

    for m in re.finditer(r"(SortMergeJoin|ShuffledHashJoin) \[([^\]]*)\], \[([^\]]*)\]", plan):
        left_keys = m.group(2)
        assert not (
            left_keys.startswith("sh#") and "," not in left_keys
        ), f"unbounded shingle self-join in curate pair stage: {m.group(0)}"


# ---- measured shuffle bytes (round-3: claims measured, not just plan-shaped)


def _shuffle_writes(spark, name: str) -> dict[int, int]:
    """Per-stage shuffle WRITE bytes for one query execution, from the
    app status store (the same numbers the UI's stage page shows). Scoped
    via a job group so concurrent/prior jobs don't pollute the measurement;
    skipped stages (reused exchanges) have no attempt and are excluded —
    which is correct: they moved no new bytes."""
    sc = spark.sparkContext
    spark.catalog.clearCache()
    sc.setJobGroup(f"audit_{name}", name)
    try:
        df = all_queries()[name].fn(spark, SF_SMALL)
        df.collect()
    finally:
        sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    store = sc._jsc.sc().statusStore()
    stage_ids: set[int] = set()
    for j in tracker.getJobIdsForGroup(f"audit_{name}"):
        info = tracker.getJobInfo(j)
        if info:
            stage_ids.update(info.stageIds)
    writes: dict[int, int] = {}
    for sid in stage_ids:
        try:
            s = store.lastStageAttempt(sid)
        except Exception:  # noqa: BLE001 — skipped stage
            continue
        b = s.shuffleWriteBytes()
        if b > 0:
            writes[sid] = b
    return writes


def test_taxi_q1_shuffles_only_aggregates(spark):
    """groupBy(cab_type).count() must shuffle ONE stage of partial
    aggregates (groups x partitions rows), never table data: a few hundred
    bytes at sf0.001 vs ~MBs for the scanned column."""
    writes = _shuffle_writes(spark, "taxi_q1")
    assert len(writes) == 1, writes
    assert sum(writes.values()) < 5_000, writes


def test_ml_filter_moves_zero_shuffle_bytes(spark):
    writes = _shuffle_writes(spark, "ml_filter")
    assert writes == {}, writes


def test_segment_revenue_shuffles_only_aggregates(spark):
    """All dimension joins broadcast; the fact table is reduced map-side,
    so the single exchange carries only (segment x partition) partials."""
    writes = _shuffle_writes(spark, "segment_revenue")
    assert len(writes) == 1, writes
    assert sum(writes.values()) < 20_000, writes


def test_dedup_exact_shuffles_digests_not_text(spark):
    """exact_dedup's one exchange must carry 16-byte digests + ids — bytes
    moved stay well under half the corpus text volume (at 100 TB this is
    the difference between shuffling hashes and shuffling the corpus)."""
    from timedf_spark.sources import load_table

    corpus_bytes = (
        load_table(spark, SF_SMALL, "documents")
        .agg(F.sum(F.length("text")))
        .first()[0]
    )
    writes = _shuffle_writes(spark, "dedup_exact")
    assert len(writes) == 1, writes
    assert sum(writes.values()) < corpus_bytes / 2, (writes, corpus_bytes)


def test_plasticc_multi_agg_one_hash_exchange_measured(spark):
    """The 13-agg two-pass (window mean + grouped moments) claims ONE hash
    exchange — the plan must show exactly one hashpartitioning Exchange
    (the other is fan_out's round-robin scan-parallelism guard, a no-op at
    production scale), and at most two stages may write shuffle data."""
    plan = _executed_plan(spark, "plasticc_multi_agg")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    writes = _shuffle_writes(spark, "plasticc_multi_agg")
    assert len(writes) <= 2, writes


# ---- round-3 query plan audits


def test_market_share_broadcasts_every_dimension(spark):
    """Q8 joins lineitem to part, orders, customer(+nation+region) and
    supplier(+nation): every dimension side must broadcast, leaving at most
    the orders⋈lineitem fact join as a shuffle join — five chained
    sort-merge joins is the 100 TB failure mode this guards against."""
    plan = _executed_plan(spark, "market_share")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_repetition_stats_no_hash_exchange(spark):
    """Row-local rewrite: every metric (incl. top-bigram count via the
    sorted-run fold) computes inside the scan — no hash exchange at any
    scale. The only permitted exchange is fan_out's round-robin scan-
    parallelism guard, which disappears at production split counts."""
    plan = _executed_plan(spark, "repetition_stats")
    assert "Exchange hashpartitioning" not in plan, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, plan


def test_zscore_outliers_never_shuffles_raw_rows(spark):
    """Both aggregation passes must map-side-combine to group grain and
    the stats join back as a broadcast — no window over the
    low-cardinality key (one-reducer-per-type at scale), and total
    shuffle bytes stay at partial-aggregate size."""
    plan = _executed_plan(spark, "zscore_outliers")
    assert "Window" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    writes = _shuffle_writes(spark, "zscore_outliers")
    assert sum(writes.values()) < 50_000, writes


def test_supplier_part_counts_anti_join_broadcasts(spark):
    """Q16's supplier exclusion must be a broadcast anti join (the flagged
    set is tiny); shuffling the fact side against it would be wasted IO."""
    # static plan: at sf0.001 the flagged-supplier set is EMPTY and AQE's
    # empty-relation propagation (correctly) deletes the executed anti join
    plan = _formatted(spark, "supplier_part_counts")
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_tfidf_vocab_join_broadcasts(spark):
    """tf⋈df and tf⋈n_docs must broadcast (vocabulary ≪ token stream);
    ranking must be a per-doc window, not a global sort."""
    plan = _executed_plan(spark, "tfidf_top_terms")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_top_bigrams_is_take_ordered(spark):
    """Global top-20 must land in TakeOrderedAndProject — a full sort of
    the bigram aggregate would materialize the whole vocabulary ordered."""
    plan = _executed_plan(spark, "top_bigrams")
    assert "TakeOrderedAndProject" in plan, plan


def test_ivfpq_no_cartesian(spark):
    """IVF-PQ candidate generation is an equi-join on cell id with the
    probe set broadcast; any cartesian/nested-loop means the inverted
    index was lost."""
    plan = _executed_plan(spark, "ann_ivfpq_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_salted_join_spreads_key_over_salts(spark):
    """The salted-join query must join on (key, _salt) — the hot key's
    rows spread across 8 sub-keys — with the deterministic hash salt
    (xxhash64), never rand()."""
    plan = _formatted(spark, "salted_segment_spend")
    assert "_salt" in plan, plan
    assert "xxhash64" in plan, plan
    assert "rand(" not in plan, plan


def test_incremental_near_dup_no_corpus_self_join(spark):
    """Batch-vs-corpus LSH: candidates must come from a BROADCAST probe of
    the batch band set — no corpus-side self-join, no cartesian."""
    plan = _executed_plan(spark, "incremental_near_dup")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_event_bucket_dedup_single_aggregate_no_window(spark):
    """The bucketed dedup must be ONE partial+final aggregate over one
    exchange — no Window (the naive rn=1 formulation windows over the
    full event stream). Spark plans min(struct) as SortAggregate (struct
    min has no hash-agg path), which still combines map-side: the
    exchange moves one row per live bucket, not per event."""
    plan = _executed_plan(spark, "event_bucket_dedup")
    assert plan.count("Exchange") <= 1, plan
    assert "Window" not in plan, plan
    assert "partial_min" in plan, plan  # map-side combine before the shuffle


def test_diverse_sample_no_join_for_assignment(spark):
    """Medoid assignment rides a broadcast-closure Arrow scan: the plan
    must contain NO join at all (16 seed vectors never become a join
    side), and exactly the quota-rank window's exchange."""
    plan = _executed_plan(spark, "diverse_sample")
    assert "Join" not in plan, plan
    assert "CartesianProduct" not in plan


def test_null_skew_enrich_join_branch_filters_nulls(spark):
    """The split left join's joined branch must carry an IsNotNull data
    filter on the key expression (the plain outer join legally cannot)."""
    plan = _formatted(spark, "null_skew_enrich")
    assert "isnotnull" in plan.lower(), plan


def test_source_reputation_distinct_travels_as_digest(spark):
    """The per-source distinct must aggregate md5 digests, not text: the
    exchange carries a 32-char hash per row, never the document body."""
    plan = _executed_plan(spark, "source_reputation")
    assert "md5" in plan, plan
    # text itself must not appear as a shuffle attribute in the exchange
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        assert "text#" not in seg.split("\n")[0], seg.split("\n")[0]


# ---- round-5 query plan audits


def test_brand_basket_pairs_no_fact_self_join(spark):
    """Co-occurrence must come from array-side pair emission over ONE
    lineitem scan — the naive orderkey self-join scans and shuffles the
    fact table twice and explodes on hot orders. Top-20 must be
    TakeOrdered, not a global sort of the pair aggregate."""
    plan = _executed_plan(spark, "brand_basket_pairs")
    assert plan.count("lineitem.parquet") <= 1, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_fuzzy_part_names_gram_join_is_equi(spark):
    """The candidate join must be an equi-join on the prefix gram; the
    only nested-loop join allowed is the bounded short-string branch
    (broadcast, alphabet-limited by construction)."""
    plan = _executed_plan(spark, "fuzzy_part_names")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_overlapping_sessions_no_theta_join(spark):
    """The overlap join must execute as an EQUI-join on the grid cell —
    a CartesianProduct/BroadcastNestedLoopJoin means Catalyst received
    the raw theta predicate, the quadratic shape this operator exists
    to avoid."""
    plan = _executed_plan(spark, "overlapping_sessions")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan, plan


def test_weighted_doc_sample_is_take_ordered_no_exchange(spark):
    """The race key computes row-locally inside the scan; bottom-k must be
    TakeOrderedAndProject — a global Sort would materialize the ordered
    corpus, and any hash exchange means the key left the row."""
    plan = _executed_plan(spark, "weighted_doc_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_source_lang_drift_single_fact_scan(spark):
    """Marginals and the total must derive from the (source, lang)
    aggregate — the corpus parquet appears in the plan exactly once; the
    expected-count grid joins aggregate-sized frames only."""
    plan = _executed_plan(spark, "source_lang_drift")
    assert plan.count("documents.parquet") == 1, plan


def test_fuzzy_name_probe_broadcasts_batch_side(spark):
    """Incremental linkage: the candidate join must be a broadcast
    equi-join on the prefix gram (batch side broadcast) — the corpus
    must never self-join; only the bounded short branch may nest-loop."""
    plan = _executed_plan(spark, "fuzzy_name_probe")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_session_paths_single_raw_exchange(spark):
    """The path aggregate must reuse the session window's user_id
    exchange (hashpartitioning(user_id) satisfies the (user_id,
    session_id) clustered distribution) — exactly one hashpartitioning
    exchange carries raw event rows; the path-count aggregate exchanges
    path-vocabulary rows only, and top-15 is TakeOrdered."""
    plan = _executed_plan(spark, "session_paths")
    assert "TakeOrderedAndProject" in plan, plan
    # exchanges: one for the window/collect on user_id, one for the
    # path count — nothing more
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_fk_integrity_audit_dims_broadcast(spark):
    """Every dimension-keyed FK branch must broadcast its dimension; at
    most the lineitem->orders fact-fact edge may shuffle-join. Each
    branch reduces to one row before the union."""
    plan = _executed_plan(spark, "fk_integrity_audit")
    assert plan.count("BroadcastHashJoin") >= 6, plan
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1, plan


def test_ewma_single_user_exchange(spark):
    """All 8 lag terms and both row_numbers must ride ONE user_id
    exchange — a second raw-row exchange means the window specs stopped
    sharing their partitioning."""
    plan = _executed_plan(spark, "ewma_user_trend")
    assert plan.count("Exchange hashpartitioning") <= 1, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_linkpred_pairs_via_generate_not_self_join(spark):
    """Supplier affinity pairs come from exploding per-neighbor arrays
    (Generate), never from an edge self-join — the hub cap bounds the
    unfold; a join-based plan would re-shuffle the edge set twice."""
    plan = _executed_plan(spark, "supplier_affinity_links")
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_join_size_report_joins_only_aggregates(spark):
    """Key-count frames, not fact rows, enter every join: each join in
    the plan must sit above HashAggregates on both sides (proxy: at
    least two aggregates per join, no cartesian)."""
    import re

    plan = _executed_plan(spark, "join_size_report")
    n_joins = len(re.findall(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan))
    n_aggs = plan.count("HashAggregate")
    assert "CartesianProduct" not in plan, plan
    assert n_aggs >= 2 * n_joins, (n_aggs, n_joins)


def test_cusum_windows_share_exchange(spark):
    """prefix sum, row_number, count and total all partition by
    event_type: one raw-row exchange total."""
    plan = _executed_plan(spark, "cusum_changepoint")
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_brand_lift_rules_no_fact_self_join(spark):
    """Association rules: pairs unfold from per-order brand ARRAYS
    (Generate), never a lineitem-grain self-join; part broadcasts; no
    cartesian anywhere."""
    plan = _executed_plan(spark, "brand_lift_rules")
    assert "CartesianProduct" not in plan, plan
    assert "Generate explode" in plan, plan
    assert "BroadcastHashJoin" in plan
    # the only cross-join style operator allowed is the 1-row n_orders
    # broadcast (BroadcastNestedLoopJoin over a single-row aggregate)
    for seg in plan.split("BroadcastNestedLoopJoin")[1:]:
        assert "BuildRight" in seg[:80] or "BuildLeft" in seg[:80]


def test_rolling_7d_actives_no_theta_join(spark):
    """The trailing-window distinct must be the EXPLODE form — a range
    (theta) join would nested-loop day keys at scale."""
    plan = _executed_plan(spark, "rolling_7d_actives")
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_conversion_hazard_table_single_fact_pass(spark):
    """The survival table reads events ONCE per aggregate leg (per-user
    min/max legs), never self-joins raw events, and the day expansion is
    an explode over user-grain rows."""
    plan = _executed_plan(spark, "conversion_hazard_table")
    assert "Generate explode" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan parquet") <= 2, plan


def test_semantic_dedup_capped_window_linking(spark):
    """Degree-bounded pair generation: the plan carries the (tbl, bucket)
    row_number window and NO first-table-guard self-join fallback; the
    range condition keeps the join an equi-join on (tbl, bucket)."""
    plan = _executed_plan(spark, "semantic_dedup_capped")
    assert "row_number" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_price_band_range_join_broadcasts_bands(spark):
    """The non-uniform band range join must broadcast the 5-row band
    table (BroadcastNestedLoopJoin on the range predicate); a
    CartesianProduct or a sort-merge of the fact side would be the
    quadratic/shuffle failure mode."""
    plan = _executed_plan(spark, "price_band_revenue")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan
    # the fact side shuffles only for the final 5-group aggregate
    assert "SortMergeJoin" not in plan


def test_copart_pair_unfold_is_joinless_single_scan(spark):
    """supplier_copart_links (r11 rewrite): the sorted-array pair unfold
    replaces the distinct + degree pre-pass + equi-self-join with ONE
    lineitem scan, a collect_set aggregate whose array size IS the
    degree guard (a row filter, still BEFORE the quadratic unfold), and
    streaming Generates — the executed plan must contain no join at all
    and exactly one parquet scan."""
    plan = _executed_plan(spark, "supplier_copart_links")
    assert plan.count("Scan parquet") == 1, plan[:1500]
    for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert j not in plan, plan[:1500]
    # the i<j unfold is two chained Generates (posexplode + suffix slice)
    assert plan.count("Generate") >= 2, plan[:1500]
    # Spark pushes the rank filter down as a partial top-k BEFORE the
    # window exchange (WindowGroupLimit Partial/Final) — the per-group
    # cap therefore bounds what shuffles, exactly the scale contract
    assert "WindowGroupLimit" in plan


def test_daily_anomaly_single_scan_single_window_pass(spark):
    """daily_revenue_anomaly: one parquet scan, one aggregate exchange,
    one window pass over the (tiny) daily grain — the integer math must
    not introduce extra shuffles."""
    plan = _executed_plan(spark, "daily_revenue_anomaly")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Window") == 1, plan


def test_brand_triples_broadcasts_dim_and_canonical_generation(spark):
    """brand_basket_triples (r11 rewrite): part is broadcast onto the
    lineitem scan, baskets dedup in-aggregate (sorted collect_set), and
    the i<j<k triple unfold is chained Generates over suffix slices —
    the only join left is the dimension broadcast; no self-join of the
    fact-derived frame, no CartesianProduct."""
    plan = _executed_plan(spark, "brand_basket_triples")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    for j in ("SortMergeJoin", "ShuffledHashJoin"):
        assert j not in plan, plan[:1500]
    # one basket collect_set aggregate + the triple count aggregate
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Generate") >= 3, plan[:1500]


def test_wallet_share_two_windows_one_exchange(spark):
    """supplier_share_of_wallet: the rank window and the per-customer
    total/count windows all partition by o_custkey — Spark must evaluate
    them over ONE custkey exchange on top of the (cust, supp) aggregate
    exchange. A third exchange means a window stopped reusing the
    partitioning."""
    plan = _executed_plan(spark, "supplier_share_of_wallet")
    import re

    cust_ex = re.findall(r"Exchange hashpartitioning\(o_custkey[^)]*\)", plan)
    assert len(cust_ex) <= 2, plan  # agg exchange + (at most) window exchange
    assert plan.count("Window") >= 1
