"""Round-8 tests: exact substring dedup, per-group caps, shard planning.

The oracle parity of the four round-8 queries is covered by the
parametrized differential suite (test_queries_oracle); these tests pin
the semantic edge cases and the scale-critical plan shapes.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from timedf_spark.operators.sampling import cap_per_group
from timedf_spark.operators.substring import (
    duplicate_span_report,
    strip_duplicate_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_span_exact_boundaries(spark):
    """A shared 30-char block inside otherwise-unique text must come back
    as exactly one maximal span per doc at the right character offsets."""
    shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123"  # 30 chars
    a = "aaaaaaaaaa" + shared + "bbbbbbbbbb"  # span at [10, 40)
    b = "cc" + shared + "dddddddddddddddddd"  # span at [2, 32)
    docs = _docs(spark, [(1, a), (2, b)])
    spans = {
        r["doc_id"]: (r["span_start"], r["span_end"], r["span_len"])
        for r in duplicate_span_report(docs, k=20).collect()
    }
    assert spans == {1: (10, 40, 30), 2: (2, 32, 30)}


def test_duplicate_span_merges_adjacent_windows(spark):
    """Two distinct shared blocks separated by < k unique chars must merge
    into one island only when their windows actually overlap."""
    s1 = "ABCDEFGHIJKLMNOPQRST"  # 20 chars, shared
    s2 = "abcdefghijklmnopqrst"  # 20 chars, shared
    gap = "0123456789" * 3  # 30 unique chars > k: no merge
    doc = s1 + gap + s2
    docs = _docs(spark, [(1, doc), (2, s1 + "zzzzzzzzzzzzzzzzzzzzzzzzzz" + s2)])
    got = sorted(
        (r["span_start"], r["span_end"])
        for r in duplicate_span_report(docs, k=20)
        .filter("doc_id = 1")
        .collect()
    )
    assert got == [(0, 20), (50, 70)]


def test_strip_handles_fully_duplicated_and_untouched_docs(spark):
    """A doc whose whole text is duplicated strips to ''; a doc with no
    duplicated windows (or shorter than k) passes through verbatim."""
    shared = "The same license block appears in both documents here."
    docs = _docs(
        spark,
        [
            (1, shared),
            (2, shared),
            (3, "completely unique text that nothing else shares at all"),
            (4, "short"),
        ],
    )
    out = {r["doc_id"]: r for r in strip_duplicate_spans(docs, k=20).collect()}
    assert out[1]["clean_text"] == "" and out[1]["removed_chars"] == len(shared)
    assert out[2]["clean_text"] == ""
    assert out[3]["clean_text"].startswith("completely unique") and out[3]["n_spans"] == 0
    assert out[4]["clean_text"] == "short" and out[4]["n_spans"] == 0


def test_strip_reassembly_is_exact_complement(spark):
    """len(clean) + removed == len(text) and the clean text is the
    concatenation of the keep-segments in order."""
    shared = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    a = "head-" + shared + "-middle-" + shared + "-tail"
    docs = _docs(spark, [(1, a), (2, shared + "???" + shared)])
    row = strip_duplicate_spans(docs, k=20).filter("doc_id = 1").first()
    assert len(row["clean_text"]) + row["removed_chars"] == len(a)
    assert row["clean_text"].startswith("head-")
    assert row["clean_text"].endswith("-tail")
    assert shared not in row["clean_text"]


def test_cap_per_group_exercises_both_paths(spark):
    """One group under the cap (bypasses the window) and one over it
    (two-stage top-n) — the kept set must equal the naive per-group
    top-n, and skew_spread must not change the result."""
    rows = [(i, "small", i * 10) for i in range(3)] + [
        (100 + i, "big", i) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    order = [F.desc("score"), F.asc("id")]
    expected = {(r[0], r[1]) for r in rows if r[1] == "small"} | {
        (100 + i, "big") for i in range(15, 20)  # top-5 scores
    }
    for spread in (True, False):
        got = {
            (r["id"], r["grp"])
            for r in cap_per_group(df, ["grp"], order, 5, skew_spread=spread).collect()
        }
        assert got == expected, spread


def test_cap_per_group_parallelism_invariant(spark):
    """The kept set is a pure function of the data: repartitioning the
    input (which changes spark_partition_id) must not change it."""
    rows = [(i, f"g{i % 3}", (i * 37) % 101) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, grp string, score long")
    order = [F.desc("score"), F.asc("id")]
    base = {r["id"] for r in cap_per_group(df, ["grp"], order, 7).collect()}
    shuffled = {
        r["id"]
        for r in cap_per_group(df.repartition(13), ["grp"], order, 7).collect()
    }
    assert base == shuffled


def test_shard_plan_parallelism_invariant(spark):
    """(shard, seq) must be identical at any input partitioning — the
    reproducible-training-order contract."""
    from timedf_spark.queries import all_queries

    fn = all_queries()["corpus_shard_plan"].fn
    a = {(r["doc_id"], r["shard"], r["seq"]) for r in fn(spark, "/root/testdata/sf0.001").collect()}
    assert len(a) > 0
    shards = {s for (_, s, _) in a}
    assert shards <= set(range(16))
    # per-shard seq is dense 1..n
    from collections import defaultdict

    per = defaultdict(list)
    for _, s, q in a:
        per[s].append(q)
    for s, qs in per.items():
        assert sorted(qs) == list(range(1, len(qs) + 1)), s


def test_substring_tier_two_exchanges(spark):
    """The exact substring tier must pay exactly TWO requirement shuffles —
    one on the gram hash, one on doc_id reused by the window, the island
    groupBy and nothing else. A third ENSURE_REQUIREMENTS exchange means
    the doc_id partitioning stopped being reused. The explicit fan-out
    repartition before the k-gram explode (REPARTITION_BY_NUM — the
    single-row-group-parquet guard, sources/readers.fan_out) is counted
    separately and capped at one."""
    from timedf_spark.queries import all_queries

    spark.catalog.clearCache()
    df = all_queries()["duplicate_substring_spans"].fn(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("ENSURE_REQUIREMENTS") == 2, plan
    assert plan.count("REPARTITION_BY_NUM") <= 1, plan
    assert plan.count("Exchange") <= 3, plan
    assert "CartesianProduct" not in plan


def test_source_cap_no_sort_merge_join(spark):
    """Both semi-joins must broadcast (group-grain build sides); a
    SortMergeJoin here would shuffle the full corpus for the bypass."""
    from timedf_spark.queries import all_queries

    spark.catalog.clearCache()
    df = all_queries()["source_cap_sample"].fn(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan


def test_fingerprint_candidates_are_real_shared_substrings(spark):
    """Every candidate pair must share a literal k-char substring
    (collisions aside) — the precision-by-construction property that
    justifies min_shared=1."""
    from timedf_spark.operators.substring import fingerprint_candidate_pairs

    shared = "The quick brown fox jumps over the lazy dog!"
    docs = _docs(
        spark,
        [
            (1, "xxx " + shared + " yyy"),
            (2, "zzz " + shared),
            (3, "totally different content with no overlap at all here"),
        ],
    )
    pairs = fingerprint_candidate_pairs(docs, k=20, min_shared=1).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(1, 2)}


def test_substring_tier_recall_floor(spark):
    """The self-evaluating report must hold the tier's recall at its
    design point (word-boundary anchors, min_shared=1): >= 0.80
    doc-level on the audit sample."""
    from timedf_spark.queries import all_queries

    row = all_queries()["substring_tier_report"].fn(
        spark, "/root/testdata/sf0.001"
    ).first()
    assert row["n_exact_docs"] > 0
    assert row["doc_recall"] >= 0.80, row


def test_fingerprint_join_is_equi_no_cartesian(spark):
    """The candidate join must be equi on the gram hash."""
    from timedf_spark.queries import all_queries

    spark.catalog.clearCache()
    df = all_queries()["substring_candidates"].fn(spark, "/root/testdata/sf0.001")
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan


def test_incremental_probe_equals_full_filtered(spark):
    """Probe-path equivalence: the index probe must emit exactly the
    full-batch candidate pairs that touch the batch — Spark vs Spark,
    independent of the DuckDB oracle that pins the same fact."""
    from timedf_spark.operators.substring import (
        corpus_fingerprints,
        fingerprint_candidate_pairs,
        incremental_fingerprint_probe,
    )
    from timedf_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    pred = "doc_id % 10 = 7"
    new = docs.filter(pred).select("doc_id", "text")
    corpus = docs.filter(f"NOT ({pred})").select("doc_id", "text")
    fps = corpus_fingerprints(corpus, "text", 20)
    probe = {
        (r["doc_a"], r["doc_b"], r["n_shared"])
        for r in incremental_fingerprint_probe(new, fps, "text", 20, 1).collect()
    }
    batch_ids = {r["doc_id"] for r in new.select("doc_id").collect()}
    full = {
        (r["doc_a"], r["doc_b"], r["n_shared"])
        for r in fingerprint_candidate_pairs(docs, "text", 20, 1).collect()
        if r["doc_a"] in batch_ids or r["doc_b"] in batch_ids
    }
    assert probe == full and len(probe) > 0
