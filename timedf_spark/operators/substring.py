"""Exact duplicated-substring detection and removal (character level).

The corpus-dedup tier so far works at document granularity (exact digest,
MinHash/SimHash/Jaccard near-dup) or at token-chunk granularity against a
probe set (curation.decontaminate_spans). This module adds the remaining
Lee-et-al capability ("Deduplicating Training Data Makes Language Models
Better", ACL 2022, §ExactSubstr): find every CHARACTER span of length
>= k that occurs verbatim in more than one document, and optionally cut
those spans out of the text — boilerplate headers, license blocks,
templated navigation, quoted reposts.

Algorithm (suffix-array-free, shuffle-friendly): every doc emits its
length-k character windows as (doc_id, pos, hash60(gram)); one exchange
on the gram hash marks windows whose gram also appears in ANOTHER doc
(min(doc_id) != max(doc_id) over the hash partition — no distinct-count
expansion); one exchange on doc_id merges overlapping duplicated windows
into maximal spans by gaps-and-islands (running max of window end).
A span of length L >= k duplicated across docs covers L-k+1 duplicated
windows, so the merged islands recover exactly the maximal duplicated
regions.

Scale posture (the 100 TB lens): the window stream is O(total_chars)
rows of 24 bytes (doc_id, pos, 60-bit gram hash) — ~2.4x the corpus
bytes through ONE hash exchange, the honest cost of EXACT substring
dedup (the suffix-array formulation is also O(total_chars) but needs a
global sort; the hash formulation needs only hash partitioning, no
order). Both downstream exchanges partition by doc_id and Catalyst
reuses the first for the island groupBy. Nothing is quadratic: a gram
duplicated across D docs costs D rows in one hash partition, and
hot-gram skew (the empty-string-of-spaces pathology) spreads because
windows of a hot gram from many docs hash to ONE partition only for the
min/max reduction, which is a constant-size aggregate state. At 60 bits
a hash collision can mark a unique window as duplicated; at corpus scale
(>2^30 windows) widen to the full md5 (two 60-bit columns) — for an
EXACT guarantee group by the gram string itself and pay k bytes/row of
shuffle instead of 8.

No counterpart exists in intel-ai/timedf (extension row; SURVEY.md §2
has no substring surface — closest is the digest dedup the reference
also lacks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "duplicate_span_report",
    "duplicate_span_sql",
    "strip_duplicate_spans",
    "strip_duplicate_spans_sql",
    "fingerprint_candidate_pairs",
    "fingerprint_candidates_sql",
]

DEFAULT_K = 20


def _gram_hash_fast_spark(text_col: str, k: int) -> str:
    # The EXACT tier only consumes gram EQUALITY (duplicated-or-not), so
    # each engine may use its own fastest 64-bit hash — xxhash64 here,
    # DuckDB's native hash() in the oracle. ~10x cheaper than
    # md5+hex-conv per window, identical spans (collisions aside).
    return f"xxhash64(substring({text_col}, pos + 1, {k}))"


def _gram_hash_fast_duck(text_col: str, k: int) -> str:
    return f"cast(hash(substr({text_col}, pos + 1, {k})) as hugeint)"


# Birthday bound for the 64-bit fast-hash tier: past ~2^30 windows the
# collision expectation Σ≈n²/2^65 approaches 1 — a collision marks a
# unique window as duplicated, and strip_duplicate_spans would then cut
# genuinely unique text. The guard below WARNS (one column-pruned length
# scan) instead of relying on a docstring; `exact=True` removes the
# hash entirely.
_COLLISION_WARN_WINDOWS = 1 << 30


def _warn_if_past_birthday_bound(docs, text_col: str, k: int) -> None:
    import warnings

    n_windows = (
        docs.filter(F.length(text_col) >= k)
        .agg(F.sum(F.length(text_col) - k + 1))
        .first()[0]
        or 0
    )
    if n_windows > _COLLISION_WARN_WINDOWS:
        warnings.warn(
            f"duplicate_span_report: {n_windows:.3g} k-gram windows exceed "
            f"the 64-bit birthday bound (~2^30); hash collisions can mark "
            f"unique windows as duplicated. Pass exact=True (gram-string "
            f"keys, no collisions) or raise k.",
            RuntimeWarning,
            stacklevel=3,
        )


def duplicate_span_report(
    docs: DataFrame, text_col: str = "text", k: int = DEFAULT_K,
    exact: bool = False, collision_guard: bool = True,
) -> DataFrame:
    """Maximal cross-document duplicated character spans.

    Returns (doc_id, span_start, span_end, span_len): 0-based start
    inclusive, end exclusive — every maximal region of ``text`` whose
    k-char windows all occur verbatim in at least one OTHER document.

    ``exact=True`` keys the duplicated-window test on the gram STRING
    itself instead of its 64-bit hash — zero collision risk at the cost
    of k-char keys (instead of 8 bytes) through the one exchange. Use it
    past the birthday bound (~2^30 windows), where a 64-bit collision
    would mark a unique window as duplicated; ``collision_guard``
    (default on) measures the window count in one column-pruned length
    scan and warns when the corpus crosses that bound (ADVICE r05).
    """
    if not exact and collision_guard:
        _warn_if_past_birthday_bound(docs, text_col, k)
    key = (
        f"substring({text_col}, pos + 1, {k})"
        if exact
        else _gram_hash_fast_spark(text_col, k)
    )
    grams = (
        docs.filter(F.length(text_col) >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.length(text_col) - k)).alias("pos"),
            text_col,
        )
        .select("doc_id", "pos", F.expr(key).alias("gh"))
    )
    # one exchange on gh: a window is duplicated iff its gram appears in
    # another doc (min/max over the hash partition, no count-distinct)
    wg = Window.partitionBy("gh")
    dup_pos = (
        grams.withColumn("mn", F.min("doc_id").over(wg))
        .withColumn("mx", F.max("doc_id").over(wg))
        .filter(F.col("mn") != F.col("mx"))
        .select("doc_id", "pos")
    )
    # gaps-and-islands on doc_id: merge overlapping [pos, pos+k) windows
    wd = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        wd.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup_pos.withColumn(
        "new_island",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1).otherwise(0),
    ).withColumn("island", F.sum("new_island").over(wd))
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(
            "doc_id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start")).cast("long").alias("span_len"),
        )
    )


def _span_ctes(table: str, text_col: str, k: int) -> str:
    """Shared DuckDB CTE chain ending in `spans` (same shape as the
    Spark plan: unnest windows -> hash-partition min/max -> islands)."""
    return f"""
g AS (
  SELECT doc_id, unnest(range(0, length({text_col}) - {k} + 1)) AS pos, {text_col}
  FROM {table} WHERE length({text_col}) >= {k}
),
h AS (SELECT doc_id, pos, {_gram_hash_fast_duck(text_col, k)} AS gh FROM g),
p AS (
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos,
           min(doc_id) OVER (PARTITION BY gh) AS mn,
           max(doc_id) OVER (PARTITION BY gh) AS mx
    FROM h
  ) WHERE mn <> mx
),
m AS (
  SELECT doc_id, pos,
         max(pos + {k}) OVER (PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM p
),
i AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM m
),
spans AS (
  SELECT doc_id,
         cast(min(pos) AS BIGINT) AS span_start,
         cast(max(pos) + {k} AS BIGINT) AS span_end
  FROM i GROUP BY doc_id, island
)"""


def duplicate_span_sql(
    table: str = "documents", text_col: str = "text", k: int = DEFAULT_K
) -> str:
    return f"""
WITH {_span_ctes(table, text_col, k)}
SELECT doc_id, span_start, span_end,
       cast(span_end - span_start AS BIGINT) AS span_len
FROM spans
"""


def strip_duplicate_spans(
    docs: DataFrame, text_col: str = "text", k: int = DEFAULT_K,
    exact: bool = False, collision_guard: bool = True,
) -> DataFrame:
    """Per doc: cut every cross-document duplicated span out of the text.

    Returns (doc_id, n_spans, removed_chars, clean_text) for EVERY doc —
    spanless docs (including those shorter than k) pass through with
    their text intact. Keep-segments are the complement of the sorted
    disjoint spans: [prev_span_end, span_start) per span plus the tail
    [last_span_end, len); reassembly is an order-defined string
    aggregate, one exchange on doc_id (shared with the span frame's
    island exchange). ``exact``/``collision_guard``: see
    :func:`duplicate_span_report` — stripping is where a hash collision
    would actually DELETE unique text, so the guard matters most here.
    """
    spans = duplicate_span_report(docs, text_col, k, exact, collision_guard)
    # r11: spans feeds THREE consumers below (keep-segment heads, tail
    # segments, per-doc stats) and Spark's exchange reuse does not unify
    # the three subtrees — the r10 plan ran the whole gram pipeline
    # (window explode + hash + two window passes over O(total_chars)
    # rows) three times (plan-verified: 10 parquet scans, 0
    # ReusedExchange). The span frame is tiny (duplicated regions only),
    # so one eager localCheckpoint executes the gram pipeline exactly
    # once; session cache hygiene reclaims the blocks.
    spans = spans.localCheckpoint(eager=True)
    wd = Window.partitionBy("doc_id").orderBy("span_start")
    heads = spans.select(
        "doc_id",
        F.coalesce(F.lag("span_end").over(wd), F.lit(0)).alias("ks"),
        F.col("span_start").alias("ke"),
    )
    tails = spans.groupBy("doc_id").agg(F.max("span_end").alias("ks")).withColumn(
        "ke", F.lit(None).cast("long")  # NULL = end of text, resolved after join
    )
    base = docs.select("doc_id", text_col, F.length(text_col).cast("long").alias("doc_len"))
    segs = (
        heads.unionByName(tails)
        .join(base, "doc_id")
        .withColumn("ke", F.coalesce("ke", "doc_len"))
        .filter(F.col("ke") > F.col("ks"))
        .select(
            "doc_id",
            "ks",
            F.expr(f"substring({text_col}, ks + 1, ke - ks)").alias("seg"),
        )
    )
    cleaned = segs.groupBy("doc_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(ks, seg))),"
            " x -> x.seg), '')"
        ).alias("clean_text")
    )
    stats = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("removed_chars"),
    )
    return (
        base.join(stats, "doc_id", "left")
        .join(cleaned, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("removed_chars", F.lit(0)).cast("long").alias("removed_chars"),
            # a doc whose ENTIRE text is duplicated has stats but no
            # keep-segments -> clean_text '', not the original
            F.when(F.col("n_spans").isNull(), F.col(text_col))
            .otherwise(F.coalesce("clean_text", F.lit("")))
            .alias("clean_text"),
        )
    )


def strip_duplicate_spans_sql(
    table: str = "documents", text_col: str = "text", k: int = DEFAULT_K
) -> str:
    return f"""
WITH {_span_ctes(table, text_col, k)},
heads AS (
  SELECT doc_id,
         coalesce(lag(span_end) OVER (PARTITION BY doc_id ORDER BY span_start),
                  0) AS ks,
         span_start AS ke
  FROM spans
),
tails AS (
  SELECT doc_id, max(span_end) AS ks, cast(NULL AS BIGINT) AS ke
  FROM spans GROUP BY doc_id
),
base AS (SELECT doc_id, {text_col}, cast(length({text_col}) AS BIGINT) AS doc_len FROM {table}),
segs AS (
  SELECT s.doc_id, s.ks,
         substr(b.{text_col}, cast(s.ks + 1 AS INT),
                cast(coalesce(s.ke, b.doc_len) - s.ks AS INT)) AS seg
  FROM (SELECT * FROM heads UNION ALL SELECT * FROM tails) s
  JOIN base b USING (doc_id)
  WHERE coalesce(s.ke, b.doc_len) > s.ks
),
cleaned AS (
  SELECT doc_id, string_agg(seg, '' ORDER BY ks) AS clean_text
  FROM segs GROUP BY doc_id
),
stats AS (
  SELECT doc_id, count(*) AS n_spans,
         sum(span_end - span_start) AS removed_chars
  FROM spans GROUP BY doc_id
)
SELECT b.doc_id,
       cast(coalesce(st.n_spans, 0) AS BIGINT) AS n_spans,
       cast(coalesce(st.removed_chars, 0) AS BIGINT) AS removed_chars,
       CASE WHEN st.n_spans IS NULL THEN b.{text_col}
            ELSE coalesce(c.clean_text, '') END AS clean_text
FROM base b
LEFT JOIN stats st USING (doc_id)
LEFT JOIN cleaned c USING (doc_id)
"""


# ---- sampled-fingerprint tier (the 100 TB path) ----------------------------
#
# The exact tier above pays ~24 bytes of shuffle per corpus character.
# The scalable companion is ANCHOR-sampled shingling (the anchor trick
# of Manber, "Finding Similar Files in a Large File System", USENIX
# 1994; word-boundary shingles à la Broder): keep only k-gram windows
# whose FIRST character is the anchor (' ') — content-defined, so a
# shared substring yields identical sampled windows in every document
# containing it regardless of offset; density ≈ 1/(avg word length + 1)
# ≈ 1/6 on text. Docs sharing >= min_shared sampled grams become
# candidate pairs for the exact verifier — the same generate-cheap/
# verify-exact two-tier shape as MinHash-LSH, but at substring (not
# whole-doc) granularity.
#
# Until r08 this tier sampled 0-mod-p over a cross-engine md5 hash
# (Schleimer et al.'s winnowing rule); an md5 + hex-conv PER WINDOW was
# the tier's dominant cost (~60% of substring_candidates at sf0.1,
# VERDICT r07 item 6). The anchor predicate is a 1-char comparison, and
# because sampling no longer needs a hash VALUE shared across engines,
# the join key drops to each engine's native fast 64-bit hash
# (xxhash64 / hash) — exactly like the exact tier, same documented
# birthday-bound caveat; collisions only add candidates for the exact
# verifier downstream. The md5 family is gone from the hot path.

FP_ANCHOR = " "


def _anchored_grams(
    docs: DataFrame, text_col: str, k: int, anchor: str = FP_ANCHOR
) -> DataFrame:
    """Distinct (doc_id, gh) for the anchor-sampled k-gram windows."""
    return (
        docs.filter(F.length(text_col) >= k)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.length(text_col) - k)).alias("pos"),
            text_col,
        )
        .filter(F.expr(f"substring({text_col}, pos + 1, 1) = '{anchor}'"))
        .select("doc_id", F.expr(_gram_hash_fast_spark(text_col, k)).alias("gh"))
        .distinct()
    )


def _anchored_grams_sql(table: str, text_col: str, k: int) -> str:
    """DuckDB twin of the anchored fingerprint stream (CTE body)."""
    return f"""
  SELECT DISTINCT doc_id, {_gram_hash_fast_duck(text_col, k)} AS gh FROM (
    SELECT doc_id, unnest(range(0, length({text_col}) - {k} + 1)) AS pos, {text_col}
    FROM {table} WHERE length({text_col}) >= {k}
  ) WHERE substr({text_col}, pos + 1, 1) = '{FP_ANCHOR}'"""


def fingerprint_candidate_pairs(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_shared: int = 2,
    max_doc_freq: int | None = 64,
) -> DataFrame:
    """Candidate doc pairs sharing >= min_shared anchor-sampled k-gram
    fingerprints -> (doc_a, doc_b, n_shared).

    Scale posture: the fingerprint stream is ~1/6 of the exact tier's,
    distinct-ed to (doc_id, gh) grain before the self-join; the
    candidate join is equi on gh (no cross product) and ``max_doc_freq``
    drops degenerate grams shared by more than that many docs — the
    same hot-key guard as the n-gram Jaccard tier, without which one
    boilerplate gram shared by D docs costs D^2 pairs."""
    # r11: sorted-array pair unfold (the supplier_copart_links shape)
    # instead of the df-guard window + gram self-join — the self-join
    # executed the anchored-gram pipeline (per-position substring + hash
    # over the corpus) once PER SIDE, and the window paid a gram-grain
    # sort on top. collect_set dedups (doc_id, gh) in-aggregate (grams
    # are already distinct, so set size == the window's doc-frequency
    # count) and i<j pairs unfold from the sorted array via streaming
    # Generates: same pair multiset, ONE gram pipeline execution, and
    # the gh-grain window exchange+sort replaced by one aggregate.
    # ADVICE r11 note (examined r12, left as-is): the collect_set builds
    # the full per-gram doc array BEFORE the size guard, so a degenerate
    # hot gram allocates one O(D) aggregation buffer. A count-aggregate
    # pre-filter (gh-grain count + semi-join ahead of the collect_set)
    # bounds that buffer, but A/B'd 2-3x SLOWER at sf0.1 in both
    # directions of an interleaved same-box A/B (substring_candidates
    # 1.06 -> 1.9/3.8 s, substring_tier_report 2.5 -> 3.7/6.9 s): the
    # semi-join adds a full gram-grain SMJ pass that dwarfs the buffer
    # saving at bench scale. At 100 TB with adversarial boilerplate the
    # pre-filter is the right guard — revisit if a real corpus trips the
    # buffer; the max_doc_freq semantics are unchanged either way.
    baskets = (
        _anchored_grams(docs, text_col, k)
        .groupBy("gh")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("_ds"))
    )
    if max_doc_freq is not None:
        baskets = baskets.where(F.size("_ds") <= max_doc_freq)
    lefts = baskets.select(F.posexplode("_ds").alias("_i", "doc_a"), "_ds")
    return (
        lefts.select(
            "doc_a",
            F.explode(F.expr("slice(_ds, _i + 2, size(_ds))")).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("doc_a", "doc_b", F.col("n_shared").cast("long").alias("n_shared"))
    )


def fingerprint_candidates_sql(
    table: str = "documents",
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_shared: int = 2,
    max_doc_freq: int | None = 64,
) -> str:
    guard = (
        f"""
,fpg AS (
  SELECT doc_id, gh FROM (
    SELECT doc_id, gh, count(*) OVER (PARTITION BY gh) AS df FROM fp
  ) WHERE df <= {max_doc_freq}
)"""
        if max_doc_freq is not None
        else ",fpg AS (SELECT doc_id, gh FROM fp)"
    )
    return f"""
WITH fp AS ({_anchored_grams_sql(table, text_col, k)}
){guard}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(count(*) AS BIGINT) AS n_shared
FROM fpg a JOIN fpg b ON a.gh = b.gh AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING count(*) >= {min_shared}
"""


def corpus_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
) -> DataFrame:
    """The persistable fingerprint index: distinct (doc_id, gh) for the
    anchor-sampled k-grams — what a streaming ingest loop keeps in its
    store so arriving batches probe an index instead of re-shingling the
    corpus (the substring-tier analogue of the MinHash band-signature
    store in streaming/ingest_dedup.py)."""
    return _anchored_grams(docs, text_col, k)


def incremental_fingerprint_probe(
    new_docs: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_shared: int = 1,
    max_doc_freq: int | None = 64,
) -> DataFrame:
    """Candidate pairs TOUCHING the new batch — batch-internal plus
    batch-vs-corpus — via the fingerprint index; corpus text is never
    re-shingled. Bit-identical to the full-batch candidate set filtered
    to new-doc pairs, because the hash family is deterministic and the
    doc-frequency guard is evaluated over the union (deployment note: a
    real store keeps per-gram doc counts materialized, so the guard is
    an index lookup, not a recount).

    Scale posture (r10): the corpus index is PRUNED to the batch's gram
    set by a broadcast semi-join BEFORE anything shuffles — a store row
    whose gram no batch document holds cannot participate in a
    batch-touching pair, and for grams the batch DOES hold every corpus
    holder survives the prune, so the doc-frequency guard's union count
    is bit-identical. The per-batch store cost drops from two
    store-sized exchanges (the df window + the self-join both shuffled
    every store row on gh) to one store SCAN feeding a broadcast-hash
    semi-join — no store shuffle at all; only the (batch-sized) matching
    subset enters the window/join. Measured by
    tools/store_growth_shakeout.py: batch-vs-store-size exponent
    0.22 -> 0.11 (SCALE_SHAKEOUT.json store_growth_100x). The broadcast
    is the BATCH's distinct gram set — bounded by the micro-batch
    trigger size, which is the contract of this probe (a 500k-doc
    "batch" still cleared it in the 1000x shakeout; for corpus-scale
    re-dedup use the batch operator, whose plan has no broadcast).
    Batch rows are still the only text shingled; no corpus scan of
    text, no cross product.
    """
    new_fps = corpus_fingerprints(new_docs, text_col, k).withColumn(
        "is_new", F.lit(True)
    )
    batch_ghs = new_fps.select("gh").distinct()
    corpus_pruned = corpus_fps.join(F.broadcast(batch_ghs), "gh", "semi")
    allfps = new_fps.unionByName(corpus_pruned.withColumn("is_new", F.lit(False)))
    if max_doc_freq is not None:
        wg = Window.partitionBy("gh")
        allfps = (
            allfps.withColumn("df", F.count(F.lit(1)).over(wg))
            .filter(F.col("df") <= max_doc_freq)
            .drop("df")
        )
    a = allfps.alias("a")
    b = allfps.alias("b")
    return (
        a.join(b, "gh")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.col("a.is_new") | F.col("b.is_new"))
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .select("doc_a", "doc_b", F.col("n_shared").cast("long").alias("n_shared"))
    )


def incremental_fingerprint_sql(
    batch_pred: str,
    table: str = "documents",
    text_col: str = "text",
    k: int = DEFAULT_K,
    min_shared: int = 1,
    max_doc_freq: int | None = 64,
) -> str:
    """DuckDB oracle: the FULL candidate set filtered to pairs touching
    the batch — the equivalence the probe path must reproduce."""
    full = fingerprint_candidates_sql(table, text_col, k, min_shared, max_doc_freq)
    return f"""
SELECT * FROM ({full})
WHERE doc_a IN (SELECT doc_id FROM {table} WHERE {batch_pred})
   OR doc_b IN (SELECT doc_id FROM {table} WHERE {batch_pred})
"""
