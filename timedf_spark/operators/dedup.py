"""Deduplication operators for LLM-data pipelines over ``documents``.

Four tiers, each the idiomatic Spark expression of a published technique:

1. exact_dedup          — hash-groupBy on md5(text): one shuffle on the
                          digest, arbitrarily wide scale-out. (The digest,
                          not the text, is the shuffle key: 16 bytes/row.)
2. ngram_jaccard_pairs  — exact word-shingle Jaccard via inverted-index
                          self-join: explode shingles → pre-hash each to a
                          60-bit md5-prefix int (8-byte, engine-identical
                          join keys) → join on the hash → per-pair
                          intersection counts. Quadratic in docs per
                          shingle; correct baseline + oracle for the
                          approximate tiers.
3. minhash_lsh_pairs    — MinHash signatures + LSH banding (Broder '97 /
                          MMDS ch.3): per-doc signature is a small agg;
                          candidate generation is an equi-join on
                          (band, band-signature) — linear-ish, the 100 TB
                          path. Hash = md5 (engine-independent) so even
                          this tier is oracle-checkable.
4. simhash64            — Charikar SimHash over tokens: 64-bit signature
                          from per-bit weighted sums; hamming-ball pairing
                          via 4×16-bit band exact-match (covers distance ≤3
                          by pigeonhole).

All tiers share the shingle/token expressions from operators.text and are
pure Column/HOF pipelines — no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.text import shingle_expr_duckdb, shingle_expr_spark
from timedf_spark.sources import fan_out, load_table

__all__ = [
    "exact_dedup",
    "exact_dedup_sql",
    "ngram_jaccard_pairs",
    "ngram_jaccard_pairs_df",
    "ngram_jaccard_sql",
    "ngram_jaccard_prefix_pairs",
    "minhash_lsh_pairs",
    "minhash_lsh_pairs_df",
    "minhash_lsh_sql",
    "incremental_near_dup_pairs",
    "incremental_near_dup_pairs_indexed",
    "simhash64",
]

# ---- tier 1: exact --------------------------------------------------------


def exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups of byte-identical texts: keeper (min doc_id) + group size."""
    return (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.expr("md5(text)").alias("text_hash"))
        .agg(
            F.expr("min(doc_id)").alias("keep_id"),
            F.count(F.lit(1)).alias("dup_cnt"),
        )
    )


EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS dup_cnt
FROM documents GROUP BY md5(text)
"""

# ---- tier 2: exact n-gram Jaccard ----------------------------------------

_K = 4  # word-shingle width
_JACCARD_THRESHOLD = 0.2

# Shingle → 60-bit int from the md5 hex prefix: stays under 2^63 so the
# conv() result is exact, and the SAME value is computable in DuckDB
# (('0x'||substr(md5,1,15))::BIGINT) — 8-byte join keys with oracle parity.
_HASH60_SPARK = "cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)"
_HASH60_DUCK = "(('0x' || substr(md5(s), 1, 15))::BIGINT)"


def ngram_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = _K,
    threshold: float = _JACCARD_THRESHOLD,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """All near-dup pairs (a<b) with shingle-set Jaccard ≥ threshold.

    Plan shape: explode distinct shingles (flatMap, no shuffle) → pre-hash
    each shingle to a 60-bit md5-prefix int (8-byte shuffle key, identical
    in both engines, so the oracle still matches exactly) → self equi-join
    on the hash (one shuffle each side) → count common per pair (one
    shuffle on the pair) → join per-doc set sizes (broadcast — the per-doc
    size table is |docs| rows). Shuffling 8-byte ints instead of k-word
    strings is what keeps the exchange volume sane at 100 TB; a 60-bit
    collision needs ~2^30 distinct shingles per joined pair to matter.
    """
    return ngram_jaccard_pairs_df(
        # 24 MB floor: join-dominated pipeline — the r08 A/B at sf0.1
        # measured the fan-out repartition LOSING 0.3-1.6 s on small
        # scans here (downstream exchanges re-partition anyway), while
        # at 100x the floor passes and the single-row-group scan still
        # fans out. Opt-in per call site (VERDICT r08 item 1).
        fan_out(load_table(spark, sf_dir, "documents"), min_bytes=24 << 20),
        k=k,
        threshold=threshold,
        max_doc_freq=max_doc_freq,
    )


def ngram_jaccard_pairs_df(
    docs: DataFrame,
    k: int = _K,
    threshold: float = _JACCARD_THRESHOLD,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Core of ngram_jaccard_pairs over any (doc_id, text) frame — used
    directly by composite pipelines that dedup a filtered subset rather
    than the raw table.

    ``max_doc_freq``: optional hot-shingle guard — drop shingles appearing
    in more than this many documents BEFORE pairing (common-shingle removal,
    as in Broder-style near-dup pipelines). This bounds the inverted-index
    self-join's per-shingle blowup at O(f²) instead of O(docs²), which is
    what keeps the exact tier usable beyond toy scale: stopword shingles
    shared by millions of docs would otherwise dominate the join. SEMANTICS
    CHANGE: Jaccard is then computed over the *filtered* shingle sets (both
    n_common and the set sizes exclude hot shingles), so scores for pairs
    whose overlap was mostly-common shingles drop — deliberately: such
    overlap is boilerplate, not near-duplication.
    """
    sh = docs.select(
        "doc_id", F.explode(F.expr(f"array_distinct({shingle_expr_spark('text', k)})")).alias("s")
    ).select("doc_id", F.expr(_HASH60_SPARK).alias("sh"))
    if max_doc_freq is not None:
        # Heavy hitters are few by definition (df > f) → broadcast anti-join;
        # costs one extra agg over sh but removes the quadratic hot buckets.
        # (A/B-measured at sf0.1: caching the RAW stream before the guard
        # and re-filtering per consumer is ~2x SLOWER than paying the one
        # extra shingle pass here — three broadcast-join passes over the
        # cached stream cost more than one md5 projection.)
        hot = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("sh")
        )
        sh = sh.join(F.broadcast(hot), "sh", "left_anti")
    sh = sh.cache()  # reused by both join sides + sizes (same as minhash)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    out = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.expr("n_common / (n_a + n_b - n_common)"))
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc_a", "doc_b", "n_common", "jaccard")


def ngram_jaccard_sql(
    k: int = _K,
    threshold: float = _JACCARD_THRESHOLD,
    src: str = "documents",
    max_doc_freq: int | None = None,
) -> str:
    """DuckDB oracle; ``src`` may be any table/CTE name with (doc_id, text).
    ``max_doc_freq`` mirrors the hot-shingle guard in ngram_jaccard_pairs_df."""
    sh = shingle_expr_duckdb("text", k)
    guard = (
        f"""
sh AS (
  SELECT doc_id, sh FROM sh_all
  WHERE sh NOT IN (SELECT sh FROM sh_all GROUP BY sh HAVING count(*) > {max_doc_freq})
),"""
        if max_doc_freq is not None
        else """
sh AS (SELECT doc_id, sh FROM sh_all),"""
    )
    return f"""
WITH shs AS (
  SELECT doc_id, unnest(list_distinct({sh})) AS s FROM {src}
),
sh_all AS (
  SELECT doc_id, {_HASH60_DUCK} AS sh FROM shs
),{guard}
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, n_common,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
"""

# ---- tier 3: MinHash + LSH -----------------------------------------------

_N_HASHES = 16
_BANDS = 4  # 4 bands × 4 rows: P(candidate) = 1-(1-j^4)^4 — s-curve at j≈0.55

# Universal-hash family over a 28-bit md5-prefix base value: products stay
# < 2^59, so the arithmetic is exact int64 in every engine (no overflow,
# no ANSI failure). p = 2^31 − 1 (Mersenne).
_MERSENNE_P = 2147483647


def _hash_params(n_hashes: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a_s, b_s) mixing constants, shared by the Spark
    expression and the DuckDB oracle text."""
    import random

    rng = random.Random(seed)
    return [
        (rng.randrange(1, _MERSENNE_P), rng.randrange(0, _MERSENNE_P))
        for _ in range(n_hashes)
    ]


def minhash_lsh_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = _K,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    threshold: float = _JACCARD_THRESHOLD,
) -> DataFrame:
    """LSH candidate pairs verified by exact Jaccard.

    Signature: minhash_s = min over shingles of (a_s·h + b_s) mod (2^31−1),
    where h is a 28-bit integer from one md5 prefix per shingle — a
    universal-hash family whose int64 arithmetic is exact and identical in
    any engine (one md5 per shingle, not one per slot).
    Banding: rows/band consecutive signature slots concatenated and
    re-hashed; a pair is a candidate iff some band matches exactly
    (equi-join on (band_idx, band_key) — THIS is what makes it linear at
    100 TB: no pairwise comparisons outside hash buckets).
    Verification: exact Jaccard on the candidates only.
    """
    return minhash_lsh_pairs_df(
        # 24 MB floor: same r08 A/B as the jaccard entry point — band
        # equi-joins re-partition downstream, small-scan fan-out is pure
        # overhead here; floor passes at 100x where it pays.
        fan_out(load_table(spark, sf_dir, "documents"), min_bytes=24 << 20),
        k=k,
        n_hashes=n_hashes,
        bands=bands,
        threshold=threshold,
    )


def minhash_lsh_pairs_df(
    docs: DataFrame,
    k: int = _K,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    threshold: float = _JACCARD_THRESHOLD,
) -> DataFrame:
    """Core of minhash_lsh_pairs over any (doc_id, text) frame — the
    scale-safe near-dup tier composite pipelines (curate_corpus) run."""
    # All n_hashes minhashes as independent aggregates of ONE groupBy —
    # single shuffle, no seed×row blowup, no collect_list. The hash family
    # is ONE md5 per shingle, pre-hashed to a 60-bit int at explode time
    # (so the cache, every join, and every shuffle carry 8-byte keys, not
    # k-word strings) + universal-hash mixing h_s = (a_s·h + b_s) mod p per
    # signature slot, where h is the top 28 bits (div 2^32) of the 60-bit
    # value — products stay < 2^59: exact int64 in any engine. Map-side
    # combine reduces each partition to one row per doc before the exchange.
    # (Signature construction shared with the incremental probe below.)
    bands_df, sh = _minhash_bands(docs, k, n_hashes, bands)
    return _lsh_pairs_from_bands(bands_df, sh, threshold)


def _lsh_pairs_from_bands(
    bands_df: DataFrame, sh: DataFrame, threshold: float = _JACCARD_THRESHOLD
) -> DataFrame:
    """Candidate generation + exact-Jaccard verify over PRECOMPUTED band
    rows and shingle rows — shared by minhash_lsh_pairs_df and the
    streaming ingest loop (which builds the batch's signature exactly
    once per micro-batch and reuses it for internal pairs, the corpus
    probe, and the persisted index write)."""
    a, b = bands_df.alias("a"), bands_df.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    pair_common = (
        sh.alias("x")
        .join(candidates, F.col("x.doc_id") == F.col("doc_a"))
        .join(
            sh.alias("y"),
            (F.col("y.doc_id") == F.col("doc_b")) & (F.col("x.sh") == F.col("y.sh")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        pair_common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.expr("n_common / (n_a + n_b - n_common)"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_sql(
    k: int = _K,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    threshold: float = _JACCARD_THRESHOLD,
    src: str = "documents",
) -> str:
    """DuckDB oracle; ``src`` may be any table/CTE name with (doc_id, text)."""
    rows_per_band = n_hashes // bands
    sh = shingle_expr_duckdb("text", k)
    base = "(sh // 4294967296)"
    minh_cols = ", ".join(
        f"min(({a} * {base} + {b}) % {_MERSENNE_P}) AS mh{s}"
        for s, (a, b) in enumerate(_hash_params(n_hashes))
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, md5(concat_ws(',', "
        + ", ".join(f"mh{s}" for s in range(b * rows_per_band, (b + 1) * rows_per_band))
        + ")) AS band_key FROM minh"
        for b in range(bands)
    )
    return f"""
WITH shs AS (
  SELECT doc_id, unnest(list_distinct({sh})) AS s FROM {src}
),
sh AS (
  SELECT doc_id, {_HASH60_DUCK} AS sh FROM shs
),
minh AS (
  SELECT doc_id, {minh_cols} FROM sh GROUP BY doc_id
),
bands AS (
  {band_rows}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
  SELECT doc_a, doc_b, count(*) AS n_common
  FROM cand
  JOIN sh x ON x.doc_id = doc_a
  JOIN sh y ON y.doc_id = doc_b AND x.sh = y.sh
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       n_common / (sa.n_sh + sb.n_sh - n_common) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common / (sa.n_sh + sb.n_sh - n_common) >= {threshold}
"""

# ---- tier 4: SimHash ------------------------------------------------------


def simhash64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document from token md5s (Charikar 2002).

    Per-token 64-bit hash = first 15 hex chars of md5 (60 bits, kept under
    2^63 so conv() stays exact); bit i contributes +1/-1 to a 60-lane sum;
    the sign vector is the signature. Emitted with 4×15-bit band keys for
    hamming-distance-≤3 candidate lookup (pigeonhole). Pure HOF pipeline:
    explode tokens → per-doc fold — one shuffle on doc_id.
    """
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", F.explode(F.expr("split(text, ' ')")).alias("w")
    )
    hashed = toks.withColumn(
        "h", F.expr("cast(conv(substring(md5(w), 1, 15), 16, 10) as bigint)")
    )
    # lane sums: +1 where bit set, -1 where clear
    lanes = hashed.groupBy("doc_id").agg(
        *[
            F.expr(f"sum(case when (h div {1 << i}) % 2 = 1 then 1 else -1 end)").alias(f"b{i}")
            for i in range(60)
        ]
    )
    sig = lanes.select(
        "doc_id",
        F.expr(
            "+".join(f"(case when b{i} > 0 then cast({1 << i} as bigint) else 0 end)" for i in range(60))
        ).alias("simhash"),
    )
    return sig.select(
        "doc_id",
        "simhash",
        *[
            F.expr(f"cast((simhash div {1 << (15 * j)}) % {1 << 15} as int)").alias(f"band{j}")
            for j in range(4)
        ],
    )


def simhash_sql() -> str:
    """DuckDB oracle for simhash64 — same md5-derived lanes.

    DuckDB lacks conv(); the 60-bit int is rebuilt from 15 hex chars via a
    fold over substrings: sum(hexval(c) * 16^pos).
    """
    # explicit 15-term sum with Python-precomputed 16^j constants — DuckDB's
    # power() returns double, which is inexact past 2^53 (16^14 ≈ 7e16)
    hexv = " + ".join(
        f"(cast(strpos('0123456789abcdef', substring(md5(w), {i + 1}, 1)) - 1 as bigint)"
        f" * {16 ** (15 - (i + 1))})"
        for i in range(15)
    )
    lanes = ", ".join(
        f"sum(case when (h // {1 << i}) % 2 = 1 then 1 else -1 end) AS b{i}" for i in range(60)
    )
    sig = "+".join(f"(case when b{i} > 0 then cast({1 << i} as bigint) else 0 end)" for i in range(60))
    bandsel = ", ".join(
        f"cast((simhash // {1 << (15 * j)}) % {1 << 15} as int) AS band{j}" for j in range(4)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
hashed AS (SELECT doc_id, {hexv} AS h FROM toks),
lanes AS (SELECT doc_id, {lanes} FROM hashed GROUP BY doc_id),
sig AS (SELECT doc_id, {sig} AS simhash FROM lanes)
SELECT doc_id, simhash, {bandsel} FROM sig
"""


# ---- incremental near-dup: new batch probed against an indexed corpus -----


def _minhash_bands(
    docs: DataFrame, k: int = _K, n_hashes: int = _N_HASHES, bands: int = _BANDS
) -> tuple[DataFrame, DataFrame]:
    """(band rows, shingle rows) for any (doc_id, text) frame — the same
    signature family as minhash_lsh_pairs_df, factored for reuse by the
    incremental probe. Shingle rows are cached (signatures + verification
    reuse them)."""
    rows_per_band = n_hashes // bands
    sh = docs.select(
        "doc_id", F.explode(F.expr(f"array_distinct({shingle_expr_spark('text', k)})")).alias("s")
    ).select("doc_id", F.expr(_HASH60_SPARK).alias("sh"))
    sh = sh.cache()
    base = "(sh div 4294967296)"
    minh = sh.groupBy("doc_id").agg(
        *[
            F.expr(f"min(({a} * {base} + {b}) % {_MERSENNE_P})").alias(f"mh{s}")
            for s, (a, b) in enumerate(_hash_params(n_hashes))
        ]
    )
    band_keys = [
        F.expr(
            "md5(concat_ws(',', "
            + ", ".join(f"mh{s}" for s in range(b * rows_per_band, (b + 1) * rows_per_band))
            + "))"
        ).alias(f"bk{b}")
        for b in range(bands)
    ]
    bands_df = minh.select("doc_id", *band_keys).select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"bk{b}").alias("band_key"))
                    for b in range(bands)
                ]
            )
        ).alias("tb"),
    ).select("doc_id", "tb.band", "tb.band_key")
    return bands_df, sh


def incremental_near_dup_pairs(
    new_batch: DataFrame,
    corpus: DataFrame,
    k: int = _K,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    threshold: float = _JACCARD_THRESHOLD,
) -> DataFrame:
    """Near-duplicate pairs between a (small) NEW batch and the existing
    corpus — the daily-ingest shape of the MinHash tier, the approximate
    sibling of bloom.incremental_dedup's exact hash check.

    Why this is the 100 TB shape: the corpus is NEVER self-joined and
    never shuffled for the candidate join — its band rows stream through
    a broadcast-hash probe against the batch's (tiny) band set. In a real
    deployment the corpus signatures are computed once at ingest time and
    stored (they are 16 bytes × bands per doc); here they are recomputed
    from the same deterministic hash family, which keeps the operator a
    pure function of its inputs and lets the DuckDB oracle replicate it
    end-to-end. The exact-Jaccard verification likewise touches only
    candidate docs' shingles: the corpus shingle stream is semi-joined
    down to candidates before the pair count.
    """
    batch_bands, batch_sh = _minhash_bands(new_batch, k, n_hashes, bands)
    corpus_bands, corpus_sh = _minhash_bands(corpus, k, n_hashes, bands)
    # r11: candidates feed the verify's broadcast join AND the shingle
    # prune — materialized once (the lazy form re-ran the probe join and
    # the corpus minhash aggregate per consumer); the bounded id list
    # prunes the verification shingles as a literal predicate.
    candidates, ids = _materialized_candidates(batch_bands, corpus_bands)
    cs = corpus_sh.withColumnRenamed("doc_id", "corpus_id")
    if ids is not None:
        corpus_cand_sh = cs.filter(F.col("corpus_id").isin(ids))
    else:
        corpus_cand_sh = cs.join(
            F.broadcast(candidates.select("corpus_id").distinct()),
            "corpus_id",
            "left_semi",
        )
    return _verify_batch_corpus(batch_sh, corpus_cand_sh, candidates, threshold)


def _probe_candidates(batch_bands: DataFrame, corpus_bands: DataFrame) -> DataFrame:
    """(batch_id, corpus_id) LSH candidates: the corpus band rows are
    probed by a BROADCAST of the (tiny) batch band set — the corpus side
    never shuffles."""
    return (
        corpus_bands.join(
            F.broadcast(batch_bands.withColumnRenamed("doc_id", "batch_id")),
            ["band", "band_key"],
        )
        .select(F.col("batch_id"), F.col("doc_id").alias("corpus_id"))
        .distinct()
    )


def _verify_batch_corpus(
    batch_sh: DataFrame,
    corpus_cand_sh: DataFrame,
    candidates: DataFrame,
    threshold: float,
) -> DataFrame:
    """Exact-Jaccard verification of batch↔corpus candidate pairs —
    shared by the rehash path (incremental_near_dup_pairs) and the
    signature-index path (incremental_near_dup_pairs_indexed). Inputs:
    batch shingles (doc_id, sh), corpus shingles already reduced to
    candidate docs (corpus_id, sh), candidates (batch_id, corpus_id)."""
    common = (
        batch_sh.withColumnRenamed("doc_id", "batch_id")
        .join(F.broadcast(candidates), "batch_id")
        .join(
            corpus_cand_sh,
            ["corpus_id", "sh"],
        )
        .groupBy("batch_id", "corpus_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes_b = batch_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_b")).withColumnRenamed("doc_id", "batch_id")
    sizes_c = corpus_cand_sh.groupBy("corpus_id").agg(F.count(F.lit(1)).alias("n_c"))
    return (
        common.join(F.broadcast(sizes_b), "batch_id")
        .join(F.broadcast(sizes_c), "corpus_id")
        .withColumn("jaccard", F.expr("n_common / (n_b + n_c - n_common)"))
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )


def incremental_near_dup_pairs_indexed(
    new_batch: DataFrame,
    corpus_docs: DataFrame,
    corpus_bands: DataFrame,
    k: int = _K,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    threshold: float = _JACCARD_THRESHOLD,
) -> DataFrame:
    """incremental_near_dup_pairs with a PRECOMPUTED corpus band-signature
    index — the deployment shape the rehash path's docstring promises.

    ``corpus_bands`` is the persisted (doc_id, band, band_key) store
    (written once per ingest batch, ~16 bytes × bands per doc). Candidate
    generation probes that index with a broadcast of the batch's band set
    — the corpus TEXT is never shingled or minhashed per batch. Only the
    candidate docs (a broadcast semi-join of ``corpus_docs``) are
    re-shingled for the exact-Jaccard verify, so per-batch corpus cost
    drops from O(corpus tokens) to O(index rows scanned + candidate-doc
    tokens). Same hash family, bit-identical pairs to the rehash path
    (pinned by test)."""
    batch_bands, batch_sh = _minhash_bands(new_batch, k, n_hashes, bands)
    return _incremental_pairs_indexed_pre(
        batch_bands, batch_sh, corpus_docs, corpus_bands, k, threshold
    )


_CAND_LITERAL_CAP = 8_192


def _materialized_candidates(batch_bands, corpus_bands, materialize: bool = True):
    """(candidates, ids): the LSH candidate pairs plus the bounded
    distinct corpus-id list (None when over the cap or when lazy).

    r11: candidates feed TWO consumers (the corpus-side prune and the
    verify's broadcast join) — lazy, the band-index probe executed once
    per consumer. One eager localCheckpoint runs it once, and the id
    list it yields turns the corpus-store prune from a broadcast
    semi-join into a LITERAL scan predicate that parquet row-group
    min/max stats can act on (store rows cluster by doc_id within each
    ingest batch dir, so a bounded id set skips most row groups — the
    flattening lever the r10 store-growth note asked for). The collect
    is bounded by limit(cap + 1); an overflowing candidate set falls
    back to the broadcast semi-join, never a giant predicate.

    r12 (VERDICT r11 item 7): ``materialize=False`` keeps the candidate
    frame LAZY — no checkpoint job, no collect. The eager shape's two
    extra driver round-trips are store-size-independent overhead that
    doubled the small-store streaming batch median (4.1 -> 8.0 s at the
    1x store) while its prune only pays off once the probed index is
    large; callers whose corpus_bands is a cheap store SCAN pass
    materialize=False under a store-size bound (streaming/ingest_dedup).
    Callers that DERIVE corpus_bands from corpus text (the rehash tier,
    the bench's in-query index builds) always materialize — lazy would
    re-run the corpus minhash once per consumer."""
    if not materialize:
        return _probe_candidates(batch_bands, corpus_bands), None
    candidates = _probe_candidates(batch_bands, corpus_bands).localCheckpoint(
        eager=True
    )
    rows = (
        candidates.select("corpus_id")
        .distinct()
        .limit(_CAND_LITERAL_CAP + 1)
        .collect()
    )
    ids = [int(r[0]) for r in rows] if len(rows) <= _CAND_LITERAL_CAP else None
    return candidates, ids


def _incremental_pairs_indexed_pre(
    batch_bands: DataFrame,
    batch_sh: DataFrame,
    corpus_docs: DataFrame,
    corpus_bands: DataFrame,
    k: int = _K,
    threshold: float = _JACCARD_THRESHOLD,
    materialize_candidates: bool = True,
) -> DataFrame:
    """Indexed probe with a PRECOMPUTED batch sketch (streaming ingest
    builds the batch signature once and fans it out)."""
    candidates, ids = _materialized_candidates(
        batch_bands, corpus_bands, materialize=materialize_candidates
    )
    # only candidate docs get shingled — the full corpus text stays cold
    if ids is not None:
        cand_docs = corpus_docs.filter(F.col("doc_id").isin(ids))
    else:
        cand_docs = corpus_docs.join(
            F.broadcast(
                candidates.select(F.col("corpus_id").alias("doc_id")).distinct()
            ),
            "doc_id",
            "left_semi",
        )
    corpus_cand_sh = cand_docs.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({shingle_expr_spark('text', k)})")).alias("s"),
    ).select(
        F.col("doc_id").alias("corpus_id"), F.expr(_HASH60_SPARK).alias("sh")
    )
    return _verify_batch_corpus(batch_sh, corpus_cand_sh, candidates, threshold)


def incremental_near_dup_pairs_sketched(
    new_batch: DataFrame,
    corpus_bands: DataFrame,
    corpus_sh: DataFrame,
    k: int = _K,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    threshold: float = _JACCARD_THRESHOLD,
) -> DataFrame:
    """Fully-sketched incremental probe: candidate generation reads the
    persisted band index AND the exact-Jaccard verify reads a persisted
    per-doc shingle store (doc_id, sh) — the corpus TEXT is never
    touched, at any stage. This is the lowest-latency micro-batch shape:
    per batch the corpus contributes one index scan (band rows) plus the
    candidate docs' stored shingle rows; everything corpus-sized moves
    through broadcast probes. Shingle rows are ~8 bytes × distinct
    shingles per doc — the storage cost of removing the text re-shingle
    from the hot path. Bit-identical pairs to the rehash path (same
    deterministic hash family; the store holds exactly what the rehash
    path recomputes) — pinned by test."""
    batch_bands, batch_sh = _minhash_bands(new_batch, k, n_hashes, bands)
    return _incremental_pairs_sketched_pre(
        batch_bands, batch_sh, corpus_bands, corpus_sh, threshold
    )


def _incremental_pairs_sketched_pre(
    batch_bands: DataFrame,
    batch_sh: DataFrame,
    corpus_bands: DataFrame,
    corpus_sh: DataFrame,
    threshold: float = _JACCARD_THRESHOLD,
    materialize_candidates: bool = True,
) -> DataFrame:
    """Sketched probe with a PRECOMPUTED batch sketch. The shingle store
    is the largest frame this tier touches (~10-100x the band index);
    the bounded literal prune from _materialized_candidates is what
    keeps its per-batch scan row-group-pruned rather than store-sized."""
    candidates, ids = _materialized_candidates(
        batch_bands, corpus_bands, materialize=materialize_candidates
    )
    cs = corpus_sh.select(F.col("doc_id").alias("corpus_id"), "sh")
    if ids is not None:
        corpus_cand_sh = cs.filter(F.col("corpus_id").isin(ids))
    else:
        corpus_cand_sh = cs.join(
            F.broadcast(candidates.select("corpus_id").distinct()),
            "corpus_id",
            "left_semi",
        )
    return _verify_batch_corpus(batch_sh, corpus_cand_sh, candidates, threshold)


def incremental_near_dup_sql(
    batch_pred: str,
    k: int = _K,
    n_hashes: int = _N_HASHES,
    bands: int = _BANDS,
    threshold: float = _JACCARD_THRESHOLD,
) -> str:
    """DuckDB oracle: the same family with documents split into batch
    (``batch_pred``) and corpus (its negation)."""
    rows_per_band = n_hashes // bands
    sh = shingle_expr_duckdb("text", k)
    base = "(sh // 4294967296)"
    minh_cols = ", ".join(
        f"min(({a} * {base} + {b}) % {_MERSENNE_P}) AS mh{s}"
        for s, (a, b) in enumerate(_hash_params(n_hashes))
    )

    def band_rows(src: str) -> str:
        return " UNION ALL ".join(
            f"SELECT doc_id, {b} AS band, md5(concat_ws(',', "
            + ", ".join(f"mh{s}" for s in range(b * rows_per_band, (b + 1) * rows_per_band))
            + f")) AS band_key FROM {src}"
            for b in range(bands)
        )

    return f"""
WITH bsrc AS (SELECT doc_id, text FROM documents WHERE {batch_pred}),
csrc AS (SELECT doc_id, text FROM documents WHERE NOT ({batch_pred})),
bshs AS (SELECT doc_id, unnest(list_distinct({sh})) AS s FROM bsrc),
bsh AS (SELECT doc_id, {_HASH60_DUCK} AS sh FROM bshs),
cshs AS (SELECT doc_id, unnest(list_distinct({sh})) AS s FROM csrc),
csh AS (SELECT doc_id, {_HASH60_DUCK} AS sh FROM cshs),
bminh AS (SELECT doc_id, {minh_cols} FROM bsh GROUP BY doc_id),
cminh AS (SELECT doc_id, {minh_cols} FROM csh GROUP BY doc_id),
bbands AS ({band_rows('bminh')}),
cbands AS ({band_rows('cminh')}),
cand AS (
  SELECT DISTINCT b.doc_id AS batch_id, c.doc_id AS corpus_id
  FROM bbands b JOIN cbands c ON b.band = c.band AND b.band_key = c.band_key
),
common AS (
  SELECT batch_id, corpus_id, count(*) AS n_common
  FROM cand
  JOIN bsh x ON x.doc_id = batch_id
  JOIN csh y ON y.doc_id = corpus_id AND x.sh = y.sh
  GROUP BY batch_id, corpus_id
),
sb AS (SELECT doc_id, count(*) AS n_b FROM bsh GROUP BY doc_id),
sc AS (SELECT doc_id, count(*) AS n_c FROM csh GROUP BY doc_id)
SELECT batch_id, corpus_id,
       n_common / (sb.n_b + sc.n_c - n_common) AS jaccard
FROM common
JOIN sb ON sb.doc_id = batch_id
JOIN sc ON sc.doc_id = corpus_id
WHERE n_common / (sb.n_b + sc.n_c - n_common) >= {threshold}
"""


def ngram_jaccard_prefix_pairs(
    spark: SparkSession,
    sf_dir: str,
    k: int = _K,
    threshold: float = _JACCARD_THRESHOLD,
    persist_mode: str = "cache",
) -> DataFrame:
    """EXACT Jaccard pairs via PPJoin-style prefix filtering — identical
    results to :func:`ngram_jaccard_pairs` (same oracle), structurally
    cheaper candidates.

    The inverted-index tier pairs every two docs sharing ANY shingle —
    per-shingle cost O(df²), and the verify happens inside the pairing
    join. Prefix filtering (Chaudhuri et al., "A Primitive Operator for
    Similarity Joins", ICDE 2006; Bayardo et al. WWW 2007) exploits the
    threshold: under one GLOBAL rare-first shingle order, a pair with
    J ≥ t must share a shingle within each doc's first
    |d| - ceil(t·|d|) + 1 ordered shingles. Candidates therefore join
    only on PREFIX shingles — and because prefixes are rare-first, the
    hottest (stopword) shingles fall outside most prefixes precisely
    because frequent shingles carry no evidence of similarity. A size
    filter (t·|a| ≤ |b| ≤ |a|/t) prunes further before verification.

    The exact verify then counts full-set intersections ONLY for
    candidate pairs: candidates ⋈ a-shingles ⋈ b-shingles — linear in
    candidate volume, not in shared-shingle volume. At corpus scale this
    is the exact tier you can actually run; the inverted-index form
    stays as the oracle-twin baseline.

    Blocking bounds use INTEGER arithmetic on a rational form of the
    threshold (num/den): ``ceil(t·n)`` in IEEE doubles can round UP when
    t·n is an exact integer (e.g. t = 0.3 stored as 0.30000…04, n = 10),
    which would shrink the prefix below the lossless bound and silently
    drop a threshold-boundary pair. ``ceil_div(num·n, den)`` and
    ``den·|b| ≥ num·|a|`` are exact for every representable threshold.
    """
    from fractions import Fraction

    from pyspark.sql.window import Window

    from timedf_spark.operators.cluster import _checkpoint, _release

    frac = Fraction(threshold).limit_denominator(1_000_000)
    num, den = frac.numerator, frac.denominator

    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.expr(f"array_distinct({shingle_expr_spark('text', k)})")).alias("s"),
    ).select("doc_id", F.expr(_HASH60_SPARK).alias("sh"))
    # feeds prefixes, sizes, and both verify sides — persist so the
    # explode runs once. persist_mode:
    #   "cache" (default, the query path): lazy .cache(); block cleanup is
    #     the harness's job (bench.py clearCache()s between queries). The
    #     r04 in-band disk checkpoint cost 2.6x per iteration for hygiene
    #     the harness already provides.
    #   "checkpoint": eager localCheckpoint + release before return — for
    #     long-lived sessions that run this outside a clearCache protocol.
    if persist_mode == "checkpoint":
        sh, sh_ids = _checkpoint(sh)
    else:
        sh = sh.cache()
        sh_ids = None

    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "sh")  # global rare-first
    prefix = (
        sh.join(freq, "sh")
        .join(F.broadcast(sizes), "doc_id")
        .withColumn("rk", F.row_number().over(w))
        # rk <= n_sh - ceil(t*n_sh) + 1, integer ceil-div form
        .filter(
            F.col("rk")
            <= F.col("n_sh")
            - F.expr(f"({num}L * n_sh + {den - 1}L) DIV {den}L")
            + 1
        )
        .select("doc_id", "sh", "n_sh")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            # size filter: J >= t forces t·|a| <= |b| and t·|b| <= |a|
            # (cross-multiplied to integers)
            & (F.lit(den) * F.col("b.n_sh") >= F.lit(num) * F.col("a.n_sh"))
            & (F.lit(den) * F.col("a.n_sh") >= F.lit(num) * F.col("b.n_sh")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verify restricted to candidates: count the full-set overlap
    common = (
        cands.join(sh.alias("x"), cands.doc_a == F.col("x.doc_id"))
        .select("doc_a", "doc_b", F.col("x.sh").alias("sh_a"))
        .join(
            sh.alias("y"),
            (F.col("doc_b") == F.col("y.doc_id")) & (F.col("sh_a") == F.col("y.sh")),
            "left_semi",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    # final verify keeps the float form — it defines the result semantics
    # and must match the inverted-index tier and the DuckDB oracle exactly
    result = (
        common.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .withColumn("jaccard", F.expr("n_common / (n_a + n_b - n_common)"))
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_common", "jaccard")
    )
    if persist_mode == "checkpoint":
        # materialize the (small) pair set, then free the shingle blocks —
        # same discipline as the iterative operators
        result, _ = _checkpoint(result)
        _release(sh, sh_ids)
    return result
