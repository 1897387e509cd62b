"""Fuzzy string matching: edit-distance self-join with q-gram prefix
blocking (Ed-Join family: Gravano et al. VLDB'01 count filtering,
Xiao/Wang/Lin VLDB'08 prefix filtering).

Reference parity: the reference engine's string surface is exact
equality / normalization (SURVEY.md §2 H9); record-linkage-grade fuzzy
matching is an extension-layer operator every real cleaning pipeline
needs (supplier/part name variants, near-identical doc titles).

Scale posture (100 TB lens):

- **Vocabulary grain, not row grain.** The operator deduplicates to
  DISTINCT values first — fuzzy matching 10^11 rows whose column has
  10^6 distinct values is a 10^6-string problem plus one hash
  aggregate. Verification cost is per candidate *pair of distinct
  values*, never per row pair.
- **Prefix filtering kills hot grams.** The inverted-index join is on
  each string's first ``k*q + 1`` grams under ONE global rare-first
  order, so frequent (stopword) grams fall outside most prefixes and
  the per-gram posting lists stay short — the same structural fix the
  PPJoin tier applies to Jaccard (operators/dedup.py).
- **Nothing quadratic outside the bounded short branch.** Strings with
  at most ``k*q`` distinct grams (length <~ q*(k+1) - 1 chars) can pair
  within edit distance k while sharing zero grams, so they cross only
  against EACH OTHER — a set bounded by the alphabet, broadcast on one
  side, never against the long tail.

Exactness: the q-gram lemma bounds the distinct-gram overlap of a pair
within edit distance k by ``|D(a) ∩ D(b)| >= max(|D(a)|,|D(b)|) - k*q``
(each edit destroys at most q gram positions, and a destroyed type
costs at least one destroyed position). The prefix-filter lemma then
guarantees any pair with that overlap shares a gram inside both
(k*q+1)-length rare-first prefixes whenever ``max(|D|) >= k*q + 1``;
the short branch covers the remainder. The final
``levenshtein(a,b) <= k`` verify makes the result EXACTLY the
brute-force cross-join answer — the DuckDB oracle runs the brute force,
so the two engines agree by construction, independent of the blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["candidate_pairs", "edit_distance_pairs", "edit_distance_probe"]


def _qgrams_expr(col: str, q: int) -> str:
    """Distinct q-gram array; a string shorter than q contributes itself."""
    return (
        f"array_distinct(transform(sequence(1, greatest(length({col}) - {q - 1}, 1)),"
        f" i -> substring({col}, i, {q})))"
    )


def candidate_pairs(
    names: DataFrame,
    col: str = "name",
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """Candidate (name_a, name_b) pairs, name_a < name_b — a superset of
    every pair within edit distance ``k`` (blocking only; no verify).
    Exposed separately so tests can measure candidate pruning."""
    prefix_len = k * q + 1
    vocab = (
        names.filter(F.col(col).isNotNull())
        .select(F.col(col).alias("name"))
        .distinct()
        .select(
            "name",
            F.length("name").alias("len"),
            F.explode(F.expr(_qgrams_expr("name", q))).alias("g"),
        )
    )
    sizes = vocab.groupBy("name", "len").agg(F.count(F.lit(1)).alias("n_g"))
    freq = vocab.groupBy("g").agg(F.count(F.lit(1)).alias("df"))
    # Rare-first global gram order; (df, g) is a total order so prefixes
    # are deterministic across partitionings and runs.
    w = Window.partitionBy("name").orderBy("df", "g")
    prefix = (
        vocab.join(F.broadcast(freq), "g")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= prefix_len)
        .select("name", "len", "g")
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    long_cands = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.name") < F.col("b.name"))
            # within edit distance k the lengths differ by at most k
            & (F.abs(F.col("a.len") - F.col("b.len")) <= k),
        )
        .select(F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b"))
    )
    # Short branch: both sides have <= k*q distinct grams — the prefix
    # guarantee needs max(|D|) >= k*q + 1, so these cross among
    # themselves only. Alphabet-bounded set; broadcast one side.
    short = sizes.filter(F.col("n_g") <= k * q).select("name", "len")
    sa, sb = short.alias("sa"), F.broadcast(short.alias("sb"))
    short_cands = sa.join(
        sb,
        (F.col("sa.name") < F.col("sb.name"))
        & (F.abs(F.col("sa.len") - F.col("sb.len")) <= k),
    ).select(F.col("sa.name").alias("name_a"), F.col("sb.name").alias("name_b"))
    # a pair can share several prefix grams / appear in both branches
    return long_cands.unionByName(short_cands).distinct()


def edit_distance_pairs(
    names: DataFrame,
    col: str = "name",
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """All unordered pairs of distinct ``col`` values within Levenshtein
    distance ``k`` → (name_a, name_b, dist), name_a < name_b.

    Exact: equals the brute-force cross join (see module docstring for
    the blocking proof). ``names`` may contain duplicates/nulls; the
    operator reduces to the distinct non-null vocabulary first.
    """
    return (
        candidate_pairs(names, col, k, q)
        # bigint, not Spark's int32: DuckDB levenshtein is BIGINT and the
        # driver's compare checks dtype widths (same convention as the
        # year() casts in queries/taxi.py)
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("dist") <= k)
        .select("name_a", "name_b", "dist")
    )


def _gram_sets(df: DataFrame, col: str, q: int, out: str) -> DataFrame:
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).alias(out))
        .distinct()
        .select(
            out,
            F.length(out).alias(f"{out}_len"),
            F.explode(F.expr(_qgrams_expr(out, q))).alias("g"),
        )
    )


def edit_distance_probe(
    corpus: DataFrame,
    batch: DataFrame,
    col: str = "name",
    k: int = 2,
    q: int = 2,
) -> DataFrame:
    """Incremental record linkage: every (batch name, corpus name) pair
    within Levenshtein distance ``k`` → (probe, match, dist).

    The daily-ingest shape (same decomposition as
    dedup.incremental_near_dup_pairs): the small batch side BROADCASTS —
    the corpus computes its prefix grams in one scan and equi-joins the
    broadcast batch prefixes; the corpus never self-joins and never
    shuffles for candidate generation. Both sides rank grams under ONE
    global order — corpus document frequency (batch-only grams default to
    df=0, i.e. rarest: unseen grams carry maximal evidence), tie-broken
    by gram — so the prefix-filter lemma applies across the two sets
    exactly as in the self-join case, with the same short-string branch.

    Exact: equals the brute-force batch × corpus cross join (DuckDB
    oracle runs the brute force).
    """
    prefix_len = k * q + 1
    cg = _gram_sets(corpus, col, q, "match")
    bg = _gram_sets(batch, col, q, "probe")
    freq = cg.groupBy("g").agg(F.count(F.lit(1)).alias("df"))

    def prefixes(grams: DataFrame, out: str) -> DataFrame:
        w = Window.partitionBy(out).orderBy("df", "g")
        return (
            grams.join(F.broadcast(freq), "g", "left")
            .na.fill({"df": 0})
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= prefix_len)
            .select(out, f"{out}_len", "g")
        )

    long_cands = (
        prefixes(cg, "match")
        .join(
            F.broadcast(prefixes(bg, "probe")),
            "g",
        )
        .filter(F.abs(F.col("probe_len") - F.col("match_len")) <= k)
        .select("probe", "match")
    )
    def shorts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.filter(F.col(col).isNotNull())
            .select(F.col(col).alias(out))
            .distinct()
            .filter(F.size(F.array_distinct(F.expr(_qgrams_expr(out, q)))) <= k * q)
            .select(out, F.length(out).alias(f"{out}_len"))
        )

    short_cands = (
        shorts(corpus, "match")
        .join(
            F.broadcast(shorts(batch, "probe")),
            F.abs(F.col("probe_len") - F.col("match_len")) <= k,
        )
        .select("probe", "match")
    )
    return (
        long_cands.unionByName(short_cands)
        .distinct()
        # bigint for cross-engine dtype parity (see edit_distance_pairs)
        .withColumn("dist", F.levenshtein("probe", "match").cast("long"))
        .filter(F.col("dist") <= k)
        .select("probe", "match", "dist")
    )
