"""Exact weighted sampling without replacement — integer-only arithmetic.

Weighted reservoir sampling (Efraimidis–Spirakis, IPL 2006) orders items
by ``u^(1/w)`` — a transcendental whose last-ulp differences across
engines/libms make it impossible to verify by exact comparison (the same
reason tfidf_top_terms avoids log()). This operator gets the SAME
distribution from pure integer arithmetic: each item draws ``w``
independent 60-bit uniform hashes and keeps the MINIMUM; the bottom-k
items by that key are the sample.

Correctness of the race: for independent uniforms, P(min of item A's
``w_a`` draws beats min of B's ``w_b`` draws) = w_a / (w_a + w_b) — by
symmetry each of the w_a + w_b draws is equally likely to be the overall
minimum. That pairwise property (and its multi-item generalization:
argmin over all draws lands on item i with probability w_i / Σw) is
exactly the without-replacement inclusion law of the exponential-race /
A-ES scheme. Selection is a deterministic pure function of (id, salt),
reproducible at any parallelism — the same hash-not-RNG reproducibility
contract as corpus_mix.

Scale posture: cost is O(Σw) hash evaluations in ONE row-local
projection (no shuffle — the HOF runs inside the scan), then a
TakeOrderedAndProject for the bottom-k; nothing materializes the sorted
corpus. Keep weights coarse (e.g. size div 100) so Σw stays a small
multiple of row count; for unbounded float weights the ``u^(1/w)`` float
key is the fallback tier — same distribution, not oracle-exact.

Reference parity: the reference samples only via head/limit
(SURVEY.md §2 A3/F4); weighted corpus subsampling is what a
training-data mixture pipeline actually needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "weighted_bottomk",
    "weighted_bottomk_float",
    "race_key_spark",
    "race_key_duck",
    "cap_per_group",
]


def race_key_spark(id_col: str, weight_col: str, salt: str = "") -> str:
    """Spark SQL text of the min-of-w-hashes race key (60-bit bigint)."""
    h = (
        f"cast(conv(substring(md5(concat(cast({id_col} as string), '#{salt}#', "
        f"cast(j as string))), 1, 15), 16, 10) as bigint)"
    )
    return f"array_min(transform(sequence(1, {weight_col}), j -> {h}))"


def race_key_duck(id_col: str, weight_col: str, salt: str = "") -> str:
    """The DuckDB twin — same md5 text, same 60-bit prefix, value-identical."""
    h = (
        f"(('0x' || substr(md5(CAST({id_col} AS VARCHAR) || '#{salt}#' || "
        f"CAST(j AS VARCHAR)), 1, 15))::BIGINT)"
    )
    return f"list_min([{h} for j in range(1, {weight_col} + 1)])"


def weighted_bottomk(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Bottom-k rows by the weighted race key → input columns plus
    ``race_key``. ``weight_col`` must be a positive integer column;
    ordering ties break on ``id_col`` (keys are 60-bit, so a tie means a
    hash collision — broken deterministically all the same)."""
    return (
        df.withColumn("race_key", F.expr(race_key_spark(id_col, weight_col, salt)))
        .orderBy("race_key", id_col)
        .limit(k)
    )


def weighted_bottomk_float(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """The unbounded-weight tier: Efraimidis–Spirakis via the exponential
    race — key = -ln(u)/w with u a 53-bit hash-uniform in (0, 1], bottom-k
    by key. Same without-replacement distribution as the integer race
    (P(A beats B) = w_a/(w_a+w_b); an Exp(w) minimum IS the A-ES order),
    but ONE hash per row regardless of weight, and ``weight_col`` may be
    any positive DOUBLE — the tier to use when weights are token counts
    in the billions or real-valued mixture scores.

    Trade-off vs :func:`weighted_bottomk`: ln() is libm-dependent in the
    last ulp, so this tier is NOT cross-engine oracle-exact — it is
    pinned by the same ±3σ inclusion-law test instead. Still
    deterministic and parallelism-independent (hash, not RNG).

    Scale posture: one row-local projection (single md5 per row, no HOF
    loop), TakeOrderedAndProject bottom-k — strictly cheaper than the
    integer race's O(Σw) hashing."""
    # 52-bit uniform (13 hex chars): exactly representable in a double,
    # u = (h + 1) / 2^52 in (0, 1] — the +1 keeps u > 0 so ln(u) is finite.
    u = (
        f"(cast(conv(substring(md5(concat(cast({id_col} as string), "
        f"'#{salt}#')), 1, 13), 16, 10) as double) + 1.0) / 4503599627370496.0"
    )
    key = f"(-ln({u}) / cast({weight_col} as double))"
    return (
        df.withColumn("race_key", F.expr(key))
        .orderBy("race_key", id_col)
        .limit(k)
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_by,
    n: int,
    skew_spread: bool = True,
    broadcast_groups: bool = True,
) -> DataFrame:
    """Keep at most ``n`` rows per group under a deterministic total order
    — the per-domain document cap of a corpus-curation pipeline (cap docs
    per crawl domain / per source so no single origin dominates the mix).

    ``order_by`` is a list of Spark Columns forming a TOTAL order (caller
    must include a tiebreaker); the kept set is then a pure function of
    the data, independent of parallelism.

    Scale posture: the naive form — row_number over (PARTITION BY group)
    on the whole table — global-sorts every group and lands each hot
    domain on ONE reducer. This form instead:

    1. counts rows per group (partial-agg scan, group-grain result);
    2. groups already under the cap bypass the window entirely via a
       broadcast semi-join (no sort, no exchange of their rows beyond
       the join itself — at web scale most domains are under any cap);
    3. over-cap groups go through a TWO-STAGE top-n: a pre-window keyed
       by (group, input partition id) keeps <= n rows per partition —
       spreading a hot domain across the whole cluster instead of one
       reducer — then the final per-group window ranks at most
       n * num_partitions survivors per group. Exact because any row in
       the global top-n of its group is in the top-n of whatever
       partition it sits in.

    Set ``broadcast_groups=False`` when group cardinality is too large to
    broadcast (the semi-joins then shuffle); ``skew_spread=False`` skips
    the pre-window when groups are known near-uniform.
    """
    from pyspark.sql.window import Window

    cnt = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("_cnt"))
    under = cnt.filter(F.col("_cnt") <= n).select(*group_cols)
    over = cnt.filter(F.col("_cnt") > n).select(*group_cols)
    if broadcast_groups:
        under, over = F.broadcast(under), F.broadcast(over)
    small = df.join(under, group_cols, "left_semi")
    big = df.join(over, group_cols, "left_semi")
    if skew_spread:
        pre = Window.partitionBy(*group_cols, "_pid").orderBy(*order_by)
        big = (
            big.withColumn("_pid", F.spark_partition_id())
            .withColumn("_rn", F.row_number().over(pre))
            .filter(F.col("_rn") <= n)
            .drop("_pid", "_rn")
        )
    final = Window.partitionBy(*group_cols).orderBy(*order_by)
    capped = (
        big.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )
    return small.unionByName(capped)
