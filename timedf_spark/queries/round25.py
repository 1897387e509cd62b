"""Round-25 queries: two-sample distribution divergence (KS +
Wasserstein-1), rank statistics (Mann-Whitney U / AUC), a co-moment
Pearson correlation matrix, corpus keyness, entity-resolution blocking
audits, and a Simpson's-paradox slope audit.

Scale posture (the 100 TB lens, per query):

- ``price_divergence_report`` — two-sample KS statistic AND the
  Wasserstein-1 (earth-mover) distance between the 'O' and 'F' order
  price distributions in ONE pass: prices land on a fixed $1000 grid
  (the distribution comparison a 100 TB engine actually runs — the
  per-distinct-value CDF would put a global window over billions of
  rows; the grid caps the windowed relation at a few hundred rows no
  matter the corpus). Cross-multiplied integer CDFs (|cum1·n2 −
  cum2·n1|) keep both statistics hash-exact; the only global-order
  window runs AFTER aggregation to grid grain. Guarded pre-scaled
  divisors (the twap pattern) keep every product < 2^63 at any factor
  where counts < ~3e9.

- ``mann_whitney_discount`` — Mann-Whitney U between the 'A' and 'R'
  return flags' discount distributions via tie-corrected rank sums over
  the VALUE grain (11 distinct discounts): doubled average ranks
  (2·cum_before + count + 1) stay integer, so U, and the AUC estimate
  U/(n1·n2), are exact. No per-row ranking anywhere — the classic
  rank-sum trick that makes MW a two-shuffle statistic at any scale.
  Overflow bound (ADVICE r08): the rank-sum product r1x2 = Σ ca·rank2
  grows as ~2·n_a·N — with ANSI off Spark silently wraps past 2^63
  while DuckDB promotes to HUGEINT, so results diverge above ~2e9
  qualifying rows; add a HUGEINT-style two-step guard (the keyness
  pattern) before a >1000× port.

- ``corr_matrix_lineitem`` — Pearson correlation for all 6 pairs of 4
  quantized lineitem measures from ONE aggregation pass (15 exact int64
  co-moments), then the textbook ratio evaluated in IEEE double with an
  op order mirrored verbatim in the oracle (+, ×, sqrt, ÷ are all
  correctly-rounded under IEEE 754, unlike ln/exp — so the doubles are
  bit-identical across engines). Overflow bound: Σ(price_dollars²) ≈
  1.1e10/row → safe below ~8e8 rows; re-check before a >1000× port.

- ``keyness_odds_terms`` — corpus keyness of the lexicographically
  first source vs the rest as an add-one-smoothed rate ratio in basis
  points (the log-odds keyness WITHOUT the log — ln/exp are not
  correctly-rounded and would break cross-engine hash equality).
  Two-step scaled-integer division keeps every product < 2^63 for
  corpora up to ~9e9 tokens per side.

- ``blocking_profile`` — the audit every dedup blocking scheme runs
  before anyone materializes candidate pairs: per-scheme block count,
  max block, singleton count, candidate-pair volume Σ b(b−1)/2 and the
  reduction ratio vs n(n−1)/2 — ALL computed at block grain (one
  groupBy per scheme); no pair is ever materialized, which is the
  entire point of measuring a blocker before running it at 100 TB.

- ``simpson_slope_audit`` — per-nation OLS slope of price-on-discount
  vs the pooled slope, flagging sign reversals (Simpson's paradox).
  Co-moments are exact int64 per nation (25 groups, map-side combine);
  the slope ratio is the same mirrored-double pattern as the corr
  matrix; dimensions broadcast.

Reference parity: none of these exist in intel-ai/timedf (no
hypothesis-test, keyness, ER-audit, or paradox-detection surface;
SURVEY.md §2 extension rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

# --------------------------------------------------------------------
# price_divergence_report

_KS_GRID_DOLLARS = 1000


def price_divergence_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus").isin("O", "F"))
        .select(
            F.expr(
                f"CAST(floor(o_totalprice / {_KS_GRID_DOLLARS}.0) AS BIGINT)"
            ).alias("bucket"),
            "o_orderstatus",
        )
    )
    grid = o.groupBy("bucket").agg(
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("c2"),
    )
    # global-order window AFTER aggregation to grid grain (~500 rows)
    w_cum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    totals = grid.agg(
        F.sum("c1").alias("n_o"), F.sum("c2").alias("n_f")
    )
    cdf = (
        grid.select(
            "bucket",
            F.sum("c1").over(w_cum).alias("cum1"),
            F.sum("c2").over(w_cum).alias("cum2"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "n_o",
            "n_f",
            F.abs(F.col("cum1") * F.col("n_f") - F.col("cum2") * F.col("n_o")).alias(
                "d_num"
            ),
        )
    )
    sums = cdf.agg(
        F.max("d_num").alias("d_max"),
        F.sum("d_num").alias("d_sum"),
        F.min("n_o").alias("n_o"),
        F.min("n_f").alias("n_f"),
    )
    ks_at = (
        cdf.select("bucket", "d_num")
        .crossJoin(F.broadcast(sums.select("d_max")))
        .where(F.col("d_num") == F.col("d_max"))
        .agg(F.min("bucket").alias("ks_bucket"))
    )
    return sums.crossJoin(F.broadcast(ks_at)).select(
        "n_o",
        "n_f",
        F.expr("d_max DIV greatest((n_o * n_f) DIV 10000, 1)").alias("ks_bp"),
        "ks_bucket",
        F.expr(
            f"(d_sum DIV greatest((n_o * n_f) DIV {_KS_GRID_DOLLARS}, 1))"
        ).alias("emd_dollars"),
    )


PRICE_DIVERGENCE_ORACLE = f"""
WITH grid AS (
  SELECT CAST(floor(o_totalprice / {_KS_GRID_DOLLARS}.0) AS BIGINT) AS bucket,
         sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c2
  FROM orders WHERE o_orderstatus IN ('O', 'F')
  GROUP BY 1
), totals AS (SELECT sum(c1) AS n_o, sum(c2) AS n_f FROM grid),
cdf AS (
  SELECT bucket, n_o, n_f,
         abs(sum(c1) OVER (ORDER BY bucket) * n_f
             - sum(c2) OVER (ORDER BY bucket) * n_o) AS d_num
  FROM grid CROSS JOIN totals
), sums AS (
  SELECT max(d_num) AS d_max, sum(d_num) AS d_sum,
         min(n_o) AS n_o, min(n_f) AS n_f
  FROM cdf
), ks_at AS (
  SELECT min(bucket) AS ks_bucket
  FROM cdf, sums WHERE d_num = d_max
)
SELECT CAST(n_o AS BIGINT) AS n_o, CAST(n_f AS BIGINT) AS n_f,
       CAST(d_max // greatest((n_o * n_f) // 10000, 1) AS BIGINT) AS ks_bp,
       ks_bucket,
       CAST(d_sum // greatest((n_o * n_f) // {_KS_GRID_DOLLARS}, 1)
            AS BIGINT) AS emd_dollars
FROM sums CROSS JOIN ks_at
"""

# --------------------------------------------------------------------
# mann_whitney_discount


def mann_whitney_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag").isin("A", "R"))
        .select(
            F.expr("CAST(round(l_discount * 100) AS BIGINT)").alias("v"),
            "l_returnflag",
        )
    )
    grid = li.groupBy("v").agg(
        F.sum(F.when(F.col("l_returnflag") == "A", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("cr"),
    )
    # tie-corrected doubled average rank per value: 2*cum_before + ct + 1
    w_prev = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grid.select(
        "ca",
        "cr",
        (
            2 * F.coalesce(F.sum(F.col("ca") + F.col("cr")).over(w_prev), F.lit(0))
            + F.col("ca")
            + F.col("cr")
            + 1
        ).alias("rank2"),
    )
    return ranked.agg(
        F.sum("ca").alias("n_a"),
        F.sum("cr").alias("n_r"),
        F.sum(F.col("ca") * F.col("rank2")).alias("r1x2"),
    ).select(
        "n_a",
        "n_r",
        F.expr("r1x2 - n_a * (n_a + 1)").alias("u1_x2"),
        F.expr("2 * n_a * n_r - (r1x2 - n_a * (n_a + 1))").alias("u2_x2"),
        F.expr(
            "(r1x2 - n_a * (n_a + 1)) DIV greatest((2 * n_a * n_r) DIV 10000, 1)"
        ).alias("auc_bp"),
    )


MANN_WHITNEY_ORACLE = """
WITH grid AS (
  SELECT CAST(round(l_discount * 100) AS BIGINT) AS v,
         sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS ca,
         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS cr
  FROM lineitem WHERE l_returnflag IN ('A', 'R')
  GROUP BY 1
), ranked AS (
  SELECT ca, cr,
         2 * coalesce(sum(ca + cr) OVER (
               ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) + ca + cr + 1 AS rank2
  FROM grid
), agg AS (
  SELECT sum(ca) AS n_a, sum(cr) AS n_r, sum(ca * rank2) AS r1x2 FROM ranked
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_r AS BIGINT) AS n_r,
       CAST(r1x2 - n_a * (n_a + 1) AS BIGINT) AS u1_x2,
       CAST(2 * n_a * n_r - (r1x2 - n_a * (n_a + 1)) AS BIGINT) AS u2_x2,
       CAST((r1x2 - n_a * (n_a + 1))
            // greatest((2 * n_a * n_r) // 10000, 1) AS BIGINT) AS auc_bp
FROM agg
"""

# --------------------------------------------------------------------
# corr_matrix_lineitem

_CORR_PAIRS = [("q", "p"), ("q", "d"), ("q", "t"), ("p", "d"), ("p", "t"), ("d", "t")]

# the one float expression, shared verbatim (modulo identifier names)
# between the Spark plan and the DuckDB oracle so the IEEE op order is
# identical: every operand is cast to DOUBLE before any arithmetic, and
# +, ×, sqrt, ÷ are correctly-rounded under IEEE 754 → bit-equal results
def _corr_expr(x: str, y: str) -> str:
    n, sx, sy = "CAST(n AS DOUBLE)", f"CAST(s_{x} AS DOUBLE)", f"CAST(s_{y} AS DOUBLE)"
    sxy = f"CAST(s_{x}{y} AS DOUBLE)"
    sxx, syy = f"CAST(s_{x}{x} AS DOUBLE)", f"CAST(s_{y}{y} AS DOUBLE)"
    num = f"({n} * {sxy} - {sx} * {sy})"
    dx = f"({n} * {sxx} - {sx} * {sx})"
    dy = f"({n} * {syy} - {sy} * {sy})"
    return (
        f"CASE WHEN {dx} * {dy} <= 0 THEN NULL "
        f"ELSE {num} / sqrt({dx} * {dy}) END"
    )


def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(l_quantity AS BIGINT) AS q",
        "CAST(floor(l_extendedprice) AS BIGINT) AS p",
        "CAST(round(l_discount * 100) AS BIGINT) AS d",
        "CAST(round(l_tax * 100) AS BIGINT) AS t",
    )
    cols = ["q", "p", "d", "t"]
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(c).alias(f"s_{c}") for c in cols]
    aggs += [F.sum(F.col(c) * F.col(c)).alias(f"s_{c}{c}") for c in cols]
    aggs += [
        F.sum(F.col(x) * F.col(y)).alias(f"s_{x}{y}") for x, y in _CORR_PAIRS
    ]
    moments = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{x}', '{y}', {_corr_expr(x, y)}" for x, y in _CORR_PAIRS
    )
    return moments.selectExpr(
        "n",
        f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (x_col, y_col, corr)",
    ).select("x_col", "y_col", "n", "corr")


def _corr_oracle() -> str:
    branches = "\nUNION ALL\n".join(
        f"SELECT '{x}' AS x_col, '{y}' AS y_col, n, {_corr_expr(x, y)} AS corr FROM m"
        for x, y in _CORR_PAIRS
    )
    sums = ", ".join(
        ["count(*) AS n"]
        + [f"sum({c}) AS s_{c}" for c in ["q", "p", "d", "t"]]
        + [f"sum({c} * {c}) AS s_{c}{c}" for c in ["q", "p", "d", "t"]]
        + [f"sum({x} * {y}) AS s_{x}{y}" for x, y in _CORR_PAIRS]
    )
    return f"""
WITH base AS (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(floor(l_extendedprice) AS BIGINT) AS p,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_tax * 100) AS BIGINT) AS t
  FROM lineitem
), m AS (SELECT {sums} FROM base)
{branches}
"""


# --------------------------------------------------------------------
# keyness_odds_terms

_KEYNESS_TOPN = 40
_KEYNESS_MIN_COUNT = 3


def keyness_odds_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    target = docs.agg(F.min("source").alias("target_source"))
    toks = (
        docs.crossJoin(F.broadcast(target))
        .select(
            (F.col("source") == F.col("target_source")).alias("is_target"),
            F.explode(F.split("text", " ")).alias("term"),
        )
        .where(F.col("term") != "")
    )
    per_term = toks.groupBy("term").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("k_target"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).alias("k_rest"),
    )
    totals = per_term.agg(
        F.sum("k_target").alias("n_target"), F.sum("k_rest").alias("n_rest")
    )
    return (
        per_term.where(F.col("k_target") >= _KEYNESS_MIN_COUNT)
        .crossJoin(F.broadcast(totals))
        .selectExpr(
            "term",
            "k_target",
            "k_rest",
            # two-step scaled rate ratio: rates per-billion, ratio in bp
            "((k_target + 1) * 1000000000 DIV (n_target + 1)) * 10000"
            " DIV greatest((k_rest + 1) * 1000000000 DIV (n_rest + 1), 1)"
            " AS ratio_bp",
        )
        .orderBy(F.desc("ratio_bp"), "term")
        .limit(_KEYNESS_TOPN)
    )


KEYNESS_ORACLE = f"""
WITH target AS (SELECT min(source) AS target_source FROM documents),
toks AS (
  SELECT (source = target_source) AS is_target, t.term
  FROM documents CROSS JOIN target,
       unnest(str_split(text, ' ')) AS t(term)
  WHERE t.term <> ''
), per_term AS (
  SELECT term,
         sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS k_target,
         sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS k_rest
  FROM toks GROUP BY term
), totals AS (
  SELECT sum(k_target) AS n_target, sum(k_rest) AS n_rest FROM per_term
)
SELECT term, CAST(k_target AS BIGINT) AS k_target,
       CAST(k_rest AS BIGINT) AS k_rest,
       CAST(((k_target + 1) * 1000000000 // (n_target + 1)) * 10000
            // greatest((k_rest + 1) * 1000000000 // (n_rest + 1), 1)
            AS BIGINT) AS ratio_bp
FROM per_term CROSS JOIN totals
WHERE k_target >= {_KEYNESS_MIN_COUNT}
ORDER BY ratio_bp DESC, term
LIMIT {_KEYNESS_TOPN}
"""

# --------------------------------------------------------------------
# blocking_profile

_LEN_BUCKET = 64


def blocking_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "n_chars", "text")

    def _profile(keyed: DataFrame, scheme: str) -> DataFrame:
        blocks = keyed.groupBy("bkey").agg(F.count(F.lit(1)).alias("b"))
        return blocks.agg(
            F.lit(scheme).alias("scheme"),
            F.sum("b").alias("n_docs"),
            F.count(F.lit(1)).alias("n_blocks"),
            F.max("b").alias("max_block"),
            F.sum(F.when(F.col("b") == 1, 1).otherwise(0)).alias("singleton_blocks"),
            F.sum(F.expr("b * (b - 1) DIV 2")).alias("cand_pairs"),
        ).selectExpr(
            "scheme",
            "n_docs",
            "n_blocks",
            "max_block",
            "singleton_blocks",
            "cand_pairs",
            "10000 - cand_pairs DIV greatest((n_docs * (n_docs - 1) DIV 2)"
            " DIV 10000, 1) AS reduction_bp",
        )

    # NULL semantics made explicit on BOTH sides (ADVICE r08): concat_ws
    # SKIPS null operands while the oracle's || PROPAGATES them, so a null
    # lang/n_chars would land the row in different blocks across engines.
    # coalesce(lang,'') and coalesce(n_chars, -bucket) (→ bucket -1, exact
    # division so DIV-vs-// rounding can't differ) pin one shared key.
    a = _profile(
        docs.select(
            F.expr(
                "concat(coalesce(lang, ''), '|', "
                f"CAST(coalesce(n_chars, -{_LEN_BUCKET}) DIV {_LEN_BUCKET}"
                " AS STRING))"
            ).alias("bkey")
        ),
        "lang_len",
    )
    b = _profile(
        docs.select(F.split("text", " ").getItem(0).alias("bkey")), "first_token"
    )
    return a.unionAll(b).orderBy("scheme")


BLOCKING_ORACLE = f"""
WITH keyed AS (
  SELECT 'lang_len' AS scheme,
         coalesce(lang, '') || '|'
           || CAST(coalesce(n_chars, -{_LEN_BUCKET}) // {_LEN_BUCKET} AS VARCHAR)
           AS bkey
  FROM documents
  UNION ALL
  SELECT 'first_token' AS scheme, str_split(text, ' ')[1] AS bkey FROM documents
), blocks AS (
  SELECT scheme, bkey, count(*) AS b FROM keyed GROUP BY 1, 2
)
SELECT scheme,
       CAST(sum(b) AS BIGINT) AS n_docs,
       count(*) AS n_blocks,
       CAST(max(b) AS BIGINT) AS max_block,
       CAST(sum(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS singleton_blocks,
       CAST(sum(b * (b - 1) // 2) AS BIGINT) AS cand_pairs,
       CAST(10000 - sum(b * (b - 1) // 2)
            // greatest((sum(b) * (sum(b) - 1) // 2) // 10000, 1)
            AS BIGINT) AS reduction_bp
FROM blocks
GROUP BY scheme
ORDER BY scheme
"""

# --------------------------------------------------------------------
# simpson_slope_audit

_SLOPE_EXPR = (
    "CASE WHEN (CAST(n AS DOUBLE) * CAST(s_xx AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE)) <= 0 THEN NULL"
    " ELSE (CAST(n AS DOUBLE) * CAST(s_xy AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_y AS DOUBLE))"
    " / (CAST(n AS DOUBLE) * CAST(s_xx AS DOUBLE)"
    " - CAST(s_x AS DOUBLE) * CAST(s_x AS DOUBLE)) END"
)
_POOLED_SLOPE_EXPR = _SLOPE_EXPR.replace("n AS DOUBLE", "pn AS DOUBLE").replace(
    "s_x", "ps_x"
).replace("s_y", "ps_y")
# note: "s_xx" -> "ps_xx" and "s_xy" -> "ps_xy" already covered by the
# s_x replacement prefixing; keep the derivation mechanical and visible


def simpson_slope_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_suppkey",
        "CAST(round(l_discount * 100) AS BIGINT) AS x",
        "CAST(floor(l_extendedprice) AS BIGINT) AS y",
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name")
    )
    base = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    )
    mom = [
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s_x"),
        F.sum("y").alias("s_y"),
        F.sum(F.col("x") * F.col("y")).alias("s_xy"),
        F.sum(F.col("x") * F.col("x")).alias("s_xx"),
    ]
    per_nation = base.groupBy("n_name").agg(*mom)
    pooled = base.agg(*mom).selectExpr(
        "n AS pn", "s_x AS ps_x", "s_y AS ps_y", "s_xy AS ps_xy", "s_xx AS ps_xx"
    )
    return (
        per_nation.crossJoin(F.broadcast(pooled))
        .selectExpr(
            "n_name",
            "n",
            f"{_SLOPE_EXPR} AS slope",
            f"{_POOLED_SLOPE_EXPR} AS pooled_slope",
        )
        .selectExpr(
            "n_name",
            "n",
            "slope",
            "pooled_slope",
            "slope IS NOT NULL AND pooled_slope IS NOT NULL"
            " AND slope * pooled_slope < 0 AS sign_flip",
        )
        .orderBy("n_name")
    )


SIMPSON_ORACLE = f"""
WITH base AS (
  SELECT n_name,
         CAST(round(l_discount * 100) AS BIGINT) AS x,
         CAST(floor(l_extendedprice) AS BIGINT) AS y
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
), per_nation AS (
  SELECT n_name, count(*) AS n, sum(x) AS s_x, sum(y) AS s_y,
         sum(x * y) AS s_xy, sum(x * x) AS s_xx
  FROM base GROUP BY n_name
), pooled AS (
  SELECT count(*) AS pn, sum(x) AS ps_x, sum(y) AS ps_y,
         sum(x * y) AS ps_xy, sum(x * x) AS ps_xx
  FROM base
), j AS (
  SELECT n_name, CAST(n AS BIGINT) AS n,
         {_SLOPE_EXPR} AS slope,
         {_POOLED_SLOPE_EXPR} AS pooled_slope
  FROM per_nation CROSS JOIN pooled
)
SELECT n_name, n, slope, pooled_slope,
       slope IS NOT NULL AND pooled_slope IS NOT NULL
         AND slope * pooled_slope < 0 AS sign_flip
FROM j
ORDER BY n_name
"""


SUITE = {
    "price_divergence_report": QuerySpec(
        "price_divergence_report",
        price_divergence_report,
        PRICE_DIVERGENCE_ORACLE,
        "two-sample KS + Wasserstein-1 between O/F price distributions on a fixed grid, cross-multiplied integer CDFs",
    ),
    "mann_whitney_discount": QuerySpec(
        "mann_whitney_discount",
        mann_whitney_discount,
        MANN_WHITNEY_ORACLE,
        "Mann-Whitney U / AUC between return flags via tie-corrected doubled rank sums at value grain",
    ),
    "corr_matrix_lineitem": QuerySpec(
        "corr_matrix_lineitem",
        corr_matrix_lineitem,
        _corr_oracle(),
        "6-pair Pearson correlation matrix from one pass of exact int64 co-moments; mirrored IEEE double ratio",
    ),
    "keyness_odds_terms": QuerySpec(
        "keyness_odds_terms",
        keyness_odds_terms,
        KEYNESS_ORACLE,
        "corpus keyness (smoothed rate ratio, bp) of the first source vs the rest — log-odds without the log",
    ),
    "blocking_profile": QuerySpec(
        "blocking_profile",
        blocking_profile,
        BLOCKING_ORACLE,
        "ER blocking-scheme audit at block grain: candidate-pair volume and reduction ratio, no pair materialized",
    ),
    "simpson_slope_audit": QuerySpec(
        "simpson_slope_audit",
        simpson_slope_audit,
        SIMPSON_ORACLE,
        "per-nation vs pooled OLS slope with Simpson's-paradox sign-flip flags; exact co-moments, broadcast dims",
    ),
}
