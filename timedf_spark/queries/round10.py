"""Round-10 queries: corpus collocation mining.

``collocations``: top word-bigram collocations by a PMI-monotone exact
integer score. PMI = log(N·c_xy / (c_x·c_y)) is monotone in the ratio
inside the log, so ranking by the ratio needs NO transcendentals: the
score is ``(N · c_xy · SCALE) DIV (c_x · c_y)`` — exact int64 (bounds:
N·c_xy·SCALE ≤ 1e6·1e5·1e4 = 1e15 at sf0.1 token counts). The
classical collocation / multi-word-expression extractor (Church &
Hanks '90), used on LLM corpora to sanity-check tokenizer merges and
mine phrase vocabularies — here with a min-count support floor so
hapax pairs (PMI's known pathology) never rank.

Plan: one bigram-grain count aggregate, one unigram-grain count
aggregate, two vocab-sized equi-joins to attach c_x/c_y, a 1-row N
broadcast, TakeOrdered top-k (no global sort).

Reference parity: none (intel-ai/timedf has no text surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_MIN_COUNT = 5
_SCALE = 10_000
_TOPN = 25


def collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    words = docs.select(F.split("text", " ").alias("t"))
    uni = (
        words.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = (
        words.select(
            F.explode(
                F.expr(
                    "case when size(t) >= 2 then "
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] as w1, t[i + 1] as w2)) "
                    "else array() end"
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .where(F.col("c_xy") >= _MIN_COUNT)
    )
    n_tok = uni.agg(F.sum("c").alias("n"))
    scored = (
        big.join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c_y")), "w2")
        .join(F.broadcast(n_tok))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.expr(f"(n * c_xy * {_SCALE}) DIV (c_x * c_y)").alias("pmi_ratio_scaled"),
        )
    )
    return scored.orderBy(
        F.desc("pmi_ratio_scaled"), F.asc("w1"), F.asc("w2")
    ).limit(_TOPN)


_COLLOC_ORACLE = f"""
WITH words AS (
  SELECT string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT w, count(*) AS c FROM (SELECT unnest(t) AS w FROM words) GROUP BY w
), big AS (
  SELECT w1, w2, count(*) AS c_xy FROM (
    SELECT t[i] AS w1, t[i + 1] AS w2
    FROM words, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i)
  ) GROUP BY w1, w2 HAVING count(*) >= {_MIN_COUNT}
), n_tok AS (
  SELECT cast(sum(c) AS BIGINT) AS n FROM uni
)
SELECT b.w1, b.w2, b.c_xy,
       cast((n_tok.n * b.c_xy * {_SCALE}) // (ux.c * uy.c) AS BIGINT)
         AS pmi_ratio_scaled
FROM big b
JOIN uni ux ON ux.w = b.w1
JOIN uni uy ON uy.w = b.w2
CROSS JOIN n_tok
ORDER BY pmi_ratio_scaled DESC, w1 ASC, w2 ASC
LIMIT {_TOPN}
"""


_PPR_ITERS = 6
_CUST_NS = 10_000_000  # customer node-id namespace offset (keys overlap)
_SEED_NATION = 3


def nation_seed_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the supplier→customer fulfillment
    graph, restarting into the suppliers of one nation — 'entities
    relevant to THIS nation's supply base', the seed-expansion move a
    graph-curation pass uses to grow a trusted-domain set. Same
    quantized-exact iteration discipline as supplier_pagerank; the
    restart vector rides the node frame."""
    from timedf_spark.operators.pagerank import personalized_pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("l_suppkey").alias("src"),
        (F.col("o_custkey") + _CUST_NS).alias("dst"),
    )
    supp = load_table(spark, sf_dir, "supplier")
    nodes = supp.select(F.col("s_suppkey").alias("node")).unionAll(
        load_table(spark, sf_dir, "customer").select(
            (F.col("c_custkey") + _CUST_NS).alias("node")
        )
    )
    seeds = supp.where(F.col("s_nationkey") == _SEED_NATION).select(
        F.col("s_suppkey").alias("node")
    )
    return personalized_pagerank(nodes, edges, seeds, iters=_PPR_ITERS)


def _ppr_oracle() -> str:
    from timedf_spark.operators.pagerank import personalized_pagerank_sql

    return personalized_pagerank_sql(
        "SELECT s_suppkey AS node FROM supplier "
        f"UNION ALL SELECT {_CUST_NS} + c_custkey FROM customer",
        f"SELECT l_suppkey AS src, {_CUST_NS} + o_custkey AS dst "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey",
        f"SELECT s_suppkey AS node FROM supplier WHERE s_nationkey = {_SEED_NATION}",
        iters=_PPR_ITERS,
    )


SUITE = {
    "nation_seed_ppr": QuerySpec(
        "nation_seed_ppr",
        nation_seed_ppr,
        _ppr_oracle(),
        "personalized PageRank: restart vector on the node frame, quantized-exact iterations, unrolled-CTE twin",
    ),
    "collocations": QuerySpec(
        "collocations",
        collocations,
        _COLLOC_ORACLE,
        "PMI-monotone collocation mining without transcendentals: bigram/unigram count aggregates, vocab-sized joins, TakeOrdered top-k",
    ),
}
