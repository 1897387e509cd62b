"""Round-19 queries: sketch-based join-size estimation.

``join_size_sketch`` — the approximate companion to round-11's exact
``join_size_report``: estimate |A ⋈ B| from two count-min sketches via
the CMS inner product (Cormode & Muthukrishnan '05 §4.2), and report
the estimate NEXT TO the exact size with the overcount in basis
points. This is the planner move when even the per-key count frames
are too big to join: each sketch is d·w cells regardless of table
size, sketches are mergeable (streaming/cms_apply.py pattern), and the
inner product touches only the two d·w-cell frames.

Because the sketch lanes are the engine-portable md5 construction from
``operators/cms.py``, the whole report — estimate included — is
ORACLE-CHECKABLE exactly, an unusual property for an approximate
estimator (the approximation is deterministic, so both engines compute
the identical wrong-by-a-bounded-amount number). The CMS guarantee
est >= exact is also pinned per row by a test.

w is the accuracy budget: expected overcount is N_a*N_b/w per hash
row, so a fixed-size sketch DEGRADES relatively as tables grow — which
is exactly why the report carries the exact size and overcount next to
the estimate (self-evaluating, like near_dup_tier_report). At 100 TB
one sizes w to the error budget, not the data; the test pins the
3*N_a*N_b/w Markov bound.

Reference parity: none (intel-ai/timedf has no sketch or planner
surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timedf_spark.operators.cms import (
    cms_build_from_counts,
    cms_inner_product,
    cms_join_size_sql,
)
from timedf_spark.queries import QuerySpec
from timedf_spark.sources import load_table

_D = 5
_W = 65536

_JOINS = [
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
]


def join_size_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for name, lt, lk, rt, rk in _JOINS:
        # isNotNull on BOTH branches' shared input: the exact equi-join
        # infers isnotnull(k) into its aggregate subtree; without the
        # same filter on the sketch branch the two aggregate subtrees
        # canonicalize differently and exchange reuse cannot fire.
        # Result-identical for any input: a NULL key's md5 lane is NULL,
        # so its cell matches nothing in the inner product (both
        # engines), and the exact inner join drops NULL keys anyway.
        left = (
            load_table(spark, sf_dir, lt)
            .select(F.col(lk).alias("k"))
            .where(F.col("k").isNotNull())
        )
        right = (
            load_table(spark, sf_dir, rt)
            .select(F.col(rk).alias("k"))
            .where(F.col("k").isNotNull())
        )
        # r11: no fan_out — the sketch build aggregates to per-key counts
        # before its md5 lanes, so the per-row CPU runs AFTER the groupBy
        # exchange (already at full parallelism); the fan-out repartition
        # would only add an exchange ahead of a cheap partial count.
        # r12: ONE per-key count aggregate per side feeds BOTH the sketch
        # lanes and the exact branch — the aggregate subtrees are
        # byte-identical, so Spark's ReusedExchange shares the shuffle
        # (scan + partial agg run once per side) with no materialization.
        # The r11 experiment shared them via eager checkpoints instead,
        # which serialized the two branches and measured slower; exchange
        # reuse keeps the branches concurrent (VERDICT r11 item 4).
        lc = left.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        rc = right.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        est = cms_inner_product(
            cms_build_from_counts(lc.select(F.col("k").alias("item"), "n"), _D, _W),
            cms_build_from_counts(rc.select(F.col("k").alias("item"), "n"), _D, _W),
            _D,
        )
        exact = lc.join(rc.withColumnRenamed("n", "cr"), "k").agg(
            F.sum(F.col("n") * F.col("cr")).alias("exact_rows")
        )
        row = (
            est.join(F.broadcast(exact))
            .select(
                F.lit(name).alias("join_name"),
                "exact_rows",
                "est_rows",
                F.expr("(est_rows - exact_rows) * 10000 DIV exact_rows").alias(
                    "overcount_bp"
                ),
            )
        )
        out = row if out is None else out.unionAll(row)
    return out.orderBy("join_name")


def _sketch_oracle() -> str:
    parts = []
    for name, lt, lk, rt, rk in _JOINS:
        est = cms_join_size_sql(
            _D, _W,
            f"SELECT {lk} AS item FROM {lt}",
            f"SELECT {rk} AS item FROM {rt}",
        )
        parts.append(
            f"""SELECT '{name}' AS join_name, exact.exact_rows, est.est_rows,
       cast((est.est_rows - exact.exact_rows) * 10000 // exact.exact_rows AS BIGINT)
         AS overcount_bp
FROM ({est}) est CROSS JOIN (
  SELECT cast(sum(cl * cr) AS BIGINT) AS exact_rows
  FROM (SELECT {lk} AS k, count(*) AS cl FROM {lt} GROUP BY 1) a
  JOIN (SELECT {rk} AS k, count(*) AS cr FROM {rt} GROUP BY 1) b USING (k)
) exact"""
        )
    return " UNION ALL ".join(parts) + " ORDER BY join_name"


SUITE = {
    "join_size_sketch": QuerySpec(
        "join_size_sketch",
        join_size_sketch,
        _sketch_oracle(),
        "CMS inner-product join-size estimate next to the exact size — deterministic sketch, oracle-exact report",
    ),
}
