"""Dump plans for subtrees hidden behind checkpoint boundaries.

label_propagation checkpoints its symmetrized edge frame before the
rounds, so the final query plan shows only a LogicalRDD — the r12
symmetrization change (union of two edge-pipeline subtrees -> one
subtree + explode) is invisible in dump_plans_r12 output. This tool
rebuilds supplier_communities' edge frame exactly as the query does and
explains BOTH symmetrization shapes (plan-only, nothing executed):

    plans/r12/supplier_communities_edges_union.txt    (r11 shape)
    plans/r12/supplier_communities_edges_explode.txt  (r12 shape)

Usage: PYTHONPATH=. python tools/dump_subplans_r12.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from timedf_spark.operators.linkpred import resource_allocation_pairs  # noqa: E402
from timedf_spark.session import get_spark  # noqa: E402
from timedf_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
)


def _edges(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_custkey")
    bip = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "o_custkey", "l_suppkey"
    )
    return resource_allocation_pairs(
        bip, neighbor="o_custkey", node="l_suppkey"
    ).select("n1", "n2")


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump_subplans_r12")
    edges = _edges(spark)
    a, b = edges.columns[:2]
    union = edges.select(F.col(a).alias("src"), F.col(b).alias("dst")).unionAll(
        edges.select(F.col(b).alias("src"), F.col(a).alias("dst"))
    ).distinct()
    explode = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(a).alias("src"), F.col(b).alias("dst")),
                    F.struct(F.col(b).alias("src"), F.col(a).alias("dst")),
                )
            ).alias("_e")
        )
        .select("_e.src", "_e.dst")
        .distinct()
    )
    for tag, df in (("union", union), ("explode", explode)):
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"supplier_communities_edges_{tag}.txt")
        with open(path, "w") as f:
            f.write(
                f"# supplier_communities symmetrized-edge subtree ({tag}) at {SF_DIR}\n\n"
            )
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
