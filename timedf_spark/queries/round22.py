"""Round-22 queries: scale-guard variants and new analytics.

Reference parity: extension layer (intel-ai/timedf has no embedding or
dedup surface); the semantic-dedup tier extends the LLM-data-pipeline
components the engine adds beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from timedf_spark.operators import similarity
from timedf_spark.queries import QuerySpec

_CAP = 8


def _semantic_dedup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cosine_dedup_pairs with the per-vector degree bound — the
    adversarial-density guard for near-dup-heavy corpora (VERDICT r05
    item 4). Deterministic window linking keeps it oracle-exact; the
    recall cost vs the uncapped tier is measured in the evidence block
    (``semantic_dedup_degree_cap``)."""
    return similarity.cosine_dedup_pairs(spark, sf_dir, max_degree=_CAP)


SUITE: dict[str, QuerySpec] = {
    "semantic_dedup_capped": QuerySpec(
        "semantic_dedup_capped",
        _semantic_dedup_capped,
        similarity.cosine_dedup_capped_sql(_CAP),
        "degree-bounded SRP-LSH cosine near-dup pairs (linear candidate volume)",
    ),
}
