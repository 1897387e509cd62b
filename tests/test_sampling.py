"""Weighted race sampling: distribution law + engine-reference exactness."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from timedf_spark.operators.sampling import (
    race_key_spark,
    weighted_bottomk,
    weighted_bottomk_float,
)


def _py_key(id_str: str, weight: int, salt: str = "") -> int:
    return min(
        int(hashlib.md5(f"{id_str}#{salt}#{j}".encode()).hexdigest()[:15], 16)
        for j in range(1, weight + 1)
    )


def test_bottomk_matches_python_reference(spark):
    rows = [(i, (i * 7) % 5 + 1) for i in range(60)]
    df = spark.createDataFrame(rows, "item long, weight long")
    got = [
        (r["item"], r["race_key"])
        for r in weighted_bottomk(df, "item", "weight", 10).collect()
    ]
    keys = sorted((_py_key(str(i), w), i) for i, w in rows)[:10]
    assert got == [(i, k) for k, i in keys]


def test_k_equals_n_returns_everything(spark):
    df = spark.createDataFrame([(i, 2) for i in range(25)], "item long, weight long")
    assert weighted_bottomk(df, "item", "weight", 25).count() == 25


def test_inclusion_probability_proportional_to_weight(spark):
    """The race law: P(B's min beats A's min) = w_b/(w_a+w_b). With
    w_a=1, w_b=3 the expected win rate is 0.75; 400 independent salts
    (folded into the hashed id) give sd ≈ 0.022 — the [0.68, 0.82] gate
    is ±3σ. One Spark job over the (salt × item) grid."""
    n_salts = 400
    grid = spark.createDataFrame(
        [(s, item, w) for s in range(n_salts) for item, w in (("A", 1), ("B", 3))],
        "salt long, item string, weight long",
    ).withColumn("sid", F.expr("concat(item, '-', salt)"))
    keyed = grid.withColumn("k", F.expr(race_key_spark("sid", "weight")))
    wins = (
        keyed.groupBy("salt")
        .agg(F.min_by("item", F.struct("k", "item")).alias("winner"))
        .groupBy("winner")
        .count()
        .collect()
    )
    rate_b = {r["winner"]: r["count"] for r in wins}.get("B", 0) / n_salts
    assert 0.68 <= rate_b <= 0.82, rate_b


def test_float_tier_inclusion_law_and_float_weights(spark):
    """The exponential-race tier must obey the SAME inclusion law with
    real-valued weights (w_b/w_a = 3 → win rate 0.75 ± 3σ over 400
    salts), and must be deterministic across repartitioning (hash keys,
    not RNG)."""
    n_salts = 400
    grid = spark.createDataFrame(
        [(s, item, w) for s in range(n_salts) for item, w in (("A", 0.5), ("B", 1.5))],
        "salt long, item string, weight double",
    ).withColumn("sid", F.expr("concat(item, '-', salt)"))
    keyed = weighted_bottomk_float(grid, "sid", "weight", k=n_salts * 2)
    wins = (
        keyed.groupBy("salt")
        .agg(F.min_by("item", F.struct("race_key", "item")).alias("winner"))
        .groupBy("winner")
        .count()
        .collect()
    )
    rate_b = {r["winner"]: r["count"] for r in wins}.get("B", 0) / n_salts
    assert 0.68 <= rate_b <= 0.82, rate_b

    # determinism: a different physical partitioning picks the same rows
    df = spark.createDataFrame(
        [(i, 0.1 + (i % 7)) for i in range(200)], "item long, weight double"
    )
    a = {r["item"] for r in weighted_bottomk_float(df, "item", "weight", 20).collect()}
    b = {
        r["item"]
        for r in weighted_bottomk_float(df.repartition(13), "item", "weight", 20).collect()
    }
    assert a == b and len(a) == 20
