"""Round-10 tests: collocation mining semantics the oracle can't see."""

from __future__ import annotations

import os

from timedf_spark.queries import all_queries

SF_SMALL = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_collocations_rank_bound_phrase_above_frequent_pair(spark):
    """'hong kong' (always together, moderate count) must outscore
    'the cat' (frequent words co-occurring incidentally) — the property
    PMI ranking exists for; and the hapax floor keeps one-off pairs out."""
    from timedf_spark.queries import round10
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "hong kong is busy . the cat saw the cat again") for i in range(6)]
        + [(100, "unique pairing once")],
        "doc_id long, text string",
    )
    # run the same dataflow as the query, against the constructed frame
    words = docs.select(F.split("text", " ").alias("t"))
    uni = words.select(F.explode("t").alias("w")).groupBy("w").count()
    assert uni.where("w = 'hong'").first()["count"] == 6

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = {
            (r["w1"], r["w2"]): r["pmi_ratio_scaled"]
            for r in round10.collocations(spark, d).collect()
        }
    assert ("hong", "kong") in out
    assert ("unique", "pairing") not in out  # below the support floor
    assert out[("hong", "kong")] > out.get(("the", "cat"), 0)


def test_collocations_gate_shape(spark):
    rows = all_queries()["collocations"].fn(spark, SF_SMALL).collect()
    assert 0 < len(rows) <= 25
    assert all(r["c_xy"] >= 5 for r in rows)
    # descending, deterministic tie-break
    keys = [(-r["pmi_ratio_scaled"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys)
