"""Bloom-filter incremental dedup: no-false-negative property, exactness of
the end-to-end operator on manufactured duplicates, and the zero-corpus-
shuffle plan shape (broadcast joins only on the confirm pass)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from timedf_spark.operators import bloom


@pytest.fixture()
def corpus_and_batch(spark):
    corpus = spark.createDataFrame(
        [(i, f"corpus text number {i}") for i in range(200)], "doc_id long, text string"
    )
    # batch: 3 exact dups of corpus rows, 2 in-batch dup pairs, 4 fresh
    rows = [
        (1000, "corpus text number 7"),
        (1001, "corpus text number 42"),
        (1002, "corpus text number 199"),
        (1003, "batch dup A"),
        (1004, "batch dup A"),
        (1005, "batch dup B"),
        (1006, "batch dup B"),
        (1007, "fresh one"),
        (1008, "fresh two"),
        (1009, "fresh three"),
        (1010, "fresh four"),
    ]
    batch = spark.createDataFrame(rows, "doc_id long, text string")
    return corpus, batch


def test_bloom_no_false_negatives(spark):
    df = spark.createDataFrame([(f"key-{i}",) for i in range(5000)], "h string")
    bm = bloom.build_bloom(df, "h", m_bits=1 << 16, k=5)
    flagged = bloom.with_might_contain(df, "h", bm, k=5)
    assert flagged.filter(~F.col("might_contain")).count() == 0


def test_bloom_rejects_most_absent_keys(spark):
    present = spark.createDataFrame([(f"key-{i}",) for i in range(2000)], "h string")
    absent = spark.createDataFrame([(f"other-{i}",) for i in range(2000)], "h string")
    bm = bloom.build_bloom(present, "h", m_bits=1 << 16, k=5)
    fp = bloom.with_might_contain(absent, "h", bm, k=5).filter("might_contain").count()
    # m/n = 32.8 bits/key, k=5 → fpp well under 1%; allow 5% slack
    assert fp < 100


def test_incremental_dedup_exact_on_manufactured_dups(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    out = bloom.incremental_dedup(batch, corpus).select("doc_id").toPandas()
    # corpus dups 1000-1002 removed; in-batch keepers = min ids 1003, 1005;
    # fresh 1007-1010 kept
    assert sorted(out["doc_id"]) == [1003, 1005, 1007, 1008, 1009, 1010]


def test_incremental_dedup_tiny_bitmap_still_exact(spark, corpus_and_batch):
    # saturate the filter (64 bits for 200 keys → ~everything collides);
    # the confirm pass must still yield the exact answer
    corpus, batch = corpus_and_batch
    out = bloom.incremental_dedup(batch, corpus, m_bits=64, k=2).select("doc_id").toPandas()
    assert sorted(out["doc_id"]) == [1003, 1005, 1007, 1008, 1009, 1010]


def test_bitmap_build_is_partitioning_invariant(spark):
    df = spark.createDataFrame([(f"key-{i}",) for i in range(1000)], "h string")
    bm1 = bloom.build_bloom(df.repartition(1), "h", m_bits=1 << 14, k=3)
    bm2 = bloom.build_bloom(df.repartition(13), "h", m_bits=1 << 14, k=3)
    assert np.array_equal(bm1, bm2)


def test_confirm_pass_never_sortmerges_corpus(spark, corpus_and_batch):
    corpus, batch = corpus_and_batch
    plan = (
        bloom.incremental_dedup(batch, corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
