"""Persisted IVF index (operators/ivf_index.py): probing a freshly
built index must return IDENTICAL rows to the inline ivf_topk operator
(same deterministic centroids, assignment, probe ranking, re-rank);
the postings scan must show partition pruning; rebuilds converge."""

from __future__ import annotations

import pyspark.sql.functions as F

from timedf_spark.sources.readers import load_table


def _rows(df):
    return sorted(map(tuple, df.select("q_id", "vec_id", "rank", "cos").collect()))


def test_persisted_probe_equals_inline_operator(spark, sf_dir, tmp_path):
    from timedf_spark.operators import ivf_index
    from timedf_spark.operators.similarity import ivf_topk

    got = ivf_index.ann_ivf_persisted(
        spark, sf_dir, index_root=str(tmp_path / "idx")
    )
    want = ivf_topk(spark, sf_dir)
    assert _rows(got) == _rows(want) and got.count() > 0


def test_probe_plan_prunes_postings_partitions(spark, sf_dir, tmp_path):
    """The probed-cell list must reach the postings scan as a literal
    partition predicate: the scan's PartitionFilters is non-empty, so
    only probed cell directories are listed/read — the on-disk inverted
    list."""
    from timedf_spark.operators import ivf_index

    root = str(tmp_path / "idx")
    emb = load_table(spark, sf_dir, "embeddings")
    ivf_index.build_ivf_index(emb, root, n_cells=16)
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    out = ivf_index.ivf_topk_with_index(spark, root, queries, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan_lines = [
        l for l in plan.splitlines() if "PartitionFilters" in l
    ]
    assert scan_lines, plan[:2000]
    assert any("cell" in l and "PartitionFilters: []" not in l for l in scan_lines), (
        scan_lines
    )
    assert out.count() > 0


def test_rebuild_is_deterministic(spark, sf_dir, tmp_path):
    from timedf_spark.operators import ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    ivf_index.build_ivf_index(emb, str(tmp_path / "a"), n_cells=16)
    ivf_index.build_ivf_index(emb, str(tmp_path / "b"), n_cells=16)
    ca = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "a" / "centroids.parquet")).collect())
    )
    cb = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "b" / "centroids.parquet")).collect())
    )
    assert ca == cb
    pa = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "a" / "postings")).select("vec_id", "cell").collect())
    )
    pb = sorted(
        map(tuple, spark.read.parquet(str(tmp_path / "b" / "postings")).select("vec_id", "cell").collect())
    )
    assert pa == pb and len(pa) > 0


def test_stale_index_rebuilds_on_corpus_change(spark, sf_dir, tmp_path):
    """VERDICT r09 item 2 / ADVICE r09: regenerating the embeddings
    parquet at the SAME path must force a rebuild — before the manifest
    guard, any existing postings/_SUCCESS was reused and the probe
    silently answered from the OLD corpus (and the query is no-oracle,
    so the driver check could not catch it)."""
    from timedf_spark.operators import ivf_index

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    emb = load_table(spark, sf_dir, "embeddings")
    emb.filter(F.col("vec_id") < 200).write.mode("overwrite").parquet(
        str(corpus / "embeddings.parquet")
    )
    root = str(tmp_path / "idx")
    first = ivf_index.ann_ivf_persisted(
        spark, str(corpus), n_cells=8, nprobe=4, index_root=root
    )
    assert first.select(F.max("vec_id")).first()[0] < 200

    # regenerate the corpus at the same path: DIFFERENT rows (ids shifted
    # +1000), same file layout
    emb.filter(F.col("vec_id") < 200).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", *[
            c for c in emb.columns if c not in ("vec_id", "embedding")
        ]
    ).write.mode("overwrite").parquet(str(corpus / "embeddings.parquet"))
    second = ivf_index.ann_ivf_persisted(
        spark, str(corpus), n_queries=1005, n_cells=8, nprobe=4, index_root=root
    )
    # a stale probe would return vec_ids < 200 from the old postings;
    # the rebuilt index only knows the shifted ids
    assert second.select(F.min("vec_id")).first()[0] >= 1000


def test_stale_index_rebuilds_on_n_cells_change(spark, sf_dir, tmp_path):
    """A call with different n_cells must not serve the old cell layout."""
    import os

    from timedf_spark.operators import ivf_index

    corpus = tmp_path / "corpus"
    corpus.mkdir()
    emb = load_table(spark, sf_dir, "embeddings")
    emb.filter(F.col("vec_id") < 200).write.mode("overwrite").parquet(
        str(corpus / "embeddings.parquet")
    )
    root = str(tmp_path / "idx")
    ivf_index.ann_ivf_persisted(
        spark, str(corpus), n_cells=8, nprobe=4, index_root=root
    )
    ivf_index.ann_ivf_persisted(
        spark, str(corpus), n_cells=4, nprobe=4, index_root=root
    )
    cent = spark.read.parquet(os.path.join(root, "centroids.parquet"))
    assert cent.count() == 4
