"""Quality classifier: held-out separation, numpy parity of the codegen
scorer, and scale-shape assertions (no UDF, no shuffle in scoring)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from timedf_spark.operators import quality_model as qm

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def featured(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text", "lang")
    return qm.classifier_features(docs).cache()


@pytest.fixture(scope="module")
def theta(featured):
    return qm.train_quality_classifier(featured.filter("doc_id % 5 < 4"))


def test_classifier_separates_heldout(featured, theta):
    held = qm.score_documents(featured.filter("doc_id % 5 = 4"), theta)
    pdf = held.selectExpr("quality_prob", "quality_score >= 0.58e0 as y").toPandas()
    pred = pdf["quality_prob"] > 0.5
    acc = float((pred == pdf["y"]).mean())
    # the label distills a clipped-linear rule over the same feature space;
    # held-out separation should be near-perfect
    assert acc > 0.9, f"held-out accuracy {acc}"
    # both classes must actually appear, else accuracy is vacuous
    assert 0.1 < float(pdf["y"].mean()) < 0.9


def test_scorer_matches_numpy_sigmoid(featured, theta):
    scored = qm.score_documents(featured, theta)
    pdf = scored.select(*qm.FEATURES, "quality_prob").limit(200).toPandas()
    x = pdf[list(qm.FEATURES)].to_numpy(dtype=float)
    eta = x @ np.asarray(theta[:-1]) + theta[-1]
    expect = 1.0 / (1.0 + np.exp(-eta))
    np.testing.assert_allclose(pdf["quality_prob"].to_numpy(), expect, rtol=1e-12)


def test_buckets_in_range_and_cover_rows(featured, theta):
    scored = qm.score_documents(featured, theta)
    stats = scored.agg(
        F.min("prob_bucket").alias("lo"),
        F.max("prob_bucket").alias("hi"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("quality_prob").isNull().cast("int")).alias("nulls"),
    ).first()
    assert 0 <= stats["lo"] <= stats["hi"] <= 9
    assert stats["n"] == featured.count()
    assert stats["nulls"] == 0


def test_scoring_plan_has_no_shuffle_or_python(featured, theta):
    plan = (
        qm.score_documents(featured, theta)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_blocks_trainer_matches_catalyst_trainer(featured):
    from timedf_spark import ml

    train = featured.filter("doc_id % 5 < 4").withColumn(
        "__label", F.expr("cast(quality_score >= 0.58e0 as double)")
    )
    cols = list(qm.FEATURES)
    t_blocks = ml.fit_logistic_blocks(train, cols, "__label", l2=1e-2, max_iter=12)
    t_catalyst = ml.fit_logistic(train, cols, "__label", l2=1e-2, max_iter=12)
    np.testing.assert_allclose(t_blocks, t_catalyst, rtol=1e-5, atol=1e-7)


def test_training_is_split_invariant(featured):
    # IRLS over deterministic aggregates of the same rows must converge to
    # the same optimum regardless of partitioning (float-sum order may
    # differ in last bits; the optimum is tolerance-stable)
    t1 = qm.train_quality_classifier(featured.repartition(3))
    t2 = qm.train_quality_classifier(featured.repartition(17))
    np.testing.assert_allclose(t1, t2, rtol=1e-6, atol=1e-8)
