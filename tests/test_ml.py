"""Tests for the ML-adjacent dataflow layer (SURVEY.md §2.K/J1)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from timedf_spark import ml
from timedf_spark.sources import load_table


def test_stratified_split_exact_fractions(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    train, test = ml.stratified_split(emb, "label", 0.2, "vec_id")
    per_label = (
        train.groupBy("label").count().withColumnRenamed("count", "n_train")
        .join(test.groupBy("label").count().withColumnRenamed("count", "n_test"), "label")
        .collect()
    )
    for r in per_label:
        total = r["n_train"] + r["n_test"]
        assert r["n_test"] == total // 5  # exact systematic 20%
    assert train.count() + test.count() == emb.count()


def test_random_split_disjoint_and_stable(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    tr1, te1 = ml.random_split(emb, 0.25, seed=7, id_col="vec_id")
    tr2, te2 = ml.random_split(emb, 0.25, seed=7, id_col="vec_id")
    assert te1.count() == te2.count()  # deterministic
    assert tr1.join(te1, "vec_id", "inner").count() == 0  # disjoint
    assert tr1.count() + te1.count() == emb.count()
    frac = te1.count() / emb.count()
    assert 0.1 < frac < 0.4  # hash split is approximate


def test_encode_labels_dense_sorted(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    enc = ml.encode_labels(emb, "label")
    pairs = {(r["label"], r["label_idx"]) for r in enc.select("label", "label_idx").distinct().collect()}
    labels = sorted({p[0] for p in pairs})
    assert pairs == {(lab, i) for i, lab in enumerate(labels)}


def test_class_weights_map(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    w = ml.with_class_weights(emb, "label", {1: 2.0, 3: 2.0})
    got = {r["label"]: r["class_weight"] for r in w.select("label", "class_weight").distinct().collect()}
    for lab, cw in got.items():
        assert cw == (2.0 if lab in (1, 3) else 1.0)


def test_weighted_logloss_matches_numpy(spark):
    """Distributed agg form vs the reference's numpy formula
    (plasticc_pandas_modin.py:128-160) on a small random problem."""
    rng = np.random.default_rng(3)
    n, k = 300, 4
    y = rng.integers(0, k, n)
    p = rng.dirichlet(np.ones(k), n)
    weights = {0: 2.0, 2: 1.5}
    pdf = pd.DataFrame({"label_idx": y, "probs": [list(map(float, row)) for row in p]})
    sdf = spark.createDataFrame(pdf)
    got = ml.weighted_multiclass_logloss(sdf, weights=weights)

    eps = 1e-15
    pc = np.clip(p[np.arange(n), y], eps, 1 - eps)
    num = den = 0.0
    for c in range(k):
        mask = y == c
        wc = weights.get(c, 1.0)
        num += wc * np.log(pc[mask]).mean()
        den += wc
    expected = -num / den
    assert got == pytest.approx(expected, rel=1e-12)


def test_ridge_recovers_linear_relation(spark):
    rng = np.random.default_rng(11)
    n = 2000
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    y = 3.0 * x1 - 1.5 * x2 + 0.75 + rng.normal(scale=0.01, size=n)
    sdf = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "y": y}))
    theta = ml.fit_ridge(sdf, ["x1", "x2"], "y")
    assert theta[0] == pytest.approx(3.0, abs=0.01)
    assert theta[1] == pytest.approx(-1.5, abs=0.01)
    assert theta[2] == pytest.approx(0.75, abs=0.01)
    pred = ml.predict_ridge(sdf, ["x1", "x2"], theta)
    rmse = pred.select(
        F.sqrt(F.avg((F.col("prediction") - F.col("y")) ** 2)).alias("rmse")
    ).first()["rmse"]
    assert rmse < 0.02


def test_xgboost_gate_raises_cleanly(spark):
    sdf = spark.range(10).select(F.col("id").cast("double").alias("x"), (F.col("id") * 2).cast("double").alias("y"))
    with pytest.raises(NotImplementedError, match="xgboost"):
        ml.fit_xgboost(sdf, ["x"], "y")


def test_taxi_ml_pipeline_end_to_end(spark, sf_dir):
    """The full ny_taxi_ml shape (ny_taxi_ml.py:261-278): filter → features
    → split → train → predict, on orders. Sanity: finite RMSE, prediction
    correlates with target."""
    from timedf_spark.queries.ml_etl import ml_features

    feats = ml_features(spark, sf_dir).withColumn(
        "target", F.col("price_k") * 2.0 + F.col("o_day") * 0.1
    )
    train, test = ml.random_split(feats, 0.2, seed=1, id_col="o_orderkey")
    theta = ml.fit_ridge(train, ["price_k", "o_day"], "target")
    pred = ml.predict_ridge(test, ["price_k", "o_day"], theta)
    rmse = pred.select(F.sqrt(F.avg((F.col("prediction") - F.col("target")) ** 2))).first()[0]
    assert math.isfinite(rmse) and rmse < 0.01


def test_logistic_irls_matches_numpy_newton(spark):
    """Distributed IRLS must converge to the same coefficients as a
    driver-side numpy Newton solver on identical data (and both near the
    true generating weights)."""
    rng = np.random.default_rng(21)
    n = 4000
    x1, x2 = rng.normal(size=n), rng.normal(size=n)
    eta = 1.2 * x1 - 2.0 * x2 + 0.5
    y = (rng.uniform(size=n) < 1.0 / (1.0 + np.exp(-eta))).astype(float)
    sdf = spark.createDataFrame(pd.DataFrame({"x1": x1, "x2": x2, "y": y}))
    theta = ml.fit_logistic(sdf, ["x1", "x2"], "y", l2=1e-6)

    # numpy reference: same IRLS, same l2
    X = np.column_stack([x1, x2, np.ones(n)])
    b = np.zeros(3)
    for _ in range(50):
        p = 1.0 / (1.0 + np.exp(-X @ b))
        w = np.maximum(p * (1 - p), 1e-10)
        z = X @ b + (y - p) / w
        A = X.T @ (X * w[:, None]) + 1e-6 * np.eye(3)
        b_new = np.linalg.solve(A, X.T @ (w * z))
        if np.max(np.abs(b_new - b)) < 1e-10:
            b = b_new
            break
        b = b_new

    assert theta == pytest.approx(list(b), abs=1e-6)
    assert theta[0] == pytest.approx(1.2, abs=0.15)
    assert theta[1] == pytest.approx(-2.0, abs=0.15)
    # predictions calibrated: mean prob ~ base rate
    pred = ml.predict_logistic(sdf, ["x1", "x2"], theta)
    mean_p = pred.agg(F.avg("probability")).first()[0]
    assert mean_p == pytest.approx(float(y.mean()), abs=0.01)


def test_gbt_beats_ridge_on_nonlinear_target(spark):
    """fit_gbt must be real tree boosting: on a piecewise target
    (|x - 5|) a linear model is structurally unable to fit (symmetry makes
    the best line flat), while depth-limited boosted trees approximate it
    closely. Pins that the K4 stage is genuinely non-linear learning."""
    df = spark.range(2000).select(
        (F.col("id") % 100 / 10.0).alias("x"),
        F.abs(F.col("id") % 100 / 10.0 - 5.0).alias("y"),
    )
    model = ml.fit_gbt(df, ["x"], "y", max_iter=20, max_depth=4)
    pred = ml.predict_assembled(model, df, ["x"])
    gbt_rmse = pred.select(F.sqrt(F.avg((F.col("prediction") - F.col("y")) ** 2))).first()[0]
    theta = ml.fit_ridge(df, ["x"], "y")
    ridge_rmse = (
        ml.predict_ridge(df, ["x"], theta)
        .select(F.sqrt(F.avg((F.col("prediction") - F.col("y")) ** 2)))
        .first()[0]
    )
    assert gbt_rmse < 0.3 * ridge_rmse, (gbt_rmse, ridge_rmse)


def test_taxi_gbt_workload_end_to_end(spark, sf_dir):
    """K4 pipeline (ny_taxi_ml.py:222-258 shape): features → split → GBT
    train → predict; RMSE is finite and the summary schema is stable."""
    from timedf_spark.queries.ml_train import gbt_taxi_train

    row = gbt_taxi_train(spark, sf_dir).first()
    assert row["n_test"] > 0
    assert math.isfinite(row["rmse"])
    assert row["n_trees"] == 10
    # real signal, not noise-fitting: with cust_scaled in the basis the
    # euclidean target is learnable and the model must crush the
    # constant-mean baseline (the evidence block reports this same ratio)
    assert row["rmse"] < 0.5 * row["baseline_rmse"], (
        row["rmse"], row["baseline_rmse"]
    )


def test_plasticc_forest_beats_uniform_logloss(spark, sf_dir):
    """K5 pipeline (plasticc_pandas_modin.py:163-228 shape): multi-class
    forest + weighted logloss. Learnable quartile label → the loss must be
    well below the uniform-prior baseline ln(4)."""
    from timedf_spark.queries.ml_train import plasticc_forest_train

    row = plasticc_forest_train(spark, sf_dir).first()
    assert row["n_classes"] == 4
    assert row["logloss"] < 0.7 * math.log(4), row["logloss"]
