"""ML-adjacent dataflow (SURVEY.md §2.K, §2.J1) — Spark-native.

The reference's ML surface is: stratified split, label encoding, class
weights, XGBoost train/predict, and a custom weighted multi-class log-loss
(plasticc_pandas_modin.py:92-228, benchmark_utils.py:118-155). Here:

- splits/encoding/metric are distributed DataFrame ops (no sklearn);
- linear trainers: closed-form distributed ridge (one aggregation pass)
  and IRLS logistic — dependency-free, exactly testable against numpy;
- tree trainers: ``fit_gbt`` (pyspark.ml GBTRegressor) completes the
  taxi_ml regression stage and ``fit_multiclass_forest``
  (RandomForestClassifier, native softprob) the plasticc multi-class
  stage — stock Spark ML, fully distributed, evaluated with the same
  weighted log-loss the reference plugs into XGBoost;
- ``xgboost.spark`` integration is feature-gated: ``fit_xgboost`` uses the
  distributed SparkXGBRegressor/Classifier when the library exists and
  raises a clear error here (not installed in this container).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "stratified_split",
    "random_split",
    "encode_labels",
    "with_class_weights",
    "weighted_multiclass_logloss",
    "fit_ridge",
    "predict_ridge",
    "fit_logistic",
    "predict_logistic",
    "fit_gbt",
    "predict_assembled",
    "fit_multiclass_forest",
    "predict_multiclass_forest",
    "fit_xgboost",
]


# ---- K1: splits -----------------------------------------------------------

def stratified_split(
    df: DataFrame, label_col: str, test_fraction: float, order_col: str
) -> tuple[DataFrame, DataFrame]:
    """Exact systematic stratified split (sklearn-parity counts per stratum,
    deterministic given order_col). row_number per stratum → every
    round(1/f)-th row is test. One shuffle on the label; at 100 TB prefer
    ``random_split`` (shuffle-free) unless strict stratification matters."""
    every = round(1.0 / test_fraction)
    w = Window.partitionBy(label_col).orderBy(order_col)
    tagged = df.withColumn("__rn", F.row_number().over(w))
    test = tagged.filter(F.col("__rn") % every == 0).drop("__rn")
    train = tagged.filter(F.col("__rn") % every != 0).drop("__rn")
    return train, test


def random_split(
    df: DataFrame, test_fraction: float, seed: int, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """Deterministic hash-based split: no shuffle, no state, reproducible
    across runs and cluster sizes (unlike randomSplit, which depends on
    partitioning). Standard trick: bucket = xxhash64(id, seed) mod N."""
    n_buckets = 1_000_000
    cut = int(test_fraction * n_buckets)
    bucket = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_buckets))
    test = df.filter(bucket < cut)
    train = df.filter(bucket >= cut)
    return train, test


# ---- K2/K3: encoding + weights -------------------------------------------

def encode_labels(df: DataFrame, label_col: str, out_col: str = "label_idx") -> DataFrame:
    """LabelEncoder parity (ref: plasticc_pandas_modin.py:102-103): dense
    0..K-1 codes in sorted label order. Broadcast join against the distinct
    dictionary — the dictionary is tiny by definition."""
    dictionary = (
        df.select(label_col)
        .distinct()
        .withColumn(out_col, F.dense_rank().over(Window.orderBy(label_col)) - 1)
    )
    return df.join(F.broadcast(dictionary), label_col)


def with_class_weights(
    df: DataFrame, label_col: str, weights: dict, default: float = 1.0, out_col: str = "class_weight"
) -> DataFrame:
    """Literal weight map (ref: plasticc class_weights {64:2, 15:2})."""
    mapping = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    return df.withColumn(out_col, F.coalesce(mapping[F.col(label_col)], F.lit(default)))


def one_hot(df: DataFrame, col: str, values: Sequence[str] | None = None, prefix: str | None = None) -> DataFrame:
    """pandas.get_dummies parity (ref: plasticc_pandas_modin.py:135-143,
    including the missing-class zero-column fill): one 0/1 column per
    value. Pass ``values`` explicitly at scale — discovering them costs an
    extra distinct-scan, and fixed values make the schema stable."""
    if values is None:
        values = [r[0] for r in df.select(col).distinct().orderBy(col).collect()]
    p = prefix if prefix is not None else col
    return df.withColumns(
        {
            f"{p}_{v}": F.when(F.col(col) == v, F.lit(1)).otherwise(F.lit(0))
            for v in values
        }
    )


# ---- J1: weighted multi-class log-loss as distributed aggregation ---------

def weighted_multiclass_logloss(
    scored: DataFrame,
    label_col: str = "label_idx",
    probs_col: str = "probs",
    weights: dict[int, float] | None = None,
    eps: float = 1e-15,
) -> float:
    """plasticc's multi_weighted_logloss (plasticc_pandas_modin.py:128-160)
    as Spark aggs — works on any row count (the reference collects an n×14
    matrix driver-side; here only K partial sums cross the cluster):

        loss = -Σ_c w_c · mean_over_class_c(log p_true) / Σ_c w_c
    """
    w = weights or {}
    p_true = F.element_at(
        F.col(probs_col), (F.col(label_col) + 1).cast("int")
    ).cast("double")
    clipped = F.greatest(F.least(p_true, F.lit(1.0 - eps)), F.lit(eps))
    per_class = (
        scored.groupBy(label_col)
        .agg(F.avg(F.log(clipped)).alias("mean_log_p"))
        .collect()
    )
    num, den = 0.0, 0.0
    for r in per_class:
        wc = float(w.get(r[label_col], 1.0))
        num += wc * r["mean_log_p"]
        den += wc
    return -num / den if den else float("nan")


# ---- K4/K5: trainers ------------------------------------------------------

def fit_ridge(
    df: DataFrame, feature_cols: Sequence[str], target_col: str, l2: float = 1e-6
) -> list[float]:
    """Closed-form distributed ridge: one pass computes XᵀX and Xᵀy as
    aggregate sums (d(d+1)/2 + d doubles — trivially small), the driver
    solves the (d+1)×(d+1) system. Distribution-wise this is the optimal
    plan: single scan, map-side partial aggregation, no iteration."""
    import numpy as np

    cols = list(feature_cols) + ["__one"]
    dfx = df.withColumn("__one", F.lit(1.0))
    aggs: list[Column] = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"xx_{a}__{b}"))
        aggs.append(F.sum(F.col(a) * F.col(target_col)).alias(f"xy_{a}"))
    row = dfx.agg(*aggs).first()
    d = len(cols)
    xtx = np.zeros((d, d))
    xty = np.zeros(d)
    for i, a in enumerate(cols):
        for j in range(i, d):
            v = row[f"xx_{a}__{cols[j]}"]
            xtx[i, j] = xtx[j, i] = v
        xty[i] = row[f"xy_{a}"]
    xtx += l2 * np.eye(d)
    theta = np.linalg.solve(xtx, xty)
    return [float(t) for t in theta]  # weights..., intercept


def predict_ridge(df: DataFrame, feature_cols: Sequence[str], theta: Sequence[float]) -> DataFrame:
    expr = F.lit(float(theta[-1]))
    for c, t in zip(feature_cols, theta[:-1]):
        expr = expr + F.col(c) * F.lit(float(t))
    return df.withColumn("prediction", expr)


def fit_logistic(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    l2: float = 1e-6,
    max_iter: int = 25,
    tol: float = 1e-8,
) -> list[float]:
    """Distributed logistic regression by IRLS (iteratively reweighted
    least squares / Newton's method).

    Each iteration is ONE scan: the weighted moments Xᵀ W X and Xᵀ(W z)
    (z = Xθ + (y − p)/w the working response) are d(d+1)/2 + d aggregate
    sums with map-side combine — the same communication shape as
    fit_ridge, repeated until the Newton step converges (typically < 10
    rounds; each round ships O(d²) doubles to the driver, independent of
    row count). The driver solves the (d+1)×(d+1) system per round. This
    is the textbook distributed GLM layout (e.g. Spark MLlib's own
    ``LogisticRegression`` aggregates per-partition gradients the same
    way); no data ever concentrates on one node.
    """
    import numpy as np

    cols = list(feature_cols) + ["__one"]
    d = len(cols)
    theta = np.zeros(d)
    dfx = df.withColumn("__one", F.lit(1.0)).select(
        *[F.col(c).cast("double") for c in cols], F.col(label_col).cast("double").alias("__y")
    )
    dfx = dfx.cache()
    try:
        for _ in range(max_iter):
            eta = F.lit(float(theta[-1]))
            for c, t in zip(cols[:-1], theta[:-1]):
                eta = eta + F.col(c) * F.lit(float(t))
            # p = sigmoid(eta); w = p(1-p) clipped away from 0 for stability
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
            w = F.greatest(p * (F.lit(1.0) - p), F.lit(1e-10))
            z = eta + (F.col("__y") - p) / w
            work = dfx.withColumn("__w", w).withColumn("__z", z)
            aggs: list[Column] = []
            for i, a in enumerate(cols):
                for b in cols[i:]:
                    aggs.append(
                        F.sum(F.col("__w") * F.col(a) * F.col(b)).alias(f"xx_{a}__{b}")
                    )
                aggs.append(F.sum(F.col("__w") * F.col(a) * F.col("__z")).alias(f"xy_{a}"))
            row = work.agg(*aggs).first()
            xtx = np.zeros((d, d))
            xty = np.zeros(d)
            for i, a in enumerate(cols):
                for j in range(i, d):
                    v = row[f"xx_{a}__{cols[j]}"]
                    xtx[i, j] = xtx[j, i] = v
                xty[i] = row[f"xy_{a}"]
            xtx += l2 * np.eye(d)
            new_theta = np.linalg.solve(xtx, xty)
            step = float(np.max(np.abs(new_theta - theta)))
            theta = new_theta
            if step < tol:
                break
    finally:
        dfx.unpersist()
    return [float(t) for t in theta]  # weights..., intercept


def fit_logistic_blocks(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    l2: float = 1e-6,
    max_iter: int = 25,
    tol: float = 1e-8,
) -> list[float]:
    """IRLS logistic regression over cached numpy feature blocks.

    Same mathematics as :func:`fit_logistic` (one Xᵀ W X / Xᵀ W z reduction
    per Newton round, driver solve), different execution: the feature
    matrix is materialized ONCE into per-partition numpy blocks (a
    deliberate RDD escape hatch — the guidance's "per-partition imperative
    logic" case), and every subsequent round is a broadcast-θ ``map`` +
    binary-tree ``treeReduce`` of two small ndarrays. Catalyst planning and
    whole-stage codegen happen zero times inside the loop — with
    ``fit_logistic`` each round re-optimizes and re-compiles a plan whose θ
    literals changed (~0.7 s/round of pure driver overhead regardless of
    data size). Per-round communication is O(d² · partitions) ndarray
    bytes, compute is one BLAS matmul per block; at 100 TB the blocks stay
    distributed and the round time is the matmul, not the planner.
    """
    import numpy as np

    cols = list(feature_cols)
    d = len(cols) + 1
    sel = df.select(
        *[F.col(c).cast("double") for c in cols], F.col(label_col).cast("double").alias("__y")
    )

    def to_block(rows):
        mat = np.asarray([list(r) for r in rows], dtype=float)
        if mat.size:
            x = np.hstack([mat[:, :-1], np.ones((mat.shape[0], 1))])
            yield x, mat[:, -1]

    blocks = sel.rdd.mapPartitions(to_block).cache()
    sc = df.sparkSession.sparkContext
    theta = np.zeros(d)
    try:
        for _ in range(max_iter):
            bc = sc.broadcast(theta)

            def partial(block, _d=d):
                x, y = block
                eta = x @ bc.value
                p = 1.0 / (1.0 + np.exp(-eta))
                w = np.maximum(p * (1.0 - p), 1e-10)
                z = eta + (y - p) / w
                xw = x * w[:, None]
                return np.concatenate([(x.T @ xw).ravel(), x.T @ (w * z)])

            flat = blocks.map(partial).treeReduce(lambda a, b: a + b)
            bc.destroy()
            xtx = flat[: d * d].reshape(d, d) + l2 * np.eye(d)
            new_theta = np.linalg.solve(xtx, flat[d * d :])
            step = float(np.max(np.abs(new_theta - theta)))
            theta = new_theta
            if step < tol:
                break
    finally:
        blocks.unpersist()
    return [float(t) for t in theta]


def predict_logistic(
    df: DataFrame, feature_cols: Sequence[str], theta: Sequence[float]
) -> DataFrame:
    eta = F.lit(float(theta[-1]))
    for c, t in zip(feature_cols, theta[:-1]):
        eta = eta + F.col(c) * F.lit(float(t))
    return df.withColumn("probability", F.lit(1.0) / (F.lit(1.0) + F.exp(-eta)))


def _assemble(df: DataFrame, feature_cols: Sequence[str]) -> DataFrame:
    from pyspark.ml.feature import VectorAssembler

    return VectorAssembler(
        inputCols=list(feature_cols), outputCol="features", handleInvalid="skip"
    ).transform(df)


def fit_gbt(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    max_iter: int = 20,
    max_depth: int = 5,
    step_size: float = 0.1,
    seed: int = 42,
):
    """Gradient-boosted-tree regression via stock Spark ML — the in-sandbox
    completion of the reference's XGBoost train stage (K4,
    ny_taxi_ml.py:222-258: reg:squarederror, hist, 100 rounds). Same
    algorithmic family (boosted depth-limited trees, distributed histogram
    split search); trained by ``pyspark.ml.regression.GBTRegressor`` so the
    whole stage — feature assembly, tree induction, prediction — runs on
    the cluster. ``fit_xgboost`` remains the drop-in when the xgboost
    library is present.

    Returns the fitted GBTRegressionModel; score with
    :func:`predict_assembled`.
    """
    from pyspark.ml.regression import GBTRegressor

    est = GBTRegressor(
        featuresCol="features",
        labelCol=target_col,
        maxIter=max_iter,
        maxDepth=max_depth,
        stepSize=step_size,
        seed=seed,
    )
    return est.fit(_assemble(df, feature_cols))


def predict_assembled(model, df: DataFrame, feature_cols: Sequence[str]) -> DataFrame:
    """Score any pyspark.ml model trained on an assembled ``features``
    vector; adds its prediction columns to ``df``."""
    return model.transform(_assemble(df, feature_cols))


def fit_multiclass_forest(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str = "label_idx",
    num_trees: int = 40,
    max_depth: int = 8,
    seed: int = 42,
):
    """Multi-class tree-ensemble classifier — the in-sandbox completion of
    plasticc's XGBoost stage (K5, plasticc_pandas_modin.py:163-228:
    multi:softprob over 14 classes). Spark's GBTClassifier is binary-only,
    so the multi-class ensemble is ``RandomForestClassifier`` (distributed
    histogram trees, native multi-class softprob output) — evaluated with
    the same :func:`weighted_multiclass_logloss` the reference plugs into
    XGBoost as feval.
    """
    from pyspark.ml.classification import RandomForestClassifier

    est = RandomForestClassifier(
        featuresCol="features",
        labelCol=label_col,
        numTrees=num_trees,
        maxDepth=max_depth,
        seed=seed,
    )
    return est.fit(_assemble(df, feature_cols))


def predict_multiclass_forest(model, df: DataFrame, feature_cols: Sequence[str]) -> DataFrame:
    """Score a multi-class forest; emits ``probs`` as array<double> (the
    shape weighted_multiclass_logloss consumes) plus the argmax
    ``prediction``."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_assemble(df, feature_cols))
    return scored.withColumn("probs", vector_to_array(F.col("probability")))


def fit_xgboost(df: DataFrame, feature_cols: Sequence[str], target_col: str, **params):
    """Distributed XGBoost (ref: ny_taxi_ml.py:222-258, plasticc :163-228)
    via the official Spark estimator — feature-gated on the library."""
    try:
        from xgboost.spark import SparkXGBRegressor
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "xgboost is not installed in this environment; fit_ridge is the "
            "built-in trainer. With xgboost present this uses "
            "SparkXGBRegressor(features_col=..., label_col=...) distributed "
            "histogram training."
        ) from exc
    from pyspark.ml.feature import VectorAssembler

    assembled = VectorAssembler(inputCols=list(feature_cols), outputCol="features").transform(df)
    reg = SparkXGBRegressor(features_col="features", label_col=target_col, **params)
    return reg.fit(assembled)
