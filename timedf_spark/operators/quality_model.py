"""Trained quality classifier over the documents table.

The production pattern this models (CCNet / GPT-3 / LLaMA data pipelines):
train a cheap linear classifier against a weak-supervision label — a
reference slice, or a rule-based heuristic — then score EVERY document and
keep/weight by the calibrated probability. The default label here distills
the Gopher-style rule ``quality_score >= τ`` (operators/text.py) into a
smooth scorer (Snorkel-style rule distillation; the testdata's text is
synthetic, so a corpus-external signal like wiki-vs-crawl is not
learnable from it). Swapping the label expression for a curated-vs-crawl
flag is a one-argument change.

Spark shape, end to end:
- features  — one codegen projection per document (operators/text.py
  stats + derived ratios). No UDFs, no shuffle.
- training  — ``ml.fit_logistic_blocks`` IRLS: the feature matrix is
  cached once as per-partition numpy blocks, then each Newton round is a
  broadcast-θ treeReduce of (XᵀWX, XᵀWz) partials; the driver solves a
  (d+1)² system. Communication per round is O(d²) doubles — independent
  of corpus size, so 100 TB trains in the same handful of rounds as 60k
  rows (sampling the train split down is a one-line filter if even the
  matmul-per-round is too dear).
- scoring   — the learned θ is folded into a literal sigmoid expression:
  whole-stage-codegen arithmetic over the feature projection, zero Python.
  Bucketing uses the score's VALUE (floor(p·10)), not its rank — a rank
  decile would need a global sort; a value bucket is a projection.

Training is iterative float aggregation → not expressible as one oracle
SQL; the driver records the rows-only check and the pytest suite pins
accuracy, numpy-parity of the scorer, and bucket sanity instead.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timedf_spark.ml import fit_logistic_blocks
from timedf_spark.operators.text import with_text_stats

__all__ = ["FEATURES", "classifier_features", "train_quality_classifier", "score_documents"]

# Engineered, scale-free features (ratios / clipped counts — comparable
# magnitudes keep the IRLS normal equations well-conditioned without a
# standardization pass). len_clip/stop_clip are the saturating transforms
# quality heuristics actually use (Gopher's length and stopword gates) —
# with them in the basis, a thresholded rule over them is an exact
# halfspace, so the distilled model can match the rule rather than merely
# approximate its smooth part.
FEATURES: tuple[str, ...] = (
    "stop_ratio",
    "uniq_ratio",
    "punct_ratio",
    "len_clip",
    "stop_clip",
    "mean_word_len",
)


def classifier_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One projection: text stats + derived model features."""
    out = with_text_stats(df, text_col)
    return out.withColumns(
        {
            "punct_ratio": F.expr("n_punct / cast(n_chars_obs as double)"),
            "len_clip": F.expr("least(n_tokens / 50e0, 1e0)"),
            "stop_clip": F.expr("least((n_stop / n_tokens) / 3e-1, 1e0)"),
            # tokens are space-split: chars minus separators over tokens
            "mean_word_len": F.expr(
                "(n_chars_obs - (n_tokens - 1)) / cast(n_tokens as double) / 1e1"
            ),
        }
    )


def train_quality_classifier(
    featured: DataFrame,
    label_expr: str = "cast(quality_score >= 0.58e0 as double)",
    feature_cols: Sequence[str] = FEATURES,
    l2: float = 1e-2,
    max_iter: int = 12,
) -> list[float]:
    """IRLS fit; returns θ with the intercept LAST (fit_logistic layout).

    The default l2 is deliberately non-tiny: a rule-distillation label is
    linearly separable in this basis, and without regularization IRLS
    would walk the weights toward infinity for all ``max_iter`` rounds
    (each round a full scan). l2=1e-2 makes the optimum finite and the
    Newton iteration converge in a handful of rounds at any data scale.
    """
    train = featured.withColumn("__label", F.expr(label_expr))
    return fit_logistic_blocks(train, list(feature_cols), "__label", l2=l2, max_iter=max_iter)


def score_documents(
    featured: DataFrame,
    theta: Sequence[float],
    feature_cols: Sequence[str] = FEATURES,
    out_col: str = "quality_prob",
) -> DataFrame:
    """sigmoid(x·θ) as a literal codegen expression + a value-decile bucket."""
    eta = F.lit(float(theta[-1]))
    for c, t in zip(feature_cols, theta[:-1]):
        eta = eta + F.col(c).cast("double") * F.lit(float(t))
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
    return featured.withColumn(out_col, prob).withColumn(
        "prob_bucket", F.least(F.floor(F.col(out_col) * 10), F.lit(9)).cast("long")
    )
