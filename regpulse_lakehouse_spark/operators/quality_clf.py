"""Trainable document-quality classifier — the fastText-style gate the
published pretraining pipelines use alongside heuristics (GPT-3 /
The Pile / PaLM data work: a linear classifier over bag-of-words
features, trained "positive = curated reference corpus, negative =
raw crawl", then every crawl document keeps/drops on the classifier
probability). The heuristic gates (functions/text.gopher_quality_flags,
operators/lm_score) are fixed rules; this operator learns the boundary
from labeled examples.

Spark-first shape (pyspark.ml, all JVM-side):

- features: HashingTF over the shared tokenizer (functions/text.tokens)
  — a fixed-width sparse vector per doc, no vocabulary state to
  collect, any corpus size;
- model: LogisticRegression — at scoring time the coefficient vector
  broadcasts with the plan (it is Stage metadata, ~n_features doubles)
  and transform() is one sparse dot product per row inside the JVM;
- training: runs on the LABELED table, which in every published recipe
  is orders of magnitude smaller than the corpus being scored (curated
  positives + sampled negatives); L-BFGS iterations each make one pass
  over the cached training set.

100 TB story: scoring is a stateless map over the corpus — no shuffle,
no Python stage, linear scale-out; only the (small) labeled set ever
feeds the iterative trainer. Persist with ``model.save(path)`` /
``load_quality_classifier`` (pyspark.ml native writers: JSON metadata
+ parquet coefficients).

Reference parity: the reference has no trainable gate (its quality
signals are fixed-rule, services/api/src/services/scan.ts) — this is
beyond-parity surface for the training-data-pipeline north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens

_TOKENS_COL = "_clf_tokens"
_FEATURES_COL = "_clf_features"


def _with_features(df: DataFrame, text: Column, n_features: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    toked = df.withColumn(_TOKENS_COL, tokens(F.lower(text)))
    tf = HashingTF(
        inputCol=_TOKENS_COL, outputCol=_FEATURES_COL, numFeatures=n_features
    )
    return tf.transform(toked)


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = 1 << 15,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the linear quality model on a labeled table
    (``label_col`` ∈ {0.0, 1.0}; 1 = keep-quality). Returns a
    ``LogisticRegressionModel`` whose ``numFeatures`` matches the
    hashing width (scoring re-derives features with the same width).

    Deterministic: HashingTF is a pure hash, L-BFGS from a fixed zero
    start on a fixed dataset converges to the same coefficients."""
    from pyspark.ml.classification import LogisticRegression

    feats = _with_features(labeled, F.col(text_col), n_features).select(
        F.col(label_col).cast("double").alias("label"), _FEATURES_COL
    )
    lr = LogisticRegression(
        featuresCol=_FEATURES_COL,
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return lr.fit(feats)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Append ``out_col`` = P(quality=1) per document. A stateless map:
    HashingTF + one sparse dot product per row, coefficients ride the
    plan as stage metadata — no shuffle, no Python stage, no collect."""
    from pyspark.ml.functions import vector_to_array

    feats = _with_features(df, F.col(text_col), model.numFeatures)
    scored = model.transform(feats)
    return scored.withColumn(
        out_col, vector_to_array(F.col(model.getProbabilityCol()))[1]
    ).drop(
        _TOKENS_COL,
        _FEATURES_COL,
        model.getRawPredictionCol(),
        model.getProbabilityCol(),
        model.getPredictionCol(),
    )


def load_quality_classifier(path: str):
    """Load a model persisted with ``model.save(path)``."""
    from pyspark.ml.classification import LogisticRegressionModel

    return LogisticRegressionModel.load(path)
