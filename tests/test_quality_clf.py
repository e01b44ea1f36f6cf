"""Trainable quality classifier (operators/quality_clf.py): learned
keep/drop separation, determinism, persistence round-trip, plan purity
(scoring must be a stateless JVM map), and the prepare_corpus gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import quality_clf as QC


def _labeled(spark, n=120):
    """Synthetic labeled set: clean prose vs keyboard-mash garbage."""
    rows = []
    for i in range(n):
        clean = (
            f"the regulatory filing number {i} describes quarterly "
            f"obligations for licensed entities operating across state "
            f"lines with clear reporting duties and deadlines"
        )
        garbage = (
            f"zzqx{i} wkppt vvnm {i}xj qqqq lorem0x zx!!k m{i}vv "
            f"asdfgh jkl{i} qwerty zxcvb {i}nm"
        )
        rows.append((2 * i, clean, 1.0))
        rows.append((2 * i + 1, garbage, 0.0))
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_and_is_deterministic(spark):
    labeled = _labeled(spark)
    model = QC.train_quality_classifier(labeled, n_features=1 << 12)
    scored = QC.score_quality(labeled, model)
    rows = scored.select("doc_id", "label", "quality_prob").collect()
    clean = [r["quality_prob"] for r in rows if r["label"] == 1.0]
    garbage = [r["quality_prob"] for r in rows if r["label"] == 0.0]
    assert min(clean) > 0.5 and max(garbage) < 0.5  # full separation on train
    assert sum(clean) / len(clean) > 0.9
    assert sum(garbage) / len(garbage) < 0.1
    # deterministic: refit on the same data → identical coefficients
    model2 = QC.train_quality_classifier(labeled, n_features=1 << 12)
    assert model.coefficients.toArray().tolist() == pytest.approx(
        model2.coefficients.toArray().tolist(), abs=1e-9
    )


def test_classifier_generalizes_to_unlabeled(spark):
    model = QC.train_quality_classifier(_labeled(spark), n_features=1 << 12)
    unseen = spark.createDataFrame(
        [
            (900, "the agency published new reporting obligations for "
                  "licensed entities with quarterly deadlines"),
            (901, "vvnm zx qqqq wkppt asdfgh zzqx9 jkl qwerty"),
        ],
        "doc_id long, text string",
    )
    probs = {r["doc_id"]: r["quality_prob"] for r in QC.score_quality(unseen, model).collect()}
    assert probs[900] > 0.5 > probs[901]


def test_classifier_save_load_roundtrip(spark, tmp_path):
    labeled = _labeled(spark, n=40)
    model = QC.train_quality_classifier(labeled, n_features=1 << 12)
    path = str(tmp_path / "clf")
    model.save(path)
    back = QC.load_quality_classifier(path)
    a = QC.score_quality(labeled, model).select("doc_id", "quality_prob").collect()
    b = QC.score_quality(labeled, back).select("doc_id", "quality_prob").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_scoring_plan_is_stateless_jvm_map(spark):
    """Scoring must be shuffle-free and Python-free: hashed features +
    a sparse dot product with broadcast-with-the-plan coefficients."""
    labeled = _labeled(spark, n=40)
    model = QC.train_quality_classifier(labeled, n_features=1 << 12)
    scored = QC.score_quality(labeled.select("doc_id", "text"), model)
    scored.count()
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_prepare_corpus_clf_gate(spark):
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    model = QC.train_quality_classifier(_labeled(spark), n_features=1 << 12)
    clean = " ".join(
        f"the commission adopted rule{i} covering quarterly reporting "
        f"obligations for licensed entities in region{i * 7 % 13} with "
        f"clear deadlines and duties"
        for i in range(6)
    )
    garbage = " ".join(
        f"wkppt{i} vvnm qqqq zzqx{i} asdfgh jkl{i} qwerty zxcvb nm{i} zx"
        for i in range(8)
    )
    docs = spark.createDataFrame(
        [(1, clean), (2, garbage)], "doc_id long, text string"
    )
    r = prepare_corpus(docs, clf_model=model, clf_floor=0.5)
    kept = {x["doc_id"] for x in r.stages["clf_gate"].select("doc_id").collect()}
    # doc 2 may already fail the heuristic gate; the learned gate must
    # at minimum keep the clean doc and the stage must exist
    assert 1 in kept and 2 not in kept
    prov = {x["doc_id"]: x["dropped_at"] for x in r.provenance().collect()}
    assert prov.get(2) in ("quality", "clf_gate")


# --- frozen-coefficient portable scoring (round 13) -------------------------


def test_frozen_coefficients_match_live_retrain(spark):
    """The literals in FROZEN_TERM_WEIGHTS/FROZEN_BIAS must be exactly
    what train_term_weight_classifier produces from
    FROZEN_TRAINING_SET — the freeze is a cache of a deterministic
    run, not hand-tuned numbers. Tolerance covers L-BFGS libm drift
    across platforms, far below the 8-dp freeze granularity's effect
    on any 6-dp-rounded score."""
    from regpulse_lakehouse_spark.operators import quality_clf as QC

    labeled = spark.createDataFrame(
        list(QC.FROZEN_TRAINING_SET), "label double, text string"
    )
    w, b = QC.train_term_weight_classifier(labeled, QC.FROZEN_VOCAB)
    assert set(w) == set(QC.FROZEN_TERM_WEIGHTS)
    for t, v in w.items():
        assert abs(v - QC.FROZEN_TERM_WEIGHTS[t]) < 1e-4, (t, v)
    assert abs(b - QC.FROZEN_BIAS) < 1e-4


def test_frozen_scoring_matches_hand_computation(spark):
    """score_with_term_weights is a plain logistic dot product over
    term counts — verify against a pure-Python reimplementation on
    known texts (separates the arithmetic from the oracle SQL)."""
    import math

    from regpulse_lakehouse_spark.operators import quality_clf as QC

    texts = [
        "fast join window stream",
        "slow big scan scan slow",
        "spark agg filter",
        "no vocabulary terms at all",
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r["i"]: (r["quality_prob"], r["quality_prob_hits"])
        for r in QC.score_with_term_weights(df).collect()
    }
    for i, t in enumerate(texts):
        toks = t.lower().split()
        dot = QC.FROZEN_BIAS
        hits = 0
        for term in sorted(QC.FROZEN_TERM_WEIGHTS):
            c = toks.count(term)
            dot += QC.FROZEN_TERM_WEIGHTS[term] * c
            hits += c
        want = 1.0 / (1.0 + math.exp(-dot))
        assert abs(got[i][0] - want) < 1e-12, (i, got[i][0], want)
        assert got[i][1] == hits
    # positive-leaning text scores above negative-leaning text
    assert got[0][0] > 0.5 > got[1][0]


def test_frozen_scoring_plan_is_jvm_only(spark, sf_dir):
    """The scoring leg must stay a shuffle-free JVM projection: no
    Python eval, no exchange — the model IS the plan."""
    from regpulse_lakehouse_spark.operators import quality_clf as QC
    from regpulse_lakehouse_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    out = QC.score_with_term_weights(docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan
