"""CCNet-style unigram LM scoring (operators/lm_score.py): model
normalization, score ordering (typical text over gibberish), OOV
penalty, determinism, and the broadcast plan shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import lm_score as LM


@pytest.fixture(scope="module")
def corpus(spark):
    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common) for i in range(20)]
    rows.append((100, "zyxqv plork wibble frumious bandersnatch"))  # gibberish
    rows.append((101, "the cat and the dog"))  # fluent, all in-vocab
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_model_is_a_distribution(spark, corpus):
    model = LM.unigram_model(corpus, min_count=1)
    rows = model.collect()
    assert len(rows) > 0
    # add-one smoothed probs over (vocab + OOV) must sum to < 1 (the
    # remainder is the reserved OOV mass) and every logp is negative
    total_p = sum(math.exp(r["logp"]) for r in rows)
    assert 0.9 < total_p < 1.0
    assert all(r["logp"] < 0 for r in rows)


def test_fluent_beats_gibberish(spark, corpus):
    model = LM.unigram_model(corpus, min_count=2)
    scores = {
        r["doc_id"]: r
        for r in LM.perplexity_proxy(corpus, model).collect()
    }
    assert scores[101]["mean_logp"] > scores[100]["mean_logp"]
    assert scores[100]["n_oov"] == 5      # all gibberish tokens OOV
    assert scores[101]["n_oov"] == 0
    # ppl = exp(-mean_logp): fluent doc has lower perplexity
    assert math.exp(-scores[101]["mean_logp"]) < math.exp(-scores[100]["mean_logp"])


def test_scores_deterministic(spark, corpus):
    model = LM.unigram_model(corpus, min_count=2)
    a = sorted(map(tuple, LM.perplexity_proxy(corpus, model).collect()))
    b = sorted(map(tuple, LM.perplexity_proxy(corpus.repartition(5), model).collect()))
    assert a == b


def test_vocab_cap_and_empty_model(spark, corpus):
    capped = LM.unigram_model(corpus, min_count=1, vocab_cap=3)
    assert capped.count() == 3
    empty = LM.unigram_model(corpus.filter(F.lit(False)), min_count=1)
    with pytest.raises(ValueError, match="empty"):
        LM.perplexity_proxy(corpus, empty)


def test_scoring_plan_broadcasts_model(spark, corpus):
    model = LM.unigram_model(corpus, min_count=2)
    plan = (
        LM.perplexity_proxy(corpus, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_bigram_catches_scrambled_word_order(spark):
    """The killer case for the bigram upgrade: a scrambled doc keeps
    its exact unigram score (same tokens) but must lose bigram score."""
    fluent = "the cat sat on the mat and the dog sat on the rug " * 5
    words = fluent.split()
    scrambled = " ".join(words[::2] + words[1::2][::-1])  # same multiset
    train = spark.createDataFrame(
        [(i, fluent) for i in range(10)], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [(1, fluent), (2, scrambled)], "doc_id long, text string"
    )
    uni = LM.unigram_model(train, min_count=1)
    u = {r["doc_id"]: r["mean_logp"] for r in LM.perplexity_proxy(probe, uni).collect()}
    assert u[1] == u[2]  # unigram is order-blind

    bi = LM.bigram_model(train, min_count=1)
    b = {r["doc_id"]: r["mean_logp"] for r in
         LM.bigram_perplexity_proxy(probe, bi).collect()}
    assert b[1] > b[2]   # bigram punishes the scramble


def test_bigram_model_is_conditional_distribution(spark):
    train = spark.createDataFrame(
        [(1, "a b a b a c")], "doc_id long, text string"
    )
    model = {r["bigram"]: r["logp"] for r in LM.bigram_model(train, min_count=1).collect()}
    # context 'a': continuations b (x2), c (x1); ctx_n=3, ctx_v=2 →
    # P(b|a)=(2+1)/(3+2+1)=0.5, P(c|a)=(1+1)/6
    assert model["a b"] == pytest.approx(math.log(0.5))
    assert model["a c"] == pytest.approx(math.log(2 / 6))


def test_bigram_scoring_plan_broadcasts(spark, corpus):
    model = LM.bigram_model(corpus, min_count=2)
    plan = (
        LM.bigram_perplexity_proxy(corpus, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_vocab_cap_prefilter_equals_plain_sort(spark):
    """Round-5 scalability fix: when the vocabulary far exceeds the
    cap, a quantile threshold prefilter bounds the TakeOrdered input.
    The capped model must EQUAL the plain sort's result, and the
    executed plan must actually carry the count filter."""
    from regpulse_lakehouse_spark.operators.lm_score import _cap_top_counts

    # 3000 distinct keys with distinct counts -> unambiguous top-100
    counts = spark.range(3000).select(
        F.concat(F.lit("tok"), F.col("id")).alias("token"),
        (F.col("id") + 2).alias("n"),
    )
    capped = _cap_top_counts(counts, "token", 100)
    plain = counts.orderBy(F.desc("n"), F.asc("token")).limit(100)
    assert [tuple(r) for r in capped.collect()] == [tuple(r) for r in plain.collect()]
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    # the prefilter: a pushed/planned (n >= c) ABOVE min_count — with
    # margin 4 and 3000 rows the threshold lands near the 400th-from-top
    # count (~2601)
    import re

    # Catalyst pushes the threshold through the projection, so match
    # the comparison value rather than the column name
    m = re.search(r">= (\d+(?:\.\d+)?)\)", plan)
    assert m, f"no count prefilter in plan: {plan[:500]}"
    assert float(m.group(1)) > 2  # a real quantile threshold, not min_count


def test_vocab_cap_prefilter_noop_when_small(spark):
    from regpulse_lakehouse_spark.operators.lm_score import _cap_top_counts

    counts = spark.range(50).select(
        F.concat(F.lit("tok"), F.col("id")).alias("token"),
        (F.col("id") + 2).alias("n"),
    )
    capped = _cap_top_counts(counts, "token", 100)
    assert capped.count() == 50  # no prefilter pass, nothing dropped


def test_unigram_model_prefilter_binding_equality(spark):
    """Model trained with a binding cap+prefilter == model from an
    uncapped train restricted to the same top tokens (the prefilter
    must be invisible in the output)."""
    docs = spark.range(400).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("common words repeat here"),
            F.concat(F.lit("rare"), F.col("id")),
            F.concat(F.lit("rare"), F.col("id")),
        ).alias("text"),
    )
    # vocab = 4 common + 400 rare(x2 each); cap 40 with margin 4 binds
    m_small = {
        r["token"]: r["logp"]
        for r in LM.unigram_model(docs, min_count=2, vocab_cap=40).collect()
    }
    m_big = {
        r["token"]: r["logp"]
        for r in LM.unigram_model(docs, min_count=2, vocab_cap=40_000).collect()
    }
    assert len(m_small) == 40
    # same tokens selected as the true top-40 of the full model, with
    # logp differing only through the denominator (vocab-size term)
    top_big = sorted(m_big, key=lambda t: (-m_big[t], t))[:40]
    assert sorted(m_small) == sorted(top_big)
