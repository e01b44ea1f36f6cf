"""Decontamination operator (operators/decontam.py): overlap detection
threshold behavior, the clean/dirty partition, and the broadcast plan
shape that makes it a zero-train-shuffle pass."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import decontam as DC

K = 5


def _corpora(spark):
    # eval doc: ten tokens e0..e9
    eval_text = " ".join(f"e{i}" for i in range(10))
    evals = spark.createDataFrame([(100, eval_text)], "doc_id long, text string")
    # t1: embeds a K-token run of the eval doc -> contaminated
    t1 = "alpha beta " + " ".join(f"e{i}" for i in range(K)) + " gamma"
    # t2: shares only K-1 consecutive eval tokens -> clean at gram size K
    t2 = "alpha beta " + " ".join(f"e{i}" for i in range(K - 1)) + " gamma delta"
    # t3: no overlap at all
    t3 = "the quick brown fox jumps over the lazy dog tonight"
    # t4: embeds TWO disjoint K-runs -> more shared grams than t1
    t4 = (
        " ".join(f"e{i}" for i in range(K))
        + " filler "
        + " ".join(f"e{i}" for i in range(5, 10))
    )
    train = spark.createDataFrame(
        [(1, t1), (2, t2), (3, t3), (4, t4)], "doc_id long, text string"
    )
    return train, evals


@pytest.mark.parametrize("broadcast_eval", [True, False])
def test_report_flags_only_k_gram_overlap(spark, broadcast_eval):
    train, evals = _corpora(spark)
    rep = {
        r["doc_id"]: r
        for r in DC.contamination_report(
            train, evals, k=K, broadcast_eval=broadcast_eval
        ).collect()
    }
    assert set(rep) == {1, 4}
    assert rep[1]["n_shared_grams"] == 1
    assert rep[1]["n_eval_docs"] == 1
    # t4 contains two disjoint contaminated runs of exactly K tokens
    assert rep[4]["n_shared_grams"] == 2


def test_decontaminate_is_exact_complement(spark):
    train, evals = _corpora(spark)
    clean = DC.decontaminate(train, evals, k=K)
    assert {r["doc_id"] for r in clean.collect()} == {2, 3}
    assert clean.columns == train.columns


def test_min_shared_threshold(spark):
    train, evals = _corpora(spark)
    rep = DC.contamination_report(train, evals, k=K, min_shared=2)
    assert {r["doc_id"] for r in rep.collect()} == {4}


def test_broadcast_plan_has_no_train_shuffle_before_join(spark):
    """The default plan must broadcast the eval gram set: the gram join
    shows up as BroadcastHashJoin, never SortMergeJoin, so train data
    crosses no exchange before the contamination filter."""
    train, evals = _corpora(spark)
    plan = DC.contamination_report(train, evals, k=K)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
