"""Deterministic sampling operators (operators/sampling.py):
reproducibility (the whole point), rate accuracy, stratification,
split disjointness/exhaustiveness, and the zero-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import sampling as SP

N = 4000


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


def test_hash_sample_is_deterministic_and_close(ids):
    a = {r["id"] for r in SP.hash_sample(ids, 0.25, ["id"]).collect()}
    b = {r["id"] for r in SP.hash_sample(ids, 0.25, ["id"]).collect()}
    assert a == b
    # binomial(4000, .25): ±5 sigma ≈ ±137
    assert abs(len(a) - N * 0.25) < 140
    # repartitioning must not change membership
    c = {r["id"] for r in SP.hash_sample(ids.repartition(13), 0.25, ["id"]).collect()}
    assert a == c


def test_hash_sample_nests_by_fraction(ids):
    small = {r["id"] for r in SP.hash_sample(ids, 0.1, ["id"]).collect()}
    big = {r["id"] for r in SP.hash_sample(ids, 0.5, ["id"]).collect()}
    assert small <= big  # same seed: cutoff growth only adds rows


def test_hash_sample_rejects_bad_fraction(ids):
    with pytest.raises(ValueError, match="fraction"):
        SP.hash_sample(ids, 1.5, ["id"])


def test_stratified_rates(ids):
    out = SP.stratified_hash_sample(
        ids, "stratum", {"0": 1.0, "1": 0.5, "2": 0.0}, ["id"]
    )
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("0") == N // 4          # keep all
    assert "2" not in counts                   # drop all
    assert "3" not in counts                   # default_fraction=0
    assert abs(counts.get("1", 0) - N // 8) < 80


def test_assign_splits_disjoint_exhaustive_stable(ids):
    out = SP.assign_splits(ids, ["id"], {"train": 8, "val": 1, "test": 1})
    rows = out.collect()
    assert len(rows) == N                      # exhaustive, one split per row
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] - N * 0.8) < 150
    assert abs(counts["val"] - N * 0.1) < 100
    # determinism across invocations
    again = {(r["id"], r["split"]) for r in SP.assign_splits(ids, ["id"], {"train": 8, "val": 1, "test": 1}).collect()}
    assert again == {(r["id"], r["split"]) for r in rows}


def test_sampling_is_shuffle_free(ids):
    plan = SP.assign_splits(
        SP.hash_sample(ids, 0.5, ["id"]), ["id"], {"a": 1, "b": 1}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
