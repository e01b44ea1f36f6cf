"""SemDeDup (operators/vector.py::semantic_dedup): group collapse,
representative policy (farthest-from-centroid vs min-id), singleton
passthrough, determinism, rejection of bad args."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.vector import semantic_dedup


def _clustered_corpus(spark, n_groups=6, dup_per_group=4, singletons=8, dim=16):
    """Deterministic corpus: each group is one base direction plus tiny
    per-member jitter (cosine within group ≈ 1); singletons are
    well-separated directions."""
    rows = []
    vid = 0
    rng_base = np.eye(max(n_groups + singletons, dim), dim)
    for g in range(n_groups):
        base = rng_base[g] + 0.05
        for m in range(dup_per_group):
            v = base.copy()
            v[(g + m) % dim] += 0.01 * (m + 1)  # jitter grows with m
            rows.append((vid, g, [float(x) for x in v]))
            vid += 1
    for s in range(singletons):
        v = rng_base[n_groups + s] * 3.0
        rows.append((vid, -1, [float(x) for x in v]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, group long, embedding array<double>")


def test_groups_collapse_to_one_and_singletons_survive(spark):
    corpus = _clustered_corpus(spark)
    out = semantic_dedup(
        corpus, n_clusters=8, threshold=0.98, keep="min_id", train_cap=64
    )
    rows = out.select("vec_id", "group").collect()
    by_group: dict[int, list[int]] = {}
    for r in rows:
        by_group.setdefault(r["group"], []).append(r["vec_id"])
    # every duplicate group keeps exactly one member — its minimum id
    for g in range(6):
        assert len(by_group.get(g, [])) == 1, f"group {g}: {by_group.get(g)}"
        assert by_group[g][0] == min(
            r["vec_id"] for r in corpus.filter(F.col("group") == g).collect()
        )
    # all singletons pass through untouched
    assert len(by_group.get(-1, [])) == 8


def test_farthest_keeps_least_prototypical(spark):
    corpus = _clustered_corpus(spark, n_groups=3, dup_per_group=5, singletons=2)
    out = semantic_dedup(
        corpus, n_clusters=5, threshold=0.98, keep="farthest", train_cap=64
    )
    kept = {r["group"]: r["vec_id"] for r in out.filter(F.col("group") >= 0).collect()}
    mins = {
        g: min(r["vec_id"] for r in corpus.filter(F.col("group") == g).collect())
        for g in range(3)
    }
    # one representative per group, and the policy differs from min_id
    # for at least one group (the jitter makes later members less
    # prototypical, so min-id and farthest must disagree somewhere)
    assert set(kept) == {0, 1, 2}
    assert any(kept[g] != mins[g] for g in range(3))


def test_deterministic_across_partitioning(spark):
    corpus = _clustered_corpus(spark)
    a = sorted(
        r["vec_id"]
        for r in semantic_dedup(corpus, n_clusters=8, threshold=0.98, train_cap=64)
        .select("vec_id")
        .collect()
    )
    b = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            corpus.repartition(7), n_clusters=8, threshold=0.98, train_cap=64
        )
        .select("vec_id")
        .collect()
    )
    assert a == b


def test_bad_keep_rejected(spark):
    corpus = _clustered_corpus(spark, n_groups=1, dup_per_group=2, singletons=0)
    with pytest.raises(ValueError, match="keep must be"):
        semantic_dedup(corpus, keep="best")
