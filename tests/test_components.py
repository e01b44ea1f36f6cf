"""Connected components / transitive dedup (operators/components.py):
transitivity across chains, isolated nodes, a union-find differential
on a random graph, and the representative-collapse semantics."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.components import (
    cluster_representatives,
    connected_components,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "a long, b long")


def test_chain_transitivity_and_isolates(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8), (10, 11), (11, 12), (12, 13), (13, 14)])
    nodes = spark.createDataFrame([(99,)], "id long")
    comp = {
        r["id"]: r["component"]
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert comp == {
        1: 1, 2: 1, 3: 1,
        7: 7, 8: 7,
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        99: 99,
    }


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    n = 120
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(90)]
    edges = [(a, b) for a, b in edges if a != b]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id per union-find component, restricted to nodes with edges
    touched = {a for e in edges for a in e}
    want = {}
    for x in sorted(touched):
        root = find(x)
        want.setdefault(root, min(y for y in touched if find(y) == root))
    expect = {x: want[find(x)] for x in touched}

    got = {
        r["id"]: r["component"]
        for r in connected_components(_pairs(spark, edges)).collect()
    }
    assert got == expect


def test_cluster_representatives_keeps_min_and_untouched(spark):
    corpus = spark.range(10).select(F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept = {r["doc_id"] for r in cluster_representatives(pairs, corpus).collect()}
    assert kept == {0, 1, 4, 5, 7, 8, 9}


def test_cluster_representatives_star_algorithm(spark):
    corpus = spark.range(10).select(F.col("id").alias("doc_id"), F.lit("t").alias("text"))
    pairs = _pairs(spark, [(1, 2), (2, 3), (5, 6)])
    kept_prop = {r["doc_id"] for r in cluster_representatives(pairs, corpus).collect()}
    kept_star = {
        r["doc_id"]
        for r in cluster_representatives(pairs, corpus, algorithm="star").collect()
    }
    assert kept_star == kept_prop == {0, 1, 4, 5, 7, 8, 9}

    # a 30-node path that exceeds propagation's iteration budget still
    # collapses under the star variant (the reason the knob exists)
    chain = _pairs(spark, [(i, i + 1) for i in range(30)])
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_representatives(chain, corpus, max_iterations=3)
    kept = {
        r["doc_id"]
        for r in cluster_representatives(chain, corpus, algorithm="star").collect()
    }
    assert kept == {0}

    with pytest.raises(ValueError, match="algorithm"):
        cluster_representatives(pairs, corpus, algorithm="bogus")


def test_nonconvergence_guard(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(30)])  # diameter 30 path
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=3)


def test_nonconvergence_keep_returns_partial_labels(spark):
    pairs = _pairs(spark, [(i, i + 1) for i in range(30)])
    with pytest.warns(RuntimeWarning, match="without.*converging|converging"):
        labels = connected_components(pairs, max_iterations=3, on_nonconvergence="keep")
    rows = {r["id"]: r["component"] for r in labels.collect()}
    # every node present, labels monotonically decreased but not unified
    assert set(rows) == set(range(31))
    assert all(c <= i for i, c in rows.items())
    assert len(set(rows.values())) > 1  # genuinely partial

    with pytest.raises(ValueError, match="on_nonconvergence"):
        connected_components(pairs, on_nonconvergence="explode")


def test_reliable_checkpoint_dir(spark, tmp_path):
    ckdir = str(tmp_path / "cc_ckpt")
    pairs = _pairs(spark, [(1, 2), (2, 3), (7, 8)])
    comp = {
        r["id"]: r["component"]
        for r in connected_components(pairs, checkpoint_dir=ckdir).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}
    # reliable checkpoints actually hit the directory
    import os

    assert any(files for _, _, files in os.walk(ckdir)), "no checkpoint files written"


def test_rounds_free_previous_blocks(spark):
    """The loop must not pin one label-table snapshot per round: after a
    multi-round run, at most the returned table's blocks (plus nothing
    else from this operator) may remain in the block manager."""
    sc = spark.sparkContext

    def n_persisted():
        return sc._jsc.sc().getPersistentRDDs().size()

    base = n_persisted()
    pairs = _pairs(spark, [(i, i + 1) for i in range(12)])  # several rounds
    labels = connected_components(pairs, max_iterations=20)
    labels.count()
    # edges + per-round snapshots all freed; only the returned frame's
    # blocks may linger
    assert n_persisted() - base <= 1


def test_graded_row_round_plans_no_all_pairs(spark, sf_dir):
    """The dd_cluster_components driver row's 100 TB contract: every
    propagation round joins edges↔labels on the node key — never a
    cartesian/all-pairs plan — and the dup-cluster graph converges in a
    handful of rounds (shallow near-cliques, plus one fixpoint-check
    round)."""
    from regpulse_lakehouse_spark.operators import dedup as DD
    from regpulse_lakehouse_spark.sources.tpch import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    pairs = DD.minhash_near_dup_pairs(
        docs, "text", "doc_id", num_hashes=16, num_bands=4, threshold=0.4
    ).select("a", "b")
    plans: list[str] = []
    connected_components(
        pairs,
        nodes=docs.select(F.col("doc_id").alias("id")),
        src_col="a",
        dst_col="b",
        id_col="id",
        round_plans=plans,
    )
    assert 1 <= len(plans) <= 5, f"unexpected round count {len(plans)}"
    for i, p in enumerate(plans):
        assert "CartesianProduct" not in p, f"round {i} plans all-pairs"
        assert "Join" in p  # the equi-join on the node key is really there
