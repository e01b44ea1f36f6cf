"""PageRank (operators/graphrank.py): analytic ground truth on small
graphs (including dangling mass), conservation, convergence,
determinism across partitionings, and plan hygiene."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.graphrank import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {r["node"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_is_uniform(spark):
    r = _ranks(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert all(abs(v - 1 / 3) < 1e-9 for v in r.values())


def test_star_graph_matches_closed_form(spark):
    # a,b,c all point at hub; hub is dangling. With d=0.85, N=4 the
    # fixed point satisfies:
    #   leaf = (1-d)/N + d·(hub/N)
    #   hub  = (1-d)/N + d·(a+b+c) + d·(hub/N)
    r = _ranks(spark, [("a", "hub"), ("b", "hub"), ("c", "hub")], n_iter=60)
    leaf, hub = r["a"], r["hub"]
    d, n = 0.85, 4
    assert abs(leaf - ((1 - d) / n + d * hub / n)) < 1e-6
    assert abs(hub - ((1 - d) / n + d * 3 * leaf + d * hub / n)) < 1e-6
    assert abs(sum(r.values()) - 1.0) < 1e-9  # dangling mass conserved
    assert hub > leaf


def test_authority_ordering_and_conservation(spark):
    # two pages link to "good"; one of those also links to "minor"
    edges = [
        ("p1", "good"), ("p2", "good"), ("p1", "minor"),
        ("good", "p1"),  # keep good non-dangling
    ]
    r = _ranks(spark, edges, n_iter=40)
    assert r["good"] > r["minor"]
    assert abs(sum(r.values()) - 1.0) < 1e-9


def test_parallel_edges_weight_contributions(spark):
    # u links to v twice and w once: v gets 2/3 of u's donation
    r = _ranks(spark, [("u", "v"), ("u", "v"), ("u", "w")], n_iter=30)
    assert r["v"] > r["w"]


def test_deterministic_across_partitioning(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 23}") for i in range(60)]
    df = spark.createDataFrame(edges, "src string, dst string")
    a = sorted((r["node"], round(r["rank"], 10)) for r in pagerank(df, n_iter=15).collect())
    b = sorted(
        (r["node"], round(r["rank"], 10))
        for r in pagerank(df.repartition(7), n_iter=15).collect()
    )
    assert a == b


def test_validation(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="damping"):
        pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="n_iter"):
        pagerank(df, n_iter=0)


def test_empty_edges_rejected(spark):
    empty = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError, match="non-empty edge"):
        pagerank(empty)


def test_checkpoint_cadence_is_equivalence_preserving(spark):
    """checkpoint_every only changes WHERE lineage is truncated, never
    the numbers: every cadence must reproduce the per-round default
    bit-for-bit on a graph with dangling mass and parallel edges."""
    edges = [
        ("a", "b"), ("a", "b"),  # parallel edge
        ("b", "c"), ("c", "a"), ("c", "d"),  # d is dangling
        ("e", "a"),  # e is a source-only node
    ]
    base = _ranks(spark, edges, n_iter=5, checkpoint_every=1)
    for every in (2, 3, 5, 7):
        got = _ranks(spark, edges, n_iter=5, checkpoint_every=every)
        assert got == base, every
    with pytest.raises(ValueError, match="checkpoint_every"):
        _ranks(spark, edges, checkpoint_every=0)
