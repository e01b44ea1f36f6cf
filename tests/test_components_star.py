"""Large-star/small-star connected components (operators/components.py
::connected_components_star, Kiveris et al. SoCC 2014) — the
general-graph counterpart of min-label propagation: equality on random
graphs, the long-chain case propagation cannot touch, isolated nodes,
and the per-round plan shape."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.components import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {(r["id"], r["component"]) for r in df.collect()}


@settings(max_examples=15, deadline=None)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)), min_size=1, max_size=40
    ),
    extra=st.lists(st.integers(31, 40), max_size=5),
)
def test_star_equals_propagation_on_random_graphs(spark, edges, extra):
    pairs = spark.createDataFrame(edges, "a long, b long")
    nodes = (
        spark.createDataFrame([(i,) for i in extra], "id long") if extra else None
    )
    want = _labels(
        connected_components(pairs, nodes=nodes, max_iterations=50)
    )
    got = _labels(connected_components_star(pairs, nodes=nodes))
    assert got == want


def test_star_closes_long_chain_fast(spark):
    """A 256-node PATH: min-label propagation needs 255 rounds (its
    default 20 raises); star contraction closes it in a handful of
    alternations — the reason a general 100 TB graph wants this
    variant."""
    n = 256
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iterations=20)
    plans = []
    out = connected_components_star(pairs, round_plans=plans)
    labels = _labels(out)
    assert labels == {(i, 0) for i in range(n)}
    # O(log^2 n) in theory, single digits in practice for a path
    assert 1 <= len(plans) <= 12, len(plans)
    for p in plans:
        assert "CartesianProduct" not in p and "BroadcastNestedLoop" not in p


def test_star_isolated_nodes_and_empty_graph(spark):
    pairs = spark.createDataFrame([], "a long, b long")
    nodes = spark.createDataFrame([(7,), (9,)], "id long")
    got = _labels(connected_components_star(pairs, nodes=nodes))
    assert got == {(7, 7), (9, 9)}


def test_star_string_ids(spark):
    pairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y")], "a string, b string"
    )
    got = _labels(connected_components_star(pairs))
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_star_two_cliques_bridge(spark):
    rows = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    rows += [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    rows += [(4, 10)]  # bridge
    pairs = spark.createDataFrame(rows, "a long, b long")
    got = dict(_labels(connected_components_star(pairs)))
    assert set(got.values()) == {0}
