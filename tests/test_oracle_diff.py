"""Differential correctness: every oracle-bearing registry query must
match its DuckDB oracle on row count, column names/order-insensitive
schema, and values — a local replica of the driver's t2 gate.

Values are compared after canonicalization: columns sorted by name,
rows sorted by stringified tuple, floats compared exactly (queries
round on both sides). List/tuple cells are REJECTED outright: the
driver canonicalizes with pandas sort_values, which raises
``TypeError: unhashable type: 'list'`` on array columns — our replica
must be at least as strict so that class of failure is caught
pre-submit (round-1 lesson: v1_v2_validate_route, e1_deterministic_embed).
"""

from __future__ import annotations

import math

import pytest

from regpulse_lakehouse_spark.queries import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


def _canon_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # 12 significant digits: both sides round explicitly in-query,
        # this only absorbs float64 repr noise.
        return f"{v:.12g}"
    if isinstance(v, (list, tuple, dict)):
        raise TypeError(
            f"non-atomic cell {type(v).__name__} in oracle-checked output — "
            "the driver's pandas canonicalizer cannot hash it; serialize "
            "with array_join/to_json or emit component columns"
        )
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _canon_frame(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_matches_oracle(spark, duck, sf_dir, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(q.oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = [tuple(r) for r in cur.fetchall()]

    assert sorted(s_cols) == sorted(d_cols), f"{name}: column names differ"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} oracle={len(d_rows)}"
    )

    _, s_canon = _canon_frame(s_rows, s_cols)
    _, d_canon = _canon_frame(d_rows, d_cols)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_canon, d_canon)) if a != b
    ]
    assert not mismatches, f"{name}: first value mismatches: {mismatches[:3]}"


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_query_schema_is_atomic(spark, sf_dir, name):
    """Driver-checked outputs must be flat atomic columns — the driver's
    pandas canonicalizer chokes on ArrayType/MapType/StructType cells."""
    from pyspark.sql import types as T

    sdf = REGISTRY[name].fn(spark, sf_dir)
    bad = [
        f.name
        for f in sdf.schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, f"{name}: non-atomic output columns {bad}"


def test_no_rows_only_queries_remain():
    """Since round 4 every registry row carries a DuckDB oracle — the
    driver's weaker rows-only mode is unused. A positive assertion
    (instead of the old auto-skipping empty parametrization) so a
    future oracle-less row shows up as a FAILURE to ratchet back, not
    as a silent skip."""
    assert ROWS_ONLY_QUERIES == [], (
        f"queries without oracles: {ROWS_ONLY_QUERIES} — add DuckDB "
        "mirrors or document why the rows-only mode returned"
    )


def test_folded_g3_posexplode_still_matches_oracle(spark, duck, sf_dir):
    """g3_posexplode was registry-folded in r9 (its posexplode algebra is
    driver-graded inside fz_editdist_pairs' q-gram explode); the full
    differential stays pinned here."""
    from regpulse_lakehouse_spark.queries.lineage_q import G3_ORACLE, g3_posexplode

    sdf = g3_posexplode(spark, sf_dir)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(G3_ORACLE)
    d_cols = [c[0] for c in cur.description]
    d_rows = [tuple(r) for r in cur.fetchall()]
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    _, s_canon = _canon_frame(s_rows, s_cols)
    _, d_canon = _canon_frame(d_rows, d_cols)
    assert s_canon == d_canon
