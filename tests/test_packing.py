"""Sequence packing (operators/packing.py): budget respected, oversize
isolation, exactly-once assignment, determinism, single-exchange plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.packing import pack_sequences

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    # token counts 1..60 cycling, plus two oversize outliers
    rows = [(i, (i % 60) + 1) for i in range(500)] + [(1000, 250), (1001, 999)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_exactly_once_and_budget(docs):
    out = pack_sequences(docs, "n_tokens", budget=BUDGET).collect()
    assert len(out) == 502
    assert len({r["doc_id"] for r in out}) == 502
    sums: dict[int, int] = {}
    counts: dict[int, int] = {}
    for r in out:
        sums[r["pack_id"]] = sums.get(r["pack_id"], 0) + r["n_tokens"]
        counts[r["pack_id"]] = counts.get(r["pack_id"], 0) + 1
        if r["oversize"]:
            assert r["n_tokens"] > BUDGET
    for pid, s in sums.items():
        if s > BUDGET:  # only an oversize singleton may exceed
            assert counts[pid] == 1
    # oversize docs really are alone in their packs
    over_packs = {r["pack_id"] for r in out if r["oversize"]}
    assert all(counts[p] == 1 for p in over_packs)
    assert len(over_packs) == 2


def test_offsets_partition_the_pack(docs):
    out = pack_sequences(docs, "n_tokens", budget=BUDGET).collect()
    by_pack: dict[int, list] = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for rows in by_pack.values():
        rows.sort(key=lambda r: r["pack_offset"])
        acc = 0
        for r in rows:
            assert r["pack_offset"] == acc
            acc += r["n_tokens"]


def test_packing_is_deterministic(docs):
    a = sorted((r["doc_id"], r["pack_id"], r["pack_offset"])
               for r in pack_sequences(docs, "n_tokens", budget=BUDGET).collect())
    b = sorted((r["doc_id"], r["pack_id"], r["pack_offset"])
               for r in pack_sequences(docs.repartition(7), "n_tokens", budget=BUDGET).collect())
    assert a == b


def test_fill_efficiency(docs):
    """FFD should land well above the 50% trivial bound on this mix.
    Shard count is pinned low here: fill quality needs many docs per
    shard (the production default of 256 shards assumes a corpus-scale
    input; 500 docs over 256 shards would strand ~2 docs per bin)."""
    out = pack_sequences(docs, "n_tokens", budget=BUDGET, n_shards=4).collect()
    normal = [r for r in out if not r["oversize"]]
    packs = {r["pack_id"] for r in normal}
    total = sum(r["n_tokens"] for r in normal)
    assert total / (len(packs) * BUDGET) > 0.7


def test_single_exchange_plan(docs):
    plan = pack_sequences(docs, "n_tokens", budget=BUDGET)._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"(?<!Broadcast)Exchange ", plan)) == 1
    assert "FlatMapGroupsInPandas" in plan or "ApplyInPandas" in plan