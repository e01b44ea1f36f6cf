"""Property tests for the write-side operators and run ledger
(SURVEY.md §5.3: at-most-one row per key, first/latest-wins, state
machine transitions, ordered replay)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.upsert import (
    VersionedParquetTable,
    dedup_on_keys,
    edge_upsert,
    insert_if_absent,
    upsert_latest_wins,
)
from regpulse_lakehouse_spark.sources import fixtures
from regpulse_lakehouse_spark.streaming import RunLedger


def test_insert_if_absent_is_idempotent(spark):
    base = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    new = spark.createDataFrame([(2, "X"), (3, "c")], "id int, v string")
    once = insert_if_absent(base, new, ["id"])
    twice = insert_if_absent(once, new, ["id"])
    assert sorted(tuple(r) for r in once.collect()) == [(1, "a"), (2, "b"), (3, "c")]
    assert sorted(tuple(r) for r in twice.collect()) == sorted(
        tuple(r) for r in once.collect()
    )


def test_upsert_latest_wins(spark):
    base = spark.createDataFrame([(1, "old", 10), (2, "keep", 10)], "id int, v string, ts int")
    upd = spark.createDataFrame([(1, "new", 20), (3, "ins", 5)], "id int, v string, ts int")
    out = upsert_latest_wins(base, upd, ["id"], "ts")
    rows = {r.id: (r.v, r.ts) for r in out.collect()}
    assert rows == {1: ("new", 20), 2: ("keep", 10), 3: ("ins", 5)}
    # at-most-one row per key
    assert out.groupBy("id").count().filter(F.col("count") > 1).count() == 0


def test_upsert_version_tie_prefers_update(spark):
    base = spark.createDataFrame([(1, "old", 10)], "id int, v string, ts int")
    upd = spark.createDataFrame([(1, "new", 10)], "id int, v string, ts int")
    out = upsert_latest_wins(base, upd, ["id"], "ts")
    assert out.collect()[0].v == "new"


def test_edge_upsert_unique_five_tuple(spark, tmp_path):
    links = fixtures.links(spark)
    five = ["from_type", "from_id", "to_type", "to_id", "relation"]
    empty = links.limit(0)
    merged = edge_upsert(empty, links, F.asc("id"))
    assert merged.count() == links.dropDuplicates(five).count()
    again = edge_upsert(merged, links, F.asc("id"))
    assert again.count() == merged.count()


def test_versioned_table_snapshots(spark, tmp_path):
    t = VersionedParquetTable(spark, str(tmp_path / "tbl"))
    assert not t.exists()
    df1 = spark.createDataFrame([(1, "a", 1)], "id int, v string, ts int")
    t.write(df1)
    assert t.version == 1
    t.upsert(spark.createDataFrame([(1, "b", 2)], "id int, v string, ts int"), ["id"], "ts")
    assert t.version == 2
    assert t.read().collect()[0].v == "b"
    t.append(spark.createDataFrame([(2, "c", 3)], "id int, v string, ts int"))
    assert t.read().count() == 2
    t.delete_where(F.col("id") == 1)
    assert [r.id for r in t.read().collect()] == [2]
    t.truncate()
    assert t.read().count() == 0
    # time-travel: every committed snapshot remains readable by version
    assert t.read(version=1).collect()[0].v == "a"
    assert t.read(version=2).collect()[0].v == "b"
    assert t.read(version=3).count() == 2
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read(version=99)


def test_get_or_create_default_store(spark, tmp_path):
    from regpulse_lakehouse_spark.operators.vector import get_or_create_default_store

    t = VersionedParquetTable(spark, str(tmp_path / "stores"))
    sid = get_or_create_default_store(t)
    assert sid == get_or_create_default_store(t)  # idempotent
    assert t.read().filter(F.col("provider") == "local").count() == 1


def test_dedup_on_keys_deterministic_survivor(spark):
    df = spark.createDataFrame(
        [(1, "z"), (1, "a"), (2, "m")], "k int, v string"
    )
    out = dedup_on_keys(df, ["k"], [F.asc("v")])
    assert {(r.k, r.v) for r in out.collect()} == {(1, "a"), (2, "m")}


def test_run_ledger_state_machine(spark, tmp_path):
    ledger = RunLedger(spark, str(tmp_path / "ledger"))
    run_id = ledger.create_run("scan", "EU", 90)
    ledger.log(run_id, "search", "starting")
    ledger.transition(run_id, "running")
    ledger.log(run_id, "process", "working")
    ledger.transition(run_id, "completed", meta={"discovered": "5", "errors": "0"})
    ledger.log(run_id, "complete", "done")

    run = ledger.runs.read().filter(F.col("id") == run_id).collect()[0]
    assert run.status == "completed"
    assert run.completed_at is not None
    assert run.meta["discovered"] == "5"
    # at-most-one ledger row per run id after transitions
    assert ledger.runs.read().groupBy("id").count().filter(F.col("count") > 1).count() == 0

    replay = ledger.replay(run_id).collect()
    assert [r.stage for r in replay] == ["search", "process", "complete"]
    ts = [r.created_at for r in replay]
    assert ts == sorted(ts)
