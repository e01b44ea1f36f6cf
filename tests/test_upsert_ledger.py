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


def test_compact_binpacks_fragmented_snapshot(spark, tmp_path):
    """Delta-OPTIMIZE shape: many appended fragments -> one compaction
    commit with file count sized from on-disk bytes; rows identical,
    old versions untouched, sorted variant restores min-max skipping."""
    import glob
    import os

    from regpulse_lakehouse_spark.operators.upsert import VersionedParquetTable

    t = VersionedParquetTable(spark, str(tmp_path / "frag"))
    base = spark.range(0, 4000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    # 8 fragmented appends, each writing multiple small files
    t.write(base.repartition(8))
    for i in range(1, 4):
        t.append(
            spark.range(4000 * i, 4000 * (i + 1))
            .select(F.col("id"), (F.col("id") % 97).alias("k"))
            .repartition(8)
        )
    v_before = t.version
    n_files_before = len(glob.glob(os.path.join(str(tmp_path / "frag"), f"v={v_before}", "*.parquet")))
    rows_before = sorted(r["id"] for r in t.read().collect())

    # generous target -> everything packs into ONE file
    v_after = t.compact(target_file_bytes=1 << 30)
    assert v_after == v_before + 1
    n_files_after = len(glob.glob(os.path.join(str(tmp_path / "frag"), f"v={v_after}", "*.parquet")))
    assert n_files_after == 1 < n_files_before
    assert sorted(r["id"] for r in t.read().collect()) == rows_before
    # time travel still sees the fragmented snapshot
    assert t.read(version=v_before).count() == len(rows_before)

    # sorted compaction: per-file min/max on the sort column must be
    # disjoint (file skipping restored), checked via parquet footers
    t.compact(target_file_bytes=64 * 1024, sort_cols=["id"])
    import pyarrow.parquet as pq

    ranges = []
    for f in glob.glob(os.path.join(str(tmp_path / "frag"), f"v={t.version}", "*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = min(md.row_group(i).column(0).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(0).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1  # small target really split the data
    ranges.sort()
    assert all(ranges[i][1] < ranges[i + 1][0] for i in range(len(ranges) - 1))

    with pytest.raises(ValueError, match="target_file_bytes"):
        t.compact(target_file_bytes=0)


def test_changes_between_versions(spark, tmp_path):
    """Change feed (Delta CDF shape): insert/update/delete classified
    per key between two snapshots; unchanged keys absent; NULL-valued
    columns compared null-safely."""
    from regpulse_lakehouse_spark.operators.upsert import VersionedParquetTable

    t = VersionedParquetTable(spark, str(tmp_path / "cdc"))
    v1 = t.write(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20), (3, None, 30), (4, "d", 40)],
            "k int, s string, v int",
        )
    )
    v2 = t.write(
        spark.createDataFrame(
            [(1, "a", 10),          # unchanged -> absent
             (2, "B", 20),          # update
             (3, None, 30),         # unchanged with NULL value -> absent
             (5, "e", 50)],         # insert; 4 deleted
            "k int, s string, v int",
        )
    )
    out = {r["k"]: r for r in t.changes(["k"], from_version=v1, to_version=v2).collect()}
    assert set(out) == {2, 4, 5}
    assert out[2]["_change_type"] == "update_postimage" and out[2]["s"] == "B"
    assert out[4]["_change_type"] == "delete" and out[4]["s"] == "d"  # old image
    assert out[5]["_change_type"] == "insert" and out[5]["v"] == 50
    # default to_version = latest; self-diff is empty
    assert t.changes(["k"], from_version=v1).count() == 3
    assert t.changes(["k"], from_version=v2).count() == 0


def test_append_schema_evolution_is_opt_in(spark, tmp_path):
    """Delta mergeSchema shape: a batch with a NEW column fails loudly
    by default (typo guard), evolves additively under
    merge_schema=True (old rows null-filled), and a batch missing an
    existing column is likewise only accepted under the flag."""
    from regpulse_lakehouse_spark.operators.upsert import VersionedParquetTable

    t = VersionedParquetTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"]))
    widened = spark.createDataFrame([(3, "c", 0.9)], ["id", "name", "score"])
    with pytest.raises(Exception, match="score|column"):
        t.append(widened)
    t.append(widened, merge_schema=True)
    rows = {r["id"]: (r["name"], r["score"]) for r in t.read().collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 0.9)}
    # new batch may omit a column under the flag — null-filled
    t.append(spark.createDataFrame([(4,)], ["id"]), merge_schema=True)
    assert t.read().where("id = 4").first()["name"] is None
    # time-travel still sees the pre-evolution schema
    assert "score" not in t.read(version=1).columns
