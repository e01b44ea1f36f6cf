"""Delta change-feed as a Structured-Streaming source
(streaming/delta_source.py, VERDICT r14 task 3): the transaction log
is tailed as a file stream, each commit's add-files become typed
change rows, the sink is exactly-once via per-version rename-commit.

Contracts pinned here:
- stream-consumed changes ≡ the batch ``changes()`` diff per commit,
  and ≡ ``read(head)`` for pure-append tables, across ≥3 commits;
- kill-and-resume from the same checkpoint converges on exactly the
  uninterrupted sink (the r14 drill shape);
- delta-spark streaming-source semantics for non-append commits:
  OPTIMIZE (dataChange=false) skipped, data-changing removes raise
  unless ignore_changes, schema changes always raise.
"""

from __future__ import annotations

import os
import time as _time

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.delta_log import DeltaLogTable
from regpulse_lakehouse_spark.streaming.delta_source import (
    read_change_sink,
    stream_changes,
)

_AWAIT_S = 300


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _drain(table, sink, ckpt, **kw):
    q = stream_changes(table, sink, ckpt, **kw)
    assert q.awaitTermination(_AWAIT_S), "stream did not drain in time"


def test_stream_equals_batch_diff_across_commits(spark, tmp_path):
    t = DeltaLogTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(0, "zero")], "id long, val string"))
    t.append(spark.createDataFrame([(1, "one"), (2, "two")], "id long, val string"))
    t.insert_if_absent(
        spark.createDataFrame([(2, "dup"), (3, "three")], "id long, val string"),
        ["id"],
    )
    t.append(spark.createDataFrame([(4, "four")], "id long, val string"))
    head = t.version
    assert head >= 3

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ck")
    _drain(t, sink, ckpt)
    got = read_change_sink(spark, sink)
    assert set(got.columns) == {"id", "val", "_change_type", "commit_version"}

    # per-commit: stream rows at v ≡ batch changes(v-1, v)
    for v in range(1, head + 1):
        want = t.changes(["id"], from_version=v - 1, to_version=v)
        assert _rows(
            got.filter(F.col("commit_version") == v), ["id", "val"]
        ) == _rows(want, ["id", "val"])
        assert (
            got.filter(
                (F.col("commit_version") == v)
                & (F.col("_change_type") != "insert")
            ).count()
            == 0
        )

    # whole feed ≡ read(head) minus the v0 snapshot (default start=0)
    whole = t.read().join(t.read(version=0), ["id"], "left_anti")
    assert _rows(got, ["id", "val"]) == _rows(whole, ["id", "val"])

    # starting_version=-1 also emits the v0 snapshot → the full table
    sink2, ckpt2 = str(tmp_path / "sink2"), str(tmp_path / "ck2")
    _drain(t, sink2, ckpt2, starting_version=-1)
    assert _rows(read_change_sink(spark, sink2), ["id", "val"]) == _rows(
        t.read(), ["id", "val"]
    )

    # incremental tail: a NEW commit after a drain streams alone on
    # the same checkpoint (nothing reprocessed)
    t.append(spark.createDataFrame([(5, "five")], "id long, val string"))
    _drain(t, sink, ckpt)
    got2 = read_change_sink(spark, sink)
    assert _rows(
        got2.filter(F.col("commit_version") == head + 1), ["id", "val"]
    ) == [(5, "five")]
    assert got2.count() == got.count() + 1


def test_kill_and_resume_converges_on_uninterrupted_sink(spark, tmp_path):
    """Stop the feed mid-stream (one commit per microbatch), restart
    from the same checkpoint: offsets come back, replayed versions
    skip via the rename-commit publish, final sink ≡ the twin that
    never stopped."""
    t = DeltaLogTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(0, 0)], "id long, v long"))
    for i in range(1, 9):
        t.append(spark.createDataFrame([(i, i * 10)], "id long, v long"))

    # uninterrupted twin
    _drain(t, str(tmp_path / "sink_full"), str(tmp_path / "ck_full"))

    # interrupted run: stop after a few single-commit microbatches
    sink_cut, ck_cut = str(tmp_path / "sink_cut"), str(tmp_path / "ck_cut")
    q = stream_changes(t, sink_cut, ck_cut)
    stopped_early = False
    deadline = _time.time() + _AWAIT_S
    while q.isActive and _time.time() < deadline:
        if len(q.recentProgress) >= 3:
            q.stop()
            q.awaitTermination(_AWAIT_S)
            stopped_early = True
            break
        _time.sleep(0.1)
    if not stopped_early:
        q.awaitTermination(_AWAIT_S)
    _drain(t, sink_cut, ck_cut)  # resume from the same checkpoint

    cols = ["id", "v", "commit_version"]
    got = _rows(read_change_sink(spark, sink_cut), cols)
    want = _rows(read_change_sink(spark, str(tmp_path / "sink_full")), cols)
    assert got == want and len(want) == 8
    assert stopped_early, "query drained before the mid-stream stop; raise the commit count"


def test_non_append_commits_follow_delta_spark_rules(spark, tmp_path):
    t = DeltaLogTable(spark, str(tmp_path / "t"))
    t.write(
        spark.createDataFrame([(i, 1, "x") for i in range(8)], "id long, ver long, val string")
    )
    t.append(spark.createDataFrame([(8, 1, "y")], "id long, ver long, val string"))
    # OPTIMIZE: dataChange=false on both sides → silently skipped
    t.compact(target_file_bytes=1 << 30)
    sink, ckpt = str(tmp_path / "s1"), str(tmp_path / "c1")
    _drain(t, sink, ckpt)
    got = read_change_sink(spark, sink)
    assert _rows(got, ["id"]) == [(8,)]  # only the real append

    # a data-changing rewrite fails the stream loudly by default
    t.upsert(
        spark.createDataFrame([(3, 9, "up")], "id long, ver long, val string"),
        ["id"],
        "ver",
    )
    q = stream_changes(t, sink, ckpt)
    with pytest.raises(Exception, match="ignore_changes"):
        q.awaitTermination(_AWAIT_S)
        raise AssertionError("stream should have failed on the upsert")

    # ignore_changes=True re-emits the rewritten file's rows as inserts
    sink2, ckpt2 = str(tmp_path / "s2"), str(tmp_path / "c2")
    _drain(t, sink2, ckpt2, ignore_changes=True)
    up_v = t.version
    re_emitted = read_change_sink(spark, sink2).filter(
        F.col("commit_version") == up_v
    )
    ids = {r["id"] for r in re_emitted.collect()}
    assert 3 in ids  # the upserted key is there
    # ignoreChanges semantics: the rewritten FILE's other rows ride along
    assert _rows(re_emitted.filter(F.col("id") == 3), ["ver", "val"]) == [(9, "up")]


def test_schema_change_fails_the_feed(spark, tmp_path):
    """The feed's schema freezes at FIRST start (persisted as a sink
    sidecar): a table whose schema evolves between drains fails the
    next drain loudly instead of publishing mixed-schema version dirs.
    A feed STARTED after the evolution adopts the evolved schema."""
    t = DeltaLogTable(spark, str(tmp_path / "t"))
    t.write(spark.createDataFrame([(1, "a")], "id long, val string"))
    t.append(spark.createDataFrame([(2, "b")], "id long, val string"))
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    _drain(t, sink, ckpt)
    assert _rows(read_change_sink(spark, sink), ["id"]) == [(2,)]

    t.append(
        spark.createDataFrame([(3, "c", 0.5)], "id long, val string, score double"),
        merge_schema=True,
    )
    q = stream_changes(t, sink, ckpt)
    with pytest.raises(Exception, match="schema change"):
        q.awaitTermination(_AWAIT_S)
        raise AssertionError("re-drain should have failed on the metaData change")

    # a FRESH feed started post-evolution adopts the new schema and
    # emits every commit after its starting point, wide column included
    sink2, ckpt2 = str(tmp_path / "s2"), str(tmp_path / "c2")
    _drain(t, sink2, ckpt2, starting_version=-1)
    got = read_change_sink(spark, sink2)
    assert "score" in got.columns
    assert _rows(got, ["id"]) == [(1,), (2,), (3,)]


def test_change_stream_feeds_bm25_index_maintenance(spark, tmp_path):
    """The 100 TB ingestion loop end-to-end: a DeltaLogTable of
    documents is drained through the change stream, and each commit's
    rows maintain a BM25 index incrementally
    (apply_changes_to_bm25_index with per-version batch_refs =
    exactly-once) — search over the maintained index equals search
    over a fresh build of the table's head snapshot."""
    from pyspark.sql import functions as F

    from regpulse_lakehouse_spark.operators.retrieval import (
        apply_changes_to_bm25_index,
        bm25_search,
        write_bm25_index,
    )

    t = DeltaLogTable(spark, str(tmp_path / "docs"))
    t.write(
        spark.createDataFrame(
            [(1, "spark shuffles data between stages"),
             (2, "delta logs are newline json")],
            "doc_id long, text string",
        )
    )
    t.append(
        spark.createDataFrame(
            [(3, "bm25 ranks documents by term frequency"),
             (4, "spark broadcast joins avoid shuffles")],
            "doc_id long, text string",
        )
    )
    t.append(
        spark.createDataFrame(
            [(5, "structured streaming drains delta commits")],
            "doc_id long, text string",
        )
    )

    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ck")
    _drain(t, sink, ckpt, starting_version=-1)
    feed = read_change_sink(spark, sink)

    # maintain the index one commit at a time, in commit order
    maint = str(tmp_path / "idx_maint")
    versions = sorted(
        r["commit_version"]
        for r in feed.select("commit_version").distinct().collect()
    )
    assert len(versions) == 3
    for v in versions:
        batch = feed.filter(F.col("commit_version") == v).select(
            "doc_id", "text", "_change_type"
        )
        if v == versions[0]:
            write_bm25_index(batch.select("doc_id", "text"), maint)
        else:
            apply_changes_to_bm25_index(batch, maint, batch_ref=f"v{v}")
    # replaying a commit is a no-op thanks to the batch_ref
    apply_changes_to_bm25_index(
        feed.filter(F.col("commit_version") == versions[-1]).select(
            "doc_id", "text", "_change_type"
        ),
        maint,
        batch_ref=f"v{versions[-1]}",
    )

    fresh = str(tmp_path / "idx_fresh")
    write_bm25_index(t.read(), fresh)

    def topk(path):
        return sorted(
            (r["doc_id"], round(r["bm25"], 6))
            for r in bm25_search(spark, path, "spark shuffles", k=3).collect()
        )

    got, want = topk(maint), topk(fresh)
    assert got == want and len(want) > 0
