"""Process-lifetime /tmp teardown (tmpstate.cleanup — VERDICT r10
task 7): tracked dirs are removed, caches reset, and a second build
AFTER cleanup round-trips to identical results instead of serving a
dangling path."""

from __future__ import annotations

import os

import regpulse_lakehouse_spark as rl
from regpulse_lakehouse_spark import tmpstate
from regpulse_lakehouse_spark.queries import load_all, vector_q


def test_track_and_cleanup_removes_dirs(tmp_path):
    d = tmp_path / "fake_store"
    d.mkdir()
    (d / "x").write_text("payload")
    assert tmpstate.track(str(d)) == str(d)
    out = rl.cleanup()
    assert str(d) in out["removed"] and not d.exists()
    # idempotent: nothing tracked now, second call is a no-op
    assert rl.cleanup()["removed"] == []


def test_ivfpq_build_after_cleanup_roundtrips(spark, sf_dir):
    """The graded e4 row builds its persisted IVF-PQ index on first
    use and caches the path. cleanup() must BOTH remove the index dir
    and clear the cache so the next call rebuilds — a cleared cache
    with a surviving dir (or vice versa) would serve stale/missing
    state."""
    q = load_all()["e4_ivf_topk"]
    before = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    path, _np, _sl = vector_q._IVFPQ_PATHS[os.path.abspath(sf_dir)]
    assert os.path.isdir(path)
    rl.cleanup()
    assert not os.path.exists(path)
    assert vector_q._IVFPQ_PATHS == {}
    after = sorted(map(tuple, q.fn(spark, sf_dir).collect()))
    assert after == before and len(after) > 0
    assert os.path.isdir(vector_q._IVFPQ_PATHS[os.path.abspath(sf_dir)][0])


def test_dedup_expr_caches_clear_on_cleanup(spark):
    """ADVICE r11: the minhash signature/banding Column caches hold py4j
    references into the live JVM gateway; a SparkContext restart leaves
    them dangling. cleanup() must clear them so the next call rebuilds."""
    from pyspark.sql import functions as F

    from regpulse_lakehouse_spark.operators import dedup

    df = spark.createDataFrame(
        [("a", "one two three four"), ("b", "two three four five")],
        "doc_id string, text string",
    )
    dedup.minhash_signatures(df).collect()
    assert dedup._SIG_EXPRS
    rl.cleanup()
    assert dedup._SIG_EXPRS == {} and dedup._BAND_EXPRS == {}
    # rebuild works after the reset
    assert dedup.minhash_signatures(df).count() == 2
