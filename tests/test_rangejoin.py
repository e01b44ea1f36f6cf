"""Range/interval join (operators/rangejoin.py): correctness vs a
brute-force cross-join reference, boundary semantics, left join,
timestamp domains, and the scale-shape guarantee (equi-join, no
BroadcastNestedLoop / cartesian in the plan)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.rangejoin import interval_join


@pytest.fixture(scope="module")
def pts(spark):
    return spark.range(200).select((F.col("id") * 7 % 500).cast("double").alias("x"),
                                   F.col("id").alias("pid"))


@pytest.fixture(scope="module")
def ivs(spark):
    # 40 intervals of varied width, some overlapping, some empty
    return spark.range(40).select(
        (F.col("id") * 13 % 450).cast("double").alias("lo"),
        ((F.col("id") * 13 % 450) + (F.col("id") % 5) * 20).cast("double").alias("hi"),
        F.col("id").alias("iid"),
    )


def brute(spark, pts, ivs, closed="both"):
    lo = F.col("lo") <= F.col("x") if closed in ("both", "left") else F.col("lo") < F.col("x")
    hi = F.col("x") <= F.col("hi") if closed in ("both", "right") else F.col("x") < F.col("hi")
    return {
        (r["pid"], r["iid"])
        for r in pts.crossJoin(ivs).filter(lo & hi).collect()
    }


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_matches_brute_force(spark, pts, ivs, closed):
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(pts, ivs, "x", "lo", "hi", bucket_width=25.0,
                               closed=closed).collect()
    }
    assert got == brute(spark, pts, ivs, closed)


def test_no_duplicate_pairs(spark, pts, ivs):
    out = interval_join(pts, ivs, "x", "lo", "hi", bucket_width=10.0)
    n = out.count()
    assert n == out.dropDuplicates(["pid", "iid"]).count()


def test_left_join_keeps_unmatched_points(spark):
    p = spark.createDataFrame([(1.0, 1), (50.0, 2), (999.0, 3)], "x double, pid int")
    i = spark.createDataFrame([(0.0, 10.0, 7)], "lo double, hi double, iid int")
    out = interval_join(p, i, "x", "lo", "hi", bucket_width=5.0, how="left").collect()
    by_pid = {r["pid"]: r for r in out}
    assert len(out) == 3
    assert by_pid[1]["iid"] == 7
    assert by_pid[2]["iid"] is None and by_pid[3]["iid"] is None


def test_timestamp_domain(spark):
    t0 = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)
    p = spark.createDataFrame(
        [(t0 + dt.timedelta(minutes=m), m) for m in (5, 90, 150)], "ts timestamp, pid int"
    )
    i = spark.createDataFrame(
        [(t0, t0 + dt.timedelta(hours=1), 1),
         (t0 + dt.timedelta(hours=1), t0 + dt.timedelta(hours=3), 2)],
        "w_start timestamp, w_end timestamp, iid int",
    )
    out = interval_join(p, i, "ts", "w_start", "w_end",
                        bucket_width=3_600_000_000, closed="left")
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == {(5, 1), (90, 2), (150, 2)}


def test_plan_is_equi_join_not_nested_loop(pts, ivs):
    plan = interval_join(pts, ivs, "x", "lo", "hi", bucket_width=25.0)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_validates(pts, ivs):
    with pytest.raises(ValueError, match="bucket_width"):
        interval_join(pts, ivs, "x", "lo", "hi", bucket_width=0)
    with pytest.raises(ValueError, match="how"):
        interval_join(pts, ivs, "x", "lo", "hi", bucket_width=1.0, how="full")


def test_broadcast_intervals_builds_on_interval_side(spark, pts, ivs):
    out = interval_join(pts, ivs, "x", "lo", "hi", bucket_width=25.0,
                        broadcast_intervals=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BuildRight" in plan  # the exploded interval side is the build side
    got = {(r["pid"], r["iid"]) for r in out.collect()}
    assert got == brute(spark, pts, ivs, "both")
