"""Skew-safe bucketed as-of join (operators/asof.py::asof_join_bucketed,
round 13): exact equivalence with the plain window formulation across
bucket widths / tie shapes / modes, and the measured hot-key fan-out
the bucketing exists for (SCALING.md round 13 entry)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.asof import asof_join, asof_join_bucketed


def _collect(df):
    return sorted(
        tuple(r) for r in df.select("i", "k", "lts", "payload").collect()
    )


@pytest.mark.parametrize("width", [1.0, 3.0, 10.0, 1000.0])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_bucketed_equals_plain_numeric(spark, width, how):
    """Every (width, how): bucketed ≡ plain on a fixture that exercises
    ties at equal ts, buckets with only left rows, buckets with only
    right rows, and keys with no right rows at all."""
    lefts = [
        (0, "a", 5.0), (1, "a", 10.0), (2, "a", 10.5), (3, "a", 99.0),
        (4, "b", 1.0), (5, "b", 50.0),
        (6, "c", 7.0),                      # key with no right rows
        (7, "a", 0.5),                      # before any right row
    ]
    rights = [
        ("a", 1.0, "p1"), ("a", 10.0, "p2"),   # tie with left at 10.0
        ("a", 42.0, "p3"),
        ("b", 0.0, "q1"), ("b", 49.9, "q2"),
    ]
    ldf = spark.createDataFrame(lefts, "i long, k string, lts double")
    rdf = spark.createDataFrame(rights, "k string, rts double, payload string")
    plain = asof_join(ldf, rdf, "k", "lts", "rts", ["payload"], how=how)
    bucketed = asof_join_bucketed(
        ldf, rdf, "k", "lts", "rts", ["payload"], bucket_width=width, how=how
    )
    assert _collect(plain) == _collect(bucketed)


def test_bucketed_equals_plain_timestamps(spark):
    lefts = [(0, 7, "2024-01-01 00:30:00"), (1, 7, "2024-01-01 05:00:00"),
             (2, 8, "2024-01-02 00:00:00")]
    rights = [(7, "2024-01-01 00:00:00", 1.5), (7, "2024-01-01 04:59:59", 2.5),
              (8, "2024-01-01 23:59:59", 3.5)]
    ldf = spark.createDataFrame(lefts, "i long, k long, lts string").withColumn(
        "lts", F.to_timestamp("lts"))
    rdf = spark.createDataFrame(rights, "k long, rts string, payload double").withColumn(
        "rts", F.to_timestamp("rts"))
    plain = asof_join(ldf, rdf, "k", "lts", "rts", ["payload"])
    bucketed = asof_join_bucketed(
        ldf, rdf, "k", "lts", "rts", ["payload"], bucket_width=3600.0
    )
    assert sorted(tuple(r) for r in plain.select("i", "payload").collect()) == \
           sorted(tuple(r) for r in bucketed.select("i", "payload").collect())


@settings(max_examples=20, deadline=None)
@given(
    lefts=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 40)), min_size=1, max_size=12
    ),
    rights=st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 40), st.integers(0, 9)),
        max_size=12,
    ),
    width=st.sampled_from([1.0, 4.0, 7.0, 100.0]),
)
def test_bucketed_equals_plain_property(spark, lefts, rights, width):
    lefts = [(i, k, float(ts)) for i, (k, ts) in enumerate(lefts)]
    uniq = {(k, ts): p for k, ts, p in rights}
    rights = [(k, float(ts), p) for (k, ts), p in uniq.items()]
    ldf = spark.createDataFrame(lefts, "i long, k string, lts double")
    if rights:
        rdf = spark.createDataFrame(rights, "k string, rts double, payload integer")
    else:
        rdf = spark.createDataFrame([], "k string, rts double, payload integer")
    plain = {r["i"]: r["payload"] for r in asof_join(
        ldf, rdf, "k", "lts", "rts", ["payload"]).collect()}
    bucketed = {r["i"]: r["payload"] for r in asof_join_bucketed(
        ldf, rdf, "k", "lts", "rts", ["payload"], bucket_width=width).collect()}
    assert plain == bucketed


def test_bucketed_splits_hot_key_partitions(spark):
    """The point of the operator: the plain window sorts a hot key in
    ONE partition; the bucketed window's largest (key, bucket) group
    is a fraction bounded by the bucket span. Assert on the actual
    group sizes the windows will see."""
    n = 50_000
    hot = spark.range(n).select(
        F.lit("hot").alias("k"), (F.col("id") % 5000).cast("double").alias("ts")
    )
    # plain: one window partition of n rows
    plain_max = hot.groupBy("k").count().agg(F.max("count")).first()[0]
    assert plain_max == n
    width = 500.0
    bucketed_max = (
        hot.withColumn("_bkt", F.floor(F.col("ts") / width))
        .groupBy("k", "_bkt").count().agg(F.max("count")).first()[0]
    )
    assert bucketed_max <= n / 10 + 1  # 5000/500 = 10 buckets
