"""As-of (point-in-time) join — a custom operator the reference lacks
and Spark has no built-in for (SURVEY.md §2.3 notes no as-of/range
joins exist in the reference; a training-data pipeline needs one to
join facts to the latest dimension snapshot at event time).

Implementation is the scale-safe union + window formulation:

1. tag right rows (the snapshot side) and left rows (the probe side);
2. union on (key, ts) and sort within each key — right rows before
   left rows at equal ts so ``ts_left >= ts_right`` matches inclusively;
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   window carries the latest right payload forward onto each left row.

One shuffle on the join key, one window scan — linear at any scale.
The naive alternative (range join: ``left.ts >= right.ts`` + window
top-1) is a quadratic blow-up on hot keys; Spark would plan it as a
broadcast-nested-loop or cartesian-range join.

DuckDB's native ``ASOF JOIN`` is the differential oracle
(queries/relational.py::asof_latest_order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """For every left row, attach the payload of the right row with the
    greatest ``right_ts <= left_ts`` for the same ``key`` (point-in-time
    lookup). ``how='inner'`` drops left rows with no prior right row.

    The right side must be unique per (key, right_ts) — enforce with a
    latest-wins dedup upstream if needed (ties would make the result
    nondeterministic in any engine)."""
    l_tagged = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    r_tagged = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("_ts"),
            F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
        )
        .withColumn("_side", F.lit(0))
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # right rows (_side=0) sort before left rows at equal _ts → inclusive match
    w = (
        W.partitionBy(key)
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_ts", "_side", "_payload")
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    return out.select(
        *[c for c in out.columns if c != "_asof"],
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    bucket_width: float,
    how: str = "left",
) -> DataFrame:
    """Skew-safe :func:`asof_join`: identical semantics, but the carry
    window partitions on (key, time bucket) instead of key alone — the
    r13 answer to the one straggler shape the plain formulation has.

    Why: ``asof_join`` sorts each key's full history in ONE window
    partition. A hot key (one instrument carrying 10⁷ of the ticks, one
    user generating most of the events) serializes into a single task
    no matter how many executors exist — the classic skew corner
    VERDICT r12 task 7 asked to break with a measured number (see
    SCALING.md round 13).

    Two exact phases, the salting pattern adapted to ORDERED carry
    (a plain hash salt would sever the carry chain — rows needing a
    payload from another salt would silently miss it; time buckets
    keep the chain intact because bucket order IS time order):

    1. within-bucket: the same union + last(ignorenulls) carry, window
       partitioned by (key, floor(ts / bucket_width)) — a hot key's
       sort fans out over its time buckets;
    2. cross-bucket carry-in: per-(key, bucket) LATEST right payload
       (one ``max_by`` row per bucket — thousands of rows where the
       input had millions), carried forward over buckets-strictly-
       before with an unbounded→-1 window per key, then joined back on
       (key, bucket) — the build side is bucket-cardinality-sized, so
       AQE broadcasts it. A left row whose bucket has no earlier right
       row in-bucket takes the carry-in; ties at equal ts still
       resolve right-before-left inside phase 1.

    ``bucket_width`` is in the timestamp column's native units
    (seconds for TIMESTAMP via unix epoch, raw units for numerics).
    Choose it so a hot key spans many buckets while typical keys span
    few; correctness never depends on the choice
    (tests/test_asof.py pins bucketed ≡ plain across widths)."""
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be > 0, got {bucket_width}")

    def _num(df: DataFrame, name: str):
        c = df[name]
        if str(df.schema[name].dataType).lower().startswith("timestamp"):
            return F.unix_micros(c).cast("double") / 1e6
        return c.cast("double")

    l_tagged = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_num", _num(left, left_ts))
        .withColumn("_side", F.lit(1))
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        # _num inside the select: after the projection aliases the ts
        # column away, a lineage-bound reference to the original frame
        # no longer resolves
        _num(right, right_ts).alias("_num"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("_payload"),
    ).withColumn("_side", F.lit(0))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True).withColumn(
        "_bkt", F.floor(F.col("_num") / F.lit(float(bucket_width))).cast("long")
    )
    # phase 1: carry within (key, bucket)
    w_in = (
        W.partitionBy(key, "_bkt")
        .orderBy(F.asc("_ts"), F.asc("_side"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    phase1 = unioned.withColumn(
        "_asof_in", F.last("_payload", ignorenulls=True).over(w_in)
    )
    # phase 2: per-bucket latest right payload, carried over earlier
    # buckets. Built on the distinct bucket set of BOTH sides so a
    # bucket holding only left rows still receives its carry-in.
    tails = unioned.groupBy(key, "_bkt").agg(
        F.max_by("_payload", F.when(F.col("_side") == 0, F.col("_ts"))).alias("_tail")
    )
    w_carry = (
        W.partitionBy(key)
        .orderBy(F.asc("_bkt"))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = tails.select(
        F.col(key),
        "_bkt",
        F.last("_tail", ignorenulls=True).over(w_carry).alias("_carry_in"),
    )
    joined = phase1.filter(F.col("_side") == 1).join(
        F.broadcast(carry), [key, "_bkt"], "left"
    )
    out = joined.withColumn(
        "_asof", F.coalesce(F.col("_asof_in"), F.col("_carry_in"))
    ).drop("_ts", "_num", "_side", "_bkt", "_payload", "_asof_in", "_carry_in")
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    return out.select(
        *[c for c in out.columns if c != "_asof"],
        *[F.col(f"_asof.{c}").alias(c) for c in payload_cols],
    )
