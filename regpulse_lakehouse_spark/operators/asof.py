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
