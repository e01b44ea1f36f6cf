"""Skew mitigation for large joins — the 100 TB posture (SURVEY.md §4).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles sort-merge skew at runtime; explicit salting is the
complement for the cases AQE can't re-plan:

- hot-key **aggregations** (two-stage partial → final re-agg);
- skewed **broadcast-ineligible equi-joins** where one side's hot keys
  must be fanned out across ``salt`` partitions.

Both are pure DataFrame transforms — no RDDs, no custom partitioners —
so Catalyst still prunes/pushes around them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed`` has hot keys: each skewed row gets a
    deterministic salt in [0, n_salts); ``small`` is exploded n_salts×
    so every (key, salt) bucket finds its match. The shuffle spreads a
    hot key over ``n_salts`` partitions instead of one straggler task.

    Use when the small side is too big to broadcast but far smaller
    than the skewed side (replication cost = |small| × n_salts).

    The salt hashes (keys…, spark_partition_id) — not
    ``monotonically_increasing_id()``, and not the whole row:

    - retry/speculation-stable: a re-executed task re-reads the same
      input partition, so every row re-derives the same salt (mid()
      re-numbers rows on retry — benign for a join, but a trap the
      moment the pattern is copied into an op where the salt reaches
      the output);
    - spreads even fully identical rows: a hot key's rows span many
      input partitions, so they fan out across salts no matter their
      content (a whole-row hash would re-concentrate keys-only or
      duplicate-heavy inputs onto one salt — the exact straggler this
      operator exists to break);
    - touches only the key columns, so unhashable payload types
      (MapType) never reach xxhash64.

    Spread GRANULARITY is the input partition: every row of a given
    key inside one input partition derives the same salt, so a hot
    key's max post-shuffle group is (partitions landing on the
    busiest salt) × (rows per partition) — a binomial max over
    P partitions into n_salts bins, not a per-row split. With
    P ≫ n_salts the imbalance vanishes (measured: P=32, S=8 left one
    salt with 2× the ideal share; P=256 lands within ~15% of ideal —
    tests/test_layout_skew.py rehearsal); if the skewed side arrives
    in few partitions, fan_out() it first."""
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()), F.lit(n_salts)
    )
    left = skewed.withColumn("_salt", salt.cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [*keys, "_salt"], how).drop("_salt")


def two_stage_agg(
    df: DataFrame,
    keys: list[str],
    partial: dict[str, Column],
    final: dict[str, Column],
    n_salts: int = 8,
) -> DataFrame:
    """Hot-key aggregation in two hops: partial agg on (keys, salt) —
    spreading each hot key over ``n_salts`` reducers — then a final
    re-agg on keys. Only algebraic aggregates compose; the caller names
    both halves explicitly:

        two_stage_agg(df, ["k"],
                      partial={"n": F.count(F.lit(1)), "total": F.sum("v")},
                      final={"n": F.sum("n"), "total": F.sum("total")})

    ≡ ``df.groupBy("k").agg(...)`` but no single reducer ever sees all
    rows of one key. (Spark's own map-side partial aggregation already
    covers mild skew; this is for keys hot enough that even the merge
    of one key's partials would straggle.)

    Salt is a hash of (keys…, spark_partition_id) — retry-stable and
    spreads identical rows across salts; see salted_join's docstring
    for why a whole-row or mid()-based salt is wrong here. Algebraic
    aggregates are salt-invariant, so the final re-agg erases the salt
    entirely."""
    salt = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id()), F.lit(n_salts)
    )
    partial_df = (
        df.withColumn("_salt", salt.cast("int"))
        .groupBy(*keys, "_salt")
        .agg(*[expr.alias(name) for name, expr in partial.items()])
    )
    return partial_df.groupBy(*keys).agg(
        *[expr.alias(name) for name, expr in final.items()]
    )


def fan_out(df: DataFrame, multiplier: int = 1, by: list[str] | None = None) -> DataFrame:
    """Repartition a narrow input UP to cluster parallelism before a
    data-amplifying stage (shingle explode, hash fan-out, vector
    rescore).

    Everything pipelined into a scan stage inherits the scan's
    parallelism — the number of input blocks. A small or single-file
    table therefore runs its whole explode/hash chain on ONE core even
    on a 32-core executor, and the amplified work (10-100× the input
    rows) is exactly the part that should be parallel. One narrow
    round-robin shuffle of the (id, text) projection buys a fully
    parallel fan-out stage; the guard makes it a no-op whenever the
    input is already at least that parallel, so a 100 TB scan with 10^5
    blocks is never repartitioned down.

    The guard reads ``inputFiles()`` — file-listing metadata, ~1 ms —
    rather than ``rdd.getNumPartitions()``, which compiles the physical
    plan a second time (~0.5 s per call on a fresh DataFrame). File
    count understates partition count when files are splittable, but an
    underestimate only ever adds a repartition that was close to
    warranted anyway; a non-file input (empty list, e.g. an in-memory
    range) falls through to the repartition, since it carries no
    block-parallelism of its own.

    ``by``: when the amplified stage feeds a groupBy on these columns,
    pass them here — the spread becomes hash partitioning on the key,
    which the downstream aggregate's ClusteredDistribution accepts
    as-is, so EnsureRequirements inserts NO second exchange: one whole
    shuffle stage (and its AQE replan + codegen round) disappears from
    the plan. Requires keys that are themselves well-spread (unique ids
    are; a hot grouping key should stay round-robin + two-stage agg)."""
    target = df.sparkSession.sparkContext.defaultParallelism * multiplier
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if by:
        return df.repartition(target, *[F.col(c) for c in by])
    return df.repartition(target)
