"""Deterministic hash-based sampling — training-data-pipeline operators
(BASELINE.json north-star family, alongside dedup/decontamination).

``df.sample()`` / ``sampleBy()`` draw from an RNG seeded per partition:
a task RETRY re-draws different rows (Spark documents sample() as not
guaranteed deterministic), partition count changes the result, and two
runs over the same data can disagree — all fatal for reproducible
training corpora. Hash-gating fixes every one of those: a row is in the
sample iff ``xxhash64(seed, key...)`` falls under the fraction cutoff,
so membership is a pure row-local function of the key — stable under
retries, re-partitioning, engine version, and cluster size, and
composable (the same key always lands in the same split).

All three operators are plain filters/projections: zero shuffles, fully
codegen'd, trivially pushed beneath wide downstream plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 2^63 - 1 as float; xxhash64 & MAX_LONG is uniform on [0, 2^63)
_HALF_RANGE = float(1 << 63)


def _unit_hash(seed: str, keys: list[Column]) -> Column:
    """Deterministic uniform [0,1) value per key tuple."""
    h = F.xxhash64(F.lit(seed), *keys)
    return h.bitwiseAND(F.lit((1 << 63) - 1)) / F.lit(_HALF_RANGE)


def hash_sample(
    df: DataFrame, fraction: float, keys: list[str], seed: str = "sample"
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``keys``: a row
    survives iff its key hash falls under the cutoff. Same key ⇒ same
    decision everywhere, so sampling the same table twice (or on two
    clusters) yields the identical subset."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(_unit_hash(seed, [F.col(k) for k in keys]) < fraction)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    keys: list[str],
    default_fraction: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible counterpart
    of ``sampleBy``): each stratum value gets its own keep-fraction;
    unlisted strata fall back to ``default_fraction``. The cutoff is a
    literal CASE over the stratum column — still one shuffle-free
    filter."""
    for v, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for stratum {v!r} must be in [0,1], got {f_}")
    cutoff = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(cutoff)
    return df.filter(_unit_hash(seed, [F.col(k) for k in keys]) < cutoff)


def assign_splits(
    df: DataFrame,
    keys: list[str],
    weights: dict[str, float],
    split_col: str = "split",
    seed: str = "split",
) -> DataFrame:
    """Deterministic dataset split assignment (train/val/test): each key
    tuple maps to exactly one split, with expected proportions given by
    ``weights`` (normalized; order-stable by sorted split name). Returns
    ``df`` plus ``split_col`` — disjoint and exhaustive by construction,
    and a given key lands in the same split on every engine run, which
    is what keeps eval sets leak-free across pipeline re-runs."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    u = _unit_hash(seed, [F.col(k) for k in keys])
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)
