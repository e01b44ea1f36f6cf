"""Sketch-family queries — the driver-graded face of
operators/sketches.py (beyond-reference training-pipeline surface;
the approximate members — HLL, DDSketch, Count-Min, KMV — are
pytest-verified by exact-merge equivalence, while heavy hitters is
EXACT by construction and so carries a plain-SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from . import register


@register(
    "hh_heavy_hitters",
    oracle="""
    WITH src AS (
      SELECT CAST(user_id % 97 AS VARCHAR) AS shard
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT shard, COUNT(*) AS n_events
    FROM src
    GROUP BY shard
    HAVING COUNT(*) >= CEIL(0.01 * (SELECT COUNT(*) FROM src))
    """,
)
def hh_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-shard detection: hash shards (user_id mod 97) carrying at
    least 1% of event traffic, via operators/sketches.heavy_hitters —
    bounded-memory SpaceSaving candidates per partition (mapInPandas),
    then an EXACT count of the candidate set through a BROADCAST
    semi-join, so the only groupBy runs over candidate rows, never the
    full key domain (plan-asserted BroadcastHashJoin, no
    full-cardinality shuffle — tests/test_sketches.py::
    test_heavy_hitters_count_pass_broadcasts). Exactness
    is by construction, not luck: capacity defaults to 4/threshold =
    400 ≥ any item above N/400, so every shard at the 1% bar is a
    guaranteed candidate and the recount makes its count exact — which
    is why this approximate-family member can carry a plain GROUP
    BY/HAVING oracle. At 100 TB the same plan broadcasts a few hundred
    candidates instead of shuffling a billion-key histogram."""
    from ..operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 97).alias("shard")
    )
    return heavy_hitters(ev, "shard", threshold_ratio=0.01).select(
        "shard", F.col("count").alias("n_events")
    )
