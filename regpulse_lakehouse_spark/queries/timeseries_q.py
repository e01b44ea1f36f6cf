"""Time-series queries — the driver-graded face of
operators/timeseries.py (beyond-reference training-pipeline surface:
the TimescaleDB ``time_bucket_gapfill`` shape for dashboard series).

Registered round 10 (VERDICT r9 task 6): gapfill was the last
nontrivial pytest-only operator family with a cheap exact oracle. The
slot is funded by unregistering ``mm_frame_sample_plan`` — its entire
graded algebra (filter → explode(sequence()) grid) is THIS operator's
grid stage, now graded here over a sparser slice with two fill
strategies on top; the metadata-only pruned-scan property that made
that row distinctive stays machine-asserted in
tests/test_plan_quality.py and tests/test_lineage_streaming_mm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import gapfill
from ..sources.tpch import load_table
from . import register


@register(
    "ts_gapfill",
    oracle="""
    WITH c AS (
      SELECT time_bucket(INTERVAL 10 MINUTE, CAST(ts AS TIMESTAMP)) AS b,
             CAST(COUNT(*) AS DOUBLE) AS n
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    grid AS (
      SELECT unnest(generate_series((SELECT MIN(b) FROM c),
                                    (SELECT MAX(b) FROM c),
                                    INTERVAL 10 MINUTE)) AS b
    ),
    j AS (SELECT grid.b, c.n FROM grid LEFT JOIN c USING (b)),
    w AS (
      SELECT b, n,
             last_value(n IGNORE NULLS) OVER (
               ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_v,
             last_value(CASE WHEN n IS NOT NULL THEN b END IGNORE NULLS) OVER (
               ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p_t,
             first_value(n IGNORE NULLS) OVER (
               ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_v,
             first_value(CASE WHEN n IS NOT NULL THEN b END IGNORE NULLS) OVER (
               ORDER BY b ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_t
      FROM j
    )
    SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_iso,
           CAST(coalesce(n, 0.0) AS BIGINT) AS n_zero,
           CAST(p_v AS BIGINT) AS n_locf,
           CAST(ROUND((CASE WHEN n IS NOT NULL THEN n
                            WHEN p_v IS NOT NULL AND n_v IS NOT NULL THEN
                              p_v + (n_v - p_v) *
                              (CAST(date_diff('second', p_t, b) AS DOUBLE) /
                               CAST(date_diff('second', p_t, n_t) AS DOUBLE))
                       END) * 1000000) AS BIGINT) AS n_linear_micro,
           n IS NULL AS filled
    FROM w
    """,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 10-minute purchase-rate series: sparse event counts
    regularized onto the full bucket grid, with ALL THREE fill
    strategies graded in one row (operators/timeseries.py::gapfill
    ``strategy='all'`` — explode(sequence()) grid per group, left join
    of observations, shared forward/backward anchor windows; all
    JVM-side, one Catalyst pass). 10-minute buckets over the
    'purchase' slice guarantee real gaps at every driver scale factor
    (42 empty buckets even at sf0.1; hour buckets go dense there).
    Counts round-trip through BIGINT so the hash compares exact
    integers, and buckets are epoch-aligned on both engines (Spark
    ``window()`` and DuckDB ``time_bucket`` both align sub-day
    intervals to midnight-anchored grids).

    ``linear`` is hash-portable via integer MICRO-UNITS
    (``CAST(ROUND(x*1e6) AS BIGINT)``, r10-VERDICT task 5): the
    anchors are integer counts, the bucket fraction is a ratio of
    integer second-spans, and both engines evaluate the identical
    ``p + (n-p)*(dt/span)`` double expression with IEEE-754
    exactly-rounded ops in the same order — bit-identical doubles in,
    identical BIGINT out (round-half-up and round-half-away agree on
    non-negative values; edge rows can't be NULL because the grid
    spans [min,max] observed, so both anchors always exist).
    Differentials pin it at the pytest SF
    (tests/test_timeseries.py::test_graded_row_linear_micro_matches_duckdb)
    and at sf0.01/sf0.1 via the driver replica.

    At 100 TB the gapfill input is the already-aggregated DASHBOARD
    series (groups x buckets), never raw events — the one groupBy over
    raw data here is the same tumbling-count shape the streaming rows
    grade."""
    ev = load_table(spark, sf_dir, "events")
    counts = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "10 minutes")["start"].alias("ts"))
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    g = gapfill(counts, "ts", "n", None, "10 minutes", "all")
    return g.select(
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_iso"),
        F.col("n_zero").cast("long").alias("n_zero"),
        F.col("n_locf").cast("long").alias("n_locf"),
        F.round(F.col("n_linear") * F.lit(1000000.0)).cast("long").alias("n_linear_micro"),
        "filled",
    )
