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
    j AS (SELECT grid.b, c.n FROM grid LEFT JOIN c USING (b))
    SELECT strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_iso,
           CAST(coalesce(n, 0.0) AS BIGINT) AS n_zero,
           CAST(last_value(n IGNORE NULLS) OVER (
                  ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n_locf,
           n IS NULL AS filled
    FROM j
    """,
)
def ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled 10-minute purchase-rate series: sparse event counts
    regularized onto the full bucket grid, with BOTH the ``zero`` and
    ``locf`` strategies graded in one row (operators/timeseries.py::
    gapfill — explode(sequence()) grid per group, left join of
    observations, one last(ignorenulls) window for locf; all JVM-side).
    ``linear`` stays pytest-graded (tests/test_timeseries.py): its
    float interpolation is not hash-portable across engines. 10-minute
    buckets over the 'purchase' slice guarantee real gaps at every
    driver scale factor (42 empty buckets even at sf0.1; hour buckets
    go dense there). Counts round-trip through BIGINT so the hash
    compares exact integers, and buckets are epoch-aligned on both
    engines (Spark ``window()`` and DuckDB ``time_bucket`` both align
    sub-day intervals to midnight-anchored grids).

    One operator pass: the row runs gapfill(locf) and DERIVES the zero
    strategy's column from it — on the same grid join, zero-fill is
    exactly ``CASE WHEN filled THEN 0 ELSE n END`` (the ``filled``
    flag marks materialized buckets), so both strategies' algebra is
    graded without planning the grid subtree twice (a second gapfill +
    join measured 4.6 s cold vs 2.3 s for this shape — pure
    Catalyst/codegen cost, the data is 4320 rows). The zero strategy's
    own code path keeps its direct DuckDB differential in
    tests/test_timeseries.py::test_gapfill_matches_duckdb_on_real_events.

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
    l = gapfill(counts, "ts", "n", None, "10 minutes", "locf")
    return l.select(
        F.date_format("bucket_ts", "yyyy-MM-dd HH:mm:ss").alias("bucket_iso"),
        F.when(F.col("filled"), F.lit(0)).otherwise(F.col("n")).cast("long").alias("n_zero"),
        F.col("n").cast("long").alias("n_locf"),
        "filled",
    )
