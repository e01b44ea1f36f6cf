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


@register(
    "rj_interval_join",
    oracle="""
    WITH anchors AS (
      SELECT event_id AS anchor_id,
             ts - INTERVAL 2 HOUR AS w_start,
             ts AS w_end
      FROM events
      WHERE event_type = 'purchase' AND event_id % 7 = 0
    )
    SELECT CAST(a.anchor_id AS BIGINT) AS anchor_id,
           CAST(e.event_id AS BIGINT) AS event_id,
           e.event_type AS event_type,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_iso
    FROM events e
    JOIN anchors a ON e.ts > a.w_start AND e.ts <= a.w_end
    """,
)
def rj_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range/interval join (operators/rangejoin.py — the classic
    operator Spark lacks natively; SparkSQL compiles a BETWEEN join to
    BroadcastNestedLoop or a cartesian filter, both quadratic). The
    graded shape is look-back attribution: every event inside the
    2-hour window ending at each sampled purchase (anchor), emitted as
    exact (anchor_id, event_id) pairs so the bucketize→equi-join→refine
    pipeline is hash-graded pair for pair against DuckDB's brute-force
    inequality join.

    Plan shape: anchors explode to ≤3 one-hour buckets each, points map
    to exactly one; the join is an ordinary equi-join on the 8-byte
    bucket key (broadcast here — the anchor side is sampled small, the
    enrichment shape) followed by the exact range refine. Linear in
    points + interval-bucket expansions, never quadratic; AQE/skew
    handling apply as for any equi-join. ``closed='right'`` gives
    (w_start, w_end] — the anchor matches its own window's end."""
    from ..operators import rangejoin as RJ

    ev = load_table(spark, sf_dir, "events")
    anchors = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") % 7 == 0)
    ).select(
        F.col("event_id").alias("anchor_id"),
        (F.col("ts") - F.expr("INTERVAL 2 HOURS")).alias("w_start"),
        F.col("ts").alias("w_end"),
    )
    pts = ev.select(
        F.col("event_id").cast("long").alias("event_id"), "ts", "event_type"
    )
    joined = RJ.interval_join(
        pts,
        anchors,
        point_col="ts",
        start_col="w_start",
        end_col="w_end",
        bucket_width=3_600_000_000,  # 1-hour buckets on epoch micros
        closed="right",
        broadcast_intervals=True,
    )
    return joined.select(
        F.col("anchor_id").cast("long").alias("anchor_id"),
        "event_id",
        "event_type",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_iso"),
    )
