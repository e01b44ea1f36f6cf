"""Streaming-semantics queries in their batch form — SURVEY.md §2.11
extension operators (tumbling windows, session windows) over the
``events`` stream table.

The transforms live in streaming/windows.py and run unchanged under
``readStream`` + watermark (tests/test_streaming_windows.py proves the
streamed result equals the batch result); here they register with
DuckDB oracles (``time_bucket`` / gaps-and-islands) so the windowing
semantics themselves are differential-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tpch import load_table
from ..streaming.windows import session_windows, tumbling_counts
from . import register


@register(
    "st_tumbling_window_counts",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def st_tumbling_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (streaming/windows.py —
    identical code streams with a watermark). Epoch-aligned buckets on
    both engines."""
    return tumbling_counts(load_table(spark, sf_dir, "events"), window="1 hour")


@register(
    "st_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                  OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    grp AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM grp
    GROUP BY user_id, sid
    """,
)
def st_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 30-minute inactivity gap
    (streaming/windows.py::session_windows — Spark's native stateful
    session operator; the batch equivalent is gaps-and-islands, which is
    exactly the oracle). Session end = last event + gap; an event at
    exactly ``gap`` after the previous one opens a NEW session
    ([start, end) semantics) — mirrored by the ``>=`` break predicate."""
    return session_windows(load_table(spark, sf_dir, "events"), gap="30 minutes")
