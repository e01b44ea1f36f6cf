"""Event-time windowed aggregations — the Structured Streaming
extension beyond the reference's surface (SURVEY.md §2.11 notes the
reference has no tumbling/sliding/session windows; the 100 TB
training-data pipeline needs them for rate metrics and sessionization).

Both transforms are written against a plain DataFrame so the SAME code
runs in batch mode (oracle-checkable against DuckDB ``time_bucket`` /
gaps-and-islands SQL — see queries/streaming_q.py) and under
``readStream`` with a watermark (tests/test_streaming_windows.py runs
the identical transform through a file stream and checks it emits the
batch answer).

Late-data policy: the reference's only policy is "unknown dates pass"
(ST4); for the streaming extension we adopt the standard watermark —
rows later than ``watermark`` past the max seen event time are dropped
from open windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    ts_col: str = "ts",
    watermark: str | None = None,
    slide: str | None = None,
) -> DataFrame:
    """Tumbling-window per-type event counts + value sum; pass ``slide``
    (e.g. '15 minutes' under a '1 hour' window) for SLIDING windows —
    each event then lands in window/slide overlapping windows, the
    standard rate-over-trailing-interval metric. In streaming mode pass
    ``watermark`` (e.g. '2 hours'); append-mode output emits a window
    once the watermark passes its end."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    w = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        src.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows (sessions close after ``gap`` of
    inactivity) via ``session_window`` — Spark's native stateful session
    operator; in batch mode it is equivalent to gaps-and-islands SQL."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
        )
    )
