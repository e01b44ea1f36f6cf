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


def interval_stream_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    within: str = "1 hour",
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream interval join — the hardest Structured
    Streaming primitive, wrapped so the SAME transform runs in batch
    (oracle-checkable: an equi-join plus a BETWEEN on the timestamps)
    and under two ``readStream`` sources. Semantics: left/right rows
    with equal ``key_col`` whose right timestamp lies in
    [left_ts, left_ts + within].

    Streaming state bound: the watermark plus the interval condition
    let Spark evict buffered rows once no future match is possible —
    state is O(arrival skew + within), never O(stream). Outer variants
    (``how='left_outer'``) emit the null-padded row only after the
    watermark proves no match can arrive (Spark requires the watermark
    for outer stream-stream joins; inner joins accept it for state
    eviction alone)."""
    l_src = left.withWatermark(left_ts, watermark) if watermark else left
    r_src = right.withWatermark(right_ts, watermark) if watermark else right
    cond = (
        (l_src[key_col] == r_src[key_col])
        & (r_src[right_ts] >= l_src[left_ts])
        & (r_src[right_ts] <= l_src[left_ts] + F.expr(f"INTERVAL {within}"))
    )
    joined = l_src.join(r_src, cond, how)
    # raw TIMESTAMPs out, not formatted strings: unlike the windowed
    # aggregates (whole-second window boundaries), this operator emits
    # event timestamps, where sub-second precision is real data
    return joined.select(
        l_src[key_col].alias(key_col),
        l_src[left_ts].alias("left_ts"),
        r_src[right_ts].alias("right_ts"),
    )
