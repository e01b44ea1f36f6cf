"""Streaming exact dedup — the ingest-side companion of
operators/dedup.py (BASELINE.json north-star: dedup as a first-class
component; SURVEY.md §2.11's streaming extension family).

Write-once-run-both-modes like streaming/windows.py: the same call
works on a batch DataFrame (plain ``dropDuplicates``) and on a stream,
where it uses ``dropDuplicatesWithinWatermark`` — the operator Spark
added precisely because plain ``dropDuplicates`` on a stream keeps
EVERY key ever seen in state forever (the unbounded-state trap).
State for a key is evicted once the watermark passes its event time,
so memory is bounded by the horizon × key arrival rate, and a
duplicate arriving within the horizon is dropped exactly like the
batch form would.

Semantic contract (and its scale rationale): duplicates separated by
MORE than the watermark horizon are re-emitted — at 100 TB the horizon
is the knob trading state size against dedup completeness, and the
downstream compaction (W1 first-wins, operators/dedup.first_wins) is
the batch backstop that makes the end-to-end result exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def exact_dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """First occurrence per key (within the watermark horizon when
    streaming). Batch input → plain ``dropDuplicates(keys)``; streaming
    input → watermarked ``dropDuplicatesWithinWatermark`` with bounded
    state."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)
