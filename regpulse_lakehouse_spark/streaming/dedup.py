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
from pyspark.sql import functions as F


def exact_dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """One row per key (within the watermark horizon when streaming).

    Batch input → first-wins by ``ts_col`` (W1 window dedup), a
    DETERMINISTIC survivor — plain ``dropDuplicates`` keeps whichever
    copy a partition happens to deliver first. Streaming input →
    watermarked ``dropDuplicatesWithinWatermark``: the survivor is the
    first ARRIVAL, which coincides with the batch choice whenever
    arrival respects event order; both modes agree on the KEY SET
    unconditionally (what the stream≡batch test pins)."""
    if df.isStreaming:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    from ..operators.dedup import first_wins

    return first_wins(df, keys, [F.asc(ts_col)])
