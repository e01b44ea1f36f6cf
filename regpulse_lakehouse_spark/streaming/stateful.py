"""Custom stateful streaming operator via ``applyInPandasWithState``
(the Structured Streaming extension point for semantics the built-in
windowed aggregates can't express — SURVEY.md §2.11 maps the
reference's run state machine here when it outgrows ledger upserts).

``user_running_totals`` keeps a per-user running (count, value-sum)
across micro-batches — the canonical cross-batch accumulator shape: the
state store holds one small tuple per key, each micro-batch updates it
from Arrow batches, and the operator emits the refreshed totals for
keys seen in that batch (update output mode).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("total_value", T.DoubleType(), True),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType(), False),
        T.StructField("total", T.DoubleType(), False),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, float(total)))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Cross-batch per-user running totals. Works on a streaming
    DataFrame (state persists in the checkpointed state store between
    micro-batches); on a batch DataFrame it degenerates to a one-shot
    grouped aggregate — the equivalence tested in
    tests/test_streaming_windows.py."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
