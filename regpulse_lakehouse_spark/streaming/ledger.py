"""Run ledger + streaming wrapper — SURVEY.md §2.11 ST1-ST3.

The reference's queue-driven micro-batch (BullMQ workers, queue.ts:
10-19; run state machine queued→running→completed|failed, jobs/scan.ts:
20,82-103; append-only run_logs polled every 2s, RunMonitor.tsx:25-54)
maps to:

- a ``runs`` VersionedParquetTable as the ledger (state transitions =
  keyed upserts);
- an append-only ``run_logs`` table (ordered replay is the T3 query);
- ``stream_scan``: a Structured Streaming wrapper that runs the *same*
  batch scan pipeline per micro-batch via ``foreachBatch`` — write
  once, run both modes (SURVEY §7 Phase 7).

Watermark policy note (ST4): the reference has no event-time watermark
— unknown dates pass the window filter and dedup is within-batch only.
``stream_scan`` keeps that parity; cross-batch dedup would be a
deliberate extension via ``withWatermark + dropDuplicates``.
"""

from __future__ import annotations

import datetime as dt
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas
from ..operators.upsert import VersionedParquetTable
from ..pipelines.scan import run_scan


class RunLedger:
    """runs + run_logs tables with the reference's state machine."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.runs = VersionedParquetTable(spark, f"{root}/runs")
        self.logs = VersionedParquetTable(spark, f"{root}/run_logs")

    def _now(self) -> dt.datetime:
        return dt.datetime.now(dt.timezone.utc)

    def create_run(
        self, run_type: str, jurisdiction: str, days_window: int = 90
    ) -> str:
        """queued row (index.ts:359-381)."""
        run_id = f"run-{uuid.uuid4()}"
        row = self.spark.createDataFrame(
            [
                (
                    run_id,
                    run_type,
                    jurisdiction,
                    days_window,
                    "queued",
                    self._now(),
                    None,
                    {},
                    None,
                )
            ],
            schemas.RUNS,
        )
        if self.runs.exists():
            self.runs.append(row)
        else:
            self.runs.write(row)
        return run_id

    def transition(
        self, run_id: str, status: str, meta: dict[str, str] | None = None
    ) -> None:
        """State transition via keyed upsert (jobs/scan.ts:20,82-103:
        queued→running→completed|failed; meta merged on finalize —
        the COALESCE(meta,'{}')||$1 jsonb merge becomes map_concat)."""
        current = self.runs.read()
        terminal = status in ("completed", "failed")
        updates = (
            current.filter(F.col("id") == run_id)
            .withColumn("status", F.lit(status))
            .withColumn(
                "completed_at",
                F.lit(self._now()) if terminal else F.col("completed_at"),
            )
            .withColumn(
                "meta",
                F.map_concat(
                    F.coalesce(
                        F.col("meta"), F.create_map().cast(schemas.META)
                    ),
                    F.create_map(
                        *[F.lit(x) for kv in (meta or {}).items() for x in kv]
                    ).cast(schemas.META),
                ),
            )
        )
        self.runs.upsert(updates, keys=["id"], version_col="started_at")

    def log(self, run_id: str, stage: str, message: str) -> None:
        """ST3 append-only progress stream (repository.ts:87-100)."""
        row = self.spark.createDataFrame(
            [
                (
                    f"log-{uuid.uuid4()}",
                    run_id,
                    stage,
                    message,
                    {},
                    self._now(),
                )
            ],
            schemas.RUN_LOGS,
        )
        if self.logs.exists():
            self.logs.append(row)
        else:
            self.logs.write(row)

    def replay(self, run_id: str, limit: int = 200) -> DataFrame:
        """T3 ordered replay with cap (repository.ts:94-100)."""
        return (
            self.logs.read()
            .filter(F.col("run_id") == run_id)
            .orderBy(F.asc("created_at"), F.asc("id"))
            .limit(limit)
        )


def stream_scan(
    spark: SparkSession,
    source_dir: str,
    output_root: str,
    checkpoint_dir: str,
    ledger: RunLedger | None = None,
    days_window: int = 365 * 50,
    **scan_kwargs,
):
    """ST1: Structured Streaming ingestion reusing the batch scan DAG.

    Watches ``source_dir`` for parquet files in the source_documents
    shape and processes each micro-batch through ``run_scan`` via
    foreachBatch, appending main/review/links outputs under
    ``output_root``. Returns the StreamingQuery (caller awaits)."""
    stream = (
        spark.readStream.schema(schemas.SOURCE_DOCUMENTS)
        .option("maxFilesPerTrigger", 4)  # ST5-style throttle
        .parquet(source_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        run_id = f"stream-batch-{batch_id}"
        if ledger is not None:
            ledger.log(run_id, "process", f"batch {batch_id}")
        result = run_scan(batch_df, run_id=run_id, days_window=days_window, **scan_kwargs)
        result.main_items.write.mode("append").parquet(f"{output_root}/main_items")
        result.review_items.write.mode("append").parquet(f"{output_root}/review_items")
        result.links.write.mode("append").parquet(f"{output_root}/links")

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
