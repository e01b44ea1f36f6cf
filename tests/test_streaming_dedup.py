"""Streaming exact dedup (streaming/dedup.py): a file stream carrying
every event twice must emit each key once, matching the batch answer —
and the plan must use the bounded-state operator."""

from __future__ import annotations

from regpulse_lakehouse_spark.sources.tpch import load_table
from regpulse_lakehouse_spark.streaming.dedup import exact_dedup_stream

_AWAIT_S = 120


def test_stream_dedup_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    src = str(tmp_path / "src")
    # two files with identical content → every event arrives twice
    ev.write.parquet(src)
    ev.write.mode("append").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src)
    out = exact_dedup_stream(stream, ["event_id"], watermark="2 hours")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(_AWAIT_S), "stream did not finish in time"

    got = [r["event_id"] for r in spark.table("dedup_stream").collect()]
    assert len(got) == len(set(got)), "a duplicate key was emitted twice"
    want = {r["event_id"] for r in exact_dedup_stream(ev, ["event_id"]).collect()}
    assert set(got) == want and len(want) == ev.count()


def test_streaming_plan_uses_bounded_state_operator(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    src = str(tmp_path / "probe")
    ev.limit(1).write.parquet(src)
    stream = spark.readStream.schema(ev.limit(1).schema).parquet(src)
    out = exact_dedup_stream(stream, ["event_id"])
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan
