"""Source-loading regressions.

The correctness driver builds its OWN SparkSession (not via get_spark()),
so load_table must not assume any session conf is pre-set. Round-1 failure
mode: events.parquet stores TIMESTAMP(NANOS) and the read throws
PARQUET_TYPE_ILLEGAL unless spark.sql.legacy.parquet.nanosAsLong is on.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from regpulse_lakehouse_spark.sources.tpch import TABLES, load_table


def test_events_reads_without_preset_nanos_conf(spark, sf_dir):
    # Simulate the driver's vanilla session: unset the conf, then load.
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        df = load_table(spark, sf_dir, "events")
        assert isinstance(df.schema["ts"].dataType, T.TimestampType)
        assert df.limit(1).count() == 1
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def test_all_tables_load(spark, sf_dir):
    for name in TABLES:
        assert load_table(spark, sf_dir, name).limit(1).count() == 1


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")
