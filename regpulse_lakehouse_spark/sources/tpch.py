"""Parquet sources for the driver's synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under an ``sf_dir``.

Reads are plain ``spark.read.parquet`` so Catalyst predicate pushdown,
column pruning and partition splitting all apply (SURVEY.md §4: the
reference's ``SELECT *`` row materialization is replaced by pruned
columnar scans).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables worth broadcasting in joins.
DIM_TABLES = frozenset({"region", "nation"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # events.ts has shipped as TIMESTAMP(NANOS) (needs nanosAsLong or the
    # vectorized reader refuses) in some testdata generations and as plain
    # timestamp[us] (reads as TIMESTAMP_NTZ) in others. Normalize both to
    # session-zoned TimestampType so every downstream query/oracle sees one
    # canonical type. The conf is runtime-settable and callers (the
    # correctness driver included) may hand us a vanilla session that never
    # went through get_spark() — so set it here, idempotently.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Pin UTC unconditionally (not just on the NTZ branch below): a
    # vanilla non-get_spark() session on a non-UTC host would otherwise
    # evaluate session-tz-sensitive functions (hour(), date_format)
    # differently depending on which testdata generation was loaded —
    # and the setting must not vary with load order.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        dt = df.schema["ts"].dataType
        if isinstance(dt, T.LongType):
            # TIMESTAMP(NANOS) read as long; truncate to micros with
            # integer division (double division loses precision at 1.7e18)
            # — matches DuckDB's ns→µs truncation.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, T.TimestampNTZType):
            # NTZ→timestamp reinterprets the wall clock IN THE SESSION
            # ZONE — lossless only because UTC is pinned above.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
