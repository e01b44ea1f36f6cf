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
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from .. import tmpstate

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

#: Sessions whose nanosAsLong/timezone confs are already pinned — the
#: two conf.set py4j round trips per load_table call are pure overhead
#: after the first call on a session. WeakSet: a dropped session must
#: not be kept alive by this bookkeeping.
_CONFIGURED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()

#: Per-session memo of the base-table DataFrames, keyed by
#: (abspath, mtime_ns, size) of the parquet path. This caches PLAN
#: METADATA only — the DataFrame is a lazy, immutable description and
#: every action on it re-reads the parquet input in full — but skips
#: the ~70 ms/call ``spark.read.parquet`` round trip (footer read +
#: schema inference + relation build), which r15 profiling measured as
#: one of the largest per-invocation driver costs across all 50 graded
#: rows (2-4 loads/row × 6 bench invocations/row). The stat-key makes
#: a regenerated input at the same path miss the memo, so a stale file
#: listing can never be served (the ADVICE-r14 _staged_edges staleness
#: class). Weak-keyed: sessions come and go in tests; a stopped
#: SparkContext also invalidates via tmpstate.cleanup() like the other
#: py4j-holding caches (operators/dedup._SIG_EXPRS precedent).
_FRAMES: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()

tmpstate.on_cleanup(_FRAMES.clear)
tmpstate.on_cleanup(_CONFIGURED.clear)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if spark not in _CONFIGURED:
        # events.ts has shipped as TIMESTAMP(NANOS) (needs nanosAsLong or
        # the vectorized reader refuses) in some testdata generations and
        # as plain timestamp[us] (reads as TIMESTAMP_NTZ) in others.
        # Normalize both to session-zoned TimestampType so every
        # downstream query/oracle sees one canonical type. The conf is
        # runtime-settable and callers (the correctness driver included)
        # may hand us a vanilla session that never went through
        # get_spark() — so set it here, once per session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Pin UTC unconditionally (not just on the NTZ branch below): a
        # vanilla non-get_spark() session on a non-UTC host would
        # otherwise evaluate session-tz-sensitive functions (hour(),
        # date_format) differently depending on which testdata generation
        # was loaded — and the setting must not vary with load order.
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        _CONFIGURED.add(spark)
    path = f"{sf_dir}/{name}.parquet"
    try:
        st = os.stat(path)
        key = (os.path.abspath(path), st.st_mtime_ns, st.st_size)
    except OSError:
        # non-local or vanished path: fall through uncached (the read
        # below raises the real error with Spark's own message)
        key = None
    per = _FRAMES.setdefault(spark, {})
    if key is not None and key in per:
        return per[key]
    df = spark.read.parquet(path)
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
    if key is not None:
        per[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API) and return them."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
