"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``regpulse_lakehouse_spark.queries`` — the registry maps
every implemented operator from SURVEY.md §2 (plus the training-data
pipeline extensions) to a (spark_fn, DuckDB-oracle) pair.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from regpulse_lakehouse_spark.queries import load_all

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = load_all()
    return registry["flagship_pricing_summary"].fn(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each registered query — every row
    carries an oracle (since r12 the approximate families grade through
    portable md5-twin re-derivations; recall is ADDITIONALLY pinned in
    pytest). A future genuinely non-SQL-expressible row may return
    ``oracle=None`` and fall back to the driver's rows-only check."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
