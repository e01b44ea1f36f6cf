from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import hashing, text, urls

__all__ = ["hashing", "text", "urls", "literal_dim"]


def literal_dim(
    spark: SparkSession, rows: Sequence[tuple], names: Sequence[str]
) -> DataFrame:
    """Small literal dimension table built entirely JVM-side.

    ``spark.createDataFrame(py_list)`` plans a Python-RDD scan: the
    driver pickles the rows and ``defaultParallelism`` Python workers
    are forked to deserialize a handful of rows — ~1 s per worker of
    pure startup cost when the pickle-worker pool is cold (observed:
    a 4-row dim costing 30 s on local[32]). A literal array of structs
    through ``inline`` stays a one-row JVM Range scan with zero Python
    involvement and broadcasts exactly the same way.
    """
    structs = [
        F.struct(*[F.lit(v).alias(n) for v, n in zip(row, names)]) for row in rows
    ]
    return spark.range(1).select(F.inline(F.array(*structs)))
