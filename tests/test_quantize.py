"""int8 embedding quantization (operators/quantize.py): roundtrip error
bound, constant-vector exactness, cosine preservation on the synthetic
embeddings table, all-JVM plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from regpulse_lakehouse_spark.operators.quantize import (
    dequantize_embeddings,
    quantize_embeddings,
)
from regpulse_lakehouse_spark.sources.tpch import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings").limit(200).select("vec_id", "embedding")


def test_codes_schema_and_roundtrip_bound(emb):
    q = quantize_embeddings(emb, "embedding")
    f = {fld.name: fld.dataType for fld in q.schema.fields}
    assert isinstance(f["q_codes"], T.ArrayType) and isinstance(
        f["q_codes"].elementType, T.ByteType
    )
    both = dequantize_embeddings(q, "approx").join(emb, "vec_id")
    rows = both.collect()
    assert len(rows) == 200
    for r in rows:
        lo, hi = min(r["embedding"]), max(r["embedding"])
        bound = (hi - lo) / 508 + 1e-9
        for a, b in zip(r["approx"], r["embedding"]):
            assert abs(a - b) <= bound


def test_constant_vector_exact(spark):
    df = spark.createDataFrame([(1, [0.5, 0.5, 0.5])], "vec_id long, embedding array<double>")
    out = dequantize_embeddings(quantize_embeddings(df, "embedding")).collect()[0]
    assert out["embedding"] == [0.5, 0.5, 0.5]


def test_cosine_preserved(emb):
    """Quantization error must not disturb similarity structure: cosine
    between original and dequantized self stays ~1."""
    both = dequantize_embeddings(quantize_embeddings(emb, "embedding"), "approx").join(
        emb, "vec_id"
    )
    rows = both.collect()
    for r in rows:
        dot = sum(a * b for a, b in zip(r["approx"], r["embedding"]))
        na = math.sqrt(sum(a * a for a in r["approx"]))
        nb = math.sqrt(sum(b * b for b in r["embedding"]))
        if na > 0 and nb > 0:
            assert dot / (na * nb) > 0.999


def test_quantize_is_pure_jvm(emb):
    plan = quantize_embeddings(emb, "embedding")._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
