"""Vectorize pipeline (pipelines/vectorize.py): chunk accounting,
quantized output schema, embedding fidelity through the quantize
roundtrip, and the model seam."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from regpulse_lakehouse_spark.operators.quantize import dequantize_embeddings
from regpulse_lakehouse_spark.operators.vector import cosine, deterministic_embedding
from regpulse_lakehouse_spark.pipelines.vectorize import vectorize_corpus
from regpulse_lakehouse_spark.sources.tpch import load_table


@pytest.fixture(scope="module")
def out(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    return vectorize_corpus(docs, chunk_chars=200, overlap=40, dim=8)


def test_chunk_accounting(out, spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in docs.collect()}
    # every doc contributes >= 1 chunk; ids follow {doc}-{index}
    for r in rows:
        assert r["chunk_id"] == f"{r['doc_id']}-{r['chunk_index']}"


def test_quantized_schema(out):
    f = {fld.name: fld.dataType for fld in out.schema.fields}
    assert isinstance(f["q_codes"], T.ArrayType)
    assert isinstance(f["q_codes"].elementType, T.ByteType)
    assert "embedding" not in f  # stored form is the quantized one


def test_embedding_roundtrip_fidelity(out, spark, sf_dir):
    """Dequantized chunk vectors must stay ~parallel to a freshly
    computed embedding of the same chunk text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    from regpulse_lakehouse_spark.functions.normalize import truncate
    from regpulse_lakehouse_spark.operators.chunking import chunk_documents

    chunks = chunk_documents(
        docs.withColumn("text", truncate(F.col("text"), 6000)),
        chunk_chars=200, overlap=40,
    ).select("chunk_id", deterministic_embedding(F.col("chunk_text"), 8).alias("fresh"))
    approx = dequantize_embeddings(out, "approx")
    joined = approx.join(chunks, "chunk_id").select(
        cosine(F.col("approx"), F.col("fresh")).alias("cos")
    )
    for r in joined.collect():
        assert r["cos"] > 0.999


def test_model_seam(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(5)
    out = vectorize_corpus(
        docs, embed_fn=lambda c: F.array(F.length(c).cast("double"), F.lit(1.0))
    )
    row = out.collect()[0]
    assert len(row["q_codes"]) == 2
