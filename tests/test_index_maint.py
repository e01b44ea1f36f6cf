"""Streaming BM25 index maintenance (streaming/index_maint.py): two
availableNow runs over a growing file source leave the index
byte-equal to a fresh batch build over all documents; micro-batch ids
are the append idempotency refs."""

from __future__ import annotations

from regpulse_lakehouse_spark.operators import retrieval as R
from regpulse_lakehouse_spark.streaming.index_maint import maintain_bm25_index

DOCS1 = [(f"a{i}", f"alpha{i} regulatory review wording{i} body") for i in range(20)]
DOCS2 = [(f"b{i}", f"beta{i} disclosure filing wording{i} tail") for i in range(20)]


def test_streamed_index_equals_batch_build(spark, tmp_path):
    src = str(tmp_path / "src")
    idx = str(tmp_path / "idx")
    ck = str(tmp_path / "ck")
    schema = "doc_id string, text string"

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = maintain_bm25_index(stream, idx, ck, n_buckets=4)
        assert q.awaitTermination(120), "maintenance run did not finish"

    spark.createDataFrame(DOCS1, schema).write.mode("overwrite").parquet(src)
    run_once()
    assert len(R.committed_batches(spark, idx)) >= 1
    mid = R.bm25_search(spark, idx, "regulatory review", k=5).collect()
    assert [r["doc_id"] for r in mid]  # first half searchable already

    spark.createDataFrame(DOCS2, schema).write.mode("append").parquet(src)
    run_once()

    full = spark.createDataFrame(DOCS1 + DOCS2, schema)
    for query in ("regulatory review", "disclosure filing", "wording3"):
        want = sorted(
            (r["doc_id"], r["bm25"]) for r in R.bm25_topk(full, query, k=40).collect()
        )
        got = sorted(
            (r["doc_id"], r["bm25"])
            for r in R.bm25_search(spark, idx, query, k=40).collect()
        )
        assert got == want, query


def test_streamed_ivf_index_equals_batch_twin(spark, tmp_path):
    """Vector-side maintenance: two availableNow runs over a growing
    vector source serve the same results as build(half1)+append(half2)
    in batch mode — same quantizers (trained on the identical first
    batch), same committed-batch layout."""
    from pyspark.sql import functions as F

    from regpulse_lakehouse_spark.operators import quantize as Q
    from regpulse_lakehouse_spark.sources.tpch import load_table
    from regpulse_lakehouse_spark.streaming.index_maint import (
        maintain_ivf_pq_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    half1 = corpus.filter(F.col("vec_id") % 2 == 0)
    half2 = corpus.filter(F.col("vec_id") % 2 == 1)

    src = str(tmp_path / "vsrc")
    idx = str(tmp_path / "vidx")
    ck = str(tmp_path / "vck")
    schema = corpus.schema

    def run_once():
        stream = spark.readStream.schema(schema).parquet(src)
        q = maintain_ivf_pq_index(stream, idx, ck, n_centroids=8)
        assert q.awaitTermination(120), "maintenance run did not finish"

    half1.write.mode("overwrite").parquet(src)
    run_once()
    mid = Q.ivf_pq_search(spark, idx, queries, n_probe=4, k=5).collect()
    assert len(mid) == 15  # first half searchable already

    half2.write.mode("append").parquet(src)
    run_once()

    twin = str(tmp_path / "vtwin")
    Q.ivf_pq_build(half1, twin, n_centroids=8)
    Q.ivf_pq_append(spark, twin, half2)
    got = {(r["query_id"], r["vec_id"], round(r["adc_score"], 6))
           for r in Q.ivf_pq_search(spark, idx, queries, n_probe=4, k=5).collect()}
    want = {(r["query_id"], r["vec_id"], round(r["adc_score"], 6))
            for r in Q.ivf_pq_search(spark, twin, queries, n_probe=4, k=5).collect()}
    assert got == want
