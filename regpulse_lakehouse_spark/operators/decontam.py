"""Train/eval decontamination — flag training documents that share long
n-grams with an evaluation/benchmark set (the standard LLM-corpus
hygiene pass: GPT-3 App. C / Llama 2 App. A.6 use 8-13-token overlap).

Beyond-reference training-data-pipeline operator (the reference has no
training-corpus surface; BASELINE.json's north-star families motivate
it alongside dedup). Built from the same shingle machinery as
operators/dedup.py::ngram_jaccard_pairs:

- k-token shingles per document (functions/text.word_shingles — distinct,
  JVM-side), hashed to 8-byte xxhash64 join keys;
- the eval side's gram set is tiny relative to a 100 TB train corpus
  (benchmarks are a few MB), so the default plan BROADCASTS it and the
  whole pass is one map-side semi-join over the train scan — zero
  shuffles of train data. ``broadcast_eval=False`` switches to a
  shuffle equi-join on the gram hash for eval sets too big to ship.

A contaminated document is one sharing ≥ ``min_shared`` distinct
k-grams with ANY eval document. ``contamination_report`` returns the
per-document evidence; ``decontaminate`` returns the clean remainder
(an anti-join on the same broadcast, so it composes into ingest
pipelines as a single narrow stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles
from .skew import fan_out


def _gram_hashes(df: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, gram-hash) element table: distinct k-token shingles hashed to
    xxhash64 longs — the join never touches gram strings (~8 bytes/key
    instead of ~60 for a 13-gram)."""
    return (
        fan_out(df.select(id_col, text_col))
        .select(
            F.col(id_col),
            F.explode(word_shingles(F.col(text_col), k=k)).alias("_g"),
        )
        .select(F.col(id_col), F.xxhash64("_g").alias("gh"))
    )


def contamination_report(
    train: DataFrame,
    evals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    k: int = 13,
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-train-document contamination evidence:
    (id, n_shared_grams, n_eval_docs) for documents sharing at least
    ``min_shared`` distinct k-grams with the eval set.

    ``n_shared_grams`` counts distinct contaminated grams in the train
    doc; ``n_eval_docs`` counts distinct eval documents implicated (an
    auditor's first question). Join is inner on the gram hash with the
    eval side broadcast by default — see module docstring for the
    shuffle-mode escape hatch."""
    eval_id = eval_id_col or id_col
    tg = _gram_hashes(train, text_col, id_col, k)
    eg = _gram_hashes(evals, text_col, eval_id, k).select(
        F.col("gh"), F.col(eval_id).alias("_eval_id")
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "gh")
        .groupBy(id_col)
        .agg(
            F.count_distinct("gh").alias("n_shared_grams"),
            F.count_distinct("_eval_id").alias("n_eval_docs"),
        )
        .filter(F.col("n_shared_grams") >= min_shared)
    )


def contamination_pairs(
    train: DataFrame,
    evals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    k: int = 13,
    min_shared: int = 1,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-(train doc, eval doc) contamination evidence:
    (id, benchmark_id, n_gram_hits) for every pair sharing at least
    ``min_shared`` distinct k-grams — the auditor's drill-down under
    :func:`contamination_report`'s per-document rollup (which eval doc
    leaked, and how much of it). Same plan shape: one map-side join
    against the broadcast eval gram set, grouped on the pair key; pair
    cardinality is bounded by actual contamination, not corpus size."""
    eval_id = eval_id_col or id_col
    tg = _gram_hashes(train, text_col, id_col, k)
    eg = _gram_hashes(evals, text_col, eval_id, k).select(
        F.col("gh"), F.col(eval_id).alias("_eval_id")
    )
    if broadcast_eval:
        eg = F.broadcast(eg)
    return (
        tg.join(eg, "gh")
        .groupBy(id_col, "_eval_id")
        .agg(F.count_distinct("gh").alias("n_gram_hits"))
        .filter(F.col("n_gram_hits") >= min_shared)
        .select(
            F.col(id_col),
            F.col("_eval_id").alias("benchmark_id"),
            F.col("n_gram_hits"),
        )
    )


def decontaminate(
    train: DataFrame,
    evals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
    k: int = 13,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Training rows with NO k-gram overlap with the eval set (full rows,
    original schema). Plan: gram-level semi-join against the (broadcast)
    eval gram set yields the small contaminated-id set, and the train
    table is anti-joined against THAT — contaminated ids are few, so AQE
    broadcasts them and clean documents (the overwhelming majority)
    never shuffle at all."""
    eval_id = eval_id_col or id_col
    eg = _gram_hashes(evals, text_col, eval_id, k).select("gh").distinct()
    if broadcast_eval:
        eg = F.broadcast(eg)
    dirty_ids = (
        _gram_hashes(train, text_col, id_col, k)
        .join(eg, "gh", "left_semi")
        .select(id_col)
        .distinct()
    )
    return train.join(dirty_ids, id_col, "left_anti")
