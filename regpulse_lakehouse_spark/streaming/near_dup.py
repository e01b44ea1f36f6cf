"""Incremental near-dup detection against a persisted signature store —
the ingest-time counterpart of the batch MinHash-LSH operator
(operators/dedup.py): a growing corpus asks "is this NEW document a
near-duplicate of anything ever ingested?" per batch, without
recomputing signatures for the history.

Store layout: one row per (id, sig, band, bucket) — the banded
signature table the batch operator builds internally, persisted
(VersionedParquetTable). Per batch:

1. signatures + band buckets for the BATCH only (corpus history is
   never re-hashed);
2. candidate join batch-vs-store on (band, bucket) with the batch side
   BROADCAST — the store crosses zero exchanges, the only full pass is
   its scan (upgrade path: hive-partition the store by band and bucket
   prefix to prune that scan too);
3. exact signature-overlap rescore (est_jaccard), threshold filter;
4. batch signatures APPEND to the store (duplicates too — they must be
   findable by later batches; drop them first if the policy is
   keep-first-only).

Batch-vs-batch duplicates within ONE micro-batch are found by the
same-band self-join of the batch side (tiny, broadcast²-cheap), so a
pair arriving together is still caught.

Use inside ``foreachBatch`` for streams, or call directly per
ingest increment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import banded_minhash_signatures as banded_signatures
from ..operators.upsert import VersionedParquetTable


def _rescored_pairs(
    cand: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    matches = F.size(
        F.filter(
            F.zip_with("sig_new", "sig_old", lambda x, y: (x == y).cast("int")),
            lambda m: m == 1,
        )
    )
    return (
        cand.select(
            "new_id",
            "old_id",
            F.round(matches / F.lit(float(num_hashes)), 4).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["new_id", "old_id"])
    )


def incremental_near_dup(
    batch: DataFrame,
    store: VersionedParquetTable,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Detect near-dups of ``batch`` against everything previously
    ingested (plus within the batch itself), then append the batch's
    signatures to the store. Returns (new_id, old_id, est_jaccard) —
    materialized BEFORE the store append so the result never reports a
    row as its own duplicate.

    The returned pairs are collected eagerly into the driver result
    only by the caller; this function keeps everything distributed —
    the one action is the store append."""
    banded = banded_signatures(batch, text_col, id_col, num_hashes, num_bands)
    new_side = banded.select(
        F.col(id_col).alias("new_id"), F.col("sig").alias("sig_new"), "band", "bucket"
    )

    pair_parts = []
    if store.exists():
        old_side = store.read().select(
            F.col(id_col).alias("old_id"), F.col("sig").alias("sig_old"), "band", "bucket"
        )
        # batch side broadcast: the store never shuffles. The id
        # inequality guards re-ingestion: a RETRIED batch whose append
        # already landed would otherwise report every doc as a
        # duplicate of itself.
        pair_parts.append(
            F.broadcast(new_side)
            .join(old_side, ["band", "bucket"])
            .filter(F.col("new_id") != F.col("old_id"))
        )
    intra = new_side.join(
        banded.select(
            F.col(id_col).alias("old_id"), F.col("sig").alias("sig_old"), "band", "bucket"
        ),
        ["band", "bucket"],
    ).filter(F.col("new_id") > F.col("old_id"))
    pair_parts.append(intra)

    cand = pair_parts[0]
    for p in pair_parts[1:]:
        cand = cand.unionByName(p)
    pairs = _rescored_pairs(cand, num_hashes, threshold)
    # pin the result to the PRE-append store state, then grow the store
    pairs = pairs.localCheckpoint(eager=True)
    if store.exists():
        store.append(banded)
    else:
        store.write(banded)
    return pairs
