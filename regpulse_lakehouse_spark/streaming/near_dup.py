"""Incremental near-dup detection against a persisted signature store —
the ingest-time counterpart of the batch MinHash-LSH operator
(operators/dedup.py): a growing corpus asks "is this NEW document a
near-duplicate of anything ever ingested?" per batch, without
recomputing signatures for the history.

Store layout: one row per (id, sig, band, bucket) — the banded
signature table the batch operator builds internally. Two persisted
forms:

- ``VersionedParquetTable`` (snapshot-per-commit, simplest); or
- ``PartitionedSignatureStore`` (round 5, the 100 TB form):
  hive-partitioned ``batch=N/band=B/bp=P`` where ``bp`` is a bounded
  bucket prefix — appends are TRUE increments (one new ``batch=N``
  directory + commit marker, never a snapshot rewrite), and the
  per-batch candidate read prunes to the (band, bp) partitions the
  batch actually probes (PartitionFilters in the plan, test-asserted)
  instead of scanning the full store.

Per batch:

1. signatures + band buckets for the BATCH only (corpus history is
   never re-hashed);
2. candidate join batch-vs-store on (band, bucket) with the batch side
   BROADCAST — the store crosses zero exchanges, and with the
   partitioned store the scan touches only probed (band, bp) dirs;
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

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import banded_minhash_signatures as banded_signatures
from ..operators.upsert import VersionedParquetTable


class PartitionedSignatureStore:
    """Append-only banded-signature store, hive-partitioned
    ``batch=N/band=B/bp=P`` (``bp`` = bucket mod ``n_prefix``).

    Fixes the two scale costs of the snapshot store in one layout:

    - **append is an increment**: each commit writes ONLY the new
      batch's rows into a fresh ``batch=N`` directory (the versioned
      table rewrites the whole snapshot per append — O(history) writes
      per batch);
    - **reads prune**: the candidate join only needs store rows whose
      (band, bucket-prefix) the incoming batch actually probes; those
      are partition directories here, so the scan carries
      PartitionFilters instead of a full pass (the batch probes at
      most num_bands × n_prefix partitions, usually far fewer for
      small batches).

    Crash safety matches VersionedParquetTable: data first, commit
    marker last, readers filter to committed batch ids. ``_commits``
    lives inside the root — underscore-prefixed paths are invisible to
    Spark's partition discovery, so one directory carries both.
    Single-writer, like the reference's serialized worker
    (worker.ts:18,26)."""

    def __init__(self, spark: SparkSession, root: str, n_prefix: int = 64):
        self.spark = spark
        self.root = root
        self.n_prefix = n_prefix
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)

    def _committed(self) -> list[int]:
        out = []
        for name in os.listdir(os.path.join(self.root, "_commits")):
            if re.fullmatch(r"\d+", name):
                out.append(int(name))
        return sorted(out)

    def exists(self) -> bool:
        return bool(self._committed())

    def append(self, banded: DataFrame) -> int:
        """Commit one batch of (id, sig, band, bucket) rows as the next
        ``batch=N`` increment.

        The pre-write ``repartition(band, bp)`` is the standard
        small-files guard for partitioned writes: without it every
        upstream task holding rows of every partition writes its own
        file per directory — measured ~2,000 tiny files per batch at 32
        shuffle partitions × 64 (band, bp) dirs, and the per-batch wall
        time was dominated by file creation + listing, not data. With
        it each (band, bp) directory gets one file per holding task
        (~1), at the cost of one narrow batch-sized shuffle."""
        b = (self._committed() or [0])[-1] + 1
        (
            banded.withColumn("bp", F.pmod("bucket", F.lit(self.n_prefix)))
            .repartition("band", "bp")
            .write.mode("overwrite")
            .partitionBy("band", "bp")
            .parquet(os.path.join(self.root, f"batch={b}"))
        )
        with open(os.path.join(self.root, "_commits", str(b)), "w") as fh:
            fh.write("committed")
        return b

    def read(self, probe_keys: list[tuple[int, int]] | None = None) -> DataFrame:
        """Committed rows; with ``probe_keys`` = [(band, bp), ...] the
        scan prunes to exactly those partition directories."""
        committed = self._committed()
        if not committed:
            raise FileNotFoundError(f"no committed batch under {self.root}")
        df = self.spark.read.parquet(self.root).filter(
            F.col("batch").isin(committed)
        )
        if probe_keys is not None:
            by_band: dict[int, list[int]] = {}
            for band, bp in probe_keys:
                by_band.setdefault(int(band), []).append(int(bp))
            pred = F.lit(False)
            for band in sorted(by_band):
                pred = pred | (
                    (F.col("band") == band) & F.col("bp").isin(sorted(set(by_band[band])))
                )
            df = df.filter(pred)
        return df


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
    store: VersionedParquetTable | PartitionedSignatureStore,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    num_bands: int = 4,
    threshold: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """Detect near-dups of ``batch`` against everything previously
    ingested (plus within the batch itself), then append the batch's
    signatures to the store. Returns (new_id, old_id, est_jaccard) —
    materialized BEFORE the store append so the result never reports a
    row as its own duplicate.

    The returned pairs are collected eagerly into the driver result
    only by the caller; this function keeps everything distributed —
    the one action is the store append."""
    # Materialize the batch's banded signatures ONCE: they are consumed
    # up to four times per batch (probe-key collect, candidate join,
    # intra self-join, store append) and each consumer would otherwise
    # re-run the whole shingle→md5→min aggregation — measured as the
    # dominant cost of a multi-batch ingest at sf0.1 (the banded table
    # is batch-sized: one row per (id, band), far smaller than the
    # recompute it prevents).
    banded = banded_signatures(
        batch, text_col, id_col, num_hashes, num_bands
    ).localCheckpoint(eager=True)
    new_side = banded.select(
        F.col(id_col).alias("new_id"), F.col("sig").alias("sig_new"), "band", "bucket"
    )

    pair_parts = []
    if store.exists():
        if isinstance(store, PartitionedSignatureStore):
            # the batch's probe set is bounded by num_bands × n_prefix
            # (it's the distinct (band, bucket-prefix) pairs, not the
            # batch size), so this collect is a tiny driver action —
            # the same shape as ivf_search's probed-cell literals
            probe_keys = [
                (r[0], r[1])
                for r in banded.select(
                    "band", F.pmod("bucket", F.lit(store.n_prefix)).alias("bp")
                )
                .distinct()
                .collect()
            ]
            old = store.read(probe_keys)
        else:
            old = store.read()
        old_side = old.select(
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
    # Pin the result to the PRE-append store state, then grow the store.
    # With materialize=True (default) that pin is an eager
    # localCheckpoint — robust against anything that might refresh the
    # store scan. materialize=False skips the per-batch execution and
    # relies on the read's frozen file index instead: spark.read.parquet
    # lists the store's directories ONCE when the plan is built (above,
    # before the append), and later batch=N dirs never enter that
    # index, so lazy execution after further appends still reads only
    # the pre-append batches. Requires the store files to OUTLIVE the
    # result's execution (do not delete the store before acting on the
    # returned DataFrame); batch-equivalence under deferred execution
    # is covered in tests/test_incremental_near_dup.py.
    if materialize:
        pairs = pairs.localCheckpoint(eager=True)
    if isinstance(store, PartitionedSignatureStore):
        store.append(banded)  # true increment: one new batch=N dir
    elif store.exists():
        store.append(banded)
    else:
        store.write(banded)
    return pairs
