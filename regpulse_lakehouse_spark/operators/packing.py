"""Sequence packing — assign documents to fixed token-budget packs
(context windows) for LLM training batches. Beyond-reference
training-data-pipeline operator (BASELINE.json north-star family, with
dedup/decontamination/sampling).

Packing is inherently sequential WITHIN a pack, but a 100 TB corpus
doesn't need one global packing — it needs *bounded waste* and *linear
scale*. The plan here:

- shard deterministically by ``xxhash64(id) % n_shards`` (one shuffle,
  the only exchange in the whole operator); ``n_shards`` defaults to a
  CONSTANT (256), not cluster parallelism — shard membership is part of
  the pack assignment, so a cluster-sized default would make packs
  differ between a dev box and the production cluster, breaking the
  determinism contract below. Raise it explicitly for corpora where
  256 shards can't hold a shard in executor memory;
- pack each shard independently with first-fit-decreasing (FFD) inside
  an Arrow-batched ``applyInPandas`` — classic bin-packing bound: FFD
  waste ≤ 11/9·OPT + 6/9 per shard, and shards don't interact, so the
  bound holds globally;
- pack ids are (shard << 32) | local index — globally unique with no
  coordination.

Documents longer than the budget get a pack of their own (truncation /
chunking is a separate upstream concern — see functions/normalize
truncate and the S10 extraction seam); they are flagged ``oversize``
so downstream can route them.

Determinism: the shard hash is retry-stable, and FFD runs over rows
sorted by (-tokens, id), so the full assignment is a pure function of
the input set — two runs (or two engines) produce identical packs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    n_shards: int | None = None,
) -> DataFrame:
    """Assign each row to a pack: returns the input columns plus
    ``pack_id`` (long, globally unique), ``pack_offset`` (token start
    within the pack) and ``oversize`` (single-doc pack exceeding the
    budget). Every input row appears exactly once; per-pack token sums
    never exceed ``budget`` except for oversize singletons."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_shards is not None and n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    shards = n_shards if n_shards is not None else 256

    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("pack_id", T.LongType(), False),
            T.StructField("pack_offset", T.LongType(), False),
            T.StructField("oversize", T.BooleanType(), False),
        ]
    )
    in_cols = [f.name for f in df.schema.fields]

    def _pack(pdf):
        import pandas as pd

        shard = int(pdf["_shard"].iloc[0])
        body = pdf.sort_values(
            [token_col, id_col], ascending=[False, True], kind="mergesort"
        )
        # first-fit-decreasing over open bins
        bins: list[list[int]] = []  # [remaining, next_offset]
        pack_ids, offsets, oversize = [], [], []
        for tok in body[token_col].astype("int64"):
            t = int(tok)
            placed = None
            if t <= budget:
                for i, b in enumerate(bins):
                    if b[0] >= t:
                        placed = i
                        break
            if placed is None:
                bins.append([budget, 0])
                placed = len(bins) - 1
                # pack_id = (shard << 32) | bin: a shard spilling past
                # 2^32 bins would silently alias the next shard's id
                # space — unreachable in practice (2^32 packs per shard)
                # but guard it rather than corrupt ids
                if placed >= 1 << 32:
                    raise ValueError(
                        f"shard {shard} produced 2^32 packs; raise n_shards "
                        "or budget so pack ids stay unique"
                    )
            b = bins[placed]
            offsets.append(b[1])
            pack_ids.append((shard << 32) | placed)
            oversize.append(t > budget)
            b[0] -= t
            b[1] += t
        body = body.assign(
            pack_id=pd.Series(pack_ids, index=body.index, dtype="int64"),
            pack_offset=pd.Series(offsets, index=body.index, dtype="int64"),
            oversize=pd.Series(oversize, index=body.index, dtype="bool"),
        )
        return body[in_cols + ["pack_id", "pack_offset", "oversize"]]

    sharded = df.withColumn(
        "_shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards)).cast("int")
    )
    return sharded.groupBy("_shard").applyInPandas(_pack, out_schema)
