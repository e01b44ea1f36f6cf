"""Scalar (int8) embedding quantization — the storage/IO lever for
vector columns at corpus scale (beyond-reference training-data
operator; pairs with operators/vector.py's ANN family).

A float32-stored embedding column is usually the widest thing in the
table; per-vector affine int8 quantization (the FAISS
``ScalarQuantizer``/pgvector ``halfvec``-class trade) cuts it 4× with
~1e-2 relative error — invisible to ANN candidate generation, and the
exact float rescore path keeps final rankings exact when the originals
are retained cold.

Everything here is PURE COLUMN EXPRESSIONS (array higher-order
functions): per-vector min/max, affine encode to tinyint, decode back.
No Python stage, no UDF — the encode pipelines into the parquet write
of a 100 TB corpus and the decode into the scan above it.

Encoding: q[i] = round((x[i] - lo) * 254 / (hi - lo)) - 127 with
per-vector (lo, hi) carried alongside; constant vectors (hi == lo)
encode as all-zero with scale 0 and decode exactly. Decode error is
bounded by half a step: (hi - lo) / 508 per component.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_LEVELS = 254  # int8 span [-127, 127]; avoids -128 so negation is safe


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", out_prefix: str = "q"
) -> DataFrame:
    """Replace ``vec_col`` with its int8 form: ``<prefix>_codes``
    (array<tinyint>) + ``<prefix>_lo``/``<prefix>_hi`` (the element
    type, kept at full precision) carrying the per-vector affine range.
    All other columns pass through."""
    v = F.col(vec_col)
    lo = F.array_min(v)
    hi = F.array_max(v)
    span = hi - lo
    codes = F.transform(
        v,
        lambda x: F.when(
            F.col(f"{out_prefix}_hi") == F.col(f"{out_prefix}_lo"),
            F.lit(0),
        )
        .otherwise(
            F.round(
                (x - F.col(f"{out_prefix}_lo"))
                * F.lit(float(_LEVELS))
                / (F.col(f"{out_prefix}_hi") - F.col(f"{out_prefix}_lo"))
            )
            - F.lit(127)
        )
        .cast("tinyint"),
    )
    passthrough = [c for c in df.columns if c != vec_col]
    # lo/hi stay double: a float32 range would collapse small spans on
    # large-magnitude components (span < ulp(|lo|) rounds to hi == lo),
    # silently voiding the (hi-lo)/508 error bound; 8 extra bytes per
    # vector is noise next to the codes array.
    return (
        df.withColumn(f"{out_prefix}_lo", lo)
        .withColumn(f"{out_prefix}_hi", hi)
        .select(
            *passthrough,
            f"{out_prefix}_lo",
            f"{out_prefix}_hi",
            codes.alias(f"{out_prefix}_codes"),
        )
    )


def dequantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Inverse of :func:`quantize_embeddings`: rebuild an approximate
    float vector (error ≤ (hi-lo)/508 per component) and drop the
    quantized columns."""
    lo = F.col(f"{prefix}_lo").cast("double")
    hi = F.col(f"{prefix}_hi").cast("double")
    step = (hi - lo) / F.lit(float(_LEVELS))
    vec = F.transform(
        F.col(f"{prefix}_codes"),
        lambda c: lo + (c.cast("double") + F.lit(127.0)) * step,
    )
    keep = [c for c in df.columns if c not in (f"{prefix}_lo", f"{prefix}_hi", f"{prefix}_codes")]
    return df.select(*keep, vec.alias(vec_col))
