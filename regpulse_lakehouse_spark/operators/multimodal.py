"""Multimodal column plumbing (BASELINE.json north-star: image/audio/
video as first-class pipeline data).

Media travel as opaque ``binary`` columns with typed metadata structs;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The actual codec work is STUBBED (this
container ships no image/audio libraries): ``decode_fake`` produces a
deterministic synthetic decode so the Spark-side plumbing — schema,
batch shape, UDF signature, partitioning — is real and tested, while
``decode_real`` raises NotImplementedError until a codec-backed
implementation is plugged in.

At 100 TB the operative constraints are encoded here: media bytes stay
in executor-side Arrow batches (never collected), metadata-only plans
prune the binary column entirely (Parquet column pruning), and
per-batch decode amortizes Python crossing costs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|wav|mp4|…
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", MEDIA_META, True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_real(payload: bytes, meta: dict) -> np.ndarray:
    """Codec-backed decode — intentionally unimplemented here.

    Plug in PIL/ffmpeg/torchaudio in a real deployment; the container
    for this build ships none of them."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "use decode_fake for the deterministic test path"
    )


def decode_fake(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in decode: a dim-length float vector derived
    from the payload's sha256 — stable across runs/engines, exercises
    the exact array shapes the real decoder would produce."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_features(
    media: DataFrame, dim: int = 16, batch_note: str = "fake-decode"
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas stage over Arrow
    batches (the multimodal analog of the X1 extractor plumbing)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [decode_fake(p, dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(gen, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling *plan*: computes the sample timestamps per video
    from metadata only — the binary column is pruned from this scan
    entirely (check .explain ReadSchema). The downstream decode of the
    chosen frames is the stubbed stage."""
    return (
        media.filter(F.col("meta.media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_at_ms"),
        )
    )


def synthetic_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fixture media table (no codecs needed)."""
    rows = []
    for i in range(n):
        mt = ("image", "audio", "video")[i % 3]
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (i % 4 + 1)
        rows.append(
            (
                f"media-{i:04d}",
                bytearray(payload),
                (
                    mt,
                    {"image": "png", "audio": "wav", "video": "mp4"}[mt],
                    640 if mt != "audio" else None,
                    480 if mt != "audio" else None,
                    (i + 1) * 1500 if mt != "image" else None,
                    (i + 1) * 30 if mt == "video" else None,
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
