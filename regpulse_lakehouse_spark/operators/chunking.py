"""Document chunking for embedding pipelines — fixed-size character
windows with overlap, as pure column expressions.

The reference embeds one truncated chunk per document
(services/api/src/services/vectorize.ts:14,27: 6000-char cut,
chunk_index always 0) — a documented simplification. At corpus scale
the standard shape is overlapping windows: every chunk covers
``chunk_chars`` characters and consecutive chunks share ``overlap``,
so no sentence is stranded on a boundary. One ``posexplode`` over a
computed offset sequence; no Python stage, and the chunk count per
document is ceil((len - overlap) / stride) — linear in corpus size
with a hard per-doc bound from the upstream truncation stage.

Chunk ids follow the reference's `{doc_id}-{chunk_index}` convention
(vectorize.ts:24-31) so downstream vector-store rows stay join-able
back to their document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 1000,
    overlap: int = 100,
) -> DataFrame:
    """Explode each document into overlapping character windows:
    (original columns minus text) + chunk_id, chunk_index, chunk_text.
    Empty/null texts yield one empty chunk (index 0) so every document
    keeps at least one row — the reference's 1-chunk contract.

    stride = chunk_chars - overlap; window i covers
    [i*stride, i*stride + chunk_chars). The last window is the only one
    shorter than chunk_chars; a window fully contained in the previous
    one is never emitted."""
    if not 0 <= overlap < chunk_chars:
        raise ValueError(
            f"need 0 <= overlap < chunk_chars, got overlap={overlap}, "
            f"chunk_chars={chunk_chars}"
        )
    stride = chunk_chars - overlap
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.length(t)
    # number of windows: 1 + ceil(max(0, n - chunk_chars) / stride)
    extra = F.greatest(n - F.lit(chunk_chars), F.lit(0))
    n_chunks = F.lit(1) + F.ceil(extra / F.lit(float(stride))).cast("int")
    offsets = F.sequence(F.lit(0), (n_chunks - 1) * F.lit(stride), F.lit(stride))
    chunks = F.transform(offsets, lambda off: t.substr(off + 1, F.lit(chunk_chars)))
    passthrough = [c for c in df.columns if c != text_col]
    return (
        df.select(*passthrough, F.posexplode(chunks).alias("chunk_index", "chunk_text"))
        .withColumn(
            "chunk_id",
            F.concat(F.col(id_col).cast("string"), F.lit("-"), F.col("chunk_index")),
        )
        .select(*passthrough, "chunk_id", "chunk_index", "chunk_text")
    )
