"""Hash / fingerprint functions — SURVEY.md §2.8 V7 plus the hash
primitives the dedup operators (MinHash, SimHash) build on.

The reference fingerprints documents with a 32-bit JS rolling hash of
``url|title`` (services/api/src/services/scan.ts:485-492); that is only
an opaque fingerprint, so the rebuild uses cryptographic/engine hashes
(md5 / xxhash64) — documented semantic change per SURVEY.md §2.8 V7.

``md5_bucket_*`` exists because md5 is the one hash both Spark and
DuckDB compute identically, which makes hash-dependent operators
(MinHash signatures) oracle-checkable: we take the first 15 hex chars
(60 bits) as a non-negative int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_fingerprint(*cols: Column) -> Column:
    """V7: stable fingerprint of concatenated fields (scan.ts:485-492,
    reference uses `url|title`)."""
    return F.md5(F.concat_ws("|", *cols))


def md5_long(col: Column, seed: str = "") -> Column:
    """First 60 bits of md5(seed:col) as int64 — portable to DuckDB via
    ``('0x' || substr(md5(...),1,15))::BIGINT``."""
    salted = F.concat(F.lit(f"{seed}:"), col) if seed else col
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, seed: str = "") -> str:
    """DuckDB-SQL rendering of :func:`md5_long`."""
    salted = f"'{seed}:' || {expr}" if seed else expr
    return f"(('0x' || substr(md5({salted}), 1, 15))::BIGINT)"
