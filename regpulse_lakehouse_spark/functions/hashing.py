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


# Independent hash family for MinHash: slice four non-overlapping
# 32-bit values out of each 128-bit md5, salting a fresh md5 every 4
# family members. Fully independent components (unlike the classic
# single-base h_i = a_i·x+b_i linear family, whose argmins correlate
# across i whenever two sets partially overlap — measured on the
# synthetic corpus it produced 5× false positives at est-J ≥ 0.4),
# at a quarter of the per-family-md5 cost, and every slice is
# bit-for-bit portable to DuckDB.


def family_md5(col: Column, salt: int) -> Column:
    """The salted md5 backing family members 4·salt … 4·salt+3."""
    return F.md5(F.concat(F.lit(f"{salt}:"), col))


def family_slice(md5_col: Column, j: int) -> Column:
    """j-th 32-bit slice (j in 0..3) of an md5 hex string as int64."""
    return F.conv(F.substring(md5_col, 1 + 8 * j, 8), 16, 10).cast("long")


def family_hash_sql(expr: str, i: int) -> str:
    """DuckDB-SQL rendering of family member i (salt i//4, slice i%4)."""
    salt, j = divmod(i, 4)
    return f"(('0x' || substr(md5('{salt}:' || {expr}), {1 + 8 * j}, 8))::BIGINT)"
