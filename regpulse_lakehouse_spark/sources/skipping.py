"""Bloom-filter file-skipping index — Delta's bloom index shape for
plain parquet directories: point lookups on a HIGH-CARDINALITY
non-partition column (doc_id, url hash, order key) should read the
few files that might contain the key, not every file's row groups.
Parquet footer min/max already skips on CLUSTERED columns (that's
what write_zordered buys); a bloom index covers the unclustered
point-lookup case where min/max ranges all overlap.

Index build is one distributed pass: k hash positions per value
(xxhash64 with per-hash seeds, mod m bits), deduplicated per
(file, position) — the shuffle carries at most m rows per file
regardless of row count — then packed into one m-bit bitmap per file
on the driver (files are few; bitmaps are kilobytes). Lookups read
the tiny index table, test membership driver-side, and hand Spark
ONLY the candidate file list; false positives cost one wasted file
read each (rate set by fpp), false negatives cannot happen.

The index is advisory and immutable-per-build: rebuild after
compaction/append (or index new files incrementally — build on the
new files and union the index tables)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _params(expected_per_file: int, fpp: float) -> tuple[int, int]:
    """Standard bloom sizing: m = -n ln p / ln2^2 bits, k = m/n ln2 —
    rounded up to whole longs."""
    if not 0.0 < fpp < 1.0:
        raise ValueError(f"fpp must be in (0, 1), got {fpp}")
    if expected_per_file < 1:
        raise ValueError(f"expected_per_file must be >= 1, got {expected_per_file}")
    m = int(-expected_per_file * math.log(fpp) / (math.log(2) ** 2))
    m = max(64, ((m + 63) // 64) * 64)
    k = max(1, round(m / expected_per_file * math.log(2)))
    return m, min(k, 16)


def build_bloom_index(
    spark: SparkSession,
    data_path: str,
    index_path: str,
    col: str,
    expected_per_file: int = 100_000,
    fpp: float = 0.01,
) -> int:
    """Build (overwrite) the bloom index of ``col`` over every parquet
    file under ``data_path``. Returns the number of files indexed.
    One scan of the column + a (file, position)-distinct shuffle
    bounded by m rows per file; the packed bitmaps are written as one
    small parquet table (file, m, k, bitmap)."""
    m, k = _params(expected_per_file, fpp)
    src = spark.read.parquet(data_path).select(
        F.input_file_name().alias("_file"), F.col(col).alias("_v")
    ).where(F.col("_v").isNotNull())
    pos = F.array(
        *[F.pmod(F.xxhash64("_v", F.lit(i)), F.lit(m)).cast("int") for i in range(k)]
    )
    per_file = (
        src.select("_file", F.explode(pos).alias("_p"))
        .distinct()
        .groupBy("_file")
        .agg(F.collect_list("_p").alias("_ps"))
        .collect()
    )
    rows = []
    for r in per_file:
        bits = bytearray(m // 8)
        for p in r["_ps"]:
            bits[p >> 3] |= 1 << (p & 7)
        rows.append((r["_file"], m, k, bytes(bits)))
    spark.createDataFrame(
        rows, "file string, m int, k int, bitmap binary"
    ).coalesce(1).write.mode("overwrite").parquet(index_path)
    return len(rows)


def bloom_candidate_files_many(
    spark: SparkSession, index_path: str, values: list
) -> dict:
    """{value: candidate files} for a BATCH of lookup keys in one
    probe job — point lookups usually arrive in batches, and each
    probe's hash chain must run through Spark's own xxhash64 (one
    tiny job) so the index never depends on a Python reimplementation
    of the JVM hash. No false negatives; false-positive files cost
    one wasted read each."""
    idx = spark.read.parquet(index_path).collect()
    if not idx or not values:
        return {v: [] for v in values}
    m, k = idx[0]["m"], idx[0]["k"]
    probes = spark.createDataFrame([(v,) for v in values], ["_v"]).select(
        "_v",
        F.array(
            *[
                F.pmod(F.xxhash64("_v", F.lit(i)), F.lit(m)).cast("int")
                for i in range(k)
            ]
        ).alias("_ps"),
    ).collect()
    out: dict = {}
    for pr in probes:
        positions = pr["_ps"]
        out[pr["_v"]] = [
            r["file"]
            for r in idx
            if all(r["bitmap"][p >> 3] & (1 << (p & 7)) for p in positions)
        ]
    return out


def bloom_candidate_files(
    spark: SparkSession, index_path: str, col_value
) -> list[str]:
    """Single-key form of :func:`bloom_candidate_files_many`."""
    return bloom_candidate_files_many(spark, index_path, [col_value])[col_value]


def scan_with_bloom(
    spark: SparkSession, index_path: str, col: str, col_value
) -> DataFrame:
    """Point-lookup scan that reads ONLY the bloom-candidate files
    (plus the exact filter on top — false positives are filtered, so
    results equal a full scan's). An empty candidate set returns an
    empty frame with the data schema, zero files read."""
    files = bloom_candidate_files(spark, index_path, col_value)
    if not files:
        any_file = spark.read.parquet(index_path).first()["file"]
        return (
            spark.read.parquet(any_file)
            .where(F.lit(False))
            .where(F.col(col).isNotNull())
        )
    return spark.read.parquet(*files).where(F.col(col) == F.lit(col_value))


def minmax_candidate_files(
    data_path: str, col: str, lo=None, hi=None
) -> list[str]:
    """Range-predicate file pruning from PARQUET FOOTER statistics,
    driver-side via pyarrow — no Spark job, no data read: a file is a
    candidate iff [file_min, file_max] overlaps [lo, hi] (missing
    stats keep the file — never a false negative). The range twin of
    the bloom index: bloom prunes point lookups on unclustered
    columns; this prunes ranges on CLUSTERED columns (what
    write_zordered / sorted compaction buy) before Spark even plans.
    Spark's own scan does row-group-level min/max AFTER file listing;
    doing it here hands the orchestration layer the file list (e.g.
    to range-read from object storage or size a job)."""
    import pyarrow.dataset as ds

    if lo is None and hi is None:
        raise ValueError("pass at least one of lo/hi")
    dataset = ds.dataset(data_path, format="parquet")
    out = []
    for frag in dataset.get_fragments():
        keep = True
        md = frag.metadata
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    st = c.statistics
                    if st.has_min_max:
                        mins.append(st.min)
                        maxs.append(st.max)
        if mins:  # stats present: prune on the file-level envelope
            fmin, fmax = min(mins), max(maxs)
            if lo is not None and fmax < lo:
                keep = False
            if hi is not None and fmin > hi:
                keep = False
        out.append((frag.path, keep))
    return [p for p, k in out if k]


def scan_with_minmax(
    spark: SparkSession, data_path: str, col: str, lo=None, hi=None
) -> DataFrame:
    """Range scan over only the min/max-candidate files, with the
    exact predicate on top — results equal a full scan's."""
    files = minmax_candidate_files(data_path, col, lo, hi)
    if not files:
        return spark.read.parquet(data_path).where(F.lit(False))
    df = spark.read.parquet(*files)
    if lo is not None:
        df = df.where(F.col(col) >= F.lit(lo))
    if hi is not None:
        df = df.where(F.col(col) <= F.lit(hi))
    return df
