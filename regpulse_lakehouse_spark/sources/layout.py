"""Physical table layout — partitioning & bucketing (SURVEY.md §4).

The reference's B-tree indexes map to Parquet layout at scale:

- `run_logs(run_id, created_at)` index → hive-partition by run date;
- `regulation_items` per-jurisdiction reads → partition by
  jurisdiction (merge jobs filter one jurisdiction: merge.ts:22-25);
- the `links` unique-tuple index is a *constraint*, enforced by dedup
  (operators/upsert.edge_upsert), not a physical layout.

Partition pruning makes the partition column's predicate a directory
filter — at 100 TB, reading one jurisdiction touches 1/10th of the
files before any row is decoded (verified in
tests/test_layout_skew.py by asserting the pruned scan's partition
count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write hive-partitioned parquet (directory per partition value).

    Low-cardinality columns only (jurisdiction: 10 values, run date:
    1/day) — high-cardinality partitioning produces the small-files
    problem; use bucketing or plain sorting within files for those."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned layout; equality predicates on the partition
    columns prune directories (PartitionFilters in the scan node)."""
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table (`bucketBy` + `saveAsTable`): rows are
    hash-clustered into ``n_buckets`` files per partition by
    ``bucket_cols``, so a join or aggregation on the bucket key reads
    co-located data and SKIPS ITS EXCHANGE entirely — the persisted
    form of pre-shuffling, and the right layout for the high-cardinality
    keys hive-partitioning can't hold (fact-to-fact joins on orderkey,
    repeated groupBys on user id).

    Both join sides must share bucket count and key for the
    exchange-free plan; ``sort_cols`` additionally pre-sorts within
    buckets so sort-merge join skips its sort. Requires the session
    catalog (bucketing metadata lives there, not in the parquet files —
    a plain `.parquet(path)` read of the same files won't know about
    the clustering). Co-location is proven in
    tests/test_layout_skew.py::test_bucketed_join_is_exchange_free."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)
