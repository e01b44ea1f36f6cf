"""Delta Lake adapter — the named north-star table format behind the
same interface as :class:`~.upsert.VersionedParquetTable`.

The reference's write side is row-at-a-time SQL upserts
(services/api/src/repository.ts:14-23 ON CONFLICT DO NOTHING,
:25-78 ON CONFLICT UPDATE, :123-145 unique-tuple link upsert), and the
re-platform target names "Spark SQL + Delta/Iceberg operations" as the
storage approach. delta-spark is not installed in this environment, so
the mapping lives here behind an import gate, and
:func:`open_table` picks the best available implementation — callers
never branch on the format.

Interface → Delta mapping (what runs on a real cluster):

==================  =====================================================
method              Delta operation
==================  =====================================================
insert_if_absent    ``MERGE INTO t USING s ON <keys> WHEN NOT MATCHED
                    THEN INSERT *``  (ON CONFLICT DO NOTHING)
upsert              ``MERGE INTO t USING s ON <keys> WHEN MATCHED AND
                    s.version >= t.version THEN UPDATE SET * WHEN NOT
                    MATCHED THEN INSERT *``  (latest-wins full-row)
delete_where        ``DELETE FROM t WHERE <predicate>``
truncate            ``DELETE FROM t``
read(version=N)     ``spark.read.format('delta')
                    .option('versionAsOf', N)``  (time travel)
version             ``DESCRIBE HISTORY`` latest version
==================  =====================================================

Scale note: Delta MERGE shuffles both sides on the join keys and
rewrites only the touched files — strictly better than the
copy-on-write full-snapshot fallback, which rewrites the table per
commit. Both are correct; the adapter exists so the cheaper physical
plan is picked up by installing delta-spark, with zero caller changes.
The upsert's update condition (``s.version >= t.version``) reproduces
upsert_latest_wins' tie-break: on equal versions the update side wins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .upsert import VersionedParquetTable, dedup_on_keys

try:  # pragma: no cover - absent in this container
    from delta.tables import DeltaTable  # type: ignore

    HAS_DELTA = True
except ImportError:
    DeltaTable = None
    HAS_DELTA = False


class DeltaTableAdapter:
    """VersionedParquetTable's interface over a Delta table. Requires
    delta-spark (``HAS_DELTA``); constructing without it raises."""

    def __init__(self, spark: SparkSession, root: str):
        if not HAS_DELTA:
            raise ImportError(
                "delta-spark is not installed; use open_table() for the "
                "fallback copy-on-write implementation"
            )
        self.spark = spark
        self.root = root

    # -- snapshot resolution ------------------------------------------------
    def _table(self):
        return DeltaTable.forPath(self.spark, self.root)

    @property
    def version(self) -> int | None:
        if not self.exists():
            return None
        row = self._table().history(1).select("version").collect()
        return int(row[0][0]) if row else None

    def exists(self) -> bool:
        return DeltaTable.isDeltaTable(self.spark, self.root)

    def read(self, version: int | None = None) -> DataFrame:
        reader = self.spark.read.format("delta")
        if version is not None:
            reader = reader.option("versionAsOf", version)
        return reader.load(self.root)

    # -- commits ------------------------------------------------------------
    def write(self, df: DataFrame) -> int:
        df.write.format("delta").mode("overwrite").save(self.root)
        return self.version

    def append(self, df: DataFrame) -> int:
        df.write.format("delta").mode("append").save(self.root)
        return self.version

    def insert_if_absent(self, new: DataFrame, keys: list[str]) -> int:
        if not self.exists():
            return self.write(new.dropDuplicates(keys))
        on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            self._table()
            .alias("t")
            .merge(new.alias("s"), on)
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.version

    def upsert(self, updates: DataFrame, keys: list[str], version_col: str) -> int:
        if not self.exists():
            return self.write(dedup_on_keys(updates, keys, [F.desc(version_col)]))
        on = " AND ".join(f"t.{k} <=> s.{k}" for k in keys)
        (
            self._table()
            .alias("t")
            .merge(
                dedup_on_keys(updates, keys, [F.desc(version_col)]).alias("s"), on
            )
            .whenMatchedUpdateAll(condition=f"s.{version_col} >= t.{version_col}")
            .whenNotMatchedInsertAll()
            .execute()
        )
        return self.version

    def changes(
        self,
        keys: list[str],
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Change feed between two versions via time-travel reads and
        the shared keyed snapshot diff (upsert.snapshot_changes) — same
        result contract as the fallback's ``changes``. A real Delta
        deployment with CDF enabled can read ``table_changes()``
        instead, but the snapshot diff needs no table property and is
        correct for any pair of committed versions."""
        from .upsert import snapshot_changes

        return snapshot_changes(self.read(to_version), self.read(from_version), keys)

    def delete_where(self, predicate: Column) -> int:
        self._table().delete(predicate)
        return self.version

    def truncate(self) -> int:
        self._table().delete()
        return self.version

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_cols: list[str] | None = None,
    ) -> int:
        """Delta ``OPTIMIZE`` (with ``executeZOrderBy`` when
        ``sort_cols`` is given) — the native form of
        VersionedParquetTable.compact. ``target_file_bytes`` maps to
        Delta's ``optimize.maxFileSize`` session conf for this call."""
        key = "spark.databricks.delta.optimize.maxFileSize"
        prior = self.spark.conf.get(key, None)
        self.spark.conf.set(key, str(target_file_bytes))
        try:
            opt = self._table().optimize()
            if sort_cols:
                opt.executeZOrderBy(*sort_cols)
            else:
                opt.executeCompaction()
        finally:
            # restore the session conf — it must not leak into later
            # optimize calls on other tables in the same session
            if prior is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prior)
        return self.version


def open_table(spark: SparkSession, root: str, format: str = "auto"):
    """Best-available table implementation for ``root``. All three
    expose the identical method surface, so pipeline code is
    format-agnostic.

    ``format='auto'``: delta-spark's DeltaTable when importable; else
    an existing table keeps its on-disk format (``_delta_log/`` →
    :class:`~.delta_log.DeltaLogTable`, the pure-Python writer of the
    PUBLIC Delta protocol; ``_commits/`` → the copy-on-write parquet
    fallback); new tables default to the fallback. Explicit
    ``'delta-log'`` / ``'parquet'`` pin the implementation (e.g. to
    CREATE a real Delta table that delta-spark or delta-rs can open
    later)."""
    import os

    from .delta_log import DeltaLogTable

    if format == "delta-log":
        return DeltaLogTable(spark, root)
    if format == "parquet":
        return VersionedParquetTable(spark, root)
    if format != "auto":
        raise ValueError(
            f"format must be 'auto', 'delta-log' or 'parquet', got {format!r}"
        )
    if HAS_DELTA:
        return DeltaTableAdapter(spark, root)
    if os.path.isdir(os.path.join(root, "_delta_log")):
        return DeltaLogTable(spark, root)
    return VersionedParquetTable(spark, root)
