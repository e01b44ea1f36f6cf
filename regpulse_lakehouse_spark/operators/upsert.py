"""Write-side operators — SURVEY.md §2.1 S3-S8 without a metastore.

The reference does row-at-a-time SQL upserts (repository.ts:14-23
ON CONFLICT DO NOTHING; repository.ts:25-78 ON CONFLICT UPDATE all 21
cols; repository.ts:123-145 link upsert against the unique 5-tuple
index). Delta-spark isn't available in this environment, so the same
observable semantics are provided two ways (SURVEY §7 Phase 3):

- **pure transforms** (`insert_if_absent`, `upsert_latest_wins`,
  `dedup_on_keys`) — DataFrame → DataFrame, usable inside any plan;
- **VersionedParquetTable** — a minimal copy-on-write table format:
  every commit writes a new ``v=N`` directory and readers always open
  the highest committed version (commit marker written last, so a
  crashed writer leaves no visible half-version). This is the same
  shape as Delta/Iceberg snapshots; swap in Delta MERGE INTO on a real
  cluster without touching callers.

Scale: all merges shuffle once on the key columns; at 100 TB the
upsert-compaction (latest-wins window) is the standard copy-on-write
merge pattern, and the table directories would be partitioned
(e.g. regulation_items by jurisdiction — SURVEY §4).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def insert_if_absent(existing: DataFrame, new: DataFrame, keys: list[str]) -> DataFrame:
    """S3 ON CONFLICT DO NOTHING, batch form: rows of ``new`` whose key is
    absent from ``existing`` (left-anti join), appended to existing."""
    fresh = new.join(existing.select(*keys).distinct(), keys, "left_anti")
    return existing.unionByName(fresh)


def upsert_latest_wins(
    existing: DataFrame, updates: DataFrame, keys: list[str], version_col: str
) -> DataFrame:
    """S4 ON CONFLICT UPDATE (full row): union then keep the newest
    version per key — W2 window compaction. Deterministic tie-break on
    the key columns is unnecessary (version ties resolve to the update
    side via the source-priority column)."""
    tagged_old = existing.withColumn("_src", F.lit(1))
    tagged_new = updates.withColumn("_src", F.lit(0))
    w = W.partitionBy(*keys).orderBy(F.desc(version_col), F.asc("_src"))
    return (
        tagged_new.unionByName(tagged_old)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def dedup_on_keys(df: DataFrame, keys: list[str], order: list[Column]) -> DataFrame:
    """S6 unique-index semantics (links 5-tuple, schema.sql:101-102):
    deterministic survivor per key tuple."""
    w = W.partitionBy(*keys).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def edge_upsert(existing: DataFrame, new: DataFrame, id_order: Column) -> DataFrame:
    """S6: dedup incoming edges on the 5-tuple, left-anti against
    existing, append (repository.ts:123-145)."""
    five = ["from_type", "from_id", "to_type", "to_id", "relation"]
    fresh = dedup_on_keys(new, five, [id_order]).join(
        existing.select(*five).distinct(), five, "left_anti"
    )
    return existing.unionByName(fresh)


def snapshot_changes(new: DataFrame, old: DataFrame, keys: list[str]) -> DataFrame:
    """Keyed diff of two snapshots — the shared engine behind
    ``VersionedParquetTable.changes`` and the Delta adapter's
    ``changes``: one null-safe full-outer key join, side presence via
    literal marker columns (a NULL key is still a real key value under
    eqNullSafe, so key-nullness can't stand in for absence), unchanged
    keys filtered by a null-safe struct comparison."""
    val_cols = [c for c in new.columns if c not in keys]
    return (
        new.withColumn("_side_n", F.lit(1))
        .join(
            old.select(
                *[F.col(k).alias(f"_ok_{k}") for k in keys],
                *[F.col(c).alias(f"_o_{c}") for c in val_cols],
                F.lit(1).alias("_side_o"),
            ),
            [F.col(k).eqNullSafe(F.col(f"_ok_{k}")) for k in keys],
            "full_outer",
        )
        .select(
            *[F.coalesce(F.col(k), F.col(f"_ok_{k}")).alias(k) for k in keys],
            *[
                F.when(F.col("_side_n").isNotNull(), F.col(c))
                .otherwise(F.col(f"_o_{c}"))
                .alias(c)
                for c in val_cols
            ],
            F.when(F.col("_side_o").isNull(), F.lit("insert"))
            .when(F.col("_side_n").isNull(), F.lit("delete"))
            .otherwise(F.lit("update_postimage"))
            .alias("_change_type"),
            F.when(
                F.col("_side_n").isNotNull() & F.col("_side_o").isNotNull(),
                F.struct(*[F.col(c) for c in val_cols])
                .eqNullSafe(F.struct(*[F.col(f"_o_{c}") for c in val_cols])),
            )
            .otherwise(F.lit(False))
            .alias("_unchanged"),
        )
        .filter(~F.col("_unchanged"))
        .drop("_unchanged")
    )


class VersionedParquetTable:
    """Copy-on-write parquet table with monotonically increasing
    snapshot versions (``<root>/v=N`` + ``<root>/_commits/N``).

    Readers resolve the highest committed version; writers stage data
    first and write the commit marker last. Single-writer semantics
    (the reference serializes writes through one worker too —
    worker.ts:18,26)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)

    # -- snapshot resolution ------------------------------------------------
    def _committed_versions(self) -> list[int]:
        commits = os.path.join(self.root, "_commits")
        out = []
        for name in os.listdir(commits):
            if re.fullmatch(r"\d+", name):
                out.append(int(name))
        return sorted(out)

    @property
    def version(self) -> int | None:
        versions = self._committed_versions()
        return versions[-1] if versions else None

    def exists(self) -> bool:
        return self.version is not None

    def read(self, version: int | None = None) -> DataFrame:
        """Read the latest committed snapshot, or time-travel to an
        explicit ``version`` (Delta/Iceberg `VERSION AS OF` shape —
        every commit is a full immutable snapshot)."""
        v = self.version if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        if version is not None and version not in self._committed_versions():
            raise FileNotFoundError(f"version {version} not committed under {self.root}")
        return self.spark.read.parquet(os.path.join(self.root, f"v={v}"))

    # -- commits ------------------------------------------------------------
    def write(self, df: DataFrame) -> int:
        """Commit a full snapshot as the next version."""
        v = (self.version or 0) + 1
        df.write.mode("overwrite").parquet(os.path.join(self.root, f"v={v}"))
        with open(os.path.join(self.root, "_commits", str(v)), "w") as fh:
            fh.write("committed")
        return v

    def append(self, df: DataFrame, merge_schema: bool = False) -> int:
        """Append a batch as the next snapshot. Schema evolution is
        OPT-IN, the Delta ``mergeSchema`` shape: by default a batch
        whose columns differ from the table fails loudly (typo guard);
        with ``merge_schema=True`` the union is ADDITIVE — columns
        missing on either side are null-filled, so old rows carry NULL
        for newly added columns and the new batch may omit existing
        ones. Type CHANGES of a shared column are never silently
        coerced (Spark's unionByName raises on incompatible types)."""
        if not self.exists():
            return self.write(df)
        return self.write(
            self.read().unionByName(df, allowMissingColumns=merge_schema)
        )

    def insert_if_absent(self, new: DataFrame, keys: list[str]) -> int:
        if not self.exists():
            return self.write(new.dropDuplicates(keys))
        return self.write(insert_if_absent(self.read(), new, keys))

    def upsert(self, updates: DataFrame, keys: list[str], version_col: str) -> int:
        if not self.exists():
            return self.write(
                dedup_on_keys(updates, keys, [F.desc(version_col)])
            )
        return self.write(upsert_latest_wins(self.read(), updates, keys, version_col))

    def changes(
        self,
        keys: list[str],
        from_version: int,
        to_version: int | None = None,
    ) -> DataFrame:
        """Change feed between two committed snapshots (the Delta CDF
        shape): ``to_version``'s rows vs ``from_version``'s, keyed on
        ``keys`` — one row per changed key with ``_change_type`` in
        ('insert', 'update_postimage', 'delete'). Inserts/updates carry
        the NEW row, deletes the OLD one; unchanged keys (byte-equal on
        every non-key column) are absent.

        Plan: one full-outer join on the key columns between the two
        snapshots (both sides pruned to committed version dirs), change
        class decided by key-presence + a struct inequality on the
        remaining columns — no Python, no per-column loop in the
        executed plan. Downstream incremental consumers (the streaming
        index/rollup maintainers) can feed on this instead of
        re-reading snapshots whole."""
        return snapshot_changes(self.read(to_version), self.read(from_version), keys)

    def delete_where(self, predicate: Column) -> int:
        """S7 keyed delete (index.ts:196-200): keep the complement."""
        return self.write(self.read().filter(~predicate))

    def truncate(self) -> int:
        """S8 truncate-all (index.ts:405-408)."""
        return self.write(self.read().limit(0))

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_cols: list[str] | None = None,
    ) -> int:
        """Small-file compaction — the Delta ``OPTIMIZE`` shape on the
        copy-on-write table: bin-pack the current snapshot into files
        of ~``target_file_bytes`` and commit the rewrite as the next
        version (readers on older versions are untouched; time travel
        still sees the fragmented snapshot).

        Small files are the silent scan killer at 100 TB: every
        streaming micro-batch append and every fine-grained upsert
        leaves row-group-sized fragments, and a scan then pays
        per-file open/footer/seek costs thousands of times over. File
        count is sized from the CURRENT snapshot's actual on-disk
        bytes (Hadoop FS listing — already-compressed bytes, so the
        estimate holds for the rewrite). ``sort_cols`` routes the
        rewrite through ``repartitionByRange`` + local sort, restoring
        min-max skipping on those columns while compacting (the
        OPTIMIZE ... ZORDER analog for the single-dimension case);
        without it a plain ``repartition`` balances bytes evenly."""
        if target_file_bytes <= 0:
            raise ValueError(f"target_file_bytes must be > 0, got {target_file_bytes}")
        df = self.read()
        jvm = self.spark.sparkContext._jvm
        conf = self.spark.sparkContext._jsc.hadoopConfiguration()
        vdir = jvm.org.apache.hadoop.fs.Path(
            os.path.join(self.root, f"v={self.version}")
        )
        fs = vdir.getFileSystem(conf)
        total = sum(
            st.getLen()
            for st in fs.listStatus(vdir)
            if st.getPath().getName().endswith(".parquet")
        )
        n_files = max(1, -(-total // target_file_bytes))
        if sort_cols:
            packed = df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            )
        else:
            packed = df.repartition(n_files)
        return self.write(packed)


def optimize_table(
    table: "VersionedParquetTable",
    sort_cols: list[str] | None = None,
    bloom_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    bloom_expected_per_file: int = 100_000,
    bloom_fpp: float = 0.01,
    vector_indexes: list[str] | None = None,
    drift_threshold: float = 0.02,
) -> dict:
    """One maintenance verb for a versioned table — the OPTIMIZE job a
    scheduler runs nightly: bin-pack + optionally sort-cluster the
    snapshot (``compact``, restoring parquet min/max skipping on
    ``sort_cols``), then rebuild the bloom file-skipping indexes for
    ``bloom_cols`` over the NEW snapshot directory (indexes are
    immutable-per-build and the compaction just moved every row, so
    rebuild-after-compact is the contract; they land under
    ``{root}/_bloom/<col>``), then report the health of any associated
    IVF-PQ ``vector_indexes`` (operators/quantize.ivf_pq_health) — the
    frozen-quantizer contract says "monitor and rebuild when recall
    decays", and a nightly verb that compacts but never surfaces
    vector drift leaves the rebuild trigger computed-but-unread
    (VERDICT r8 task 6). Each vector entry carries the drift summary
    plus ``rebuild_recommended`` (drift > ``drift_threshold``:
    mean-centroid-sim decay between first and last batch, the
    distribution-shift signal ivf_pq_append documents). Returns a
    report dict — the audit row a maintenance ledger records."""
    import os

    from ..sources.skipping import build_bloom_index

    n_files = table.compact(target_file_bytes=target_file_bytes, sort_cols=sort_cols)
    snapshot_dir = os.path.join(table.root, f"v={table.version}")
    report = {
        "version": table.version,
        "files": n_files,
        "sorted_by": list(sort_cols or []),
        "bloom": {},
        "vector": {},
    }
    for col in bloom_cols or []:
        idx_path = os.path.join(table.root, "_bloom", col)
        report["bloom"][col] = build_bloom_index(
            table.spark, snapshot_dir, idx_path, col,
            expected_per_file=bloom_expected_per_file, fpp=bloom_fpp,
        )
    for vpath in vector_indexes or []:
        from .quantize import ivf_pq_health

        health = ivf_pq_health(table.spark, vpath)
        health["rebuild_recommended"] = health["drift"] > drift_threshold
        report["vector"][vpath] = health
    return report
