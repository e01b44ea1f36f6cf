"""Delta adapter seam (operators/delta_adapter.py): the interface
contract always holds; the Delta-backed behavior tests run only where
delta-spark is installed (not this container — they document the
MERGE INTO mapping for a real cluster)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import delta_adapter as DA
from regpulse_lakehouse_spark.operators.upsert import VersionedParquetTable


def test_open_table_falls_back_without_delta(spark, tmp_path):
    t = DA.open_table(spark, str(tmp_path / "t"))
    expected = DA.DeltaTableAdapter if DA.HAS_DELTA else VersionedParquetTable
    assert isinstance(t, expected)


def test_adapter_interface_matches_fallback():
    """Every public method/property of the fallback exists on the
    adapter with the same name — callers can swap formats blind."""
    surface = [
        n
        for n in dir(VersionedParquetTable)
        if not n.startswith("_")
    ]
    for name in surface:
        assert hasattr(DA.DeltaTableAdapter, name), name


def test_adapter_requires_delta_to_instantiate(spark, tmp_path):
    if DA.HAS_DELTA:
        pytest.skip("delta-spark installed; constructor guard not reachable")
    with pytest.raises(ImportError, match="delta-spark"):
        DA.DeltaTableAdapter(spark, str(tmp_path / "t"))


@pytest.mark.skipif(not DA.HAS_DELTA, reason="delta-spark not installed")
def test_delta_merge_roundtrip(spark, tmp_path):
    """insert_if_absent / upsert / delete_where / time travel on real
    Delta — the observable semantics VersionedParquetTable replicates
    (tests/test_upsert_ledger.py proves the same sequence there)."""
    root = str(tmp_path / "delta_t")
    t = DA.DeltaTableAdapter(spark, root)
    base = spark.range(3).select(
        F.col("id"), F.lit(1).alias("ver"), F.lit("a").alias("val")
    )
    t.write(base)
    # ON CONFLICT DO NOTHING: id=2 already present, only id=3 lands
    t.insert_if_absent(
        spark.range(2, 4).select(
            F.col("id"), F.lit(9).alias("ver"), F.lit("new").alias("val")
        ),
        ["id"],
    )
    assert t.read().filter("id = 2").collect()[0]["val"] == "a"
    assert t.read().count() == 4
    # latest-wins upsert: newer version replaces, older is ignored
    t.upsert(
        spark.range(0, 2).select(
            F.col("id"),
            (F.lit(0) + F.when(F.col("id") == 0, 5).otherwise(0)).alias("ver"),
            F.lit("up").alias("val"),
        ),
        ["id"],
        "ver",
    )
    vals = {r["id"]: r["val"] for r in t.read().collect()}
    assert vals[0] == "up" and vals[1] == "a"
    v_before = t.version
    t.delete_where(F.col("id") == 3)
    assert t.read().count() == 3
    assert t.read(version=v_before).count() == 4  # time travel
