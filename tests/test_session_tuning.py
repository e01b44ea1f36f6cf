"""Input-aware shuffle sizing (session.tune_shuffle_for_input): floors
at core parallelism for small inputs (local bench unchanged), scales
with input bytes, caps, and never overrides an explicit env pin."""

from __future__ import annotations

import os

from regpulse_lakehouse_spark.session import input_bytes, tune_shuffle_for_input


def _write(tmp_path, name, nbytes):
    p = tmp_path / name
    p.write_bytes(b"\0" * nbytes)
    return str(tmp_path)


def test_small_input_floors_at_parallelism(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    root = _write(tmp_path, "tiny.bin", 1024)
    n = tune_shuffle_for_input(spark, root, bytes_per_partition=256 * 1024)
    assert n == spark.sparkContext.defaultParallelism
    assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)


def test_large_input_scales_and_caps(spark, tmp_path, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", raising=False)
    root = _write(tmp_path, "big.bin", 10 * 1024 * 1024)
    assert input_bytes(spark, root) == 10 * 1024 * 1024
    n = tune_shuffle_for_input(spark, root, bytes_per_partition=64 * 1024)
    assert n == 160  # 10 MiB / 64 KiB
    assert tune_shuffle_for_input(spark, root, bytes_per_partition=1, cap=500) == 500


def test_env_pin_wins(spark, tmp_path, monkeypatch):
    root = _write(tmp_path, "big.bin", 10 * 1024 * 1024)
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    monkeypatch.setenv("SPARK_GRAFT_SHUFFLE_PARTITIONS", "48")
    n = tune_shuffle_for_input(spark, root, bytes_per_partition=1024)
    assert n == 48
    # pinned: the session conf was NOT touched
    assert spark.conf.get("spark.sql.shuffle.partitions") == "32"
