"""Box-speed canary (bench.py): the helper pair that demotes regression
flags when the HOST is slow while loadavg reads idle (observed late
r13: loadavg 0.23, every row uniformly ~1.6x slower)."""

from __future__ import annotations

import json
import os

import bench


def test_canary_is_positive_and_repeatable():
    a, b = bench._cpu_canary_ms(), bench._cpu_canary_ms()
    assert a > 0 and b > 0
    # best-of-3 keeps repeat spread tight on an idle box; 2x bounds GC
    # pauses and scheduler jitter without flaking under parallel tests
    assert max(a, b) / min(a, b) < 2.0


def test_best_canary_history_reads_artifacts(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert bench._best_canary_history() == {}
    (tmp_path / "BENCH_LOCAL_a.json").write_text(
        json.dumps({"canary_ms": 150.0, "canary_mc_ms": 400.0}) + "\n"
    )
    (tmp_path / "BENCH_LOCAL_b.json").write_text(
        json.dumps({"canary_ms": 120.5}) + "\n"
    )
    (tmp_path / "BENCH_LOCAL_old.json").write_text(
        json.dumps({"value": 1.0}) + "\n"  # pre-canary artifact: ignored
    )
    (tmp_path / "BENCH_LOCAL_torn.json").write_text("{not json")
    assert bench._best_canary_history() == {
        "canary_ms": 120.5,
        "canary_mc_ms": 400.0,
    }


def test_mc_canary_measures_parallel_throughput():
    ms = bench._cpu_canary_mc_ms(n_procs=2)
    assert ms > 0
