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


def test_best_canary_history_reads_artifacts_same_host_only(tmp_path, monkeypatch):
    """Canary baselines are HOST-scoped (ADVICE r13): a box slower than
    the fastest historical box must not read slow_box forever. Unstamped
    (pre-r14) and other-host artifacts are skipped."""
    monkeypatch.chdir(tmp_path)
    me = bench._host_id()
    assert bench._best_canary_history() == {}
    (tmp_path / "BENCH_LOCAL_a.json").write_text(
        json.dumps({"host": me, "canary_ms": 150.0, "canary_mc_ms": 400.0}) + "\n"
    )
    (tmp_path / "BENCH_LOCAL_b.json").write_text(
        json.dumps({"host": me, "canary_ms": 120.5}) + "\n"
    )
    (tmp_path / "BENCH_LOCAL_other.json").write_text(
        # a faster FOREIGN box: must not poison this host's baseline
        json.dumps({"host": "someone-else", "canary_ms": 50.0, "canary_mc_ms": 90.0})
        + "\n"
    )
    (tmp_path / "BENCH_LOCAL_unstamped.json").write_text(
        json.dumps({"canary_ms": 60.0}) + "\n"  # pre-r14 artifact: ignored
    )
    (tmp_path / "BENCH_LOCAL_old.json").write_text(
        json.dumps({"value": 1.0}) + "\n"  # pre-canary artifact: ignored
    )
    (tmp_path / "BENCH_LOCAL_torn.json").write_text("{not json")
    assert bench._best_canary_history() == {
        "canary_ms": 120.5,
        "canary_mc_ms": 400.0,
    }


def test_host_id_is_stable():
    assert bench._host_id() and bench._host_id() == bench._host_id()


def test_mc_canary_measures_parallel_throughput():
    ms = bench._cpu_canary_mc_ms(n_procs=2)
    assert ms > 0
