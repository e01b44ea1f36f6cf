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


def _full_artifact(names: list) -> dict:
    """A full bench artifact over the given row names, carrying every
    diagnostic field _run_once emits (worst-case contended values)."""
    q = {k: 12.345 for k in names}
    return {
        "metric": "regpulse_lakehouse_spark_total_runtime",
        "value": 64.784, "value_warm": 44.404, "value_warm_best_ever": 30.357,
        "common34_rows_present": 16, "value_common34": 30.03,
        "value_common34_warm": 11.843, "value_common34_equiv": 37.601,
        "value_common34_equiv_warm": 17.96, "unit": "sec", "sf": 0.1,
        "host": "vm-xxxxxxxx-0123abcd", "warm_iters": 5,
        "canary_ms": 127.0, "canary_mc_ms": 183.7,
        "canary_after_ms": 202.1, "canary_mc_after_ms": 236.8,
        "canary_best": {"canary_ms": 117.1, "canary_mc_ms": 180.4},
        "slow_box": True,
        "loadavg": {"at_launch": 6.08, "at_gate_exit": 0.95,
                    "gate_waited_sec": 120.0, "contended": True,
                    "before": 6.22, "after": 2.16},
        "queries": dict(q), "queries_warm": dict(q),
        "queries_warm_min": dict(q),
        "queries_warm_spread": {k: [1.0, 2.0] for k in names},
        "queries_warm_best": dict(q),
        "regressions": {},
        "regressions_under_load": {k: 1.61 for k in names[:5]},
        "rebaselined": {k: "why " * 10 for k in names[:3]},
        "attempts": 3,
        "attempt_log": [{"attempt": i, "value": 85.0, "value_warm": 49.0,
                         "slow_box": True, "contended": True,
                         "loadavg_at_launch": 6.0, "canary_mc_ms": 183.7,
                         "canary_mc_after_ms": 236.8} for i in (1, 2, 3)],
    }


def test_emit_keeps_per_query_map_at_50_rows(tmp_path, monkeypatch, capsys):
    """VERDICT r15 item 2: the stdout line's `queries` map is the
    driver's ONLY per-query signal — diagnostics must be shed before it.
    Both the r14 and r15 driver artifacts shipped "queries":{} because
    the diagnostic fields pushed the line past the 1900-char self-cap."""
    from regpulse_lakehouse_spark.queries import load_all

    names = list(load_all())  # the REAL registry's 50 row names
    assert len(names) >= 50
    monkeypatch.chdir(tmp_path)
    bench._emit(_full_artifact(names))
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert len(parsed["queries"]) == len(names)
    assert parsed["value"] == 64.784 and parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    # the full artifact (all diagnostics) is preserved on disk
    with open("BENCH_LOCAL.json") as fh:
        full = json.loads(fh.readline())
    assert len(full["queries_warm_spread"]) == len(names)
    assert full["loadavg"]["contended"] is True


def test_emit_unchanged_when_line_fits(tmp_path, monkeypatch, capsys):
    """A small registry sheds nothing: the compact line keeps warm map
    and diagnostics exactly as before."""
    monkeypatch.chdir(tmp_path)
    art = _full_artifact([f"q{i}" for i in range(5)])
    del art["attempt_log"]
    bench._emit(art)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    parsed = json.loads(line)
    assert len(parsed["queries"]) == 5 and len(parsed["queries_warm"]) == 5
    assert "loadavg" in parsed and "canary_ms" in parsed


def test_host_id_is_stable():
    assert bench._host_id() and bench._host_id() == bench._host_id()


def test_mc_canary_measures_parallel_throughput():
    ms = bench._cpu_canary_mc_ms(n_procs=2)
    assert ms > 0
