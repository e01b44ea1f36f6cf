"""staging.ensure_staged: fingerprint-keyed /tmp staging (r15 —
closes the r14 advisory that regenerated inputs under the same
sf_dir path silently served stale staged artifacts)."""

from __future__ import annotations

import os
import time

from regpulse_lakehouse_spark.staging import (
    ensure_staged,
    input_fingerprint,
    stage_path,
)


def _write(p, content):
    with open(p, "w", encoding="utf-8") as fh:
        fh.write(content)


def test_ensure_staged_builds_once_per_fingerprint(tmp_path):
    inp = tmp_path / "in.parquet"
    _write(inp, "v1" * 100)
    builds = []

    def build(tmp):
        builds.append(tmp)
        _write(os.path.join(tmp, "artifact"), "built")

    s1 = ensure_staged("tst", str(tmp_path), "v1", [str(inp)], build)
    s2 = ensure_staged("tst", str(tmp_path), "v1", [str(inp)], build)
    assert s1 == s2 and len(builds) == 1
    assert open(os.path.join(s1, "artifact")).read() == "built"


def test_regenerated_input_changes_the_stage_key(tmp_path):
    """Rewriting the input file (new size or mtime) must route to a
    NEW stage dir — the stale artifact is never served."""
    inp = tmp_path / "in.parquet"
    _write(inp, "v1")
    p1 = stage_path("tst", str(tmp_path), "v1", [str(inp)])
    _write(inp, "v2-different-size")
    p2 = stage_path("tst", str(tmp_path), "v1", [str(inp)])
    assert p1 != p2
    # same size, different mtime also invalidates
    _write(inp, "v3-different-size")  # same length as v2 content? make sure:
    os.utime(inp, ns=(time.time_ns() + 10**9, time.time_ns() + 10**9))
    p3 = stage_path("tst", str(tmp_path), "v1", [str(inp)])
    assert p3 != p2


def test_directory_inputs_fingerprint_one_level(tmp_path):
    """A multi-file parquet DIR fingerprints its entries: rewriting a
    part file inside (same dir mtime semantics notwithstanding)
    changes the fingerprint."""
    d = tmp_path / "tbl.parquet"
    d.mkdir()
    _write(d / "part-0", "a" * 10)
    f1 = input_fingerprint([str(d)])
    _write(d / "part-0", "b" * 22)
    f2 = input_fingerprint([str(d)])
    assert f1 != f2
    # missing input fingerprints as 'absent' (builder surfaces errors)
    f3 = input_fingerprint([str(tmp_path / "nope")])
    assert isinstance(f3, str) and len(f3) == 12


def test_version_bump_changes_the_stage_key(tmp_path):
    inp = tmp_path / "in.parquet"
    _write(inp, "x")
    assert stage_path("tst", str(tmp_path), "v1", [str(inp)]) != stage_path(
        "tst", str(tmp_path), "v2", [str(inp)]
    )
