"""Document chunking (operators/chunking.py): coverage/overlap
invariants, reconstruction, edge cases, JVM-only plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "abcdefghij" * 25),   # 250 chars
        (2, "xy"),                # shorter than one chunk
        (3, ""),                  # empty
        (4, None),                # null
        (5, "z" * 100),           # exactly one chunk
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_and_overlap(docs):
    out = chunk_documents(docs, chunk_chars=100, overlap=20).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 250 chars, stride 80: offsets 0, 80, 160 → 3 chunks
    c1 = sorted(by_doc[1], key=lambda r: r["chunk_index"])
    assert [r["chunk_index"] for r in c1] == [0, 1, 2]
    assert len(c1[0]["chunk_text"]) == 100
    # consecutive chunks share exactly the overlap
    assert c1[0]["chunk_text"][-20:] == c1[1]["chunk_text"][:20]
    # reconstruction: stitched chunks (dropping overlaps) == original
    text = "abcdefghij" * 25
    stitched = c1[0]["chunk_text"] + "".join(r["chunk_text"][20:] for r in c1[1:])
    assert stitched == text
    # short, empty, and null docs keep one chunk each
    assert [r["chunk_text"] for r in by_doc[2]] == ["xy"]
    assert [r["chunk_text"] for r in by_doc[3]] == [""]
    assert [r["chunk_text"] for r in by_doc[4]] == [""]
    assert [r["chunk_text"] for r in by_doc[5]] == ["z" * 100]


def test_chunk_ids_follow_reference_convention(docs):
    out = chunk_documents(docs, chunk_chars=100, overlap=20).collect()
    for r in out:
        assert r["chunk_id"] == f"{r['doc_id']}-{r['chunk_index']}"


def test_bad_overlap_rejected(docs):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, chunk_chars=100, overlap=100)


def test_chunking_is_pure_jvm(docs):
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
