"""WARC ingestion (sources/warc.py): record parsing (plain, gzip
whole-stream, gzip member-per-record), HTTP envelope split, the Spark
binaryFile → mapInPandas surface, and HTML replay into the documents
shape."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.sources import warc as W


def _record(rtype, uri, block, extra=None):
    headers = [
        "WARC/1.0",
        f"WARC-Type: {rtype}",
        f"WARC-Record-ID: <urn:uuid:{abs(hash((rtype, uri))) % 10**12}>",
        "WARC-Date: 2026-08-14T00:00:00Z",
    ]
    if uri:
        headers.append(f"WARC-Target-URI: {uri}")
    if extra:
        headers.extend(extra)
    headers.append(f"Content-Length: {len(block)}")
    return "\r\n".join(headers).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http_response(html, status=200, ctype="text/html; charset=utf-8"):
    body = html.encode()
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _sample_warc():
    html1 = (
        "<html><head><title>Reg update one</title></head><body>"
        "<article><p>First paragraph of the update body.</p>"
        "<p>Second paragraph with more words.</p></article></body></html>"
    )
    html2 = "<html><head><title>Page two</title></head><body><p>hi</p></body></html>"
    return (
        _record("warcinfo", None, b"software: test\r\n")
        + _record("request", "https://x.example/a", b"GET /a HTTP/1.1\r\n\r\n")
        + _record("response", "https://x.example/a", _http_response(html1))
        + _record("response", "https://x.example/b", _http_response(html2))
        + _record(
            "response",
            "https://x.example/miss",
            _http_response("<html><title>gone</title></html>", status=404),
        )
        + _record(
            "response",
            "https://x.example/bin",
            _http_response("PDFDATA", ctype="application/pdf"),
        )
    )


def test_parse_warc_plain_and_gzip_variants():
    raw = _sample_warc()
    for payload in (
        raw,
        gzip.compress(raw),  # one gzip stream
        b"".join(  # record-per-member, the spec's recommended layout
            gzip.compress(raw[i : i + 1000]) for i in range(0, len(raw), 1000)
        ),
    ):
        recs = list(W.parse_warc(payload))
        assert [h["WARC-Type"] for h, _ in recs] == [
            "warcinfo", "request", "response", "response", "response", "response",
        ]
        status, ctype, body = W.split_http_response(recs[2][1])
        assert status == 200 and ctype.startswith("text/html")
        assert b"First paragraph" in body


def test_parse_warc_rejects_garbage_and_truncation():
    with pytest.raises(ValueError, match="version line"):
        list(W.parse_warc(b"NOT A WARC"))
    raw = _sample_warc()
    with pytest.raises(ValueError, match="truncated"):
        list(W.parse_warc(raw[: len(raw) - 40]))


def test_read_warc_and_documents_replay(spark, tmp_path):
    raw = _sample_warc()
    (tmp_path / "seg-00000.warc").write_bytes(raw)
    (tmp_path / "seg-00001.warc.gz").write_bytes(gzip.compress(raw))
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")

    responses = W.read_warc(spark, str(tmp_path))
    rows = responses.collect()
    assert len(rows) == 8  # 4 responses per file, requests/warcinfo dropped
    assert {r["http_status"] for r in rows} == {200, 404}
    by_uri = {(r["warc_file"].rsplit("/", 1)[-1], r["target_uri"]): r for r in rows}
    a = by_uri[("seg-00000.warc", "https://x.example/a")]
    assert a["content_type"].startswith("text/html")
    assert b"First paragraph" in bytes(a["body"])

    docs = W.warc_documents(responses)
    out = {r["url"]: r for r in docs.collect()}
    # 404 and non-HTML filtered; both files contribute the same two urls
    assert set(out) == {"https://x.example/a", "https://x.example/b"}
    assert out["https://x.example/a"]["title"] == "Reg update one"
    assert "First paragraph" in out["https://x.example/a"]["text"]
    assert out["https://x.example/a"]["fetched_at"] == "2026-08-14T00:00:00Z"


def test_warc_documents_is_pure_jvm(spark, tmp_path):
    """The HTML replay stage must stay codegen (the Python cost is the
    per-file record parse, never the per-document extraction)."""
    (tmp_path / "seg.warc").write_bytes(_sample_warc())
    docs = W.warc_documents(W.read_warc(spark, str(tmp_path)))
    docs.count()
    plan = docs._jdf.queryExecution().executedPlan().toString()
    # exactly the one mapInPandas stage from read_warc, nothing after it
    assert plan.count("MapInPandas") == 1


def test_warc_to_corpus_end_to_end(spark, tmp_path):
    """Crawl archive → documents → prepare_corpus: the full offline
    replay an LLM-data pipeline runs, including exact dedup of a page
    archived twice."""
    import gzip

    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    body = " ".join(
        f"regulatory update alpha{i} describing obligations beta{i * 7 % 13} "
        f"for licensed gamma{i} entities" for i in range(20)
    )
    html = (
        f"<html><head><title>Update</title></head><body><article>"
        f"<p>{body}</p></article></body></html>"
    )
    raw = (
        _record("response", "https://x.example/one", _http_response(html))
        + _record("response", "https://x.example/dup", _http_response(html))
    )
    (tmp_path / "seg.warc.gz").write_bytes(gzip.compress(raw))
    docs = (
        W.warc_documents(W.read_warc(spark, str(tmp_path)))
        .select(F.monotonically_increasing_id().alias("doc_id"), "text")
    )
    result = prepare_corpus(docs)
    kept = result.stages["exact_dedup"].count()
    assert docs.count() == 2 and kept == 1  # archived twice, trained once


def test_http_chunked_and_gzip_bodies_decode():
    """Code-review round-6 findings: real crawls record chunked and
    gzip-encoded responses verbatim — both must decode."""
    html = "<html><head><title>Chunky</title></head><body><p>payload text</p></body></html>"
    raw = html.encode()
    # chunked framing: two chunks + terminator
    cut = len(raw) // 2
    chunked = (
        f"{cut:x}\r\n".encode() + raw[:cut] + b"\r\n"
        + f"{len(raw) - cut:x}\r\n".encode() + raw[cut:] + b"\r\n0\r\n\r\n"
    )
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: TEXT/HTML\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + chunked
    )
    status, ctype, body = W.split_http_response(block)
    assert status == 200 and body == raw
    import gzip as _gz

    gz_block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Content-Encoding: gzip\r\n\r\n" + _gz.compress(raw)
    )
    _, _, gz_body = W.split_http_response(gz_block)
    assert gz_body == raw
    # malformed chunk framing degrades to raw bytes, never raises
    bad = (
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nZZZ\r\nnope"
    )
    _, _, fallback = W.split_http_response(bad)
    assert fallback == b"ZZZ\r\nnope"


def test_uppercase_content_type_survives_document_filter(spark, tmp_path):
    html = "<html><head><title>Caps</title></head><body><p>upper body</p></body></html>"
    rec = _record(
        "response", "https://x.example/caps",
        _http_response(html, ctype="TEXT/HTML; charset=utf-8"),
    )
    (tmp_path / "seg.warc").write_bytes(rec)
    docs = W.warc_documents(W.read_warc(spark, str(tmp_path))).collect()
    assert [r["title"] for r in docs] == ["Caps"]
