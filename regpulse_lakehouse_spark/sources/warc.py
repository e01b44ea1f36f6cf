"""WARC ingestion — the entry path for web-crawl training corpora
(ISO 28500; the Common Crawl distribution format). A 100 TB text
pipeline starts from WARC segments, so the engine reads them natively:

- :func:`parse_warc` — pure-Python record parser for one WARC file
  (plain or gzip; the spec's record-per-gzip-member layout and a
  whole-file gzip stream both work — stdlib ``gzip`` consumes
  concatenated members transparently). Yields (headers, block) per
  record.
- :func:`read_warc` — the Spark surface: ``spark.read.format
  ("binaryFile")`` over ``*.warc[.gz]`` + an Arrow-batched
  ``mapInPandas`` stage producing one row per RESPONSE record with the
  HTTP envelope split off (status, content-type) and the payload body
  kept as binary.
- :func:`warc_documents` — response rows → (url, fetch time, text)
  document table: HTML payloads go through the SAME extraction chain
  the HTML connector uses (functions/html column expressions — title,
  article text, 4000-char cap), so a crawl archive replays into the
  ``documents`` schema with one call.

Scale notes, stated honestly: the unit of parallelism is the FILE
(Common Crawl segments are ~1 GB by convention — thousands of files
per crawl, so a cluster saturates on file-level parallelism alone);
``binaryFile`` materializes one file per task, so
``spark.sql.files.maxPartitionBytes`` does not sub-split WARCs (it
cannot: gzip members are not seekable without an index). Record
parsing is stream-wise per file and never collects to the driver.

Reference parity: none — the reference fetches live pages
(connectors/fetcher.ts, declared non-goal SURVEY §2.1 S11). WARC
replay is the offline counterpart that makes the same connector
pipeline runnable over an archived crawl.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

WARC_RESPONSE_SCHEMA = T.StructType(
    [
        T.StructField("warc_file", T.StringType(), False),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("target_uri", T.StringType(), True),
        T.StructField("warc_date", T.StringType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("body", T.BinaryType(), True),
    ]
)


def parse_warc(data: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, block_bytes) for every record in one WARC
    file. Accepts plain WARC bytes or gzip (record-per-member or one
    stream — stdlib gzip reads concatenated members). Gzip input is
    decompressed INCREMENTALLY through a streaming reader, so resident
    memory is bounded by one record (plus the compressed payload the
    caller already holds), never the whole decompressed archive."""
    import io

    if data[:2] == b"\x1f\x8b":
        import gzip

        stream: io.BufferedIOBase = gzip.GzipFile(fileobj=io.BytesIO(data))
    else:
        stream = io.BytesIO(data)
    while True:
        # skip inter-record CRLFs to the version line
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            break
        if not line.startswith(b"WARC/"):
            raise ValueError("WARC version line expected")
        headers: dict[str, str] = {}
        while True:
            line = stream.readline()
            if line in (b"\r\n", b"\n"):
                break
            if not line:
                raise ValueError("truncated WARC header")
            text = line.decode("utf-8", "replace").rstrip("\r\n")
            if ":" in text:
                k, v = text.split(":", 1)
                headers[k.strip()] = v.strip()
        try:
            length = int(headers["Content-Length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        block = stream.read(length)
        if len(block) != length:
            raise ValueError("truncated WARC record block")
        yield headers, block


def _dechunk(body: bytes) -> bytes:
    """Reassemble a Transfer-Encoding: chunked body (RFC 9112 §7.1):
    hex-size line, chunk, CRLF, ...; a 0-size chunk terminates.
    Malformed framing returns the body as-is (crawler recordings do
    contain broken servers; garbling beats dropping here because the
    downstream HTML extraction filter drops non-parsing payloads
    anyway)."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            return bytes(body)
        size_token = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            return bytes(body)
        if size == 0:
            break
        chunk = body[nl + 2 : nl + 2 + size]
        if len(chunk) != size:
            return bytes(body)
        out.extend(chunk)
        pos = nl + 2 + size + 2  # skip chunk + trailing CRLF
    return bytes(out)


def split_http_response(block: bytes) -> tuple[int | None, str | None, bytes]:
    """Split an application/http response block into (status,
    content-type, body) with the two transfer decodings real crawls
    record verbatim: ``Transfer-Encoding: chunked`` framing is
    reassembled and ``Content-Encoding: gzip`` bodies are inflated
    (undecodable gzip falls back to the raw bytes — loud is wrong
    here, one broken server must not fail the archive). Non-HTTP
    blocks come back as (None, None, block)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    hdr_end = block.find(b"\r\n\r\n")
    if hdr_end < 0:
        return None, None, block
    lines = block[:hdr_end].decode("utf-8", "replace").split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    ctype = None
    chunked = False
    gzipped = False
    for line in lines[1:]:
        low = line.lower()
        if low.startswith("content-type:"):
            ctype = line.split(":", 1)[1].strip()
        elif low.startswith("transfer-encoding:") and "chunked" in low:
            chunked = True
        elif low.startswith("content-encoding:") and "gzip" in low:
            gzipped = True
    body = block[hdr_end + 4 :]
    if chunked:
        body = _dechunk(body)
    if gzipped:
        import gzip

        try:
            body = gzip.decompress(body)
        except OSError:
            pass
    return status, ctype, body


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """One row per WARC RESPONSE record under ``path``
    (``binaryFile`` scan → Arrow-batched parse). Request/metadata/
    warcinfo records are dropped; the HTTP envelope is split off."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for fname, content in zip(pdf["path"], pdf["content"]):
                for headers, block in parse_warc(bytes(content)):
                    if headers.get("WARC-Type") != "response":
                        continue
                    status, ctype, body = split_http_response(block)
                    out.append(
                        (
                            fname,
                            headers.get("WARC-Record-ID"),
                            headers.get("WARC-Target-URI"),
                            headers.get("WARC-Date"),
                            status,
                            ctype,
                            body,
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in WARC_RESPONSE_SCHEMA]
            )

    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .select("path", "content")
        .mapInPandas(gen, schema=WARC_RESPONSE_SCHEMA)
    )


def warc_documents(responses: DataFrame) -> DataFrame:
    """Response rows → document table: keep HTTP 200 HTML responses,
    decode UTF-8 (lossy), and run the HTML connector's extraction
    chain (title, article text with description fallback, 4000-char
    cap). One codegen'd projection — no Python in this stage."""
    from ..functions import html as H
    from .html import CONTENT_CAP

    html = F.decode(F.col("body"), "UTF-8")
    title = H.html_title(html)
    body_text = H.article_text(html)
    content = F.when(body_text != "", body_text).otherwise(
        F.coalesce(H.html_description(html), F.lit(""))
    )
    return (
        responses.filter(
            (F.col("http_status") == 200)
            # case-insensitive: servers send TEXT/HTML, Text/Html, ...
            & F.lower(F.col("content_type")).startswith("text/html")
        )
        .select(
            F.col("target_uri").alias("url"),
            F.col("warc_date").alias("fetched_at"),
            title.alias("title"),
            F.substring(content, 1, CONTENT_CAP).alias("text"),
        )
        .filter(F.col("title").isNotNull())
    )
