"""HTML / document connectors — SURVEY.md §2.1 S9/S10 over fetched
payloads.

The reference fetches pages politely (connectors/fetcher.ts — network
effects are a declared non-goal here, SURVEY §2.1 S11) and then
*parses*: articles out of HTML (connectors/eu_news.ts) and raw text
out of .docx/.pdf attachments (connectors/globalautoregs.ts:94-120,
mammoth / pdf-parse). These stages own the data effects and are what
an offline 100 TB pipeline replays over a crawl archive, so they are
the Spark surface:

- :func:`parse_articles` — the cheerio extraction chain as one
  codegen'd projection (functions/html.py column expressions).
- :func:`article_links` — per-page link lists exploded to a corpus
  link table with the reference's filters applied.
- :func:`extract_doc_text` — the mammoth/pdf-parse stage shape:
  Arrow-batched ``mapInPandas`` over (url, payload binary) with
  per-extension dispatch. The binary decoders themselves are seams
  (this container ships neither a pdf nor a docx codec); the default
  implementation is a deterministic fake so schema, dispatch, and
  batch plumbing are real and tested — same pattern as
  operators/multimodal.py decode.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F, types as T

from ..functions import html as H

CONTENT_CAP = 4000  # eu_news.ts:80 content.slice(0, 4000)


def parse_articles(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """(url, html) → NewsDocument rows (eu_news.ts:55-83): title
    fallback chain, article-paragraph main text with description
    fallback, 4000-char content cap, date-truncated published; pages
    with no resolvable title are dropped (fetchArticle returns null)."""
    html = F.col(html_col)
    title = H.html_title(html)
    desc = H.html_description(html)
    body = H.article_text(html)
    content = F.when(body != "", body).otherwise(F.coalesce(desc, F.lit("")))
    return (
        pages.select(
            F.col(url_col).alias("url"),
            title.alias("title"),
            F.substring(content, 1, CONTENT_CAP).alias("content"),
            H.html_published(html).alias("published_date"),
        )
        .filter(F.col("title").isNotNull())
    )


def article_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """Per-page link lists → one (page_url, link) row per distinct
    usable href (eu_news.ts:15-30: fragments/mailto:/javascript:
    dropped, root-relative absolutized). The per-site path filters
    (eu_news.ts:33-41) are data, not engine: apply them as ordinary
    ``.filter(col("link").contains(...))`` predicates downstream."""
    links = H.extract_links(F.col(html_col), F.col(url_col))
    return (
        pages.select(F.col(url_col).alias("page_url"), F.explode(F.array_distinct(links)).alias("link"))
        .dropDuplicates(["page_url", "link"])
    )


DOC_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),  # docx | pdf | unsupported
        T.StructField("text", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)


class DocTextExtractor:
    """S10: attachment text extraction in the connector's shape
    (globalautoregs.ts:110-120: dispatch on extension, mammoth for
    .docx, pdf-parse for .pdf). Override ``_decode_docx`` /
    ``_decode_pdf`` with codec-backed bodies on a cluster that ships
    the libraries; the defaults produce a deterministic fake keyed on
    the payload hash, so the Spark-side plumbing (binary column in
    Arrow batches, extension dispatch, output contract) is tested for
    real without pretending to parse."""

    def _decode_docx(self, payload: bytes) -> str:
        return f"docx-text-{hashlib.md5(payload).hexdigest()[:12]}"

    def _decode_pdf(self, payload: bytes) -> str:
        return f"pdf-text-{hashlib.md5(payload).hexdigest()[:12]}"

    def extract(self, docs: DataFrame, url_col: str = "url", payload_col: str = "payload") -> DataFrame:
        decode_docx, decode_pdf = self._decode_docx, self._decode_pdf

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf_batch in batches:
                if not len(pdf_batch):
                    continue
                out = []
                for url, payload in zip(pdf_batch[url_col], pdf_batch[payload_col]):
                    low = (url or "").lower()
                    raw = bytes(payload) if payload is not None else b""
                    if low.endswith(".docx"):
                        kind, text = "docx", decode_docx(raw)
                    elif low.endswith(".pdf"):
                        kind, text = "pdf", decode_pdf(raw)
                    else:
                        kind, text = "unsupported", None
                    out.append((url, kind, text, len(raw)))
                yield pd.DataFrame(out, columns=["url", "kind", "text", "n_bytes"])

        return docs.select(url_col, payload_col).mapInPandas(gen, schema=DOC_TEXT_SCHEMA)
