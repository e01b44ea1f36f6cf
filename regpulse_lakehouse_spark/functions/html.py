"""HTML scalar functions — SURVEY.md §2.1 S9 as pure column
expressions.

The reference's news connector parses fetched HTML with cheerio
(services/api/src/connectors/eu_news.ts): title from og:title /
meta[name=title] / first h1 / <title> (eu_news.ts:58-63), description
from og:description / meta[name=description] / first <p>
(eu_news.ts:66-69), published date from <time datetime> /
article:published_time (eu_news.ts:71-74), main text as the joined
<article> paragraphs with the description as fallback
(eu_news.ts:85-94), and link lists from <a href> with #/mailto:/
javascript: filtered out and root-relative hrefs absolutized against
the listing origin (eu_news.ts:15-30).

Here the same extractions are regex column expressions: the connector
stage becomes a codegen'd projection over an (url, html) DataFrame —
no Python in the loop, linear over any corpus of fetched pages. The
regexes assume structurally well-formed documents (quoted attributes;
both property-then-content and content-then-property meta orderings
are matched). That covers the document shapes the reference's CSS
selectors cover; a malformed page degrades to NULL/empty exactly where
cheerio would return undefined.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (entity, replacement) — &amp; decoded LAST so "&amp;lt;" round-trips
# to the literal "&lt;" rather than double-decoding.
_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def strip_tags(html: Column) -> Column:
    """Tag-free text content: drop <script>/<style> blocks wholesale,
    remove remaining tags, decode the common entities, squeeze
    whitespace."""
    no_blocks = F.regexp_replace(
        html, r"(?is)<(script|style)[^>]*>.*?</\1>", " "
    )
    text = F.regexp_replace(no_blocks, r"(?s)<[^>]+>", " ")
    for ent, rep in _ENTITIES:
        text = F.replace(text, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def _meta_content(html: Column, attr: str, name: str) -> Column:
    """content= of <meta {attr}="{name}">, either attribute order;
    empty string when absent (regexp_extract semantics)."""
    fwd = F.regexp_extract(
        html,
        rf"""(?is)<meta[^>]*{attr}=["']{name}["'][^>]*content=["']([^"']*)""",
        1,
    )
    rev = F.regexp_extract(
        html,
        rf"""(?is)<meta[^>]*content=["']([^"']*)["'][^>]*{attr}=["']{name}["']""",
        1,
    )
    return F.when(fwd != "", fwd).otherwise(rev)


def _nullif_empty(c: Column) -> Column:
    return F.nullif(F.trim(c), F.lit(""))


def html_title(html: Column) -> Column:
    """eu_news.ts:58-63 title fallback chain; NULL when every source is
    empty (the reference drops such articles)."""
    return F.coalesce(
        _nullif_empty(_meta_content(html, "property", "og:title")),
        _nullif_empty(_meta_content(html, "name", "title")),
        _nullif_empty(strip_tags(F.regexp_extract(html, r"(?is)<h1[^>]*>(.*?)</h1>", 1))),
        _nullif_empty(strip_tags(F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title>", 1))),
    )


def html_description(html: Column) -> Column:
    """eu_news.ts:66-69: og:description / meta description / first <p>."""
    return F.coalesce(
        _nullif_empty(_meta_content(html, "property", "og:description")),
        _nullif_empty(_meta_content(html, "name", "description")),
        _nullif_empty(strip_tags(F.regexp_extract(html, r"(?is)<p[^>]*>(.*?)</p>", 1))),
    )


def html_published(html: Column) -> Column:
    """eu_news.ts:71-74,81: <time datetime> / article:published_time,
    truncated to the date (first 10 chars)."""
    raw = F.coalesce(
        _nullif_empty(F.regexp_extract(html, r"""(?is)<time[^>]*datetime=["']([^"']*)""", 1)),
        _nullif_empty(_meta_content(html, "property", "article:published_time")),
    )
    return F.substring(raw, 1, 10)


def article_text(html: Column) -> Column:
    """eu_news.ts:85-94 extractMainText: the <article> block's
    paragraphs, tag-stripped and newline-joined; empty string when the
    page has no article paragraphs (caller applies the description
    fallback)."""
    block = F.regexp_extract(html, r"(?is)<article[^>]*>(.*?)</article>", 1)
    paras = F.regexp_extract_all(block, F.lit(r"(?is)<p[^>]*>(.*?)</p>"), F.lit(1))
    cleaned = F.filter(
        F.transform(paras, strip_tags),
        lambda p: p != "",
    )
    return F.array_join(cleaned, "\n")


def extract_links(html: Column, base_url: Column) -> Column:
    """eu_news.ts:15-30: every <a href>, minus fragment/mailto:/
    javascript: targets; root-relative hrefs absolutized against the
    base URL's origin; everything else kept only if absolute http(s).
    Returns array<string> (deduplication is the caller's set — use
    array_distinct or explode+dropDuplicates at the corpus level)."""
    hrefs = F.regexp_extract_all(html, F.lit(r"""(?is)<a[^>]*href=["']([^"']*)["']"""), F.lit(1))
    origin = F.regexp_extract(base_url, r"^(https?://[^/?#]+)", 1)
    usable = F.filter(
        hrefs,
        lambda h: ~h.startswith("#")
        & ~h.contains("mailto:")
        & ~h.contains("javascript:")
        & (h.startswith("/") | h.startswith("http")),
    )
    return F.transform(
        usable,
        lambda h: F.when(h.startswith("/"), F.concat(origin, h)).otherwise(h),
    )
