"""URL scalar functions — SURVEY.md §2.2 F1/F2/F3.

Reference semantics (cited per function):
- canonicalization strips ``utm_*`` tracking params and the trailing
  slash (policy-gated) — services/api/src/ontology/policy.ts:77-97;
- domain extraction is hostname minus a leading ``www.`` —
  services/api/src/services/scan.ts:440-446, ontology/validator.ts:19;
- the allowed-domain predicate is a substring match of any configured
  domain against the host — scan.ts:431-438, validator.ts:17-24.

All pure column expressions (regexp-based) so they stay inside
whole-stage codegen; no Python UDFs.
"""

from __future__ import annotations

from functools import reduce
from operator import or_

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mirrors the reference's 24-domain allowlist *shape* (terms.ts:1-26);
# actual values here are generic since the rebuild's tests run on
# synthetic corpora. Callers pass their own list for real deployments.
DEFAULT_ALLOWED_DOMAINS = (
    "europa.eu",
    "unece.org",
    "nhtsa.gov",
    "example.com",
)


def canonicalize_url(url: Column) -> Column:
    """F1: drop utm_* query params, then any dangling '?'/'&', then the
    trailing slash (policy.ts:77-97)."""
    no_utm = F.regexp_replace(url, r"utm_[^&#]*&?", "")
    no_dangling = F.regexp_replace(no_utm, r"[?&]+(#|$)", "$1")
    return F.regexp_replace(no_dangling, r"/$", "")


def extract_domain(url: Column) -> Column:
    """F2: hostname minus leading 'www.' (scan.ts:440-446)."""
    host = F.regexp_extract(url, r"https?://([^/?#]+)", 1)
    return F.regexp_replace(host, r"^www\.", "")


def allowed_domain(domain: Column, domains: tuple[str, ...] = DEFAULT_ALLOWED_DOMAINS) -> Column:
    """F3: true iff the host contains any allowed domain as a substring
    (scan.ts:431-438). An OR-chain over literals — constant-folded by
    Catalyst; for very large allowlists use a broadcast join instead."""
    return reduce(or_, [domain.contains(d) for d in domains])


def canonicalize_url_sql(expr: str) -> str:
    """DuckDB-SQL rendering of :func:`canonicalize_url` (oracle side)."""
    return (
        "regexp_replace(regexp_replace(regexp_replace("
        f"{expr}, 'utm_[^&#]*&?', '', 'g'), '[?&]+(#|$)', '\\1', 'g'), '/$', '')"
    )


def extract_domain_sql(expr: str) -> str:
    """DuckDB-SQL rendering of :func:`extract_domain`."""
    return (
        f"regexp_replace(regexp_extract({expr}, 'https?://([^/?#]+)', 1), '^www\\.', '')"
    )


def allowed_domain_sql(expr: str, domains: tuple[str, ...] = DEFAULT_ALLOWED_DOMAINS) -> str:
    """DuckDB-SQL rendering of :func:`allowed_domain`."""
    return "(" + " OR ".join(f"contains({expr}, '{d}')" for d in domains) + ")"
