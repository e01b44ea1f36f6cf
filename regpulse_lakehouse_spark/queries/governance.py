"""Governance queries — SURVEY.md §2.2 F1-F3/F8-F9 and §2.8 V1-V13.

The reference's validation/routing/normalization engine
(ontology/validator.ts, ontology/policy.ts, jobs/scan.ts:50-74,
index.ts:427-488) re-expressed as columnar predicates over the driver's
synthetic tables. URL columns are synthesized deterministically from
``documents`` (both engines build the identical string) so the URL
policy ops (canonicalize / domain / allowlist / tier routing) are
oracle-checkable without domain fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import literal_dim, urls
from ..sources.tpch import load_table
from . import register

# Deterministic synthetic URL over documents: host varies (www-prefix,
# unknown-host share), tail varies (utm params / trailing slash / bare).
_URL_SQL = (
    "'https://' || (CASE WHEN doc_id % 4 = 0 THEN 'www.' ELSE '' END) || source || "
    "(CASE WHEN doc_id % 5 = 0 THEN '.unknown-host.org' ELSE '.example.com' END) || "
    "'/news/item-' || CAST(doc_id AS VARCHAR) || "
    "(CASE WHEN doc_id % 3 = 0 THEN '/?utm_source=feed&id=' || CAST(doc_id % 10 AS VARCHAR) || '&utm_medium=rss' "
    " WHEN doc_id % 3 = 1 THEN '/' ELSE '' END)"
)


def _url_col() -> F.Column:
    host = F.concat(
        F.when(F.col("doc_id") % 4 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(".unknown-host.org")).otherwise(
            F.lit(".example.com")
        ),
    )
    tail = (
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("/?utm_source=feed&id="),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("&utm_medium=rss"),
            ),
        )
        .when(F.col("doc_id") % 3 == 1, F.lit("/"))
        .otherwise(F.lit(""))
    )
    return F.concat(
        F.lit("https://"), host, F.lit("/news/item-"), F.col("doc_id").cast("string"), tail
    )


# Tier → domain-substring dim (trust-policy.json:23-68 shape): first
# matching tier in rank order wins; no match → TIER_D_QUARANTINE.
_TIER_ROWS = (
    ("src1", "TIER_A_BINDING", 1),
    ("src2", "TIER_A_BINDING", 2),
    ("src3", "TIER_B_OFFICIAL", 3),
    ("src4", "TIER_B_OFFICIAL", 4),
    ("src5", "TIER_C_MEDIA", 5),
    ("unknown-host", "TIER_C_MEDIA", 6),
)


# Source → publishing-org dim (scan.ts:448-472 host→org CASE shape).
_SOURCE_ORGS = (
    ("src0", "Org Zero"),
    ("src1", "European Commission"),
    ("src2", "UNECE"),
    ("src3", "NHTSA"),
    ("src4", "Org Four"),
)


@register(
    "f2_f9_domain_policy",
    oracle=f"""
    WITH with_domain AS (
      SELECT doc_id, source, {urls.extract_domain_sql(_URL_SQL)} AS domain,
             {urls.canonicalize_url_sql(_URL_SQL)} AS canonical_url
      FROM documents
    ),
    matches AS (
      SELECT w.doc_id, w.source, w.domain, w.canonical_url, t.tier, t.rank
      FROM with_domain w
      LEFT JOIN (VALUES {", ".join(f"('{d}','{t}',{r})" for d, t, r in _TIER_ROWS)})
                AS t(dom, tier, rank)
        ON contains(w.domain, t.dom)
    ),
    best AS (
      SELECT doc_id, source, domain, canonical_url,
             arg_min(tier, COALESCE(rank, 999)) AS matched_tier
      FROM matches GROUP BY doc_id, source, domain, canonical_url
    )
    SELECT b.doc_id, b.domain, b.canonical_url,
           {urls.allowed_domain_sql("b.domain")} AS is_allowed,
           COALESCE(b.matched_tier, 'TIER_D_QUARANTINE') AS tier,
           b.source,
           COALESCE(m.org, 'Unknown') AS source_org
    FROM best b
    LEFT JOIN (VALUES {", ".join(f"('{s}','{o}')" for s, o in _SOURCE_ORGS)})
              AS m(source, org)
      ON b.source = m.source
    """,
)
def f2_f9_domain_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full URL-policy surface in one row: F1 URL canonicalization
    (policy.ts:77-97: strip utm_* params + trailing slash; standalone row
    folded in round 9), F2 domain extraction (scan.ts:440-446), F3
    allowed-domain predicate (validator.ts:17-24), F8/F9 tier-by-domain
    routing (policy.ts:99-139,163-170: first tier whose domain list
    substring-matches; default quarantine), and V6 source-org mapping
    (scan.ts:448-472: 22-branch host→org CASE). F2/F3's standalone row
    merged here in round 12 — the 50-row budget funded the four new
    LLM-pipeline rows; every column stays hash-graded.

    Tier matching is a broadcast join against the tier dim + min_by rank
    — no driver-side loop. The org mapping is a literal create_map lookup:
    for a handful of entries that beats a second broadcast join (no dim
    materialization, stays inside codegen); swap to a broadcast dim join
    only when the mapping outgrows a literal."""
    docs = load_table(spark, sf_dir, "documents")
    tiers = literal_dim(spark, _TIER_ROWS, ["dom", "tier", "rank"])
    org_map = F.create_map(*[F.lit(x) for pair in _SOURCE_ORGS for x in pair])
    with_domain = docs.select(
        "doc_id",
        "source",
        urls.extract_domain(_url_col()).alias("domain"),
        urls.canonicalize_url(_url_col()).alias("canonical_url"),
    )
    matched = with_domain.join(
        F.broadcast(tiers), F.col("domain").contains(F.col("dom")), "left"
    )
    return (
        matched.groupBy("doc_id", "source", "domain", "canonical_url")
        .agg(F.min_by("tier", F.coalesce("rank", F.lit(999))).alias("matched_tier"))
        .select(
            "doc_id",
            "domain",
            "canonical_url",
            urls.allowed_domain(F.col("domain")).alias("is_allowed"),
            F.coalesce("matched_tier", F.lit("TIER_D_QUARANTINE")).alias("tier"),
            "source",
            F.coalesce(org_map[F.col("source")], F.lit("Unknown")).alias("source_org"),
        )
    )


@register(
    "v1_v2_validate_route",
    oracle=f"""
    WITH checked AS (
      SELECT doc_id, lang, source, n_chars,
             {urls.extract_domain_sql(_URL_SQL)} AS domain,
             list_filter([
               CASE WHEN lang NOT IN ('en','de','fr','es') THEN 'lang_not_allowed' END,
               CASE WHEN n_chars < 50 THEN 'too_short' END,
               CASE WHEN n_chars > 4000 THEN 'too_long' END,
               CASE WHEN NOT {urls.allowed_domain_sql(urls.extract_domain_sql(_URL_SQL))}
                    THEN 'disallowed_domain' END
             ], x -> x IS NOT NULL) AS violations
      FROM documents
    )
    SELECT doc_id, lang,
           len(violations) AS n_violations,
           len(violations) = 0 AS valid,
           CASE WHEN len(violations) = 0 AND source IN ('src1','src2')
                THEN 'main' ELSE 'review_queue' END AS route,
           COALESCE(array_to_string(violations, ' | '), '') AS reason
    FROM checked
    """,
)
def v1_v2_validate_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1 validation transform (validator.ts:26-48: violation reasons as an
    array) + V2 tier routing (jobs/scan.ts:50-74: valid AND tier-A → main,
    else review_queue with concatenated reasons). One columnar pass.

    The violations array is surfaced as ``n_violations`` + the joined
    ``reason`` string: the driver's pandas canonicalizer cannot sort/hash
    list cells, so driver-checked outputs carry only atomic columns
    (round-1 lesson; the array form remains available via the validator
    operator itself, operators/validate.py)."""
    docs = load_table(spark, sf_dir, "documents")
    domain = urls.extract_domain(_url_col())
    checks = F.array(
        F.when(~F.col("lang").isin("en", "de", "fr", "es"), F.lit("lang_not_allowed")),
        F.when(F.col("n_chars") < 50, F.lit("too_short")),
        F.when(F.col("n_chars") > 4000, F.lit("too_long")),
        F.when(~urls.allowed_domain(domain), F.lit("disallowed_domain")),
    )
    violations = F.filter(checks, lambda x: x.isNotNull())
    valid = F.size(violations) == 0
    return docs.select(
        "doc_id",
        "lang",
        F.size(violations).cast("long").alias("n_violations"),
        valid.alias("valid"),
        F.when(valid & F.col("source").isin("src1", "src2"), F.lit("main"))
        .otherwise(F.lit("review_queue"))
        .alias("route"),
        F.array_join(violations, " | ").alias("reason"),
    )


@register(
    "v3_v13_normalize_payload",
    oracle="""
    SELECT event_id,
           CASE WHEN event_type IN ('click','view','purchase','signup','error')
                THEN event_type ELSE 'unknown' END AS event_type_norm,
           ROUND(LEAST(GREATEST("value", 0.0), 100.0), 2) AS value_clamped,
           COALESCE(NULLIF(props, ''), '{}') AS props_norm,
           CAST(props->>'k' AS INT) AS prop_k,
           CAST(ROUND("value", 0) AS BIGINT) AS value_rounded,
           CASE WHEN "value" >= 90 THEN 'green'
                WHEN "value" >= 70 THEN 'yellow'
                ELSE 'red' END AS bucket,
           CASE WHEN lower(pr) IN ('p0','p1','p2') THEN upper(pr)
                WHEN regexp_matches(lower(pr), 'urgent|critical') THEN 'P0'
                WHEN regexp_matches(lower(pr), 'high') THEN 'P1'
                ELSE 'P2' END AS priority_norm
    FROM (SELECT *,
                 ['urgent','Critical now','high priority','HIGH','medium','low','p1','']
                   [CAST(event_id % 8 AS INT) + 1] AS pr
          FROM events)
    """,
)
def v3_v13_normalize_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3 payload normalization (index.ts:427-488: enum fallback, clamp,
    default coalescing) + V10 JSON field extraction (scan.ts:253) + V13
    confidence display math (ItemBrowser.tsx:398-407: round(conf*100) +
    threshold buckets) + V5 free-text priority mapping (scan.ts:474-483,
    functions/normalize.normalize_priority, fed a deterministic sample of
    the messy spellings the reference tolerates) — all per-event
    projections, one columnar pass."""
    from ..functions.normalize import normalize_priority

    ev = load_table(spark, sf_dir, "events")
    enum = ("click", "view", "purchase", "signup", "error")
    raw_priority = F.element_at(
        F.array(
            *[
                F.lit(s)
                for s in (
                    "urgent", "Critical now", "high priority", "HIGH",
                    "medium", "low", "p1", "",
                )
            ]
        ),
        (F.col("event_id") % 8).cast("int") + 1,
    )
    return ev.select(
        "event_id",
        F.when(F.col("event_type").isin(*enum), F.col("event_type"))
        .otherwise(F.lit("unknown"))
        .alias("event_type_norm"),
        F.round(F.least(F.greatest(F.col("value"), F.lit(0.0)), F.lit(100.0)), 2).alias(
            "value_clamped"
        ),
        F.coalesce(F.nullif(F.col("props"), F.lit("")), F.lit("{}")).alias("props_norm"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.round(F.col("value"), 0).cast("long").alias("value_rounded"),
        F.when(F.col("value") >= 90, "green")
        .when(F.col("value") >= 70, "yellow")
        .otherwise("red")
        .alias("bucket"),
        normalize_priority(raw_priority).alias("priority_norm"),
    )


_KEYWORD_TOPIC_CASES = "\n".join(
    f"             CASE WHEN contains(lower(COALESCE(text, '')), '{kw}') THEN '{topic}' END,"
    for kw, topic in (
        ("cyber", "cybersecurity"),
        ("software", "software_updates"),
        ("emission", "emissions"),
        ("battery", "batteries"),
        ("autonom", "automated_driving"),
        ("data", "data_privacy"),
    )
).rstrip(",")


@register(
    "x1_x3_extract_verify",
    oracle=f"""
    WITH items AS (
      SELECT 'item-of-' || CAST(doc_id AS VARCHAR) AS item_id,
             CAST(doc_id AS VARCHAR) AS source_document_id,
             'Item ' || CAST(doc_id AS VARCHAR) || ' from ' || source AS title,
             substr(COALESCE(text, ''), 1, 400) AS summary_1line,
             {_URL_SQL} AS url,
             list_filter([
{_KEYWORD_TOPIC_CASES}
             ], x -> x IS NOT NULL) AS topics,
             round((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT)::DOUBLE
                   / 65536 / 2 + 0.5, 4) AS confidence,
             CASE WHEN contains(lower(COALESCE(text, '')), 'urgent')
                  THEN 'P0' ELSE 'P2' END AS priority
      FROM documents
    ),
    checked AS (
      SELECT *,
             ({urls.allowed_domain_sql(urls.extract_domain_sql("url"))}) AS url_ok,
             (length(title) > 0 AND length(COALESCE(summary_1line, '')) >= 20) AS align_ok,
             (len(topics) > 0) AS topics_ok,
             (confidence >= 0.6) AS conf_ok
      FROM items
    ),
    scored AS (
      SELECT *,
             CAST((CASE WHEN url_ok THEN 25 ELSE 0 END
                 + CASE WHEN align_ok THEN 25 ELSE 0 END
                 + CASE WHEN topics_ok THEN 25 ELSE 0 END
                 + CASE WHEN conf_ok THEN 25 ELSE 0 END) AS BIGINT) AS verify_score,
             array_to_string(list_filter([
               CASE WHEN NOT url_ok THEN 'url_untrusted' END,
               CASE WHEN NOT align_ok THEN 'weak_alignment' END,
               CASE WHEN NOT topics_ok THEN 'no_topics' END,
               CASE WHEN NOT conf_ok THEN 'low_confidence' END
             ], x -> x IS NOT NULL), ',') AS failed
      FROM checked
    )
    SELECT item_id, source_document_id, priority, confidence,
           COALESCE(array_to_string(topics, '|'), '') AS topics_str,
           (verify_score = 100) AS verified,
           verify_score,
           CASE WHEN verify_score = 100 THEN '验证结果：通过；置信度评分：100'
                ELSE '验证结果：不通过；置信度评分：' || CAST(verify_score AS VARCHAR)
                     || '；问题：' || failed END AS details
    FROM scored
    """,
)
def x1_x3_extract_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 structured extraction (scan.ts:170-298, deterministic
    ColumnExtractor) piped into X3 evidence-chain verification
    (index.ts:302-357, ColumnVerifier) — the extract→audit pipeline as
    one columnar pass. Covers V5 priority normalization too
    (scan.ts:474-483 via functions/normalize.normalize_priority inside
    the extractor), replacing the former standalone v5 registry entry.
    Topics are serialized with array_join: driver-checked outputs carry
    only atomic columns (round-1 lesson)."""
    from ..operators.verify import ColumnVerifier
    from ..pipelines.extract import ColumnExtractor

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("id"),
        _url_col().alias("url"),
        F.concat(
            F.lit("Item "), F.col("doc_id").cast("string"), F.lit(" from "), F.col("source")
        ).alias("title"),
        F.col("text").alias("content"),
    )
    verified = ColumnVerifier().verify(ColumnExtractor().extract(docs))
    return verified.select(
        F.col("id").alias("item_id"),
        "source_document_id",
        "priority",
        "confidence",
        F.array_join("topics", "|").alias("topics_str"),
        "verified",
        F.col("verify_score").cast("long").alias("verify_score"),
        "details",
    )


@register(
    "x2_radar_coverage",
    oracle=f"""
    WITH items AS (
      SELECT 'item-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id,
             ['US','EU','CN','UK','JP'][CAST(doc_id % 5 AS INT) + 1] AS jurisdiction,
             list_filter([
{_KEYWORD_TOPIC_CASES}
             ], x -> x IS NOT NULL) AS topics,
             (doc_id % 3 <> 0) AS has_citations,
             CASE WHEN contains(lower(COALESCE(text, '')), 'urgent')
                  THEN 'P0' ELSE 'P2' END AS priority
      FROM documents
    ),
    fam AS (
      SELECT *, COALESCE(topics[1], 'uncategorized') AS requirement_family
      FROM items
    )
    SELECT jurisdiction,
           requirement_family,
           jurisdiction AS markets_str,
           CASE WHEN bool_and(has_citations) THEN 'complete'
                WHEN bool_or(has_citations) THEN 'partial'
                ELSE 'missing' END AS evidence_status,
           min(priority) AS priority,
           min(id) AS source_item_id,
           COUNT(*) AS n_items
    FROM fam
    GROUP BY jurisdiction, requirement_family
    """,
)
def x2_radar_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 merge/coverage radar (jobs/merge.ts:16-109 radarTable;
    services/api/src/services/merge.ts:12-131), driver-graded since
    round 5 (the last substantive §2 op that was pytest-only). Items are
    derived deterministically from ``documents`` (jurisdiction by id
    ring, topics by the x1 keyword extractor, citation presence by id
    mod, priority by the 'urgent' marker) and flow through the REAL
    pipeline stage — pipelines/merge.radar_coverage's grouped
    applyInPandas merger, the seam where the reference's LLM sits — not
    a relational re-derivation; DuckDB mirrors the derivation
    family-by-family. Registry stays at 50: J4 folded into
    j2_fk_lookup_chain to fund this slot. The row immediately caught a
    real bug: the merger classified every item 'uncategorized' because
    Arrow hands arrays to pandas as ndarray (pipelines/merge.py)."""
    from ..pipelines.merge import radar_coverage

    docs = load_table(spark, sf_dir, "documents")
    text = F.coalesce(F.col("text"), F.lit(""))
    topic_hits = F.array(
        *[
            F.when(F.instr(F.lower(text), kw) > 0, F.lit(topic))
            for kw, topic in (
                ("cyber", "cybersecurity"),
                ("software", "software_updates"),
                ("emission", "emissions"),
                ("battery", "batteries"),
                ("autonom", "automated_driving"),
                ("data", "data_privacy"),
            )
        ]
    )
    items = docs.select(
        F.concat(F.lit("item-"), F.lpad(F.col("doc_id").cast("string"), 8, "0")).alias(
            "id"
        ),
        F.element_at(
            F.array(*[F.lit(j) for j in ("US", "EU", "CN", "UK", "JP")]),
            (F.col("doc_id") % 5).cast("int") + 1,
        ).alias("jurisdiction"),
        F.filter(topic_hits, lambda x: x.isNotNull()).alias("topics"),
        F.struct(
            F.when(
                F.col("doc_id") % 3 != 0,
                F.array(F.concat(F.lit("cite-"), F.col("doc_id").cast("string"))),
            )
            .otherwise(F.array().cast("array<string>"))
            .alias("citations")
        ).alias("evidence"),
        F.when(F.instr(F.lower(text), "urgent") > 0, F.lit("P0"))
        .otherwise(F.lit("P2"))
        .alias("priority"),
    )
    radar = radar_coverage(items)
    return radar.select(
        "jurisdiction",
        "requirement_family",
        F.array_join("markets", "|").alias("markets_str"),
        "evidence_status",
        "priority",
        "source_item_id",
        "n_items",
    )


# V8 content truncations (scan.ts:276,288,396) moved into the
# rt_bm25_topk row (queries/retrieval_q.py): the snippet/full-length
# result-card columns are graded there, freeing a registry slot for the
# retrieval family (the driver grades at most 50 rows).
