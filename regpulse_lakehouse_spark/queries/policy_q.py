"""Policy/profile + meta-merge + read-cap queries — SURVEY.md §2.2 F8,
§2.8 V10, §2.6 T4.

F8: URL → policy profile matching (policy.ts:149-161: exact domain,
path prefix, required query params) as a broadcast-dim join.
V10: JSONB meta merge (jobs/scan.ts:41-44 `COALESCE(meta,'{}') || $1`)
as from_json → map_concat-with-override → field extraction.
T4: per-entity top-N read caps (lineage.ts:30,43,56,70: runs LIMIT 50,
docs/items LIMIT 200) as unioned TakeOrdered slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

from ..functions import literal_dim
from ..sources.tpch import load_table
from . import register
from .governance import _URL_SQL, _url_col

# Profile dim (trust-policy.json profiles shape): exact domain, path
# prefix, and whether a utm_source query param is required.
_PROFILES = (
    ("p-src1-news", "src1.example.com", "/news/", 0),
    ("p-src2-news", "src2.example.com", "/news/", 0),
    ("p-src3-feed", "src3.example.com", "/news/", 1),
    ("p-unknown", "src0.unknown-host.org", "/news/", 0),
)


@register(
    "f8_v10_profile_meta",
    oracle=f"""
    WITH with_url AS (
      SELECT doc_id, {_URL_SQL} AS url FROM documents
    ),
    parsed AS (
      SELECT doc_id, url,
             regexp_replace(regexp_extract(url, 'https://([^/]+)', 1), '^www\\.', '') AS domain,
             regexp_extract(regexp_replace(url, 'https://[^/]+', ''), '^[^?]*', 0) AS path,
             contains(url, 'utm_source=') AS has_utm
      FROM with_url
    ),
    merged AS (
      SELECT event_id,
             json_merge_patch(COALESCE(NULLIF(props, ''), '{{}}'),
                              '{{"status": "merged", "source": "pipeline"}}') AS meta
      FROM events
    )
    SELECT 'f8' AS leg, CAST(p.doc_id AS BIGINT) AS key,
           COALESCE(pr.profile_id, 'no-profile') AS label,
           CAST(NULL AS BIGINT) AS k, CAST(NULL AS VARCHAR) AS status,
           CAST(NULL AS VARCHAR) AS source, CAST(NULL AS INT) AS n_keys
    FROM parsed p
    LEFT JOIN (VALUES {", ".join(f"('{pid}','{dom}','{pre}',{req})" for pid, dom, pre, req in _PROFILES)})
              AS pr(profile_id, dom, path_prefix, requires_utm)
      ON p.domain = pr.dom
     AND starts_with(p.path, pr.path_prefix)
     AND (pr.requires_utm = 0 OR p.has_utm)
    UNION ALL
    SELECT 'v10', CAST(event_id AS BIGINT), NULL,
           CAST(meta->>'k' AS BIGINT),
           meta->>'status', meta->>'source',
           CAST(len(json_keys(meta)) AS INT)
    FROM merged
    """,
)
def f8_v10_profile_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 profile matcher (policy.ts:149-161): exact-domain + path-prefix +
    required-query-param predicates against a broadcast profile dim.
    Profiles are constructed so each URL matches at most one (domains are
    disjoint), keeping the left join row-preserving. The 'v10' leg
    carries the V10 JSONB meta merge (:func:`_v10_meta_merge_leg`) —
    merged in the round-12 continuation so the 50-row budget could fund
    ``sp_split_sample_cap``; both legs' algebra stays hash-graded column for
    column."""
    docs = load_table(spark, sf_dir, "documents")
    url = _url_col()
    parsed = docs.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_extract(url, r"https://([^/]+)", 1), r"^www\.", ""
        ).alias("domain"),
        F.regexp_extract(
            F.regexp_replace(url, r"https://[^/]+", ""), r"^[^?]*", 0
        ).alias("path"),
        url.contains("utm_source=").alias("has_utm"),
    )
    profiles = literal_dim(
        spark, _PROFILES, ["profile_id", "dom", "path_prefix", "requires_utm"]
    )
    joined = parsed.join(
        F.broadcast(profiles),
        (F.col("domain") == F.col("dom"))
        & F.col("path").startswith(F.col("path_prefix"))
        & ((F.col("requires_utm") == 0) | F.col("has_utm")),
        "left",
    )
    f8 = joined.select(
        F.lit("f8").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.coalesce("profile_id", F.lit("no-profile")).alias("label"),
        F.lit(None).cast("long").alias("k"),
        F.lit(None).cast("string").alias("status"),
        F.lit(None).cast("string").alias("source"),
        F.lit(None).cast("int").alias("n_keys"),
    )
    v10 = _v10_meta_merge_leg(spark, sf_dir).select(
        F.lit("v10").alias("leg"),
        F.col("event_id").cast("long").alias("key"),
        F.lit(None).cast("string").alias("label"),
        "k",
        "status",
        "source",
        "n_keys",
    )
    return f8.unionByName(v10)


def _v10_meta_merge_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V10 JSONB meta merge (jobs/scan.ts:41-44:
    `COALESCE(meta,'{}'::jsonb) || updates`): parse the open-shape meta
    to map<string,string>, merge updates with update-wins override, and
    surface merged fields. map_concat needs LAST_WIN dedup only when key
    sets overlap — here updates use fresh keys, and overridden keys are
    modeled by the coalesce order in the field extraction. Graded as the
    'v10' leg of ``f8_v10_profile_meta`` since the round-12 continuation
    merge."""
    ev = load_table(spark, sf_dir, "events")
    base = F.coalesce(
        F.from_json(F.nullif(F.col("props"), F.lit("")), T.MapType(T.StringType(), T.StringType())),
        F.from_json(F.lit("{}"), T.MapType(T.StringType(), T.StringType())),
    )
    updates = F.create_map(
        F.lit("status"), F.lit("merged"), F.lit("source"), F.lit("pipeline")
    )
    merged = F.map_concat(F.map_filter(base, lambda k, _: ~k.isin("status", "source")), updates)
    return ev.select(
        "event_id",
        F.element_at(merged, "k").cast("long").alias("k"),
        F.element_at(merged, "status").alias("status"),
        F.element_at(merged, "source").alias("source"),
        F.size(merged).alias("n_keys"),
    )


@register(
    "t4_t6_topk_limits",
    oracle="""
    (SELECT 'order' AS entity, CAST(o_orderkey AS VARCHAR) AS id,
            CAST(NULL AS VARCHAR) AS v1, CAST(NULL AS VARCHAR) AS v2
     FROM orders ORDER BY o_orderdate DESC, o_orderkey LIMIT 50)
    UNION ALL
    (SELECT 'order_oldest', CAST(o_orderkey AS VARCHAR), NULL, NULL
     FROM orders ORDER BY o_orderdate ASC, o_orderkey LIMIT 50)
    UNION ALL
    (SELECT 'event', CAST(event_id AS VARCHAR), NULL, NULL
     FROM events ORDER BY ts DESC, event_id LIMIT 200)
    UNION ALL
    (SELECT 'doc', CAST(doc_id AS VARCHAR), NULL, NULL
     FROM documents ORDER BY n_chars DESC, doc_id LIMIT 200)
    UNION ALL
    (SELECT 'user_topk', CAST(user_id AS VARCHAR),
            CAST(COUNT(*) AS VARCHAR),
            strftime(MAX(ts), '%Y-%m-%d %H:%M:%S.%f')
     FROM events GROUP BY user_id
     ORDER BY MAX(ts) DESC, user_id DESC LIMIT 10)
    """,
)
def t4_t6_topk_limits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4 per-entity lineage read caps (lineage.ts:30,43,56,70: runs
    LIMIT 50, docs/items/reqs LIMIT 200) + T3 ascending ordered-limit
    (run-log replay order, repository.ts:94-100). Each slice compiles to
    TakeOrderedAndProject (no global sort); unique-key tie-breakers keep
    the cut deterministic. Merged in round 12 with T6 order-by-aggregate
    top-k (index.ts:183-194 ORDER BY last_ingested_at DESC after the
    join+agg) as the ``user_topk`` leg — the 50-row budget funded
    `hh_cm_freq`; every leg's values stay hash-graded."""
    def slice_(entity, df, order, n, key):
        return (
            df.orderBy(*order)
            .limit(n)
            .select(
                F.lit(entity).alias("entity"),
                F.col(key).cast("string").alias("id"),
                F.lit(None).cast("string").alias("v1"),
                F.lit(None).cast("string").alias("v2"),
            )
        )

    orders_t = load_table(spark, sf_dir, "orders")
    events_t = load_table(spark, sf_dir, "events")
    orders = slice_(
        "order", orders_t, [F.desc("o_orderdate"), F.asc("o_orderkey")], 50, "o_orderkey"
    )
    oldest = slice_(
        "order_oldest", orders_t, [F.asc("o_orderdate"), F.asc("o_orderkey")], 50, "o_orderkey"
    )
    events = slice_(
        "event", events_t, [F.desc("ts"), F.asc("event_id")], 200, "event_id"
    )
    docs = slice_(
        "doc",
        load_table(spark, sf_dir, "documents"),
        [F.desc("n_chars"), F.asc("doc_id")],
        200,
        "doc_id",
    )
    user_topk = (
        events_t.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("_last"))
        .orderBy(F.desc("_last"), F.desc("user_id"))
        .limit(10)
        .select(
            F.lit("user_topk").alias("entity"),
            F.col("user_id").cast("string").alias("id"),
            F.col("n_events").cast("string").alias("v1"),
            F.date_format("_last", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("v2"),
        )
    )
    return (
        orders.unionByName(oldest)
        .unionByName(events)
        .unionByName(docs)
        .unionByName(user_topk)
    )
