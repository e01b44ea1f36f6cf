"""Explicit StructTypes for the 12-table catalog — SURVEY.md §1.2/§1.3.

The reference declares shape three ways (SQL DDL in
services/api/db/schema.sql, Zod runtime schemas in
packages/ontology/src/schemas.ts, closed vocabularies in terms.ts);
here each table is one explicit StructType, nothing inferred:

- ``TEXT[]`` → ArrayType(String) (topics, impacted_areas, markets…)
- closed-shape JSONB → fully typed structs (engineering_actions,
  evidence — schemas.ts:16-33), NOT stringly JSON
- open-shape JSONB → MapType(String,String) for flat meta;
  ``review_queue.payload`` stays a JSON *string* parsed on demand with
  from_json (it must round-trip arbitrary candidate items — SURVEY §7
  hard-parts)
- pgvector VECTOR(n) → ArrayType(Float)
- NUMERIC confidence → Double (unit-interval, schema.sql:37)
"""

from __future__ import annotations

from pyspark.sql import types as T


def _s(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


STR = T.StringType()
DBL = T.DoubleType()
INT = T.IntegerType()
LNG = T.LongType()
TS = T.TimestampType()
DATE = T.DateType()
META = T.MapType(T.StringType(), T.StringType())

CITATION = T.StructType(
    [_s("title", STR), _s("url", STR), _s("snippet", STR)]
)

EVIDENCE = T.StructType(
    [
        _s("raw_file_uri", STR),
        _s("text_snapshot_uri", STR),
        _s("citations", T.ArrayType(CITATION), False),
    ]
)

ENGINEERING_ACTION = T.StructType(
    [
        _s("action", STR, False),
        _s("owner_role", STR),
        _s("due_date", STR),
        _s("artifact", STR),
    ]
)

ONTOLOGY_TERMS = T.StructType(
    [_s("id", INT), _s("term_type", STR, False), _s("value", STR, False), _s("label", STR)]
)

SOURCE_DOCUMENTS = T.StructType(
    [
        _s("id", STR, False),
        _s("url", STR, False),
        _s("domain", STR),
        _s("title", STR),
        _s("content", STR),
        _s("retrieved_at", TS),
        _s("published_date", DATE),
        _s("hash", STR),
        _s("meta", META),
        _s("arrival_seq", LNG),  # explicit arrival order (W1 determinism)
        _s("source_profile_id", STR),
    ]
)

REGULATION_ITEMS = T.StructType(
    [
        _s("id", STR, False),
        _s("jurisdiction", STR),
        _s("source_org", STR),
        _s("source_type", STR),
        _s("title", STR),
        _s("summary_1line", STR),
        _s("url", STR),
        _s("published_date", DATE),
        _s("effective_date", DATE),
        _s("retrieved_at", TS),
        _s("status", STR),
        _s("topics", T.ArrayType(STR)),
        _s("impacted_areas", T.ArrayType(STR)),
        _s("engineering_actions", T.ArrayType(ENGINEERING_ACTION)),
        _s("evidence", EVIDENCE),
        _s("confidence", DBL),
        _s("notes", STR),
        _s("priority", STR),
        _s("trust_tier", STR),
        _s("monitoring_stage", STR),
        _s("source_profile_id", STR),
        _s("source_document_id", STR),
        _s("created_at", TS),
        _s("_ingest_ts", TS),  # upsert version column (W2 latest-wins)
    ]
)

REQUIREMENTS = T.StructType(
    [
        _s("id", STR, False),
        _s("requirement_family", STR, False),
        _s("markets", T.ArrayType(STR)),
        _s("vehicle_types", T.ArrayType(STR)),
        _s("functions", T.ArrayType(STR)),
        _s("owner", STR),
        _s("evidence_status", STR),
        _s("priority", STR),
        _s("source_item_id", STR),
        _s("created_at", TS),
    ]
)

REVIEW_QUEUE = T.StructType(
    [
        _s("id", STR, False),
        _s("entity_type", STR, False),
        _s("payload", STR),  # open-shape JSON string, from_json on read
        _s("reason", STR),
        _s("status", STR),
        _s("created_at", TS),
        _s("reviewed_at", TS),
        _s("reviewer", STR),
    ]
)

LINKS = T.StructType(
    [
        _s("id", STR),
        _s("from_type", STR, False),
        _s("from_id", STR, False),
        _s("to_type", STR, False),
        _s("to_id", STR, False),
        _s("relation", STR, False),
        _s("meta", META),
    ]
)

RUNS = T.StructType(
    [
        _s("id", STR, False),
        _s("run_type", STR),
        _s("jurisdiction", STR),
        _s("days_window", INT),
        _s("status", STR),
        _s("started_at", TS),
        _s("completed_at", TS),
        _s("meta", META),
        _s("job_id", STR),
    ]
)

RUN_LOGS = T.StructType(
    [
        _s("id", STR, False),
        _s("run_id", STR, False),
        _s("stage", STR),
        _s("message", STR),
        _s("meta", META),
        _s("created_at", TS),
    ]
)

VECTOR_STORES = T.StructType(
    [
        _s("id", STR, False),
        _s("name", STR),
        _s("provider", STR),  # 'local' store is undeletable (index.ts:167-170)
        _s("external_id", STR),
        _s("status", STR),
        _s("created_at", TS),
        _s("meta", META),
    ]
)

VECTOR_CHUNKS = T.StructType(
    [
        _s("id", STR, False),
        _s("document_id", STR, False),
        _s("chunk_index", INT),
        _s("text", STR),
        _s("embedding", T.ArrayType(T.FloatType())),
        _s("vector_store_id", STR),
        _s("created_at", TS),
    ]
)

APP_CONFIG = T.StructType([_s("key", STR, False), _s("value", STR)])

CATALOG: dict[str, T.StructType] = {
    "ontology_terms": ONTOLOGY_TERMS,
    "source_documents": SOURCE_DOCUMENTS,
    "regulation_items": REGULATION_ITEMS,
    "requirements": REQUIREMENTS,
    "review_queue": REVIEW_QUEUE,
    "links": LINKS,
    "runs": RUNS,
    "run_logs": RUN_LOGS,
    "vector_stores": VECTOR_STORES,
    "vector_chunks": VECTOR_CHUNKS,
    "app_config": APP_CONFIG,
}
