"""Closed vocabularies + dimension tables — the ontology layer.

Mirrors the reference's enum system (packages/ontology/src/terms.ts:
24 allowed domains at 1-26, 10 jurisdictions at 28, 6 source types at
29-36, 5 statuses at 37, 22 topics at 38-61, 19 impacted areas at
62-82, 3 priorities at 83, 4 trust tiers at 86-91, 5 monitoring stages
at 93-99, evidence/review/run statuses at 101-103), materialized the
way seed.ts:38-50 flattens them into ``ontology_terms``.

Values are representative of the reference's domain shape; membership
checks compile to ``isin``/``array_intersect`` literals (small enums)
or joins against :func:`ontology_terms_df` (the general path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

JURISDICTIONS = ("EU", "US", "CN", "UN_ECE", "UK", "JP", "KR", "CA", "AU", "IN")

SOURCE_TYPES = ("regulation", "directive", "standard", "guidance", "news", "unknown")

STATUSES = ("draft", "proposed", "adopted", "in_force", "repealed")

TOPICS = (
    "automated_driving",
    "cybersecurity",
    "software_updates",
    "data_privacy",
    "functional_safety",
    "emissions",
    "batteries",
    "charging",
    "connectivity",
    "crash_safety",
    "lighting",
    "braking",
    "steering",
    "tyres",
    "noise",
    "recycling",
    "type_approval",
    "market_surveillance",
    "ai_act",
    "telematics",
    "v2x",
    "hydrogen",
)

IMPACTED_AREAS = (
    "perception",
    "planning",
    "controls",
    "hmi",
    "telemetry",
    "ota",
    "security_ops",
    "data_governance",
    "homologation",
    "testing",
    "manufacturing",
    "supply_chain",
    "after_sales",
    "legal",
    "documentation",
    "mapping",
    "localization",
    "diagnostics",
    "cloud",
)

PRIORITIES = ("P0", "P1", "P2")

TRUST_TIERS = (
    "TIER_A_BINDING",
    "TIER_B_OFFICIAL",
    "TIER_C_MEDIA",
    "TIER_D_QUARANTINE",
)

MONITORING_STAGES = (
    "horizon_scan",
    "triage",
    "analysis",
    "implementation",
    "monitoring",
)

EVIDENCE_STATUSES = ("complete", "partial", "missing")
REVIEW_STATUSES = ("pending", "approved", "rejected")
RUN_STATUSES = ("queued", "running", "completed", "failed")
RUN_TYPES = ("scan", "merge")

# Tier rank map for argmax ops (jobs/merge.ts:163-182 {A:4,B:3,C:2,D:1})
TIER_RANK = {t: 4 - i for i, t in enumerate(TRUST_TIERS)}
# Stage order list (merge.ts:184-198: max index wins)
STAGE_RANK = {s: i for i, s in enumerate(MONITORING_STAGES)}

_ENUMS: dict[str, tuple[str, ...]] = {
    "jurisdiction": JURISDICTIONS,
    "source_type": SOURCE_TYPES,
    "status": STATUSES,
    "topic": TOPICS,
    "impacted_area": IMPACTED_AREAS,
    "priority": PRIORITIES,
    "trust_tier": TRUST_TIERS,
    "monitoring_stage": MONITORING_STAGES,
    "evidence_status": EVIDENCE_STATUSES,
    "review_status": REVIEW_STATUSES,
    "run_status": RUN_STATUSES,
    "run_type": RUN_TYPES,
}


def ontology_terms_df(spark: SparkSession) -> DataFrame:
    """The flattened enum dictionary as a (term_type, value, label)
    DataFrame (seed.ts:38-50) — broadcast-join this for membership
    checks over large enums."""
    from .functions import literal_dim

    rows = [
        (term_type, value, value.replace("_", " ").title())
        for term_type, values in _ENUMS.items()
        for value in values
    ]
    return literal_dim(spark, rows, ["term_type", "value", "label"])
