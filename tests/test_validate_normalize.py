"""Property tests for validation + normalization (SURVEY.md §5.3:
idempotence, enum-domain closure, clamp bounds, all reject reasons
reachable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from regpulse_lakehouse_spark.functions.normalize import normalize_items
from regpulse_lakehouse_spark.ontology import (
    IMPACTED_AREAS,
    JURISDICTIONS,
    PRIORITIES,
    SOURCE_TYPES,
    TOPICS,
)
from regpulse_lakehouse_spark.operators.validate import (
    split_routes,
    with_route,
    with_validation,
)
from regpulse_lakehouse_spark.sources import fixtures

FIXTURE_DOMAINS = fixtures.ALLOWED_FIXTURE_DOMAINS


def test_normalize_output_within_enum_domains(spark):
    items = normalize_items(fixtures.regulation_items(spark))
    rows = items.collect()
    for r in rows:
        assert r.jurisdiction in JURISDICTIONS
        assert r.source_type in SOURCE_TYPES
        assert r.priority in PRIORITIES
        assert set(r.topics) <= set(TOPICS)
        assert set(r.impacted_areas) <= set(IMPACTED_AREAS)
        assert 0.0 <= r.confidence <= 1.0
        assert len(r.summary_1line or "") <= 400
        assert r.title


def test_normalize_is_idempotent(spark):
    once = normalize_items(fixtures.regulation_items(spark))
    twice = normalize_items(once)
    a = sorted(tuple(r) for r in once.collect())
    b = sorted(tuple(r) for r in twice.collect())
    assert a == b


def test_all_reject_reasons_reachable(spark):
    validated = with_validation(
        fixtures.regulation_items(spark), allowed_domains=FIXTURE_DOMAINS
    )
    reasons = {
        v
        for r in validated.select("violations").collect()
        for v in r.violations
    }
    # the four reference reject families (validator.ts:26-48)
    assert "empty_citations" in reasons
    assert "confidence_below_min" in reasons
    assert "disallowed_domain" in reasons
    assert any(x.endswith("_not_in_enum") for x in reasons)


def test_route_split_is_partition(spark):
    routed = with_route(
        with_validation(fixtures.regulation_items(spark), allowed_domains=FIXTURE_DOMAINS)
    )
    main, review = split_routes(routed)
    assert main.count() + review.count() == routed.count()
    assert main.filter(F.col("trust_tier") != "TIER_A_BINDING").count() == 0
    assert review.filter(F.col("route_reason").isNull()).count() == 0


def test_normalized_items_pass_enum_checks(spark):
    """normalize → validate leaves only non-enum violations."""
    validated = with_validation(
        normalize_items(fixtures.regulation_items(spark)),
        allowed_domains=FIXTURE_DOMAINS,
    )
    enum_violations = validated.filter(
        F.exists("violations", lambda v: v.endswith("_not_in_enum"))
    ).count()
    # trust_tier is NOT normalized (it is assigned by policy, F9) —
    # every other enum violation must be gone
    remaining = validated.filter(
        F.exists(
            "violations",
            lambda v: v.endswith("_not_in_enum") & (v != "trust_tier_not_in_enum"),
        )
    ).count()
    assert remaining == 0
    assert enum_violations >= 0
