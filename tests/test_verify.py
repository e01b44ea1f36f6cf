"""X3 evidence-chain verification (operators/verify.py) — the
reference's LLM-judge audit (services/api/src/index.ts:302-357) as a
deterministic pluggable stage: criteria coverage, the 通过/不通过
response-parse protocol (index.ts:350), and byte-identical equivalence
between the codegen ColumnVerifier and the mapInPandas PandasVerifier."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.verify import (
    ColumnVerifier,
    PandasVerifier,
    parse_verdict,
)
from regpulse_lakehouse_spark.pipelines import ColumnExtractor
from regpulse_lakehouse_spark.sources import fixtures


@pytest.fixture(scope="module")
def items(spark):
    """Extracted items over docs engineered to hit every criterion both
    ways: the fixture corpus alone has no topic keywords in its filler
    content, so every row would fail `no_topics` and the pass path would
    go untested. Built with range+expressions, not createDataFrame (a
    driver-list DataFrame forks a Python worker per core for 6 rows)."""
    docs = spark.range(6).select(
        F.concat(F.lit("doc-"), F.col("id").cast("string")).alias("id"),
        F.when(F.col("id") % 3 == 0, F.lit("https://www.example.com/reg/1"))
        .when(F.col("id") % 3 == 1, F.lit("https://evil.test/reg/2"))
        .otherwise(F.lit("https://unece.org/reg/3"))
        .alias("url"),
        F.concat(F.lit("Title "), F.col("id").cast("string")).alias("title"),
        F.when(
            F.col("id") % 2 == 1,  # odd ids: doc-3 passes all four criteria
            F.lit("cybersecurity and software update obligations for vehicles"),
        )
        .otherwise(F.lit("short"))
        .alias("content"),
    )
    return ColumnExtractor().extract(docs).cache()


def test_parse_verdict_protocol():
    # index.ts:350: pass iff contains 通过 AND NOT contains 不通过 —
    # a response containing 不通过 also contains 通过 as a substring,
    # and must still fail.
    assert parse_verdict("验证结果：通过；置信度评分：100")
    assert not parse_verdict("验证结果：不通过；置信度评分：50")
    assert not parse_verdict("模型超时，无结论")


def test_column_verifier_criteria(spark, items):
    out = ColumnVerifier().verify(items)
    rows = {r["source_document_id"]: r for r in out.collect()}
    assert rows  # fixture corpus non-empty
    for r in rows.values():
        expected = 25 * (4 - (0 if r["verify_score"] == 100 else r["details"].count(",") + 1))
        assert r["verify_score"] == expected
        assert r["verified"] == (r["verify_score"] == 100)
        assert r["verified"] == parse_verdict(r["details"])
    # both outcomes must occur on the fixture corpus or the checks are vacuous
    outcomes = {r["verified"] for r in rows.values()}
    assert outcomes == {True, False}


def test_pandas_verifier_matches_column(spark, items):
    key = ["source_document_id"]
    col = ColumnVerifier().verify(items).orderBy(*key).collect()
    pdv = PandasVerifier().verify(items).orderBy(*key).collect()
    assert len(col) == len(pdv) > 0
    for a, b in zip(col, pdv):
        assert a.asDict() == b.asDict()


def test_verifier_stays_codegen(spark, items):
    plan = ColumnVerifier().verify(items)._jdf.queryExecution().executedPlan().toString()
    # the column path must not fall out of codegen into Python
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_low_confidence_flagged(spark):
    one = fixtures.documents(spark).limit(1)
    items = ColumnExtractor().extract(one).withColumn("confidence", F.lit(0.1))
    r = ColumnVerifier().verify(items).collect()[0]
    assert not r["verified"]
    assert "low_confidence" in r["details"]
    assert r["verify_score"] <= 75
