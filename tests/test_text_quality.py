"""Gopher/C4-style quality heuristics and PII masking
(functions/text.py): rule behavior on crafted documents, idempotent
masking, and the all-JVM plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.functions import text as TX


def _one(spark, doc, col):
    return spark.createDataFrame([(doc,)], "text string").select(
        col(F.col("text")).alias("v")
    ).collect()[0]["v"]


def test_mean_word_length(spark):
    assert _one(spark, "aa bbbb", TX.mean_word_length) == 3.0
    assert _one(spark, "", TX.mean_word_length) == 0.0


def test_symbol_word_ratio(spark):
    assert _one(spark, "a # b #", TX.symbol_word_ratio) == 0.5
    assert _one(spark, "clean words only", TX.symbol_word_ratio) == 0.0


def test_duplicate_line_fraction(spark):
    doc = "same\nsame\nunique\n\n"
    assert _one(spark, doc, TX.duplicate_line_fraction) == pytest.approx(1 / 3)
    assert _one(spark, "a\nb\nc", TX.duplicate_line_fraction) == 0.0


def test_bullet_line_fraction(spark):
    doc = "- one\n* two\n1. three\n2) four\nplain"
    assert _one(spark, doc, TX.bullet_line_fraction) == pytest.approx(4 / 5)


def test_gopher_flags(spark):
    good = " ".join(f"word{i}" for i in range(60))
    flags = _one(spark, good, TX.gopher_quality_flags)
    assert flags["passes"] and flags["word_count_ok"]
    short = "too short"
    flags = _one(spark, short, TX.gopher_quality_flags)
    assert not flags["word_count_ok"] and not flags["passes"]
    # symbol spam fails exactly the symbol rule
    spam = " ".join(["ok#"] * 60)
    flags = _one(spark, spam, TX.gopher_quality_flags)
    assert flags["word_count_ok"] and not flags["symbol_ratio_ok"] and not flags["passes"]


def test_mask_pii_and_idempotence(spark):
    doc = "mail a.b+c@example.co.uk or call +1 (555) 123-4567; host 10.0.0.1 ok"
    once = _one(spark, doc, TX.mask_pii)
    assert "<EMAIL>" in once and "<PHONE>" in once and "<IP>" in once
    assert "example" not in once and "555" not in once and "10.0.0.1" not in once
    df = spark.createDataFrame([(doc,)], "text string")
    twice = df.select(TX.mask_pii(TX.mask_pii(F.col("text"))).alias("v")).collect()[0]["v"]
    assert twice == once


def test_quality_pass_is_pure_jvm(spark):
    df = spark.createDataFrame([("sample text",)], "text string").select(
        TX.gopher_quality_flags(F.col("text")).alias("q"),
        TX.mask_pii(F.col("text")).alias("clean"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_normalize_for_dedup_collapses_formatting_variants(spark):
    from regpulse_lakehouse_spark.functions.text import normalize_for_dedup

    rows = [
        ("a", "Released v2.31 on 2024-01-05: see CHANGELOG!"),
        ("b", "released V9.04 on 1999-12-31 --- see changelog"),
        ("c", "an actually different sentence."),
        ("d", "  whitespace\t\truns\n\ncollapse  "),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    got = {
        r["id"]: r["n"]
        for r in df.select("id", normalize_for_dedup(F.col("text")).alias("n")).collect()
    }
    assert got["a"] == got["b"] == "released v0 0 on 0 0 0 see changelog"
    assert got["c"] == "an actually different sentence"
    assert got["d"] == "whitespace runs collapse"
    # idempotent: normalizing the normalized form is the identity
    df2 = spark.createDataFrame([(v,) for v in got.values()], "t string")
    again = [r["n"] for r in df2.select(normalize_for_dedup(F.col("t")).alias("n")).collect()]
    assert sorted(again) == sorted(got.values())


def test_normalize_for_dedup_matches_duckdb_chain(spark):
    """The portability claim: the identical regexp chain in DuckDB
    produces byte-identical normalized text."""
    import duckdb

    texts = [
        "Mixed CASE, punct... and 123 numbers!",
        "tabs\tand\nnewlines  everywhere",
        "[brackets] {braces} (parens) <angles> `ticks` ~tilde~",
        # vertical tab: Java \s includes \x0B, RE2's \s does not — the
        # chain uses an explicit class so both engines collapse it
        "vertical\x0btab\x0b\x0bruns",
        "form\x0cfeed and \r\n endings",
        "",
    ]
    from regpulse_lakehouse_spark.functions.text import normalize_for_dedup

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    spark_out = [r["n"] for r in df.select(normalize_for_dedup(F.col("text")).alias("n")).collect()]
    con = duckdb.connect()
    duck_out = [
        con.execute(
            r"""SELECT trim(regexp_replace(regexp_replace(regexp_replace(
                 lower(?), '[0-9]+', '0', 'g'),
                 '[!-/:-@\[-`{-~]+', ' ', 'g'),
                 '[ \t\n\x0B\f\r]+', ' ', 'g'))""",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert spark_out == duck_out
