"""Corpus profiler (operators/profile.py): metric correctness against
exact computations on the synthetic corpus, duplicate-pressure signal,
and the shuffle-free single-row plan."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators.profile import profile_by, profile_corpus
from regpulse_lakehouse_spark.sources.tpch import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_profile_row_matches_exact(docs):
    row = profile_corpus(docs, extra_distinct_cols=["source"]).collect()[0]
    n = docs.count()
    assert row["n_docs"] == n
    exact_chars = docs.agg(F.sum(F.length("text"))).collect()[0][0]
    assert row["total_chars"] == exact_chars
    # HLL at default precision: within 5% of exact
    exact_distinct = docs.select(F.md5("text")).distinct().count()
    assert abs(row["approx_distinct_texts"] - exact_distinct) <= max(2, 0.05 * exact_distinct)
    exact_sources = docs.select("source").distinct().count()
    assert abs(row["approx_distinct_source"] - exact_sources) <= max(1, 0.05 * exact_sources)
    # percentiles are ordered and within the observed range
    assert row["chars_p05"] <= row["chars_p50"] <= row["chars_p95"] <= row["chars_p99"]
    assert 0.0 <= row["empty_rate"] <= 1.0


def test_duplicate_pressure_signal(spark):
    base = [(i, "unique text %d" % i) for i in range(100)]
    dups = [(1000 + i, "copied text") for i in range(100)]
    df = spark.createDataFrame(base + dups, "doc_id long, text string")
    row = profile_corpus(df).collect()[0]
    # ~101 distinct texts over 200 docs → survival ratio ≈ 0.5
    assert row["approx_distinct_texts"] / row["n_docs"] < 0.6


def test_profile_is_shuffle_free(docs):
    plan = profile_corpus(docs)._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"(?<!Broadcast)Exchange hash", plan), (
        "global profile must be a partial-agg tree, not a keyed shuffle"
    )


def test_profile_by_groups(docs):
    rows = profile_by(docs, "source").collect()
    assert len(rows) == docs.select("source").distinct().count()
    assert sum(r["n_docs"] for r in rows) == docs.count()


# --- Gopher repetition signals -------------------------------------------


def test_repetition_stats_flags_template_stuffing(spark):
    from regpulse_lakehouse_spark.operators.profile import repetition_stats

    clean = " ".join(f"unique{i} word{i*7%13}" for i in range(40))
    stuffed = "buy cheap pills " * 30
    half = ("alpha beta gamma delta " * 3) + " ".join(
        f"tail{i}" for i in range(30)
    )
    docs = spark.createDataFrame(
        [(1, clean), (2, stuffed), (3, half), (4, ""), (5, "one")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    # stuffed doc: one trigram covers nearly everything
    assert rows[2]["top3_gram_char_frac"] > 0.8
    assert rows[2]["dup5_gram_char_frac"] > 0.8
    # clean doc: no repeated structure
    assert rows[1]["top2_gram_char_frac"] < 0.15
    assert rows[1]["dup5_gram_char_frac"] == 0.0
    # partial repetition lands between
    assert 0.1 < rows[3]["top4_gram_char_frac"] < 0.9
    # degenerate docs: all-zero rows, never NULL or error
    for d in (4, 5):
        for c in rows[d].asDict():
            if c.endswith("_frac"):
                assert rows[d][c] == 0.0
    # fractions are capped at 1.0 even though overlapping occurrences
    # are counted independently
    assert all(
        v <= 1.0
        for r in rows.values()
        for k, v in r.asDict().items()
        if k.endswith("_frac")
    )


def test_top_gram_selected_by_count_not_mass(spark):
    """Advisor fix (round 5, low): the Gopher top-n-gram signal must
    score the MOST FREQUENT gram's coverage. A long bigram occurring
    twice must not out-rank a short bigram occurring many times."""
    from regpulse_lakehouse_spark.operators.profile import repetition_stats

    # 'aa bb' occurs 10x (mass 10*6=60); the long gram occurs 2x
    # (mass 2*48=96) — by-mass selection would report the long one
    text = ("aa bb " * 10) + ("extraordinarily unconstitutionally " * 2)
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = repetition_stats(docs, top_ngram_sizes=(2,), dup_ngram_sizes=()).collect()[0]
    chars = len(text)
    expected = 10 * (len("aa bb") + 1) / chars
    assert abs(row["top2_gram_char_frac"] - expected) < 1e-3  # op rounds to 4dp
    # sanity: the by-mass (wrong) value would have been larger
    assert row["top2_gram_char_frac"] < 2 * (len("extraordinarily unconstitutionally") + 1) / chars


def test_repetition_stats_deterministic_and_complete(spark, sf_dir):
    from regpulse_lakehouse_spark.operators.profile import repetition_stats
    from regpulse_lakehouse_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    a = sorted(tuple(r) for r in repetition_stats(docs).collect())
    b = sorted(tuple(r) for r in repetition_stats(docs.repartition(7)).collect())
    assert a == b
    assert len(a) == docs.count()  # one row per doc, nothing dropped
