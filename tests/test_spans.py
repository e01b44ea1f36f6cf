"""Duplicated-span detection and stripping: spans vs an independent
brute-force window scan, cross-doc gating, merge semantics, strip
accounting, and plan quality (no Python stage)."""

from __future__ import annotations

import pytest

from regpulse_lakehouse_spark.operators import spans as S

LICENSE = "this text is provided under the creative commons attribution license terms"
DOCS = [
    ("d1", f"alpha beta gamma {LICENSE} delta epsilon"),
    ("d2", f"{LICENSE} completely different body content here"),
    ("d3", "no shared content in this document at all whatsoever today"),
    ("d4", f"closing words then {LICENSE}"),
    # within-doc repeat (chorus), no cross-doc sharing
    ("d5", "la la chorus line one two three four five six seven eight "
           "chorus line one two three four five six seven eight done"),
]


def brute_spans(docs: list[tuple[str, str]], k: int, min_count: int, min_docs: int):
    toks = {i: t.lower().split() for i, t in docs}
    grams: dict[tuple, list[tuple[str, int]]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            grams.setdefault(tuple(ts[p : p + k]), []).append((i, p))
    dup = {
        g
        for g, occ in grams.items()
        if len(occ) >= min_count and len({i for i, _ in occ}) >= min_docs
    }
    out = []
    for i, ts in toks.items():
        hitpos = sorted(p for p in range(len(ts) - k + 1) if tuple(ts[p : p + k]) in dup)
        start = end = None
        for p in hitpos:
            if start is None:
                start, end = p, p + k
            elif p <= end:  # overlapping or adjacent-within window
                end = p + k
            else:
                out.append((i, start, end))
                start, end = p, p + k
        if start is not None:
            out.append((i, start, end))
    return set(out)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


@pytest.mark.parametrize("k,min_docs", [(4, 1), (4, 2), (6, 1)])
def test_spans_match_brute_force(docs_df, k, min_docs):
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in S.duplicated_spans(docs_df, k=k, min_count=2, min_docs=min_docs).collect()
    }
    assert got == brute_spans(DOCS, k=k, min_count=2, min_docs=min_docs)


def test_cross_doc_gate_drops_within_doc_chorus(docs_df):
    any_rep = S.duplicated_spans(docs_df, k=5, min_docs=1)
    cross = S.duplicated_spans(docs_df, k=5, min_docs=2)
    assert any_rep.filter("doc_id = 'd5'").count() > 0
    assert cross.filter("doc_id = 'd5'").count() == 0
    # the license block still reports in all three carriers
    assert {r["doc_id"] for r in cross.collect()} == {"d1", "d2", "d4"}


def test_span_covers_full_license_block(docs_df):
    lic_len = len(LICENSE.split())
    rows = S.duplicated_spans(docs_df, k=6, min_docs=2).filter("doc_id = 'd2'").collect()
    assert len(rows) == 1
    # d2 starts with the license: span must begin at 0 and cover ≥ its length
    assert rows[0]["span_start"] == 0
    assert rows[0]["n_tokens"] >= lic_len


def test_strip_removes_spans_and_accounts(docs_df):
    out = {r["doc_id"]: r for r in S.strip_duplicated_spans(docs_df, k=6, min_docs=2).collect()}
    assert len(out) == len(DOCS)
    # untouched doc: text preserved (lowercased tokens re-joined), zero removed
    assert out["d3"]["n_tokens_removed"] == 0
    assert out["d3"]["text"] == DOCS[2][1]
    # carriers: license tokens gone
    for d in ("d1", "d2", "d4"):
        assert "license" not in out[d]["text"]
        assert out[d]["n_tokens_removed"] >= len(LICENSE.split())
    # removed + kept == original token count
    for did, orig in DOCS:
        kept = len(out[did]["text"].split())
        assert kept + out[did]["n_tokens_removed"] == len(orig.split())


def test_strip_reuses_precomputed_spans(docs_df):
    sp = S.duplicated_spans(docs_df, k=6, min_docs=2)
    a = S.strip_duplicated_spans(docs_df, k=6, min_docs=2).orderBy("doc_id").collect()
    b = S.strip_duplicated_spans(docs_df, spans=sp).orderBy("doc_id").collect()
    assert a == b


def test_short_docs_and_no_duplicates(spark):
    df = spark.createDataFrame(
        [("a", "one two"), ("b", "three four five"), ("c", "")],
        "doc_id string, text string",
    )
    assert S.duplicated_spans(df, k=4).count() == 0
    out = {r["doc_id"]: r for r in S.strip_duplicated_spans(df, k=4).collect()}
    assert all(r["n_tokens_removed"] == 0 for r in out.values())


def test_plan_is_pure_jvm(spark, docs_df):
    for df in (
        S.duplicated_spans(docs_df, k=4),
        S.strip_duplicated_spans(docs_df, k=4),
    ):
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert marker not in plan


def test_strip_preserves_span_free_docs_verbatim(spark):
    """Review fix: docs WITHOUT duplicated spans must keep their text
    byte-for-byte (case, newlines, spacing) — the token-normalized
    rewrite only touches carriers, so line-based quality signals and
    exact dedup downstream see untouched docs unchanged."""
    shared = "this exact license block is repeated across both carrier documents"
    pristine = "Unique Body\nWith Newlines\n  And   Spacing preserved Exactly"
    df = spark.createDataFrame(
        [("c1", f"intro {shared} tail one"), ("c2", f"{shared} other ending"),
         ("p1", pristine)],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in S.strip_duplicated_spans(df, k=5, min_docs=2).collect()}
    assert out["p1"]["text"] == pristine          # byte-identical
    assert out["p1"]["n_tokens_removed"] == 0
    assert "license" not in out["c1"]["text"] and "license" not in out["c2"]["text"]


def test_control_char_tokens_do_not_collide(spark):
    """Review fix: the window separator is ' ' (which no token can
    contain) — a \\x1f inside a token must not let distinct windows
    hash equal and strip legitimate unique text."""
    df = spark.createDataFrame(
        [("a", "pre a\x1fb c tail one two three"),
         ("b", "other a b\x1fc ending four five six")],
        "doc_id string, text string",
    )
    assert S.duplicated_spans(df, k=2, min_docs=2).count() == 0


def test_keep_first_retains_one_occurrence(spark):
    """keep='first': the globally-first carrier (min id, then offset)
    keeps the span; every other occurrence is stripped."""
    shared = "this exact license block is repeated across three carrier documents"
    df = spark.createDataFrame(
        [("a1", f"intro {shared} tail one two"),
         ("b2", f"{shared} middle content words here"),
         ("c3", f"ending text then {shared}")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in
           S.strip_duplicated_spans(df, k=5, min_docs=2, keep="first").collect()}
    assert "license" in out["a1"]["text"]          # canonical keeper
    assert out["a1"]["n_tokens_removed"] == 0
    for d in ("b2", "c3"):
        assert "license" not in out[d]["text"], d
        assert out[d]["n_tokens_removed"] >= len(shared.split())
    # keep='none' strips the keeper too
    none = {r["doc_id"]: r for r in
            S.strip_duplicated_spans(df, k=5, min_docs=2, keep="none").collect()}
    assert "license" not in none["a1"]["text"]
    with pytest.raises(ValueError, match="keep"):
        S.strip_duplicated_spans(df, k=5, keep="bogus")


def test_keep_first_within_doc_chorus(spark):
    """A within-doc repeat under keep='first' keeps its first
    occurrence in the SAME doc and strips the later one."""
    chorus = "chorus line one two three four five six"
    df = spark.createDataFrame(
        [("x", f"{chorus} verse words here then {chorus} done"),
         ("y", "completely different unrelated body content")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in
           S.strip_duplicated_spans(df, k=4, min_docs=1, keep="first").collect()}
    assert out["x"]["text"].count("chorus") == 1
    assert out["x"]["n_tokens_removed"] >= len(chorus.split()) - 1
