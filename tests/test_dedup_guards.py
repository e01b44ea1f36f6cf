"""Guard-rail tests for the dedup operators: banding parameter
validation and the stop-shingle document-frequency cap (the bound that
keeps the exact-Jaccard self-join linear at corpus scale)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import dedup as DD


@pytest.fixture(scope="module")
def docs(spark):
    # Every doc shares the boilerplate prefix "common legal disclaimer
    # text"; docs 1/2 share a real 4-token tail, doc 3 is unrelated.
    rows = [
        (1, "common legal disclaimer text alpha beta gamma delta"),
        (2, "common legal disclaimer text alpha beta gamma epsilon"),
        (3, "common legal disclaimer text zeta eta theta iota"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_bands_must_divide_hashes(docs):
    with pytest.raises(ValueError, match="divide evenly"):
        DD.minhash_near_dup_pairs(docs, num_hashes=10, num_bands=4)


def test_lsh_banding_cannot_overrun_signature(docs):
    sigs = DD.minhash_signatures(docs, num_hashes=8)
    with pytest.raises(ValueError, match="only 8"):
        DD.lsh_candidate_pairs(sigs, num_bands=4, rows_per_band=4, num_hashes=8)
    # in-bounds passes validation
    DD.lsh_candidate_pairs(sigs, num_bands=2, rows_per_band=4, num_hashes=8)


def test_stop_shingle_cap_drops_ubiquitous_shingles(docs):
    # Unguarded: boilerplate shingles put every pair above 0; pair (1,3)
    # exists purely through boilerplate.
    raw = {
        (r.a, r.b): r.jaccard
        for r in DD.ngram_jaccard_pairs(
            docs, threshold=0.0, max_shingle_df=None
        ).collect()
    }
    assert (1, 3) in raw
    # Capped at df<=2: the two shingles shared by all 3 docs drop; (1,3)
    # shares nothing else, while (1,2) still shares its three df-2
    # shingles. Sizes are computed over the retained set: 4 shingles per
    # doc, 3 shared -> jaccard 3/(4+4-3) = 0.6.
    capped = {
        (r.a, r.b): r.jaccard
        for r in DD.ngram_jaccard_pairs(
            docs, threshold=0.0, max_shingle_df=2
        ).collect()
    }
    assert (1, 3) not in capped
    assert capped[(1, 2)] == pytest.approx(0.6)


def test_cap_is_noop_when_no_shingle_is_hot(docs):
    pairs_none = {
        (r.a, r.b): r.jaccard
        for r in DD.ngram_jaccard_pairs(
            docs, threshold=0.0, max_shingle_df=None
        ).collect()
    }
    pairs_high = {
        (r.a, r.b): r.jaccard
        for r in DD.ngram_jaccard_pairs(
            docs, threshold=0.0, max_shingle_df=1000
        ).collect()
    }
    assert pairs_none == pairs_high


def test_winnow_near_dup_recall_vs_exact(spark, sf_dir):
    """Winnowed-fingerprint Jaccard must recover the near-identical
    pairs exact n-gram Jaccard finds at high similarity: winnowing
    samples grams, so scores are noisier, but any pair sharing long
    substrings shares fingerprints (guarantee: every common substring
    of ≥ k+w-1 chars contributes ≥ 1 common fingerprint)."""
    from regpulse_lakehouse_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["a"], r["b"])
        for r in DD.ngram_jaccard_pairs(
            docs, "text", "doc_id", shingle_k=3, threshold=0.8
        ).collect()
    }
    winnow = {
        (r["a"], r["b"])
        for r in DD.winnow_near_dup_pairs(
            docs, "text", "doc_id", k=5, w=4, threshold=0.5
        ).collect()
    }
    assert exact, "fixture corpus must contain high-similarity pairs"
    recall = len(exact & winnow) / len(exact)
    assert recall >= 0.9, (recall, len(exact), len(winnow))


def test_winnow_near_dup_self_consistency(spark):
    """Duplicated text → jaccard 1.0 over fingerprint sets."""
    base = "regulatory compliance obligations for automated driving systems " * 4
    rows = [(1, base), (2, base), (3, "totally different content about batteries")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r["a"], r["b"]): r["jaccard"] for r in
           DD.winnow_near_dup_pairs(df, threshold=0.2).collect()}
    assert got.get((1, 2)) == 1.0
    assert (1, 3) not in got and (2, 3) not in got
