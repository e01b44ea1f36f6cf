"""End-to-end corpus preparation (pipelines/corpus.py) on the synthetic
documents table: monotone stage attrition, dedup/decontam behavior on
planted rows, split+pack integrity of the final corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus
from regpulse_lakehouse_spark.sources.tpch import load_table


@pytest.fixture(scope="module")
def result(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    # plant: an exact duplicate of doc 0 and an eval doc overlapping doc 1
    d0, d1 = [r["text"] for r in docs.filter("doc_id IN (0, 1)").orderBy("doc_id").collect()]
    extra = spark.createDataFrame([(900001, d0)], "doc_id long, text string")
    corpus = docs.select("doc_id", "text").unionByName(extra)
    evals = spark.createDataFrame(
        [(1, " ".join(d1.split()[:40]))], "doc_id long, text string"
    )
    return prepare_corpus(
        corpus,
        evals,
        near_dup_threshold=0.5,
        decontam_k=13,
        split_weights={"train": 9, "val": 1},
        pack_budget=512,
    )


def test_stage_attrition_is_monotone(result):
    audit = result.audit()
    assert audit["input"] >= audit["quality"] >= audit["exact_dedup"]
    assert audit["exact_dedup"] >= audit["near_dedup"] >= audit["decontaminated"]
    assert audit["quality"] > 0


def test_planted_rows_removed(result, spark, sf_dir):
    ids = {r["doc_id"] for r in result.stages["decontaminated"].select("doc_id").collect()}
    # the planted exact dup (higher id) lost to doc 0...
    assert 900001 not in ids
    # ...and the eval-overlapping doc 1 was decontaminated away (if it
    # survived quality+dedup, the 40-token overlap must kill it)
    assert 1 not in ids


def test_audit_materializes_each_boundary_once(spark):
    """audit() must not re-execute the pipeline prefix per stage: an
    accumulator on the input frame counts how many times input rows are
    actually evaluated across all six counts — with the persist-then-
    count-in-order scheme that is ONE materialization (plus the eager
    near-dup closure during prepare_corpus, measured out via a
    baseline delta)."""
    from pyspark.sql.types import StringType

    acc = spark.sparkContext.accumulator(0)

    def tick(s):
        acc.add(1)
        return s

    tick_udf = F.udf(tick, StringType())
    n = 40
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox document with plainly sufficient words "
                  "and varied content number "),
            F.col("id").cast("string"),
            F.lit(" padding " * 30),
        ).alias("text"),
    )
    docs = base.withColumn("text", tick_udf(F.col("text")))
    result = prepare_corpus(docs, None, near_dup_threshold=0.9, pack_budget=512)
    evals_before = acc.value  # the eager near-dup closure's evaluations
    audit = result.audit()
    audit_evals = acc.value - evals_before
    assert audit["input"] == n
    # one materialization of the input boundary during audit; allow the
    # packed stage's Arrow round-trip but NOT per-stage prefix re-runs
    # (naive audit would be ≥ 5n here)
    assert audit_evals <= n, f"audit re-evaluated input rows {audit_evals}/{n}"


def test_packed_output_integrity(result):
    rows = result.packed.collect()
    clean_n = result.stages["split"].count()
    assert len(rows) == clean_n
    assert {r["split"] for r in rows} <= {"train", "val"}
    sums: dict[int, list] = {}
    for r in rows:
        s = sums.setdefault(r["pack_id"], [0, 0])
        s[0] += r["_n_tokens"]
        s[1] += 1
    for total, count in sums.values():
        assert total <= 512 or count == 1


def test_lm_gate_and_shuffle_stages(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # plant an in-length-band gibberish doc the heuristics pass but the
    # LM gate should kill (random rare "words", enough of them to clear
    # the Gopher min-word floor)
    gib = " ".join(f"zq{i}vx wibblefrum plork{i}" for i in range(30))
    corpus = docs.unionByName(
        spark.createDataFrame([(900002, gib)], "doc_id long, text string")
    )
    # floors sit between the populations: real docs bottom out at ≈-3.5
    # mean_logp on this corpus, the planted gibberish scores ≈-7.3
    res = prepare_corpus(
        corpus, lm_floor=-5.0, shuffle_seed="epoch0", pack_budget=512
    )
    assert "lm_gate" in res.stages and "shuffled" in res.stages
    gate_ids = {r["doc_id"] for r in res.stages["lm_gate"].select("doc_id").collect()}
    assert 900002 not in gate_ids          # gibberish gated out
    assert len(gate_ids) > 0               # real docs survive
    # the scatter is a permutation of the packed rows, deterministic
    a = [r["doc_id"] for r in res.packed.collect()]
    b = [r["doc_id"] for r in res.stages["shuffled"].collect()]
    assert sorted(a) == sorted(b) and len(a) == len(b)


def test_provenance_names_first_dropping_stage(result, spark, sf_dir):
    prov = {r["doc_id"]: r["dropped_at"] for r in result.provenance().collect()}
    # the planted exact duplicate shares doc 0's text, so it must share
    # doc 0's fate exactly: die wherever doc 0 dies (quality, if doc 0
    # fails the gate) or at exact dedup (if doc 0 survives, the copy
    # loses the lowest-id tiebreak)
    if prov.get(0) == "quality":
        assert prov.get(900001) == "quality"
    else:
        assert prov.get(900001) == "exact_dedup"
    # the eval-overlapping doc 1 is gone, at its first dropping stage
    assert prov.get(1) in ("quality", "decontaminated")
    # survivors never appear
    survivors = {
        r["doc_id"] for r in result.stages["decontaminated"].select("doc_id").collect()
    }
    assert not (set(prov) & survivors)
    # accounting closes: input = survivors + dropped
    n_input = result.stages["input"].count()
    assert n_input == len(survivors) + len(prov)


def test_repetition_gate_drops_stuffed_docs(spark):
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    # positionally-unique words: no 4/5-gram ever repeats
    clean_body = " ".join(
        f"alpha{i} beta{i * 7 % 97} gamma{i * 13 % 89}" for i in range(60)
    )
    stuffed_body = "buy cheap pills now " * 60
    docs = spark.createDataFrame(
        [(1, clean_body), (2, stuffed_body), (3, clean_body + " tail marker")],
        "doc_id long, text string",
    )
    gated = prepare_corpus(
        docs,
        repetition_caps={"top4_gram_char_frac": 0.3, "dup5_gram_char_frac": 0.3},
    )
    kept = {r["doc_id"] for r in gated.stages["repetition_gate"].select("doc_id").collect()}
    assert 2 not in kept and 1 in kept and 3 in kept
    # provenance: the stuffed doc's first dropping stage is the gate
    prov = {r["doc_id"]: r["dropped_at"] for r in gated.provenance().collect()}
    assert prov.get(2) == "repetition_gate"


def test_repetition_caps_multi_digit_and_bad_keys(spark):
    """Advisor fix (round 5, low): int(k[3]) only parsed single-digit
    'top' sizes — top10_gram_char_frac silently trained n=1 stats and
    then failed with an unresolved-column error at the filter."""
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    stuffed = "one two three four five six seven eight nine ten eleven " * 30
    clean = " ".join(
        f"alpha{i} beta{i * 7 % 97} gamma{i * 13 % 89}" for i in range(60)
    )
    docs = spark.createDataFrame(
        [(1, clean), (2, stuffed)], "doc_id long, text string"
    )
    gated = prepare_corpus(docs, repetition_caps={"top10_gram_char_frac": 0.3})
    kept = {r["doc_id"] for r in gated.stages["repetition_gate"].select("doc_id").collect()}
    assert 2 not in kept and 1 in kept
    with pytest.raises(ValueError, match="unrecognized repetition_caps"):
        prepare_corpus(docs, repetition_caps={"topgram_frac": 0.3})


def test_repetition_gate_absent_is_noop(spark):
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    docs = spark.createDataFrame(
        [(i, f"document body {i} with plain words all around {i}") for i in range(20)],
        "doc_id long, text string",
    )
    r = prepare_corpus(docs)
    assert "repetition_gate" not in r.stages


def test_line_dedup_stage_cleans_before_quality(spark):
    """line_dup_max_df wires CCNet/RefinedWeb boilerplate removal in
    FRONT of the quality gate: the banner vanishes from surviving text
    and quality judges the cleaned residue."""
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    banner = "accept all cookies to continue viewing this website today"
    body = " ".join(
        f"substantive{i} regulatory wording{i * 3 % 7} with obligations{i}"
        for i in range(40)
    )
    docs = spark.createDataFrame(
        [(i, f"{banner}\n{body} tail{i}") for i in range(1, 5)],
        "doc_id long, text string",
    )
    r = prepare_corpus(docs, line_dup_max_df=2)
    assert "line_dedup" in r.stages
    assert r.stages["line_dedup"].count() == 4  # rewrites, never drops
    texts = [x["text"] for x in r.stages["quality"].collect()]
    assert texts and all(banner not in t for t in texts)
    assert all("substantive1 " in t for t in texts)


def test_span_dedup_stage_strips_cross_doc_boilerplate(spark):
    """span_dedup_k wires exact duplicated-span removal (operators/
    spans.py) in front of the quality gate: a license block embedded
    mid-text (no newline structure, so line_dedup can't see it)
    vanishes from every carrier; distinct body text survives."""
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    license_blk = (
        "this work is licensed under the creative commons "
        "attribution share alike international license terms"
    )
    docs = spark.createDataFrame(
        [
            (
                i,
                " ".join(
                    f"substantive{i} regulatory wording{j} obligations{i * j % 11}"
                    for j in range(30)
                )
                + f" {license_blk} closing{i}",
            )
            for i in range(1, 5)
        ],
        "doc_id long, text string",
    )
    r = prepare_corpus(docs, span_dedup_k=6, span_dedup_min_docs=2)
    assert "span_dedup" in r.stages
    assert r.stages["span_dedup"].count() == 4  # rewrites, never drops
    texts = [x["text"] for x in r.stages["span_dedup"].collect()]
    assert all("licensed" not in t for t in texts)
    # per-doc body text (distinct across docs) survives
    assert all("regulatory" in t for t in texts)


def test_group_cap_stage_trims_dominant_source(spark):
    """group_cap wires per-source frequency capping after exact dedup:
    the mega-source trims to the cap, small sources pass untouched, and
    byte-identical copies collapse BEFORE cap accounting."""
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    body = " ".join(f"regulatory wording{j} with obligations{j % 7} here" for j in range(25))
    rows = [(i, f"doc{i} {body} unique{i}", "mega") for i in range(40)]
    rows += [(100 + i, f"small{i} {body} tail{i}", f"s{i}") for i in range(5)]
    # exact duplicates inside mega: same text as doc 0, higher ids
    rows += [(200 + i, f"doc0 {body} unique0", "mega") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    r = prepare_corpus(docs, group_cap=8, group_cap_cols=["source"])
    assert "group_cap" in r.stages
    per_src = {
        x["source"]: x["count"]
        for x in r.stages["group_cap"].groupBy("source").count().collect()
    }
    assert per_src["mega"] == 8
    assert all(v == 1 for s, v in per_src.items() if s != "mega")
    with pytest.raises(ValueError, match="group_cap_cols"):
        prepare_corpus(docs, group_cap=8)


def test_lang_gate_filters_by_language(spark):
    """lang_allow wires the marker-lexicon language filter as the first
    dropping stage; 'und' must be listed explicitly to keep docs with
    no marker hits."""
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    en = "the quick review of the filings is complete and the board is informed " * 5
    de = "der bericht und die akte ist da und das gremium ist informiert heute " * 5
    und = "zzz111 qqq222 www333 " * 20
    docs = spark.createDataFrame(
        [(1, en), (2, de), (3, und)], "doc_id long, text string"
    )
    r = prepare_corpus(docs, lang_allow=["en"])
    kept = {x["doc_id"] for x in r.stages["lang_gate"].collect()}
    assert kept == {1}
    r2 = prepare_corpus(docs, lang_allow=["en", "de", "und"])
    kept2 = {x["doc_id"] for x in r2.stages["lang_gate"].collect()}
    assert kept2 == {1, 2, 3}


def test_exact_dedup_normalized_collapses_formatting_variants(spark):
    from regpulse_lakehouse_spark.pipelines.corpus import prepare_corpus

    base = (
        "the data pipeline merges batch tables quickly and correctly "
        "because the merge planner reorders join stages and prunes "
        "partitions before the shuffle while keeping the output sorted "
        "for downstream readers that expect clustered files on disk "
    ) * 2
    texts = {
        1: base + "release v2.31",
        2: base.upper().lower().replace("the data", "The DATA") + "release V9.04!!",
        3: (
            "an entirely different document about stream processing with "
            "watermarks and stateful operators for late arriving data "
            "where sessions close after a gap and the state store keeps "
            "per key aggregates bounded by the retention horizon chosen "
        ) * 2 + "for the workload",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    raw = prepare_corpus(df, near_dup_threshold=0.99)
    norm = prepare_corpus(df, near_dup_threshold=0.99, exact_dedup_normalized=True)
    raw_ids = {r["doc_id"] for r in raw.stages["exact_dedup"].collect()}
    norm_ids = {r["doc_id"] for r in norm.stages["exact_dedup"].collect()}
    assert raw_ids == {1, 2, 3}  # byte-distinct → raw hash keeps all
    assert norm_ids == {1, 3}  # normalized hash collapses 1/2, keeps min id
    # survivor keeps its RAW text, not the normalized form
    kept = {r["doc_id"]: r["text"] for r in norm.stages["exact_dedup"].collect()}
    assert kept[1] == texts[1]
