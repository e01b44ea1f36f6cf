"""Text-analysis queries over the documents corpus (BASELINE.json
north-star: language-ID, quality scoring, token counting, document
fingerprinting as first-class engine operators).

All implementations are JVM-side column expressions
(functions/text.py); the oracles re-derive the same values in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators.bpe import (
    bpe_frozen_columns,
    bpe_frozen_oracle_ok,
    bpe_frozen_oracle_stream,
    bpe_frozen_oracle_stream_stats,
    bpe_stream_stats,
)
from ..sources.tpch import load_table
from . import register

# DuckDB token list (empty-token-filtered) — shared oracle fragment.
_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), t -> t != '')"
_TOKS_LOWER = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t != '')"


def _marker_count_sql(markers: tuple[str, ...]) -> str:
    inlist = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_TOKS_LOWER}, t -> t IN ({inlist})))"


_BPE_STATS = bpe_frozen_oracle_stream_stats("bpe_stream")


@register(
    "tx_token_quality_bpe",
    oracle=f"""
    WITH bpe AS (
      SELECT doc_id, text, {bpe_frozen_oracle_stream("text")} AS bpe_stream
      FROM documents
    )
    SELECT doc_id,
           CAST(len({_TOKS}) AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT)
             AS n_bpe_ish,
           {_BPE_STATS["n_bpe_tokens"]} AS n_bpe_tokens,
           {_BPE_STATS["bpe_md5"]} AS bpe_md5,
           {bpe_frozen_oracle_ok("text")} AS bpe_expr_ok,
           ROUND(CASE WHEN len({_TOKS}) > 0
                 THEN CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})
                 ELSE 0.0 END, 4) AS distinct_ratio,
           ROUND(
             0.4 * (CASE WHEN length(text) BETWEEN 200 AND 4000 THEN 1.0
                         WHEN length(text) > 0 THEN 0.5 ELSE 0.0 END)
           + 0.3 * (CASE WHEN len({_TOKS}) > 0
                    THEN CAST(len(list_distinct({_TOKS})) AS DOUBLE) / len({_TOKS})
                    ELSE 0.0 END)
           + 0.3 * (CASE WHEN length(text) > 0
                    THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
                         / length(text)
                    ELSE 0.0 END)
           , 4) AS quality
    FROM bpe
    """,
)
def tx_token_quality_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokens + BPE-ish regex chunks + REAL
    frozen-vocabulary BPE subword counts + lexical diversity) and quality
    scoring (length band + lexical diversity + alpha ratio blended to
    [0,1]) — all per-document projections in one columnar pass.

    The BPE leg is the frozen-merges expression twin
    (operators/bpe.py::bpe_frozen_columns — same trick as
    tx_lm_clf_scores' frozen classifier): encoding under
    FROZEN_BPE_MERGES is a deterministic string rewrite, so ``bpe_md5``
    hashes the ENTIRE per-doc token stream and the DuckDB oracle
    re-derives it with the identical replace chain (named once in a CTE,
    mirroring the two-level projection here — see bpe_stream_stats'
    performance note). Equivalence with the distributed Arrow encoder
    (bpe_encode_udf) is pinned in tests/test_bpe.py. Renamed from
    tx_token_quality_stats when this leg was added (REDEFINE =>
    RENAME)."""
    docs = load_table(spark, sf_dir, "documents")
    bpe_cols = bpe_frozen_columns(F.col("text"))
    # project the rewrite chain ONCE; deriving count+md5 from the alias
    # is 4x faster cold and warm than inlining the chain per output
    staged = docs.select(
        "doc_id", "text", bpe_cols["_bpe_stream"].alias("_bpe_stream")
    )
    stats = bpe_stream_stats(F.col("_bpe_stream"))
    return staged.select(
        "doc_id",
        TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
        TX.bpe_ish_token_count(F.col("text")).cast("long").alias("n_bpe_ish"),
        stats["n_bpe_tokens"].alias("n_bpe_tokens"),
        stats["bpe_md5"].alias("bpe_md5"),
        bpe_cols["bpe_expr_ok"].alias("bpe_expr_ok"),
        F.round(TX.distinct_token_ratio(F.col("text")), 4).alias("distinct_ratio"),
        TX.quality_score(F.col("text")).alias("quality"),
    )


@register(
    "tx_lang_fingerprint",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, text, lang AS labeled_lang,
             {_marker_count_sql(TX.LANG_MARKERS["en"])} AS s_en,
             {_marker_count_sql(TX.LANG_MARKERS["de"])} AS s_de,
             {_marker_count_sql(TX.LANG_MARKERS["fr"])} AS s_fr,
             {_marker_count_sql(TX.LANG_MARKERS["es"])} AS s_es
      FROM documents
    ),
    winnowed AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(len(lower(COALESCE(text, ''))) - 4, 1) + 1),
               i -> (('0x' || substr(md5(substr(lower(COALESCE(text, '')), CAST(i AS INT), 5)), 1, 8))::BIGINT)
             ) AS hs
      FROM documents
    ),
    winnow AS (
      SELECT doc_id,
             list_transform(
               range(1, greatest(len(hs) - 3, 1) + 1),
               j -> list_min(list_slice(hs, CAST(j AS INT), least(CAST(j AS INT) + 3, len(hs))))
             ) AS sel
      FROM winnowed
    )
    SELECT s.doc_id, labeled_lang,
           CASE WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 THEN 'und'
                WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                WHEN s_fr >= s_es THEN 'fr'
                ELSE 'es' END AS detected_lang,
           md5(text) AS fingerprint,
           md5(CAST(s.doc_id AS VARCHAR) || '|' || source) AS key_fingerprint,
           CAST(len(list_distinct(w.sel)) AS BIGINT) AS n_winnow_fp,
           CAST(list_min(w.sel) AS BIGINT) AS winnow_min
    FROM scored s JOIN winnow w ON s.doc_id = w.doc_id
    """,
)
def tx_lang_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID n-gram/stopword heuristic (per-language marker hit
    counts → argmax with declaration-order tie-break) + document
    fingerprinting, one per-document projection. Two fingerprint
    families: whole-content + composite-key md5 (V7 analog,
    scan.ts:485-492: hash of url|title → here doc_id|source), and
    rolling-hash winnowing (functions/text.winnow_fingerprints, k=5
    char-grams, w=4 windows — position-robust, the
    training-pipeline fingerprint md5 can't provide), surfaced as the
    distinct-fingerprint count + min so driver-checked columns stay
    atomic."""
    from ..functions.hashing import content_fingerprint

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_lt", F.lower(F.coalesce(F.col("text"), F.lit("")))
    )
    winnowed = TX.winnow_fingerprints(F.col("_lt"), k=5, w=4)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        TX.lang_id(F.col("text")).alias("detected_lang"),
        F.md5("text").alias("fingerprint"),
        content_fingerprint(F.col("doc_id").cast("string"), F.col("source")).alias(
            "key_fingerprint"
        ),
        F.size(F.array_distinct(winnowed)).cast("long").alias("n_winnow_fp"),
        F.array_min(winnowed).cast("long").alias("winnow_min"),
    )


_DECONTAM_K = 4  # see tx_decontam_overlap docstring for the choice


@register(
    "tx_decontam_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_LOWER} AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, unnest(list_distinct(
        CASE WHEN len(t) >= {_DECONTAM_K}
               THEN list_transform(generate_series(1, len(t) - {_DECONTAM_K - 1}),
                                   i -> array_to_string(t[i:i + {_DECONTAM_K - 1}], ' '))
             WHEN len(t) > 0 THEN [array_to_string(t, ' ')]
             ELSE [] END)) AS g
      FROM toks
    ),
    tg AS (SELECT doc_id, g FROM grams WHERE doc_id % 20 != 7),
    eg AS (SELECT doc_id AS benchmark_id, g FROM grams WHERE doc_id % 20 = 7)
    SELECT tg.doc_id, eg.benchmark_id,
           CAST(COUNT(DISTINCT g) AS BIGINT) AS n_gram_hits
    FROM tg JOIN eg USING (g)
    GROUP BY tg.doc_id, eg.benchmark_id
    """,
)
def tx_decontam_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination (operators/decontam.py) — the most
    load-bearing hygiene pass a training-data pipeline runs (GPT-3
    App. C / Llama 2 App. A.6): flag training documents sharing k-token
    n-grams with a benchmark set. The benchmark here is the
    deterministic doc_id % 20 == 7 slice of the corpus (≈5%, standing in
    for a few-MB eval suite); the remaining 95% is the train side.

    Plan (contamination_pairs): distinct k-gram shingles per doc hashed
    to xxhash64 longs, the tiny eval gram set BROADCAST, one map-side
    equi-join over the train scan grouped on the (train, benchmark) pair
    — zero shuffles of train-corpus data, the shape that holds at 100 TB
    (benchmarks stay a few MB no matter the corpus). The oracle joins
    the gram STRINGS directly, so the row also cross-checks that the
    hash-join loses nothing (a 64-bit collision would surface as a
    count mismatch).

    k=4 (not the production 8-13 default) because the synthetic corpus
    averages ~54 tokens/doc with near-dup clusters sharing short spans —
    k=4 yields a meaningful contaminated-pair set (44 pairs at sf0.01)
    where k=8 leaves only 4; the operator's default stays k=13."""
    from ..operators.decontam import contamination_pairs

    docs = load_table(spark, sf_dir, "documents")
    evals = docs.filter(F.col("doc_id") % 20 == 7)
    train = docs.filter(F.col("doc_id") % 20 != 7)
    pairs = contamination_pairs(train, evals, k=_DECONTAM_K)
    return pairs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("benchmark_id").cast("long").alias("benchmark_id"),
        F.col("n_gram_hits"),
    )


def _clf_oracle_terms() -> tuple[str, str]:
    """DuckDB twins of the frozen-classifier dot product and the
    matched-occurrence count, generated FROM the frozen literals in
    sorted-term order — the exact order the Spark scorer sums in, so
    both engines run the identical float addition chain."""
    from ..operators.quality_clf import FROZEN_BIAS, FROZEN_TERM_WEIGHTS

    dot = f"({FROZEN_BIAS!r})" + "".join(
        f"\n             + ({w!r}) * len(list_filter(toks, t -> t = '{term}'))"
        for term, w in sorted(FROZEN_TERM_WEIGHTS.items())
    )
    inlist = ", ".join(f"'{t}'" for t in sorted(FROZEN_TERM_WEIGHTS))
    hits = f"len(list_filter(toks, t -> t IN ({inlist})))"
    return dot, hits


_CLF_DOT_SQL, _CLF_HITS_SQL = _clf_oracle_terms()


@register(
    "tx_lm_clf_scores",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS_LOWER}) AS token FROM documents
    ),
    counts AS (
      SELECT token, COUNT(*) AS n FROM tok GROUP BY token
      HAVING COUNT(*) >= 2
    ),
    tot AS (
      SELECT CAST(SUM(n) + COUNT(*) + 1 AS DOUBLE) AS denom FROM counts
    ),
    model AS (
      SELECT token, ln((n + 1) / tot.denom) AS logp FROM counts CROSS JOIN tot
    ),
    oov AS (SELECT MIN(logp) - ln(2.0) AS o FROM model),
    scored AS (
      SELECT t.doc_id, COALESCE(m.logp, oov.o) AS lp,
             (m.logp IS NULL)::INT AS is_oov
      FROM tok t LEFT JOIN model m USING (token) CROSS JOIN oov
    ),
    qdot AS (
      SELECT doc_id,
             {_CLF_DOT_SQL} AS dot,
             {_CLF_HITS_SQL} AS hits
      FROM (SELECT doc_id, {_TOKS_LOWER} AS toks FROM documents)
    )
    SELECT 'lm' AS kind, doc_id, ROUND(AVG(lp), 6) AS score,
           COUNT(*) AS detail1,
           CAST(SUM(is_oov) AS BIGINT) AS detail2
    FROM scored GROUP BY doc_id
    UNION ALL
    SELECT 'clf', doc_id, ROUND(1.0 / (1.0 + exp(-dot)), 6),
           CAST(ROUND(1.0 / (1.0 + exp(-dot)), 6) >= 0.5 AS BIGINT),
           CAST(hits AS BIGINT)
    FROM qdot
    """,
)
def tx_lm_clf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-quality scoring row, two model families in one tagged
    union (r13 merge under the 50-row budget; REDEFINE ⇒ RENAME — the
    lm leg is the former tx_lm_score row unchanged):

    kind='lm' — CCNet-style statistical scoring (operators/lm_score.py,
    Wenzek et al. 2020): add-one-smoothed unigram LM trained on the
    corpus in one token-count aggregation, every document scored with
    its mean token log-probability in one corpus pass. score=mean logp
    (6 dp), detail1=n_tokens, detail2=n_oov (OOV = model-min logp −
    ln 2; min_count=2 keeps n_oov a live gradient). Hash-gradable
    because the pipeline is count arithmetic + ln (≤1 ulp libm drift
    against a 6-dp round).

    kind='clf' — the TRAINED quality classifier graded via frozen
    coefficients (VERDICT r12 task 5, the md5-hash-family trick
    applied to a model): operators/quality_clf.py trains an
    explicit-vocabulary logistic model once, deterministically, from
    FROZEN_TRAINING_SET (tests/test_quality_clf.py re-trains and pins
    the literals); this row runs the SCORING leg —
    sigmoid(bias + Σ wₜ·countₜ(doc)) as pure column expressions — and
    the oracle re-derives the identical arithmetic from the same
    literals in the same term order. score=P(quality) (6 dp),
    detail1=keep label at the 0.5 threshold (thresholded on the
    ROUNDED score so both engines decide on identical inputs),
    detail2=matched vocabulary occurrences. The HashingTF serving path
    (score_quality) stays the production API; this leg proves the dot
    product + threshold arithmetic against SQL.

    Both legs are single corpus passes (the lm leg's model is a
    vocab-sized broadcast); the union adds no exchange."""
    from ..operators.lm_score import perplexity_proxy, unigram_model
    from ..operators.quality_clf import score_with_term_weights

    docs = load_table(spark, sf_dir, "documents")
    model = unigram_model(docs, min_count=2)
    try:
        lm = perplexity_proxy(docs, model).select(
            F.lit("lm").alias("kind"),
            "doc_id",
            F.col("mean_logp").alias("score"),
            F.col("n_tokens").cast("long").alias("detail1"),
            F.col("n_oov").cast("long").alias("detail2"),
        )
    finally:
        # Drop the row's pin on the persisted model so repeated bench
        # calls don't accumulate cached copies. If the blocks are gone
        # before the returned plan executes, the broadcast re-derives
        # the model from source — a second (vocab-sized-output) corpus
        # aggregation, never a correctness change: the model plan is
        # fully deterministic (count filter + desc-n/asc-token capped
        # sort) and denom/oov are already baked in as Python constants.
        model.unpersist(blocking=False)
    scored = score_with_term_weights(docs, text_col="text")
    clf = scored.select(
        F.lit("clf").alias("kind"),
        "doc_id",
        F.round("quality_prob", 6).alias("score"),
        (F.round("quality_prob", 6) >= 0.5).cast("long").alias("detail1"),
        F.col("quality_prob_hits").alias("detail2"),
    )
    return lm.unionByName(clf)


@register(
    "sp_split_sample_cap",
    oracle="""
    WITH su AS (
      SELECT doc_id,
             (('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
               / 1152921504606846976.0 AS u
      FROM documents
    ),
    st AS (
      SELECT event_id, event_type,
             (('0x' || substr(md5('strat:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
               / 1152921504606846976.0 AS u
      FROM events
    )
    SELECT 'split' AS leg, CAST(doc_id AS BIGINT) AS key,
           CASE WHEN u < 0.1 THEN 'test'
                WHEN u < 0.9 THEN 'train'
                ELSE 'val' END AS label
    FROM su
    UNION ALL
    SELECT 'strat', CAST(event_id AS BIGINT), event_type
    FROM st
    WHERE u < CASE event_type WHEN 'click' THEN 0.25
                              WHEN 'error' THEN 0.5
                              ELSE 0.05 END
    UNION ALL
    SELECT 'cap', event_id, CAST(user_id AS VARCHAR)
    FROM (
      SELECT event_id, user_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id
               ORDER BY (('0x' || substr(md5('cap:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
                          / 1152921504606846976.0,
                        event_id) AS rn
      FROM events
    ) WHERE rn <= 5
    """,
)
def sp_split_sample_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split assignment + stratified
    hash sampling (operators/sampling.py) — the reproducibility ops a
    training pipeline runs between curation and mixing. ``df.sample``
    re-draws on task retry and shifts with partitioning; hash-gating
    makes membership a pure row-local function of the key, stable
    across retries, clusters, and engines.

    Graded in ``hash_mode='md5'`` — the portable mode whose decisions
    any md5-capable engine reproduces bit-for-bit (the [0,1) value is
    a 60-bit integer cast to double and scaled by an exact power of
    two, so the IEEE rounding is identical everywhere). The DuckDB
    oracle recomputes both gates from scratch. Two legs:
    - ``split``: every document's train/val/test assignment
      (0.8/0.1/0.1, keyed on doc_id) — disjoint and exhaustive.
    - ``strat``: per-stratum sampling over events (click 25%,
      error 50%, default 5%, keyed on event_id) — the reproducible
      counterpart of ``sampleBy``.
    - ``cap``: per-group frequency cap (≤5 events per user — the
      C4/Dolma "pages per domain" curation rule), hash-ranked so the
      surviving subset is retry/reshard-stable; the oracle replicates
      the under∪trimmed union as one ROW_NUMBER ≤ cap (identical set).
    The split/strat plans are shuffle-free single-pass filters; the
    cap leg windows ONLY over-cap groups with WindowGroupLimit bounding
    the exchange map-side."""
    from ..operators import sampling as SP

    docs = load_table(spark, sf_dir, "documents")
    split = SP.assign_splits(
        docs.select("doc_id"),
        keys=["doc_id"],
        weights={"train": 0.8, "val": 0.1, "test": 0.1},
        seed="split",
        hash_mode="md5",
    ).select(
        F.lit("split").alias("leg"),
        F.col("doc_id").cast("long").alias("key"),
        F.col("split").alias("label"),
    )
    ev = load_table(spark, sf_dir, "events")
    strat = SP.stratified_hash_sample(
        ev.select("event_id", "event_type"),
        strata_col="event_type",
        fractions={"click": 0.25, "error": 0.5},
        keys=["event_id"],
        default_fraction=0.05,
        seed="strat",
        hash_mode="md5",
    ).select(
        F.lit("strat").alias("leg"),
        F.col("event_id").cast("long").alias("key"),
        F.col("event_type").alias("label"),
    )
    cap = SP.cap_per_group(
        ev.select("event_id", "user_id"),
        group_cols=["user_id"],
        cap=5,
        keys=["event_id"],
        seed="cap",
        hash_mode="md5",
    ).select(
        F.lit("cap").alias("leg"),
        F.col("event_id").cast("long").alias("key"),
        F.col("user_id").cast("string").alias("label"),
    )
    return split.unionByName(strat).unionByName(cap)


_PACK_BUDGET = 96  # tokens per pack; fixture docs run 10-100 tokens,
#                    so a real fraction (3-4%) is oversize at every sf


@register(
    "ch_sp_chunk_pack",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, COALESCE(text, '') AS t,
             length(COALESCE(text, '')) AS n
      FROM documents
    ),
    offs AS (
      SELECT doc_id, t,
             unnest(generate_series(0,
               CAST(ceil(GREATEST(n - 120, 0) / 100.0) AS BIGINT) * 100,
               100)) AS off
      FROM base
    ),
    ptok AS (
      SELECT doc_id, COALESCE(len({_TOKS_LOWER}), 0) AS n_tok FROM documents
    )
    SELECT 'chunk' AS kind,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(doc_id AS VARCHAR) || '-' || CAST(off // 100 AS VARCHAR) AS unit_id,
           CAST(off // 100 AS BIGINT) AS unit_index,
           substr(t, off + 1, 120) AS unit_text
    FROM offs
    UNION ALL
    SELECT 'pack_invariant', NULL, 'n_docs', CAST(COUNT(*) AS BIGINT), NULL FROM ptok
    UNION ALL
    SELECT 'pack_invariant', NULL, 'total_tokens', CAST(SUM(n_tok) AS BIGINT), NULL FROM ptok
    UNION ALL
    SELECT 'pack_invariant', NULL, 'n_oversize',
           CAST(COUNT(*) FILTER (n_tok > {_PACK_BUDGET}) AS BIGINT), NULL FROM ptok
    UNION ALL
    SELECT 'pack_invariant', NULL, 'pack_lower_bound',
           CAST(COUNT(*) FILTER (n_tok > {_PACK_BUDGET})
                + CEIL(SUM(CASE WHEN n_tok <= {_PACK_BUDGET} THEN n_tok ELSE 0 END)
                       / {_PACK_BUDGET}.0) AS BIGINT), NULL
    FROM ptok
    UNION ALL
    SELECT 'pack_invariant', NULL, v, CAST(1 AS BIGINT), NULL
    FROM (VALUES ('every_doc_packed_once'), ('budget_respected'),
                 ('offsets_contiguous'), ('oversize_are_singletons'),
                 ('packs_within_bounds')) inv(v)
    """,
)
def ch_sp_chunk_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus→model-ready-units row, two legs in one tagged union
    (r13 merge under the 50-row budget; REDEFINE ⇒ RENAME — the chunk
    leg is the former ch_chunk_documents row unchanged):

    kind='chunk' — overlapping-window chunking
    (operators/chunking.py): chunk_chars=120, overlap=20 → stride 100;
    unit_id=`{doc_id}-{index}`, unit_index=chunk index,
    unit_text=window. Hash-graded against a generate_series+substr
    twin. One sequence+transform+posexplode over the scan — no
    shuffle, no Python.

    kind='pack_invariant' — sequence packing (operators/packing.py,
    VERDICT r12 task 2): FFD order-dependence has no SQL twin, so the
    row grades the pack INVARIANTS the way e4_ivf_topk grades recall:
    the packing runs for real (sharded FFD in applyInPandas, token
    budget {budget} over whitespace token counts) and the row emits
    its accounting as (unit_id=metric, unit_index=value) rows —
    n_docs / total_tokens / n_oversize / pack_lower_bound are
    re-derived exactly by the DuckDB oracle, and the assignment
    invariants are graded as booleans the oracle pins to 1:
    every input doc in exactly one pack; non-oversize pack token sums
    ≤ budget; per-pack offsets start at 0 and tile contiguously;
    oversize docs sit in singleton packs; and the pack count lies in
    [lower bound, n_docs] with every shard under the first-fit
    half-full bound (n_regular_packs ≤ 2·tokens/budget + 1 — at most
    one FF bin can end ≤ half full). A broken FFD, a doc dropped or
    double-packed, or an id-aliasing shard all flip a boolean and
    hash-mismatch the row.

    100 TB shape: chunk leg is row-local; pack leg is ONE shuffle to
    256-way deterministic shards (here 8) + an Arrow-batched per-shard
    FFD + narrow one-row aggregates combined by broadcast joins on a
    literal key (no cartesian)."""
    from ..operators.chunking import chunk_documents
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    chunks = chunk_documents(docs, chunk_chars=120, overlap=20).select(
        F.lit("chunk").alias("kind"),
        "doc_id",
        F.col("chunk_id").alias("unit_id"),
        F.col("chunk_index").cast("long").alias("unit_index"),
        F.col("chunk_text").alias("unit_text"),
    )

    B = _PACK_BUDGET
    toked = docs.select(
        "doc_id",
        F.size(TX.tokens(F.lower(F.coalesce(F.col("text"), F.lit(""))))).alias("n_tok"),
    )
    packed = pack_sequences(toked, "n_tok", "doc_id", budget=B, n_shards=8)
    per_pack = packed.groupBy("pack_id").agg(
        F.sum("n_tok").alias("psum"),
        F.min("pack_offset").alias("off0"),
        F.max(F.col("pack_offset") + F.col("n_tok")).alias("span"),
        F.count(F.lit(1)).alias("pn"),
        F.max(F.col("oversize").cast("int")).alias("has_over"),
    )
    pack_stats = per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("pn").alias("n_rows"),
        F.sum(
            F.when((F.col("has_over") == 0) & (F.col("psum") > B), 1).otherwise(0)
        ).alias("bad_budget"),
        F.sum(
            F.when((F.col("off0") != 0) | (F.col("span") != F.col("psum")), 1).otherwise(0)
        ).alias("bad_offsets"),
        F.sum(
            F.when((F.col("has_over") == 1) & (F.col("pn") != 1), 1).otherwise(0)
        ).alias("bad_over_multi"),
    )
    doc_stats = toked.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.sum((F.col("n_tok") > B).cast("long")).alias("n_oversize"),
        F.ceil(
            F.sum(F.when(F.col("n_tok") <= B, F.col("n_tok")).otherwise(0)) / F.lit(B)
        ).alias("lb_regular"),
    )
    uniq = packed.agg(F.countDistinct("doc_id").alias("n_distinct"))
    # per-shard first-fit half-full bound: in first fit at most one
    # open bin ends ≤ half full, so regular packs ≤ 2·tokens/B + 1
    shard_ok = (
        packed.withColumn("_sh", F.shiftright("pack_id", 32))
        .groupBy("_sh")
        .agg(
            F.countDistinct("pack_id").alias("sp"),
            F.sum(F.when(~F.col("oversize"), F.col("n_tok")).otherwise(0)).alias("stok"),
            F.sum(F.col("oversize").cast("long")).alias("sover"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("sp")
                    > F.col("sover") + F.floor(F.lit(2.0) * F.col("stok") / F.lit(B)) + 1,
                    1,
                ).otherwise(0)
            ).alias("shards_over_bound")
        )
    )
    key = F.lit(1).alias("_k")
    combined = (
        doc_stats.select(key, "*")
        .join(F.broadcast(pack_stats.select(key, "*")), "_k")
        .join(F.broadcast(uniq.select(key, "*")), "_k")
        .join(F.broadcast(shard_ok.select(key, "*")), "_k")
    )

    def _m(name, val):
        return F.struct(
            F.lit(name).alias("unit_id"), val.cast("long").alias("unit_index")
        )

    lb = F.col("n_oversize") + F.col("lb_regular")
    metrics = combined.select(
        F.explode(
            F.array(
                _m("n_docs", F.col("n_docs")),
                _m("total_tokens", F.col("total_tokens")),
                _m("n_oversize", F.col("n_oversize")),
                _m("pack_lower_bound", lb),
                _m(
                    "every_doc_packed_once",
                    (
                        (F.col("n_rows") == F.col("n_docs"))
                        & (F.col("n_distinct") == F.col("n_docs"))
                    ).cast("long"),
                ),
                _m("budget_respected", (F.col("bad_budget") == 0).cast("long")),
                _m("offsets_contiguous", (F.col("bad_offsets") == 0).cast("long")),
                _m("oversize_are_singletons", (F.col("bad_over_multi") == 0).cast("long")),
                _m(
                    "packs_within_bounds",
                    (
                        (F.col("shards_over_bound") == 0)
                        & (F.col("n_packs") >= lb)
                        & (F.col("n_packs") <= F.col("n_docs"))
                    ).cast("long"),
                ),
            )
        ).alias("m")
    ).select(
        F.lit("pack_invariant").alias("kind"),
        F.lit(None).cast("long").alias("doc_id"),
        F.col("m.unit_id").alias("unit_id"),
        F.col("m.unit_index").alias("unit_index"),
        F.lit(None).cast("string").alias("unit_text"),
    )
    return chunks.unionByName(metrics)
