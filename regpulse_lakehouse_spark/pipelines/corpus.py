"""End-to-end training-corpus preparation: the beyond-reference
operators composed into the standard LLM data pipeline
(quality-gate → PII scrub → exact dedup → near-dup dedup →
eval decontamination → split assignment → sequence packing).

Each stage is one of the engine's first-class operators; this module
only sequences them and keeps the plumbing honest:

- the pipeline is LAZY except the near-dup closure — one DataFrame in,
  one DataFrame out per stage, so Catalyst sees the plan across stage
  boundaries (e.g. the quality filter reaches the parquet scan); the
  connected-components step is inherently iterative and materializes
  its label table per round (operators/components.py);
- stage order is the cheap-first rule used in production: columnar
  filters (quality) before hash dedup before the shuffle-heavier
  near-dup join, with decontamination after dedup so the broadcast
  semi-join sees the smallest surviving corpus;
- every stage is deterministic (hash-gated sampling/splits, seeded
  MinHash family), so re-runs produce byte-identical corpora — the
  property that makes corpus versioning meaningful at all.

``prepare_corpus`` returns the packed corpus plus a small audit frame
(per-stage surviving row counts) — the numbers any data-governance
review asks for first.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as TX
from ..operators import components as CC
from ..operators import decontam as DC
from ..operators import dedup as DD
from ..operators import sampling as SP
from ..operators import spans as SPAN
from ..operators.packing import pack_sequences


@dataclass
class CorpusResult:
    """Packed corpus + per-stage audit counts (computed lazily; call
    ``audit()`` to materialize them)."""

    packed: DataFrame
    stages: dict[str, DataFrame]

    def audit(self) -> dict[str, int]:
        """Per-stage surviving row counts, at one materialization per
        stage boundary.

        Naively counting each stage would re-execute the whole pipeline
        prefix per stage — six counts ≈ six passes over a 100 TB corpus.
        Instead every boundary is persisted (MEMORY_AND_DISK, so outputs
        spill rather than OOM at scale) before counting in pipeline
        order: stage N's count then reads stage N-1's cache instead of
        recomputing it (the cache manager substitutes the cached subplan
        into N's plan), so each boundary is computed exactly once. All
        caches are dropped before returning — audit leaves no footprint.
        """
        from pyspark import StorageLevel

        dfs = list(self.stages.values())
        for df in dfs:
            df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # insertion order IS pipeline order — counting top-down is
            # what lets each stage reuse its predecessor's fresh cache
            return {name: df.count() for name, df in self.stages.items()}
        finally:
            for df in dfs:
                df.unpersist()

    def provenance(self, id_col: str = "doc_id") -> DataFrame:
        """Per-document drop provenance: (id, dropped_at) for every
        input document that did NOT survive to the final row-filtering
        stage — the answer to the governance question "why is doc X not
        in my corpus". ``dropped_at`` is the name of the FIRST stage
        whose output no longer contains the id (lang_gate, quality,
        repetition_gate, lm_gate, clf_gate, exact_dedup, group_cap,
        near_dedup, decontaminated — the text-rewrite stages line_dedup
        / span_dedup and everything past decontamination relabel or
        repartition rows, they never drop them).

        Each boundary contributes one left-anti join on the id — narrow
        8-byte keys, and the same persist-in-pipeline-order trick as
        ``audit()`` keeps it to one materialization per stage. Runs as
        one union-of-anti-joins plan; survivors appear nowhere in the
        output (it is a drop log, not a roster)."""
        from pyspark import StorageLevel

        filtering = [
            (n, df)
            for n, df in self.stages.items()
            if n in ("input", "lang_gate", "quality", "repetition_gate",
                     "lm_gate", "clf_gate", "exact_dedup", "group_cap",
                     "near_dedup", "decontaminated")
        ]
        dfs = [df for _, df in filtering]
        for df in dfs:
            df.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            parts = []
            for (_, prev), (name, cur) in zip(filtering, filtering[1:]):
                dropped = (
                    prev.select(id_col)
                    .join(cur.select(id_col), id_col, "left_anti")
                    .withColumn("dropped_at", F.lit(name))
                )
                parts.append(dropped)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            # materialize before unpersisting the inputs it reads
            rows = out.localCheckpoint(eager=True)
            return rows
        finally:
            for df in dfs:
                df.unpersist()


def prepare_corpus(
    docs: DataFrame,
    evals: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    near_dup_threshold: float = 0.5,
    near_dup_max_iterations: int = 50,
    near_dup_on_nonconvergence: str = "keep",
    checkpoint_dir: str | None = None,
    decontam_k: int = 13,
    split_weights: dict[str, float] | None = None,
    pack_budget: int = 2048,
    lm_floor: float | None = None,
    lm_mode: str = "unigram",
    shuffle_seed: str | None = None,
    near_dup_mode: str = "pairs",
    repetition_caps: dict[str, float] | None = None,
    clf_model=None,
    clf_floor: float = 0.5,
    line_dup_max_df: int | None = None,
    span_dedup_k: int | None = None,
    span_dedup_min_docs: int = 2,
    span_dedup_keep: str = "none",
    group_cap: int | None = None,
    group_cap_cols: list[str] | None = None,
    lang_allow: list[str] | None = None,
    exact_dedup_normalized: bool = False,
) -> CorpusResult:
    """The full preparation pass. ``evals=None`` skips decontamination;
    ``split_weights=None`` skips split assignment. Token counts for
    packing use the whitespace tokenizer (swap in bpe_ish_token_count
    upstream for subword budgets).

    ``lm_floor`` (e.g. -9.0) adds the CCNet-style statistical gate
    after the heuristic one: a unigram LM is trained on the
    quality-surviving corpus (one word-count agg) and documents whose
    mean token log-prob falls below the floor are dropped
    (operators/lm_score.py — gibberish and boilerplate-fragment pages
    the format heuristics cannot see). ``shuffle_seed`` scatters the
    packed output into reproducible training order
    (operators/sampling.deterministic_shuffle) as the final stage.

    The near-dup closure defaults to ``on_nonconvergence='keep'`` —
    unlike the raw operator — because one >``near_dup_max_iterations``-
    hop revision chain in an unbounded corpus should degrade to keeping
    an extra representative, not hard-fail the whole pipeline (the
    warning still surfaces). ``checkpoint_dir`` switches the closure's
    per-round materialization to reliable checkpoints for cluster runs
    (operators/components.py::_truncate_lineage)."""
    stages: dict[str, DataFrame] = {"input": docs}

    # 0. optional language gate (functions/text.lang_id — the marker-
    # lexicon heuristic; real deployments swap larger lists in). FIRST
    # of all stages, including the rewrite stages: it's the cheapest
    # columnar filter, and running it before the corpus-wide line/span
    # dedup shuffles means disallowed-language docs never pay (or
    # pollute) those stages — a block shared only between an English
    # and a soon-dropped German doc is NOT a cross-doc duplicate of
    # the surviving corpus. 'und' (no marker hits) must be listed
    # explicitly to keep unidentifiable docs.
    if lang_allow is not None:
        docs = docs.filter(TX.lang_id(F.col(text_col)).isin(*lang_allow))
        stages["lang_gate"] = docs

    # 0a. optional CCNet/RefinedWeb line-level boilerplate removal —
    # BEFORE the quality gate, so quality metrics evaluate the cleaned
    # text (a page that is 80% cookie-banner should be judged on its
    # 20% of content, and usually then dies at the length/repetition
    # rules). Row count is preserved: this stage rewrites text, it
    # never drops documents.
    if line_dup_max_df is not None:
        cleaned = DD.line_dedup(docs, text_col, id_col, max_df=line_dup_max_df)
        if len(docs.columns) > 2:  # re-attach non-text columns
            cleaned = cleaned.join(docs.drop(text_col), id_col)
        docs = cleaned.select(*docs.columns)  # original column order
        stages["line_dedup"] = docs

    # 0b. optional exact duplicated-span removal (Lee et al. substring
    # dedup, operators/spans.py) — license blocks / quoted passages
    # repeated across otherwise-distinct documents. Also BEFORE the
    # quality gate (same rationale as line_dedup) and row-preserving:
    # rewrites text, never drops documents. Note the rewrite is
    # token-normalized (lowercased, single-spaced) — unlike line_dedup,
    # which preserves surviving lines verbatim.
    if span_dedup_k is not None:
        docs = SPAN.strip_duplicated_spans(
            docs, text_col, id_col, k=span_dedup_k,
            min_docs=span_dedup_min_docs, keep=span_dedup_keep
        ).select(*docs.columns)
        # Lineage barrier (lazy — materializes on the pipeline's first
        # action, the near-dup closure). Without it the strip's
        # rewritten-text expression — a when/filter/concat tree — is
        # re-INLINED into every downstream reference of the text column
        # (ProjectCollapse undoes the select's aliasing), and the
        # heuristic gates reference text dozens of times: measured
        # 3-10× plan-analysis blowup per audit boundary when stacked
        # with line_dedup. Industry pipelines materialize between major
        # rewrite stages for the same reason; at cluster scale this
        # pins the rewritten corpus to executor storage like the
        # closure's per-round tables already do.
        docs = docs.localCheckpoint(eager=False)
        stages["span_dedup"] = docs

    # 1. columnar quality gate + PII scrub (pure JVM, reaches the scan)
    quality = docs.filter(
        TX.gopher_quality_flags(F.col(text_col))["passes"]
    ).withColumn(text_col, TX.mask_pii(F.col(text_col)))
    stages["quality"] = quality

    # 1a. optional Gopher n-gram repetition gate (the signals the
    # per-row columnar pass cannot express — needs per-doc gram counts)
    if repetition_caps:
        from ..operators.profile import repetition_stats

        sizes_top, sizes_dup = [], []
        for k in repetition_caps:
            m = re.fullmatch(r"(top|dup)(\d+)_gram_char_frac", k)
            if not m:
                raise ValueError(
                    f"unrecognized repetition_caps key {k!r}; expected "
                    "top{n}_gram_char_frac or dup{n}_gram_char_frac"
                )
            (sizes_top if m.group(1) == "top" else sizes_dup).append(int(m.group(2)))
        sizes_top.sort()
        sizes_dup.sort()
        stats = repetition_stats(
            quality, id_col, text_col,
            top_ngram_sizes=tuple(sizes_top),
            dup_ngram_sizes=tuple(sizes_dup),
        )
        ok = None
        for colname, cap in sorted(repetition_caps.items()):
            cond = F.col(colname) <= cap
            ok = cond if ok is None else (ok & cond)
        quality = quality.join(
            stats.filter(ok).select(id_col), id_col, "left_semi"
        )
        stages["repetition_gate"] = quality

    # 1b. optional statistical gate: unigram-LM perplexity proxy
    # trained on the heuristic survivors. The MODEL broadcasts (vocab-
    # sized); the per-doc score table is corpus-sized, so rejoining it
    # is a keyed semi-join — one narrow shuffle per side, never a
    # broadcast.
    if lm_floor is not None:
        from ..operators import lm_score as LM

        if lm_mode == "bigram":
            # order-sensitive gate (catches scrambled/stuffed text the
            # unigram proxy passes); floors are on a different scale —
            # calibrate per corpus
            model = LM.bigram_model(quality, text_col)
            scores = LM.bigram_perplexity_proxy(quality, model, text_col, id_col)
        elif lm_mode == "unigram":
            model = LM.unigram_model(quality, text_col)
            scores = LM.perplexity_proxy(quality, model, text_col, id_col)
        else:
            raise ValueError(f"lm_mode must be 'unigram' or 'bigram', got {lm_mode!r}")
        keep = scores.filter(F.col("mean_logp") >= lm_floor)
        quality = quality.join(keep.select(id_col), id_col, "left_semi")
        stages["lm_gate"] = quality

    # 1c. optional LEARNED gate: a pre-trained quality classifier
    # (operators/quality_clf.py — the fastText-style keep/drop the
    # published pipelines layer on top of the heuristics). A stateless
    # map over the corpus: hashed features + one sparse dot product per
    # row, no shuffle, no Python stage.
    if clf_model is not None:
        from ..operators import quality_clf as QC

        quality = QC.score_quality(quality, clf_model, text_col).filter(
            F.col("quality_prob") >= clf_floor
        ).drop("quality_prob")
        stages["clf_gate"] = quality

    # 2. exact dedup on content hash (one narrow shuffle); with
    # exact_dedup_normalized the hash key is the CCNet/Dolma-normalized
    # text (lowercase, digits→0, punct stripped, whitespace collapsed)
    # so formatting variants collapse — survivors keep their raw text
    exact = DD.exact_dedup(
        quality,
        text_col,
        order_cols=[F.col(id_col)],
        key_expr=(
            TX.normalize_for_dedup(F.col(text_col))
            if exact_dedup_normalized
            else None
        ),
    )
    stages["exact_dedup"] = exact

    # 2b. optional per-source frequency cap (operators/sampling.
    # cap_per_group) — AFTER exact dedup so byte-identical copies don't
    # burn a source's cap slots, BEFORE the near-dup join so the capped
    # (smaller) corpus enters the expensive stage.
    if group_cap is not None:
        if not group_cap_cols:
            raise ValueError("group_cap requires group_cap_cols (e.g. ['source'])")
        exact = SP.cap_per_group(exact, group_cap_cols, group_cap, keys=[id_col])
        stages["group_cap"] = exact

    # 3. near-dup removal: MinHash-LSH edges → connected components →
    #    keep the minimum-id representative of each duplicate CLUSTER
    #    (transitive closure, operators/components.py — a chain a~b~c
    #    keeps exactly a, where a pairwise drop could keep a and c).
    #    near_dup_mode='windowed' swaps the exact pairwise generator
    #    for neighbor-window cluster edges — O(n·window) per bucket
    #    instead of quadratic in duplicate-cluster size, the guard for
    #    crawl corpora with multi-million-copy clusters
    #    (DD.minhash_cluster_edges docstring for the recall trade).
    if near_dup_mode == "windowed":
        pairs = DD.minhash_cluster_edges(
            exact, text_col, id_col, num_hashes=16, num_bands=4,
            threshold=near_dup_threshold,
        )
    elif near_dup_mode == "pairs":
        # collapse_exact=False: the exact-dedup stage above already
        # collapsed byte-identical (and normalization-identical) texts,
        # so the operator's own clique pre-collapse would re-hash the
        # corpus to discover only singletons
        pairs = DD.minhash_near_dup_pairs(
            exact, text_col, id_col, num_hashes=16, num_bands=4,
            threshold=near_dup_threshold, collapse_exact=False,
        )
    else:
        raise ValueError(f"near_dup_mode must be 'pairs' or 'windowed', got {near_dup_mode!r}")
    near = CC.cluster_representatives(
        pairs, exact, id_col=id_col,
        max_iterations=near_dup_max_iterations,
        on_nonconvergence=near_dup_on_nonconvergence,
        checkpoint_dir=checkpoint_dir,
    )
    stages["near_dedup"] = near

    # 4. eval-set decontamination (broadcast semi-join, zero train
    #    shuffles) — after dedup so the gram table is minimal
    clean = near if evals is None else DC.decontaminate(
        near, evals, text_col, id_col, k=decontam_k
    )
    stages["decontaminated"] = clean

    # 5. deterministic split assignment
    if split_weights:
        clean = SP.assign_splits(clean, [id_col], split_weights)
    stages["split"] = clean

    # 6. pack into token budgets
    with_tokens = clean.withColumn("_n_tokens", TX.token_count(F.col(text_col)))
    packed = pack_sequences(
        with_tokens, "_n_tokens", id_col=id_col, budget=pack_budget
    )
    stages["packed"] = packed

    # 7. optional reproducible training-order scatter (pack_id-keyed, so
    # each packed window moves as one unit)
    if shuffle_seed is not None:
        packed = SP.deterministic_shuffle(packed, ["pack_id"], seed=shuffle_seed)
        stages["shuffled"] = packed
    return CorpusResult(packed=packed, stages=stages)
