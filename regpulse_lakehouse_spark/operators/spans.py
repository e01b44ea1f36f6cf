"""Exact duplicated-span detection — the suffix-array-style substring
dedup of Lee et al., "Deduplicating Training Data Makes Language Models
Better" (2021), re-expressed as relational algebra.

Beyond-reference training-data-pipeline operator (the reference has no
corpus surface; document-level dedup in operators/dedup.py catches
whole near-duplicates, while boilerplate headers, license blocks and
quoted passages repeat INSIDE otherwise-distinct documents — this
operator finds those spans). The suffix-array formulation is a
single-machine algorithm; the Spark-first equivalent:

1. per document, hash every overlapping k-token window at its position
   (zip-shift construction — no slice-in-lambda re-evaluation, see
   functions/text.word_shingles_of_tokens);
2. ``posexplode`` to (doc, pos, gram-hash) rows — one row per token
   position, k-independent volume;
3. one groupBy on the gram hash marks hashes occurring ≥ ``min_count``
   times (map-side partial agg does the heavy lifting: unique grams —
   the overwhelming majority — collapse to count 1 in the map stage);
4. join the duplicate-hash set back onto positions and merge
   overlapping [pos, pos+k) windows per document with one window
   function (classic gaps-and-islands).

A maximal repeat of length L ≥ k has ALL its k-windows duplicated, so
merged spans cover every exact repeat; adjacent overlapping repeats can
fuse into one reported span (documented over-approximation — the same
trade the seed-and-extend implementations make).

Every stage is pure column expressions; the only shuffles are the gram
count and the join back, both on the 8-byte hash. Per-doc window state
is bounded by document length. Scale-safe at corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..functions.text import tokens, windowed_token_strings


def positional_gram_hashes(toks: Column, k: int) -> Column:
    """xxhash64 of every overlapping k-token window, position order
    (array<long>, length n-k+1; empty when n < k). Shares the
    zip-shift window construction (and its space separator, which no
    token can contain) with the shingle family — see
    functions/text.windowed_token_strings."""
    n = F.size(toks)
    hashes = F.transform(windowed_token_strings(toks, k), lambda s: F.xxhash64(s))
    return F.when(n >= k, hashes).otherwise(F.array().cast("array<long>"))


def _positions(docs: DataFrame, text_col: str, id_col: str, k: int) -> DataFrame:
    """(id, pos, gh): gram hash at every token position. Lazily
    localCheckpoint-ed: the caller's self-join references this subplan
    twice (dup-hash aggregate + join-back), and without the pin the
    full tokenize+explode — the most expensive stage — would run twice
    per detection pass. eager=False keeps the operator lazy; the pin
    materializes on the first action and both branches read it."""
    return (
        docs.select(id_col, tokens(F.lower(F.col(text_col))).alias("_toks"))
        .select(id_col, F.posexplode(positional_gram_hashes(F.col("_toks"), k)).alias("pos", "gh"))
        .localCheckpoint(eager=False)
    )


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    min_docs: int = 1,
) -> DataFrame:
    """Maximal duplicated token spans: (id, span_start, span_end,
    n_tokens) with [start, end) 0-based token offsets. A span is a
    maximal run of positions whose k-token windows each occur ≥
    ``min_count`` times corpus-wide (set ``min_docs=2`` to require the
    repeat to cross documents — a within-doc chorus then doesn't
    count)."""
    pos = _positions(docs, text_col, id_col, k)
    dup = (
        pos.groupBy("gh")
        .agg(F.count("*").alias("_c"), F.count_distinct(id_col).alias("_nd"))
        .filter((F.col("_c") >= min_count) & (F.col("_nd") >= min_docs))
        .select("gh")
    )
    hits = pos.join(dup, "gh").select(id_col, "pos")
    w = W.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(w.rowsBetween(W.unboundedPreceding, -1))
    # merge overlapping AND abutting windows (pos == prev_end continues
    # the duplicated region) — new island only on a genuine gap
    grouped = hits.withColumn(
        "_new", F.when(F.col("pos") > F.coalesce(prev_end, F.lit(-1)), 1).otherwise(0)
    ).withColumn("_grp", F.sum("_new").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return (
        grouped.groupBy(id_col, "_grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
        )
        .select(
            id_col,
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_tokens"),
        )
    )


def keep_first_occurrence(
    docs: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Filter a ``duplicated_spans`` frame down to the occurrences that
    should be STRIPPED under keep-one semantics (Lee et al. keep a
    single copy of each repeated substring): spans are grouped by the
    hash of their token content, and the globally-first occurrence —
    min (id, span_start), deterministic — is elected canonical and
    removed from the strip set.

    One join back to ``docs`` extracts each span's token slice (bounded
    per-span work), one per-content-hash window elects the keeper.
    Fused spans with distinct content hash separately, so a span that
    merged two repeats is its own content class (documented
    over-approximation inherited from the merge)."""
    toks = tokens(F.lower(F.col(text_col)))
    with_text = spans.join(docs.select(id_col, text_col), id_col).select(
        id_col,
        "span_start",
        "span_end",
        "n_tokens",
        F.xxhash64(
            F.concat_ws(
                " ",
                F.slice(toks, F.col("span_start") + 1, F.col("n_tokens")),
            )
        ).alias("_ch"),
    )
    w = W.partitionBy("_ch").orderBy(F.asc(id_col), F.asc("span_start"))
    return (
        with_text.withColumn("_occ", F.row_number().over(w))
        .filter(F.col("_occ") > 1)  # occurrence 1 is the keeper
        .select(id_col, "span_start", "span_end", "n_tokens")
    )


def strip_duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_count: int = 2,
    min_docs: int = 1,
    spans: DataFrame | None = None,
    keep: str = "none",
) -> DataFrame:
    """Documents with duplicated spans' tokens removed. ``keep='none'``
    (default) removes ALL occurrences — the conservative variant;
    ``keep='first'`` elects the globally-first occurrence of each
    distinct span content as canonical and keeps it (the Lee et al.
    keep-one semantic, via :func:`keep_first_occurrence`). Adds
    ``{text_col}`` rewritten plus ``n_tokens_removed``;
    other columns pass through. Pass a precomputed ``spans`` frame to
    reuse one detection pass across several consumers.

    Plan: spans aggregate to one array per doc (bounded by doc length),
    left-join back, and a single higher-order ``filter`` with the
    position index drops covered tokens — no Python stage."""
    if keep not in ("none", "first"):
        raise ValueError(f"keep must be 'none' or 'first', got {keep!r}")
    if spans is None:
        spans = duplicated_spans(docs, text_col, id_col, k, min_count, min_docs)
    if keep == "first":
        spans = keep_first_occurrence(docs, spans, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    toks = tokens(F.lower(F.col(text_col)))
    spans_arr = F.coalesce(F.col("_spans"), F.array())
    covered = lambda i: F.exists(  # noqa: E731
        spans_arr, lambda s: (i >= s["span_start"]) & (i < s["span_end"])
    )
    kept = F.filter(toks, lambda t, i: ~covered(i))
    out_cols = [c for c in docs.columns if c != text_col]
    # docs WITHOUT spans keep their original text byte-for-byte — the
    # token-normalized rewrite (lowercase, single-space) only touches
    # actual carriers, so downstream line-based quality signals and
    # exact dedup see untouched documents unchanged
    has_spans = F.col("_spans").isNotNull()
    return (
        docs.join(per_doc, id_col, "left")
        .select(
            *out_cols,
            F.when(has_spans, F.concat_ws(" ", kept))
            .otherwise(F.col(text_col))
            .alias(text_col),
            F.when(has_spans, F.size(toks) - F.size(kept))
            .otherwise(F.lit(0))
            .alias("n_tokens_removed"),
        )
    )
