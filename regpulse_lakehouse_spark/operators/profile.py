"""One-pass corpus profiling — the sketch-backed data-quality readout
a training pipeline runs before anything else (beyond-reference
training-data operator; the reference's dashboard stats are A2/A3's
exact group counts — this is their corpus-scale sketch counterpart).

Single aggregation pass, all built-in JVM sketches:

- volumes: docs, bytes, whitespace tokens (exact sums);
- text-length distribution: approx_percentile t-digest (p5/p50/p95/p99);
- distinct estimates: HyperLogLog++ ``approx_count_distinct`` for
  exact-dup pressure (distinct md5 / docs ≈ 1 - dup rate) and source
  cardinality — at 1e-2 relative error for a fraction of the exact
  groupBy's shuffle;
- quality: null/empty rates, language-marker hit rate.

Everything lands in ONE row so the profile of a 100 TB corpus is one
shuffle-free partial-agg tree (no groupBy at all — partial aggregates
merge map-side, the driver receives a single row).

``profile_by`` gives the per-group variant (one groupBy) for
per-source / per-language breakdowns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import token_count


def _metrics(text: Column) -> list[Column]:
    n = F.length(text)
    return [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.coalesce(n, F.lit(0))).alias("total_chars"),
        F.sum(F.coalesce(token_count(text), F.lit(0))).alias("total_tokens"),
        F.round(F.avg(n), 2).alias("mean_chars"),
        F.percentile_approx(n, [0.05, 0.5, 0.95, 0.99]).alias("chars_pcts"),
        F.approx_count_distinct(F.md5(text)).alias("approx_distinct_texts"),
        F.round(
            F.avg((text.isNull() | (F.trim(text) == "")).cast("double")), 4
        ).alias("empty_rate"),
    ]


def profile_corpus(
    docs: DataFrame, text_col: str = "text", extra_distinct_cols: list[str] | None = None
) -> DataFrame:
    """One-row corpus profile. ``extra_distinct_cols`` adds an HLL
    distinct estimate per named column (source, lang, domain…).
    ``approx_distinct_texts / n_docs`` approximates the exact-dedup
    survival rate BEFORE paying the dedup shuffle — the number that
    decides whether dedup is worth scheduling at all."""
    t = F.col(text_col)
    aggs = _metrics(t)
    for c in extra_distinct_cols or []:
        aggs.append(F.approx_count_distinct(c).alias(f"approx_distinct_{c}"))
    return _flatten_pcts(docs.agg(*aggs))


def profile_by(
    docs: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-group profile (one groupBy): same metrics, one row per value
    of ``group_col`` — the per-source / per-language quality dashboard."""
    t = F.col(text_col)
    return _flatten_pcts(docs.groupBy(group_col).agg(*_metrics(t)))


def _flatten_pcts(out: DataFrame) -> DataFrame:
    """Flatten the chars_pcts array into named atomic columns (shared by
    the global and per-group profiles so their schemas can't diverge)."""
    pct_names = ["chars_p05", "chars_p50", "chars_p95", "chars_p99"]
    return out.select(
        *[c for c in out.columns if c != "chars_pcts"],
        *[
            F.element_at("chars_pcts", i + 1).alias(name)
            for i, name in enumerate(pct_names)
        ],
    )


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_ngram_sizes: tuple[int, ...] = (2, 3, 4),
    dup_ngram_sizes: tuple[int, ...] = (5, 10),
) -> DataFrame:
    """The Gopher repetition signals the columnar gate
    (functions/text.gopher_quality_flags) cannot express per-row:
    per document,

    - ``top{n}_gram_char_frac``: fraction of the document's characters
      covered by occurrences of its single most frequent word n-gram
      (Gopher drops docs over 0.20/0.18/0.16 for n=2/3/4);
    - ``dup{n}_gram_char_frac``: fraction covered by n-grams that occur
      more than once (the standard occurrence-sum approximation of
      Gopher's duplicated-n-gram rule, capped at 1.0).

    Shape: one explode per n-gram size → count per (doc, gram) →
    per-doc aggregate — the word-count plan, linear at any corpus
    size where a per-row higher-order-function scan of the gram array
    would be O(len²) interpreted per document. All sizes compute from
    ONE tokenization; results join back by id. Docs shorter than the
    n-gram size produce 0.0 (nothing repeats).
    """
    from ..functions.text import tokens

    if not top_ngram_sizes and not dup_ngram_sizes:
        raise ValueError("need at least one n-gram size")

    toked = docs.select(
        F.col(id_col),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).alias("_chars"),
        tokens(F.lower(F.col(text_col))).alias("_toks"),
    )
    base = toked.select(id_col, "_chars")
    out = base
    for n, kind in sorted(
        [(n, "top") for n in top_ngram_sizes] + [(n, "dup") for n in dup_ngram_sizes]
    ):
        # n-gram construction for any n: index-transform over the token
        # array (JVM-side), then explode. Char mass counts gram length
        # plus one joining/following space per occurrence — the standard
        # coverage approximation (overlapping occurrences are counted
        # independently, hence the cap at 1.0 downstream).
        n_grams = F.size("_toks") - (n - 1)
        # guard short docs explicitly: sequence(1, 0) DESCENDS in Spark
        # ([1, 0]), it does not produce an empty array
        idx = F.when(
            n_grams >= 1,
            F.transform(
                F.sequence(F.lit(1), n_grams),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("_toks", (i + j).cast("int")) for j in range(n)]
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        grams = toked.select(F.col(id_col), F.explode(idx).alias("_g"))
        counted = grams.groupBy(id_col, "_g").agg(F.count(F.lit(1)).alias("_c"))
        if kind == "top":
            # the Gopher rule scores the single MOST FREQUENT gram's
            # char coverage — select by max count (NOT max mass: a long
            # gram occurring twice must not beat a short gram occurring
            # many times), tie-break by mass for determinism, then take
            # the winner's mass
            per_doc = counted.groupBy(id_col).agg(
                F.max(
                    F.struct(
                        F.col("_c"),
                        (F.col("_c") * (F.length("_g") + 1)).alias("_mass"),
                    )
                )["_mass"].alias("_mass")
            )
            colname = f"top{n}_gram_char_frac"
        else:
            # a repeated PHRASE of L tokens contributes ~L-n+1 overlapping
            # duplicated windows, each billed at full gram width — raw
            # occurrence-sum therefore overcounts interior chars ~n×
            # (a mildly templated doc saturated to 1.0). Dividing the
            # mass by n recovers ~true char coverage: interior chars sit
            # in exactly n windows, edge chars in fewer (slight
            # undercount at span edges, the conservative direction).
            per_doc = counted.filter(F.col("_c") > 1).groupBy(id_col).agg(
                (F.sum(F.col("_c") * (F.length("_g") + 1)) / n).alias("_mass")
            )
            colname = f"dup{n}_gram_char_frac"
        out = out.join(per_doc, id_col, "left").withColumn(
            colname,
            F.round(
                F.least(
                    F.coalesce(F.col("_mass"), F.lit(0)) / F.greatest("_chars", F.lit(1)),
                    F.lit(1.0),
                ),
                4,
            ),
        ).drop("_mass")
    return out.drop("_chars")
