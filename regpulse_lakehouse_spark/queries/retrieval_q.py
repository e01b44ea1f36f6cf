"""Lexical-retrieval queries: the BM25 family driver-graded against a
DuckDB re-derivation of the same Lucene-flavoured scoring math.

The engine side (operators/retrieval.py) is pure column expressions —
explode → filtered postings → broadcast df join → per-doc sum → top-k;
the oracle recomputes idf/tf normalization from first principles on the
same whitespace tokenization the textops oracles already proved
portable (queries/textops_q.py ``_TOKS_LOWER``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.retrieval import bm25_topk
from ..sources.tpch import load_table
from . import register

#: Fixed grading query: one rare term (df≈5% of docs) + two common ones,
#: so the ranking exercises the idf spread, tf saturation AND the
#: length normalization rather than collapsing to a single-term sort.
_QUERY = "dup vector scan"
_K = 25

_TOKS_LOWER = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), t -> t != '')"

_BM25_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_LOWER} AS ts FROM documents
),
stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(len(ts)) AS avgdl FROM toks
),
post AS (
  SELECT doc_id, dl, term, COUNT(*) AS tf
  FROM (SELECT doc_id, len(ts) AS dl, unnest(ts) AS term FROM toks)
  WHERE term IN ('dup', 'vector', 'scan')
  GROUP BY doc_id, dl, term
),
dfs AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY term
),
scored AS (
  SELECT p.doc_id,
         ROUND(SUM(
           ln(1 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * p.tf * (1.2 + 1.0)
           / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.dl / s.avgdl))
         ), 6) AS bm25,
         COUNT(*) AS n_terms_matched
  FROM post p JOIN dfs d USING (term) CROSS JOIN stats s
  GROUP BY p.doc_id
)
SELECT s.doc_id,
       s.bm25,
       CAST(s.n_terms_matched AS BIGINT) AS n_terms_matched,
       substr(d.text, 1, 100) AS snippet,
       CAST(length(d.text) AS BIGINT) AS full_len
FROM scored s JOIN documents d USING (doc_id)
ORDER BY s.bm25 DESC, s.doc_id ASC
LIMIT {_K}
"""


@register("rt_bm25_topk", oracle=_BM25_ORACLE)
def rt_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k lexical search over the documents corpus (the
    retrieval complement to E4 vector search; reference's only search
    surface is services/api/src/search.ts — lexical ranking is
    beyond-parity). Runs the REAL scoring path (operators/retrieval.py
    ``bm25_topk``: query-term-filtered explode, broadcast df join,
    per-doc sum, TakeOrdered top-k), then attaches the V8 result-card
    truncations (scan.ts:276,288: snippet/full-length caps) with the
    25-row result broadcast back onto a column-pruned documents scan —
    the snippet lookup never shuffles the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    hits = bm25_topk(docs, _QUERY, k=_K)
    card = docs.select(
        "doc_id",
        F.substring("text", 1, 100).alias("snippet"),
        F.length("text").cast("long").alias("full_len"),
    )
    return card.join(F.broadcast(hits), "doc_id").select(
        "doc_id", "bm25", "n_terms_matched", "snippet", "full_len"
    )
