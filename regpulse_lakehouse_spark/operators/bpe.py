"""Byte-pair-encoding tokenizer — real subword tokenization for the
training-data pipeline (beyond-reference operator; upgrades the
whitespace/BPE-ish regex counters in functions/text.py to a learned
vocabulary).

Scale shape mirrors the vector quantizers: TRAINING runs driver-side
on a bounded sample (classic BPE merge learning is inherently
sequential — each merge depends on the previous — so distributing it
buys nothing; a corpus-representative sample caps the cost regardless
of corpus size), while ENCODING is Arrow-batched and distributed — the
learned merge table is a small broadcast closure, each executor
applies it with a per-batch word cache, and the corpus crosses no
extra exchange.

The algorithm is the published one (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"): words split to
characters plus an end-of-word marker, repeatedly merge the most
frequent adjacent symbol pair; ties break lexicographically so
training is deterministic on any engine.
"""

# NO `from __future__ import annotations` here: stringified hints break
# pandas_udf eval-type inference (same gotcha as bench.py's warmup UDF)
from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F, types as T

from ..functions.text import tokens

_EOW = "</w>"


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 512,
    sample_docs: int = 2048,
    lowercase: bool = True,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded sample of the
    corpus (first ``sample_docs`` rows per the natural read order —
    one narrow limit job, no shuffle, no full scan). Returns the
    ordered merge list; merge rank is the only state encoding needs."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    col = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    rows = docs.select(tokens(col).alias("_t")).limit(sample_docs).collect()
    word_freq: Counter = Counter()
    for r in rows:
        word_freq.update(r["_t"] or [])
    # words as symbol tuples: chars + end-of-word marker
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (_EOW,): c for w, c in word_freq.items()
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for word, c in vocab.items():
            for a, b in zip(word, word[1:]):
                pair_freq[(a, b)] += c
        if not pair_freq:
            break
        # deterministic argmax: max count, then lexicographic pair
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break  # nothing repeats; further merges memorize the sample
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for word, c in vocab.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    symbols = list(word) + [_EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_encode_udf(merges: list[tuple[str, str]], lowercase: bool = True):
    """Build a Pandas UDF: text → array of subword tokens. The merge
    table ships as a closure (vocab-sized); a per-batch word cache
    makes the amortized cost one ranked-merge pass per DISTINCT word
    per batch — Zipf does the rest."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def f(s: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for text in s:
            text = (text or "")
            if lowercase:
                text = text.lower()
            toks: list[str] = []
            for w in text.split():
                enc = cache.get(w)
                if enc is None:
                    enc = _encode_word(w, ranks)
                    cache[w] = enc
                toks.extend(enc)
            out.append(toks)
        return pd.Series(out)

    return f


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Add ``out_col`` (array<string> of subword tokens) to every row."""
    return docs.withColumn(out_col, bpe_encode_udf(merges, lowercase)(F.col(text_col)))


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Token-budget accounting under the learned vocabulary (what a
    training pipeline actually bills by)."""
    enc = bpe_encode_udf(merges, lowercase)(F.col(text_col))
    return docs.withColumn(out_col, F.size(enc).cast("long"))


def bpe_decode_col(toks: Column) -> Column:
    """Inverse of the encoder as a pure column expression: subword
    tokens concatenate byte-for-byte and every end-of-word marker
    becomes a space, so decode(encode(text)) equals the tokenizer's
    normalized view of ``text`` (lowercased if the encoder did,
    single-spaced) exactly — tested as a round-trip property. Caveat:
    text that itself contains the literal marker string '</w>' would
    decode with extra spaces (the classic sentinel trade; GPT-2 BPE
    has the same property with its byte-level markers avoided)."""
    return F.trim(F.regexp_replace(F.concat_ws("", toks), F.lit(_EOW), F.lit(" ")))


def bpe_decode(
    docs: DataFrame,
    token_col: str = "bpe_tokens",
    out_col: str = "text_decoded",
) -> DataFrame:
    """Add ``out_col``: the text reassembled from ``token_col``. JVM-
    side (concat + one literal replace) — no Python stage, unlike the
    encoder whose merge loop genuinely needs one."""
    return docs.withColumn(out_col, bpe_decode_col(F.col(token_col)))
