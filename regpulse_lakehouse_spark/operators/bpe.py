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
    return train_bpe_from_word_freq(dict(word_freq), n_merges)


def train_bpe_from_word_freq(
    word_freq: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """The sequential merge-learning core of :func:`train_bpe`, exposed
    for frozen-literal training (see FROZEN_BPE_MERGES): given an
    explicit word→count table, return the ordered merge list. Pure
    Python, deterministic (ties break lexicographically)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
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


# ---------------------------------------------------------------------------
# Frozen-merges expression twin (the oracle-gradable scoring path)
# ---------------------------------------------------------------------------
# Same trick as quality_clf's FROZEN_TERM_WEIGHTS: training is inherently
# driver-side and order-dependent, but ENCODING under a FROZEN merge list
# is a deterministic string rewrite any SQL engine can reproduce. The
# merge list below is train_bpe_from_word_freq(dict(FROZEN_BPE_WORD_FREQ),
# 24) — tests/test_bpe.py re-derives it and asserts these literals still
# come out. The word table is the corpus-characteristic vocabulary (the
# synthetic documents fixture's 31-word vocabulary with its sf0.01
# counts), frozen so the merges never depend on which sf_dir runs.

FROZEN_BPE_WORD_FREQ: tuple[tuple[str, int], ...] = (
    ("join", 964), ("hash", 947), ("row", 943), ("batch", 937),
    ("scan", 936), ("column", 934), ("customer", 934), ("filter", 933),
    ("small", 928), ("slow", 918), ("merge", 918), ("order", 912),
    ("vector", 912), ("line", 910), ("data", 908), ("table", 908),
    ("agg", 901), ("value", 897), ("key", 896), ("stream", 888),
    ("window", 886), ("a", 880), ("spark", 880), ("part", 878),
    ("group", 878), ("big", 876), ("sort", 872), ("query", 871),
    ("fast", 854), ("the", 840), ("dup", 26),
)

#: ordered merge list learned from FROZEN_BPE_WORD_FREQ (n_merges=24).
#: Rank order matters: ('jo', 'in</w>') can only fire after ('i', 'n</w>')
#: and ('j', 'o') have built its operands — the expression twin applies
#: them as a literal-replace chain in exactly this order.
FROZEN_BPE_MERGES: tuple[tuple[str, str], ...] = (
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("er", "</w>"),
    ("o", "w"), ("ow", "</w>"), ("o", "r"), ("s", "t"),
    ("h", "</w>"), ("a", "t"), ("l", "u"), ("i", "n"),
    ("a", "</w>"), ("g", "</w>"), ("y", "</w>"), ("a", "r"),
    ("p", "ar"), ("t", "</w>"), ("i", "n</w>"), ("j", "o"),
    ("jo", "in</w>"), ("a", "s"), ("as", "h</w>"), ("h", "ash</w>"),
)

# The twin's string representation wraps EVERY symbol in its own pair of
# separator chars (so a pair pattern SEP+a+SEP+SEP+b+SEP never shares
# characters with an adjacent occurrence — one replace-all pass per merge
# is exact), marks end-of-word with a single control char, and puts a
# break char between words so no merge can cross a word boundary. All
# three are control chars absent from real text; rows that DO contain
# them still hash identically on both engines (same rewrite chain), and
# the bpe_expr_ok column flags them honestly.
_SEP = "\x01"   # wraps each symbol
_BRK = "\x02"   # word boundary — interrupts SEP+SEP adjacency
_EOW1 = "\x03"  # single-char stand-in for '</w>' inside the twin

#: portable whitespace class (explicit — Java \s includes \x0B, RE2 \s
#: does not; same issue functions/text.py::normalize_for_dedup fixed)
_WS_CLASS = "[ \\t\\n\\u000B\\f\\r]+"


def _twin_sym(s: str) -> str:
    """A frozen-merge element in the twin's alphabet ('</w>' → \\x03).
    The marker only ever appears as an element SUFFIX, so a plain
    replace is exact."""
    return s.replace(_EOW, _EOW1)


def bpe_frozen_columns(text_col: Column) -> dict[str, Column]:
    """Encode ``text_col`` under FROZEN_BPE_MERGES as PURE column
    expressions (no Python stage, no exchange) and return the gradable
    projections:

    - ``n_bpe_tokens``: subword token count under the frozen vocabulary
    - ``bpe_md5``: md5 of the full delimited token stream — one changed
      token anywhere changes it, so a DuckDB oracle re-running the same
      rewrite chain verifies the entire encoding, not just counts
    - ``bpe_expr_ok``: input contains none of the twin's control chars

    Equivalence with the real Arrow encoder (bpe_encode_udf) under the
    same frozen merges is pinned in tests/test_bpe.py; the replace-chain
    form is exact because (a) per-symbol wrapping makes same-merge
    occurrences non-overlapping and (b) a trained merge list's operands
    are always products of strictly earlier ranks, so in-rank-order
    replace-all ≡ the per-word min-rank loop."""
    s0 = F.trim(
        F.regexp_replace(
            F.lower(F.coalesce(text_col, F.lit(""))), _WS_CLASS, " "
        )
    )
    # wrap every char in its own separators ([\s\S] = any char in BOTH
    # Java and RE2 regex — '.' excludes different sets across engines)
    s = F.regexp_replace(s0, "([\\s\\S])", _SEP + "$1" + _SEP)
    # the single space between words becomes end-of-word + break
    s = F.replace(s, F.lit(_SEP + " " + _SEP), F.lit(_SEP + _EOW1 + _SEP + _BRK))
    # last word's end-of-word marker (empty text stays empty)
    s = F.when(F.length(s0) > 0, F.concat(s, F.lit(_SEP + _EOW1 + _SEP))).otherwise(
        F.lit("")
    )
    for a, b in FROZEN_BPE_MERGES:
        a, b = _twin_sym(a), _twin_sym(b)
        s = F.replace(
            s,
            F.lit(_SEP + a + _SEP + _SEP + b + _SEP),
            F.lit(_SEP + a + b + _SEP),
        )
    ok = ~(
        F.coalesce(text_col, F.lit("")).contains(_SEP)
        | F.coalesce(text_col, F.lit("")).contains(_BRK)
        | F.coalesce(text_col, F.lit("")).contains(_EOW1)
    )
    return {
        **bpe_stream_stats(s),
        "bpe_expr_ok": ok,
        # exposed for two-level projection / tests (see bpe_stream_stats)
        "_bpe_stream": s,
        "_bpe_normalized": s0,
    }


def bpe_stream_stats(stream: Column) -> dict[str, Column]:
    """Token count + stream hash from a (possibly already-projected)
    twin stream. PERFORMANCE NOTE: embedding the full rewrite chain
    three times (length, replace, md5) makes Catalyst analyze/compile
    three copies — measured 4× slower cold AND warm than projecting the
    stream once and deriving these from the column reference (Spark's
    CollapseProject correctly refuses to re-inline the expensive alias).
    Graded rows should select ``_bpe_stream`` in an inner projection and
    apply this to the reference."""
    # explicit floor: for well-formed streams the separator count is
    # even, but a control-char INPUT makes it odd, and double→bigint
    # rounds differently across engines (Spark truncates, DuckDB rounds)
    n_tokens = F.floor(
        (F.length(stream) - F.length(F.replace(stream, F.lit(_SEP), F.lit("")))) / 2
    ).cast("long")
    return {"n_bpe_tokens": n_tokens, "bpe_md5": F.md5(stream)}


def bpe_frozen_oracle_stream(text_sql: str = "text") -> str:
    """The twin's full rewrite chain spelled in DuckDB SQL (RE2 regex +
    literal replace) — evaluates to the delimited token-stream string."""
    s0 = (
        f"trim(regexp_replace(lower(coalesce({text_sql}, '')), "
        f"'[ \t\n\x0b\f\r]+', ' ', 'g'))"
    )
    s = f"regexp_replace({s0}, '([\\s\\S])', '{_SEP}\\1{_SEP}', 'g')"
    s = f"replace({s}, '{_SEP} {_SEP}', '{_SEP}{_EOW1}{_SEP}{_BRK}')"
    s = (
        f"(CASE WHEN length({s0}) > 0 THEN {s} || '{_SEP}{_EOW1}{_SEP}' "
        f"ELSE '' END)"
    )
    for a, b in FROZEN_BPE_MERGES:
        a, b = _twin_sym(a), _twin_sym(b)
        s = f"replace({s}, '{_SEP}{a}{_SEP}{_SEP}{b}{_SEP}', '{_SEP}{a}{b}{_SEP}')"
    return s


def bpe_frozen_oracle_stream_stats(stream_sql: str) -> dict[str, str]:
    """DuckDB twins of :func:`bpe_stream_stats`, over an already-named
    stream expression (use a CTE/lateral so the chain runs once)."""
    n_tokens = (
        f"CAST(floor((length({stream_sql}) - "
        f"length(replace({stream_sql}, '{_SEP}', ''))) / 2) AS BIGINT)"
    )
    return {"n_bpe_tokens": n_tokens, "bpe_md5": f"md5({stream_sql})"}


def bpe_frozen_oracle_ok(text_sql: str = "text") -> str:
    """DuckDB twin of the ``bpe_expr_ok`` honesty flag."""
    return (
        f"(position('{_SEP}' IN coalesce({text_sql}, '')) = 0 AND "
        f"position('{_BRK}' IN coalesce({text_sql}, '')) = 0 AND "
        f"position('{_EOW1}' IN coalesce({text_sql}, '')) = 0)"
    )


def bpe_frozen_oracle_exprs(text_sql: str = "text") -> dict[str, str]:
    """The DuckDB re-derivation of :func:`bpe_frozen_columns` as
    standalone snippets (the stream chain inlined per output — fine for
    tests; graded SQL should name the stream once in a CTE instead)."""
    s = bpe_frozen_oracle_stream(text_sql)
    return {
        **bpe_frozen_oracle_stream_stats(s),
        "bpe_expr_ok": bpe_frozen_oracle_ok(text_sql),
    }
