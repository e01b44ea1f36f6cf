"""Property tests (SURVEY.md §5.3) — hypothesis-generated inputs, one
Spark job per example (rows batched through literal_dim so no
createDataFrame fork storm). Normalizers: closed output domains +
idempotence; dedup/upsert: at-most-one-per-key + correct survivor;
as-of join: equivalence with a brute-force point-in-time lookup."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from regpulse_lakehouse_spark.functions import literal_dim
from regpulse_lakehouse_spark.functions.normalize import normalize_priority
from regpulse_lakehouse_spark.functions.urls import canonicalize_url
from regpulse_lakehouse_spark.operators.asof import asof_join
from regpulse_lakehouse_spark.operators.dedup import first_wins, latest_wins

_SETTINGS = dict(max_examples=8, deadline=None, derandomize=True)

_text = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="'\\\"\x00"),
    max_size=30,
)


@settings(**_SETTINGS)
@given(st.lists(_text, min_size=1, max_size=30))
def test_normalize_priority_closed_domain_and_idempotent(spark, raws):
    df = literal_dim(spark, [(i, r) for i, r in enumerate(raws)], ["i", "raw"])
    out = df.select(
        "i",
        normalize_priority(F.col("raw")).alias("p1"),
        normalize_priority(normalize_priority(F.col("raw"))).alias("p2"),
    ).collect()
    for r in out:
        assert r["p1"] in ("P0", "P1", "P2")
        assert r["p2"] == r["p1"]  # idempotent


@settings(**_SETTINGS)
@given(st.lists(_text, min_size=1, max_size=20))
def test_canonicalize_url_idempotent(spark, tails):
    rows = [
        (i, f"https://www.example.com/{t}?utm_source=x&id={i}&utm_medium=rss/")
        for i, t in enumerate(tails)
    ]
    df = literal_dim(spark, rows, ["i", "url"])
    out = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in out:
        assert r["c2"] == r["c1"]
        assert "utm_" not in r["c1"]


_kv = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key (few → collisions)
        st.integers(min_value=0, max_value=100),  # order/version
        st.integers(min_value=0, max_value=10**6),  # payload
    ),
    min_size=1,
    max_size=40,
)


@settings(**_SETTINGS)
@given(_kv)
def test_first_latest_wins_survivors(spark, rows):
    # make (key, order) unique so the survivor is well-defined
    uniq = {(k, o): v for k, o, v in rows}
    rows = [(k, o, v) for (k, o), v in uniq.items()]
    df = literal_dim(spark, rows, ["k", "o", "v"])

    first = first_wins(df, ["k"], [F.asc("o")]).collect()
    latest = latest_wins(df, ["k"], [F.desc("o")]).collect()

    want_first = {}
    want_latest = {}
    for k, o, v in rows:
        if k not in want_first or o < want_first[k][0]:
            want_first[k] = (o, v)
        if k not in want_latest or o > want_latest[k][0]:
            want_latest[k] = (o, v)

    assert len(first) == len(want_first)  # at most/exactly one per key
    assert {r["k"]: (r["o"], r["v"]) for r in first} == want_first
    assert {r["k"]: (r["o"], r["v"]) for r in latest} == want_latest


@settings(**_SETTINGS)
@given(
    st.lists(  # left probes: (key, ts)
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
    ),
    st.lists(  # right snapshots: (key, ts, payload)
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 10**6)),
        min_size=1,
        max_size=25,
    ),
)
def test_asof_join_matches_bruteforce(spark, lefts, rights):
    lefts = [(i, k, ts) for i, (k, ts) in enumerate(lefts)]
    # unique (key, ts) on the right — the operator's documented contract
    uniq = {(k, ts): p for k, ts, p in rights}
    rights = [(k, ts, p) for (k, ts), p in uniq.items()]

    ldf = literal_dim(spark, lefts, ["i", "k", "lts"])
    rdf = literal_dim(spark, rights, ["k", "rts", "payload"])
    got = {
        r["i"]: r["payload"]
        for r in asof_join(ldf, rdf, key="k", left_ts="lts", right_ts="rts",
                           payload_cols=["payload"]).collect()
    }

    for i, k, lts in lefts:
        eligible = [(ts, p) for kk, ts, p in rights if kk == k and ts <= lts]
        want = max(eligible)[1] if eligible else None
        assert got[i] == want, (i, k, lts)


def _winnow_py(text: str, k: int = 5, w: int = 4) -> list[int]:
    import hashlib

    t = text.lower()
    n_g = max(len(t) - k + 1, 1)
    hs = [
        int(hashlib.md5(t[i : i + k].encode()).hexdigest()[:8], 16)
        for i in range(n_g)
    ]
    n_w = max(len(hs) - w + 1, 1)
    return [min(hs[j : j + w]) for j in range(n_w)]


@settings(**_SETTINGS)
@given(st.lists(st.text(alphabet="abcdef gh", min_size=0, max_size=60), min_size=1, max_size=15))
def test_winnow_fingerprints_match_bruteforce(spark, texts):
    from regpulse_lakehouse_spark.functions.text import winnow_fingerprints

    df = literal_dim(spark, [(i, t) for i, t in enumerate(texts)], ["i", "t"])
    out = df.select(
        "i", winnow_fingerprints(F.lower(F.col("t")), k=5, w=4).alias("fp")
    ).collect()
    got = {r["i"]: list(r["fp"]) for r in out}
    for i, t in enumerate(texts):
        assert got[i] == _winnow_py(t), (i, t)


def test_winnow_edit_locality(spark):
    """An edit at the end of the document must not disturb fingerprints
    of windows that don't overlap it — the property whole-document md5
    lacks."""
    from regpulse_lakehouse_spark.functions.text import winnow_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base[:-1] + "x"
    df = literal_dim(spark, [(0, base), (1, edited)], ["i", "t"])
    rows = {
        r["i"]: list(r["fp"])
        for r in df.select(
            "i", winnow_fingerprints(F.col("t"), k=5, w=4).alias("fp")
        ).collect()
    }
    a, b = rows[0], rows[1]
    assert len(a) == len(b) == len(base) - 5 + 1 - 4 + 1
    # everything before the edit's influence region is identical —
    # only the last k+w-1 windows can even see the changed char (and
    # they change only if the edited gram was/becomes a window min;
    # here it is not, so the fingerprints are FULLY identical: the
    # robustness md5-of-the-document cannot give)
    untouched = len(a) - (5 + 4 - 1)
    assert a[:untouched] == b[:untouched]
    assert a == b  # matches the brute-force oracle for this input
    assert _winnow_py(base) == a


_iv = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),   # lo
        st.integers(min_value=0, max_value=40),     # width
    ),
    min_size=1,
    max_size=12,
)
_pt = st.lists(st.integers(min_value=-60, max_value=110), min_size=1, max_size=25)


@settings(**_SETTINGS)
@given(_pt, _iv, st.sampled_from(["both", "left", "right", "neither"]),
       st.sampled_from([1.0, 7.0, 33.0]))
def test_interval_join_equals_brute_force(spark, pts, ivs, closed, width):
    from regpulse_lakehouse_spark.operators.rangejoin import interval_join

    p = literal_dim(spark, [(i, float(x)) for i, x in enumerate(pts)], ["pid", "x"])
    iv = literal_dim(
        spark,
        [(i, float(lo), float(lo + w)) for i, (lo, w) in enumerate(ivs)],
        ["iid", "lo", "hi"],
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(p, iv, "x", "lo", "hi", width, closed=closed).collect()
    }
    want = set()
    for i, x in enumerate(pts):
        for j, (lo, w) in enumerate(ivs):
            hi = lo + w
            lo_ok = lo <= x if closed in ("both", "left") else lo < x
            hi_ok = x <= hi if closed in ("both", "right") else x < hi
            if lo_ok and hi_ok:
                want.add((i, j))
    assert got == want


@settings(**_SETTINGS)
@given(
    st.integers(min_value=1, max_value=40),   # rows in source A
    st.integers(min_value=1, max_value=40),   # rows in source B
    st.floats(min_value=0.1, max_value=0.9),  # weight of A
)
def test_mix_corpus_epoch_accounting(spark, na, nb, wa):
    from regpulse_lakehouse_spark.operators.sampling import mix_corpus

    a = literal_dim(spark, [(i,) for i in range(na)], ["id"])
    b = literal_dim(spark, [(1000 + i,) for i in range(nb)], ["id"])
    out = mix_corpus(
        {"a": a, "b": b}, {"a": wa, "b": 1 - wa}, keys=["id"], max_epochs=3.0,
        masses={"a": float(na), "b": float(nb)},
    ).collect()
    # the binding source is emitted at exactly its epoch budget; every
    # row of every full epoch appears exactly once per epoch index
    for name, n, w in (("a", na, wa), ("b", nb, 1 - wa)):
        rows = [r for r in out if r["mixture_source"] == name]
        total = min(3.0 * na / wa, 3.0 * nb / (1 - wa))
        epochs = w * total / n
        full = int(epochs)
        by_epoch = {}
        for r in rows:
            by_epoch.setdefault(r["epoch"], set()).add(r["id"])
        for e in range(full):
            assert len(by_epoch.get(e, set())) == n  # full copies complete
        # fractional epoch is a strict subset
        frac_rows = by_epoch.get(full, set())
        assert len(frac_rows) <= n


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=200),    # weight
            st.integers(min_value=0, max_value=1000),   # score
        ),
        min_size=3,
        max_size=40,
    ),
    st.floats(min_value=0.1, max_value=0.9),            # budget fraction
)
def test_select_by_budget_tracks_sorted_prefix(spark, rows, frac):
    from regpulse_lakehouse_spark.operators.sampling import select_by_budget

    df = literal_dim(
        spark,
        [(i, float(w), float(s)) for i, (w, s) in enumerate(rows)],
        ["id", "w", "s"],
    )
    total = sum(w for w, _ in rows)
    budget = max(1.0, frac * total)
    out = select_by_budget(df, "w", budget, "s", keys=["id"], n_bins=100)
    got = {(r["id"], r["w"], r["s"]) for r in out.collect()}
    got_weight = sum(w for _, w, _ in got)
    span = (max(s for _, s in rows) - min(s for _, s in rows)) or 1
    bin_width = span / 100
    # brute-force reference: sort by score desc, weights of the prefix
    # strictly above the threshold bin must ALL be kept
    kept_scores = {s for _, _, s in got}
    if kept_scores:
        cutoff = min(kept_scores)
        for i, (w, s) in enumerate(rows):
            if s > cutoff + bin_width:
                assert (i, float(w), float(s)) in got, (i, w, s, cutoff)
    # budget respected within a bin of slack (gate noise on tiny
    # boundary bins can under/overshoot by that bin's weight)
    boundary_weight = max((w for w, s in rows), default=0)
    assert got_weight <= budget + boundary_weight * 2 + 1


@settings(**_SETTINGS)
@given(
    st.lists(
        st.integers(min_value=1, max_value=50),  # heavy ties by design
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=40),
)
def test_cap_top_counts_equals_plain_sort(spark, counts, cap):
    """The lm_score vocab prefilter must be invisible: for ANY count
    distribution (including adversarial all-ties, where the quantile
    threshold keeps everything or undershoots) the capped result equals
    the plain orderBy+limit."""
    from regpulse_lakehouse_spark.operators.lm_score import _cap_top_counts

    df = literal_dim(
        spark,
        [(f"k{i:04d}", c) for i, c in enumerate(counts)],
        ["token", "n"],
    )
    got = [tuple(r) for r in _cap_top_counts(df, "token", cap).collect()]
    want = [
        tuple(r)
        for r in df.orderBy(F.desc("n"), F.asc("token")).limit(cap).collect()
    ]
    assert got == want


# --- BM25 / duplicated spans (operators/retrieval.py, spans.py) ------

_word = st.text(alphabet="abcdef", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=25).map(" ".join)


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=12), st.lists(_word, min_size=1, max_size=3))
def test_bm25_matches_brute_force_on_random_corpora(spark, texts, qwords):
    import math

    from regpulse_lakehouse_spark.operators import retrieval as R

    corpus = [(f"d{i:02d}", t) for i, t in enumerate(texts)]
    df = literal_dim(spark, corpus, ["doc_id", "text"])
    query = " ".join(qwords)
    got = {r["doc_id"]: r["bm25"] for r in R.bm25_topk(df, query, k=50).collect()}

    docs = {i: t.lower().split() for i, t in corpus}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    terms = list(dict.fromkeys(query.lower().split()))
    dfreq = {t: sum(1 for tk in docs.values() if t in tk) for t in terms}
    want = {}
    for i, toks in docs.items():
        s = sum(
            math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            * toks.count(t) * 2.2
            / (toks.count(t) + 1.2 * (1 - 0.75 + 0.75 * len(toks) / max(avgdl, 1e-9)))
            for t in terms
            if toks.count(t)
        )
        if s > 0:
            want[i] = s
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-5, d


@settings(**_SETTINGS)
@given(st.lists(_doc, min_size=1, max_size=10))
def test_duplicated_spans_match_brute_force(spark, texts):
    from regpulse_lakehouse_spark.operators import spans as S

    k = 3
    corpus = [(f"d{i:02d}", t) for i, t in enumerate(texts)]
    df = literal_dim(spark, corpus, ["doc_id", "text"])
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in S.duplicated_spans(df, k=k, min_count=2).collect()
    }

    toks = {i: t.lower().split() for i, t in corpus}
    grams: dict[tuple, int] = {}
    for ts in toks.values():
        for p in range(len(ts) - k + 1):
            grams[tuple(ts[p : p + k])] = grams.get(tuple(ts[p : p + k]), 0) + 1
    dup = {g for g, c in grams.items() if c >= 2}
    want = set()
    for i, ts in toks.items():
        start = end = None
        for p in range(len(ts) - k + 1):
            if tuple(ts[p : p + k]) not in dup:
                continue
            if start is None:
                start, end = p, p + k
            elif p <= end:
                end = p + k
            else:
                want.add((i, start, end))
                start, end = p, p + k
        if start is not None:
            want.add((i, start, end))
    assert got == want

    # strip accounting: kept + removed == original token count, per doc
    out = {r["doc_id"]: r for r in S.strip_duplicated_spans(df, k=k).collect()}
    for i, ts in toks.items():
        assert len(out[i]["text"].split()) + out[i]["n_tokens_removed"] == len(ts)
