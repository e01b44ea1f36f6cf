"""Deterministic hash-based sampling — training-data-pipeline operators
(BASELINE.json north-star family, alongside dedup/decontamination).

``df.sample()`` / ``sampleBy()`` draw from an RNG seeded per partition:
a task RETRY re-draws different rows (Spark documents sample() as not
guaranteed deterministic), partition count changes the result, and two
runs over the same data can disagree — all fatal for reproducible
training corpora. Hash-gating fixes every one of those: a row is in the
sample iff ``xxhash64(seed, key...)`` falls under the fraction cutoff,
so membership is a pure row-local function of the key — stable under
retries, re-partitioning, engine version, and cluster size, and
composable (the same key always lands in the same split).

All three operators are plain filters/projections: zero shuffles, fully
codegen'd, trivially pushed beneath wide downstream plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

# 2^63 - 1 as float; xxhash64 & MAX_LONG is uniform on [0, 2^63)
_HALF_RANGE = float(1 << 63)
# md5_long is the first 60 bits of the digest
_MD5_RANGE = float(1 << 60)


def _unit_hash(seed: str, keys: list[Column]) -> Column:
    """Deterministic uniform [0,1) value per key tuple."""
    h = F.xxhash64(F.lit(seed), *keys)
    return h.bitwiseAND(F.lit((1 << 63) - 1)) / F.lit(_HALF_RANGE)


def _unit_hash_md5(seed: str, keys: list[Column]) -> Column:
    """Portable twin of :func:`_unit_hash`: first 60 bits of
    ``md5('{seed}:' || keys-as-strings ⊕ 0x1f)`` scaled to [0,1).
    Bit-reproducible OUTSIDE Spark (DuckDB / pandas / anything with
    md5) — use when a sample or split must be recomputable by another
    engine; the int→double cast rounds identically everywhere (IEEE
    round-to-nearest) and the 2^60 scale is an exact power of two.
    Keys are cast to strings, so cross-engine equality inherits the
    engines' shared integer/string rendering (fine for int/string
    keys; don't key md5 mode on raw floats).

    Null contract: md5 mode REJECTS NULL key values at evaluation
    time (raise_error). concat_ws silently skips NULL columns, so
    ('a', NULL) and (NULL, 'a') would otherwise join to the same
    string and collide — diverging from xxh64 mode, where NULL is a
    distinct hashed value (round-12 advice). Callers with nullable
    keys must coalesce to an explicit sentinel themselves (choosing
    one silently here would change every existing md5-mode split) or
    use xxh64 mode."""
    return md5_long(_md5_joined(keys), seed).cast("double") / F.lit(_MD5_RANGE)


def _md5_joined(keys: list[Column]) -> Column:
    """Null-rejecting string join shared by every md5-mode keyer."""
    guarded = [
        F.when(
            k.isNull(),
            F.raise_error(
                F.lit(
                    "hash_mode='md5' requires non-null key values: concat_ws "
                    "drops NULLs, so ('a',NULL) and (NULL,'a') would collide. "
                    "Coalesce keys to a sentinel or use hash_mode='xxh64'."
                )
            ),
        ).otherwise(k.cast("string"))
        for k in keys
    ]
    return F.concat_ws("\x1f", *guarded)


def _unit(seed: str, keys: list[Column], hash_mode: str) -> Column:
    if hash_mode == "xxh64":
        return _unit_hash(seed, keys)
    if hash_mode == "md5":
        return _unit_hash_md5(seed, keys)
    raise ValueError(f"hash_mode must be 'xxh64' or 'md5', got {hash_mode!r}")


def hash_sample(
    df: DataFrame,
    fraction: float,
    keys: list[str],
    seed: str = "sample",
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Deterministic ~``fraction`` sample keyed on ``keys``: a row
    survives iff its key hash falls under the cutoff. Same key ⇒ same
    decision everywhere, so sampling the same table twice (or on two
    clusters) yields the identical subset. ``hash_mode='md5'`` makes
    the decision reproducible outside Spark too (see
    :func:`_unit_hash_md5`)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    if fraction == 1.0:
        # fraction=1.0 must keep EVERY row, but the unit hash can
        # round to exactly 1.0 (a 63/60-bit value within half an ulp
        # of the range top survives the int→double cast as the range
        # itself), so `u < 1.0` would drop ~2^-53 of rows — keyed,
        # hence deterministically, not randomly (round-12 advice)
        return df
    return df.filter(_unit(seed, [F.col(k) for k in keys], hash_mode) < fraction)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    keys: list[str],
    default_fraction: float = 0.0,
    seed: str = "sample",
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible counterpart
    of ``sampleBy``): each stratum value gets its own keep-fraction;
    unlisted strata fall back to ``default_fraction``. The cutoff is a
    literal CASE over the stratum column — still one shuffle-free
    filter."""
    for v, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for stratum {v!r} must be in [0,1], got {f_}")
    cutoff = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(F.col(strata_col) == value, F.lit(float(frac))).otherwise(cutoff)
    # `cutoff >= 1.0` keeps full strata exactly (same rounding edge as
    # hash_sample's fraction=1.0 fast path: the unit hash can round to
    # exactly 1.0 for ~2^-53 of keys)
    u = _unit(seed, [F.col(k) for k in keys], hash_mode)
    return df.filter((cutoff >= 1.0) | (u < cutoff))


def assign_splits(
    df: DataFrame,
    keys: list[str],
    weights: dict[str, float],
    split_col: str = "split",
    seed: str = "split",
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Deterministic dataset split assignment (train/val/test): each key
    tuple maps to exactly one split, with expected proportions given by
    ``weights`` (normalized; order-stable by sorted split name). Returns
    ``df`` plus ``split_col`` — disjoint and exhaustive by construction,
    and a given key lands in the same split on every engine run, which
    is what keeps eval sets leak-free across pipeline re-runs."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = float(sum(weights.values()))
    u = _unit(seed, [F.col(k) for k in keys], hash_mode)
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        branch = F.when(u < acc, F.lit(name))
        expr = branch if expr is None else expr.when(u < acc, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, expr)


def select_by_budget(
    df: DataFrame,
    weight_col: str,
    budget: float,
    score_col: str,
    keys: list[str],
    n_bins: int = 1000,
    seed: str = "budget",
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Budget-constrained data selection: keep the HIGHEST-``score_col``
    subset whose total ``weight_col`` (e.g. token count) is ≈ ``budget``
    — "take the best N tokens", the selection step between quality
    scoring and mixing in a training pipeline.

    Scale shape: the naive formulation (global sort by score + running
    cumulative sum) funnels the corpus through one ordered window — a
    single-task scan at 100 TB. Instead: one agg for the score range,
    one groupBy for a ``n_bins`` weight histogram over scores, a
    driver-side cumulative over the (tiny) histogram to find the
    threshold bin, then one filter — three narrow passes, no global
    sort. Rows strictly above the threshold bin are all kept; the
    boundary bin is trimmed to the remaining budget by a deterministic
    hash gate on ``keys`` (same retry/cluster stability as hash_sample),
    so total weight lands within one bin's granularity of ``budget``
    in expectation. Bin granularity is the precision/pass-count trade —
    raise ``n_bins`` for tighter budgets.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    w = F.col(weight_col).cast("double")
    s = F.col(score_col).cast("double")
    rng = df.agg(
        F.min(s).alias("lo"), F.max(s).alias("hi"), F.sum(w).alias("total")
    ).first()
    if rng["total"] is None:
        return df.limit(0)
    if rng["total"] <= budget:
        return df  # everything fits
    if rng["lo"] is None:
        # weights exist (total > budget) but every score is NULL —
        # there is no score order to select "the best" by
        raise ValueError(
            f"select_by_budget: all values of score column {score_col!r} are "
            "NULL but total weight exceeds the budget; cannot rank rows"
        )
    lo, hi = float(rng["lo"]), float(rng["hi"])
    span = (hi - lo) or 1.0
    bin_of = F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor((s - lo) / span * n_bins).cast("int")),
    )
    hist = {
        r["b"]: r["wsum"]
        for r in df.groupBy(bin_of.alias("b")).agg(F.sum(w).alias("wsum")).collect()
    }
    # walk bins from the top score down until the budget is crossed
    acc = 0.0
    cut_bin, cut_frac = -1, 0.0
    for b in range(n_bins - 1, -1, -1):
        bw = hist.get(b, 0.0)
        if acc + bw >= budget:
            cut_bin, cut_frac = b, (budget - acc) / bw if bw > 0 else 0.0
            break
        acc += bw
    gate = _unit(seed, [F.col(k) for k in keys], hash_mode) < F.lit(float(cut_frac))
    return df.filter((bin_of > cut_bin) | ((bin_of == cut_bin) & gate))


def deterministic_shuffle(
    df: DataFrame,
    keys: list[str],
    seed: str = "shuffle",
    n_shards: int | None = None,
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Reproducible global shuffle — the training-order scatter: order
    rows by ``xxhash64(seed, keys...)`` so the sequence is pseudo-random
    but a pure function of the keys, identical across runs, engines and
    cluster sizes (``orderBy(rand())`` re-draws per task attempt; a
    retried stage yields a different epoch order, which breaks exact
    training reproducibility).

    ``n_shards`` set → ``repartitionByRange(n_shards, _ord)`` + sort
    within partitions: shard i holds the i-th contiguous slice of the
    shuffled order, ready for ``write.parquet`` as ordered training
    shards (one range-exchange; the range partitioner samples the hash,
    it never global-sorts twice). The GLOBAL order is deterministic;
    the shard CUT POINTS come from the range partitioner's sample, so
    a row near a boundary may land in the adjacent shard on a re-run —
    readers that consume shards in index order see the identical
    sequence regardless. ``n_shards=None`` → a plain global ``orderBy``
    for small frames. Different ``seed`` ⇒ a fresh independent
    permutation per epoch."""
    if hash_mode == "xxh64":
        ordcol = F.xxhash64(F.lit(seed), *[F.col(k) for k in keys])
    elif hash_mode == "md5":
        # same null-rejecting join as _unit_hash_md5 — a silent NULL
        # skip here would give colliding order keys across positions
        ordcol = md5_long(_md5_joined([F.col(k) for k in keys]), seed)
    else:
        raise ValueError(f"hash_mode must be 'xxh64' or 'md5', got {hash_mode!r}")
    tagged = df.withColumn("_ord", ordcol)
    if n_shards is None:
        return tagged.orderBy("_ord").drop("_ord")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be > 0, got {n_shards}")
    return (
        tagged.repartitionByRange(n_shards, "_ord")
        .sortWithinPartitions("_ord")
        .drop("_ord")
    )


def temperature_weights(masses: dict[str, float], tau: float) -> dict[str, float]:
    """Temperature-scaled mixture weights — the standard multilingual /
    multi-domain pretraining knob (mC4/mT5, XLM-R): w_s ∝ mass_s^tau,
    normalized. tau=1 reproduces natural proportions, tau=0 is uniform,
    intermediate values up-sample scarce sources without letting any
    single giant source dominate. Feed the result straight into
    :func:`mix_corpus` (whose ``max_epochs`` cap then bounds how hard a
    tiny source may be repeated)."""
    if not masses:
        raise ValueError("masses must be non-empty")
    if tau < 0:
        raise ValueError(f"tau must be >= 0, got {tau}")
    if any(m < 0 for m in masses.values()) or sum(masses.values()) <= 0:
        raise ValueError("masses must be non-negative with a positive sum")
    raw = {s: float(m) ** tau if m > 0 else 0.0 for s, m in masses.items()}
    z = sum(raw.values())
    return {s: v / z for s, v in raw.items()}


def mix_corpus(
    sources: dict[str, DataFrame],
    weights: dict[str, float],
    keys: list[str],
    total: float | None = None,
    weight_col: str | None = None,
    max_epochs: float = 4.0,
    masses: dict[str, float] | None = None,
    source_col: str = "mixture_source",
    epoch_col: str = "epoch",
    seed: str = "mixture",
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Weighted mixture composition — the LLM data-mixing operator:
    combine named sources at target proportions, down-sampling abundant
    sources and up-sampling (repeating) scarce ones up to ``max_epochs``.

    Proportions are measured in rows, or in ``weight_col`` units (pass
    the token-count column to mix by token budget — the usual contract
    for pretraining mixtures). ``total`` is the target output mass; when
    omitted it is the largest budget every source can serve within its
    epoch cap, i.e. min over sources of ``max_epochs·mass_s / w_s`` —
    so the default never repeats any source more than ``max_epochs``
    times and uses the binding (scarcest-relative-to-weight) source
    fully.

    Mechanics per source: epochs_s = w_s·total / mass_s; emit
    ``floor(epochs_s)`` full copies plus a hash-gated fractional copy
    (operators above: membership is a pure function of the key tuple +
    copy index, so the mixture is identical across retries, partition
    layouts, and clusters — ``df.sample``'s failure modes don't apply).
    Replication is a row-local ``explode(sequence(...))`` — zero
    shuffles, no driver loop; each copy carries its index in
    ``epoch_col`` so downstream shuffles (training-order scatter) can
    de-correlate repeats.

    Source masses require one count/sum action per source; at 100 TB
    pass precomputed ``masses`` (e.g. from table stats or the corpus
    profiler) to skip the scans. Source schemas must be union-compatible
    by name (``unionByName``).
    """
    if not sources:
        raise ValueError("sources must be non-empty")
    if set(weights) != set(sources):
        raise ValueError("weights keys must match sources keys")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be > 0, got {max_epochs}")
    wsum = float(sum(weights.values()))
    w = {s: weights[s] / wsum for s in sources}

    if masses is None:
        masses = {}
        for name, df in sources.items():
            if weight_col is None:
                masses[name] = float(df.count())
            else:
                row = df.agg(F.sum(F.col(weight_col).cast("double"))).first()
                masses[name] = float(row[0] or 0.0)
    elif set(masses) != set(sources):
        # extra keys crash later as a raw KeyError in the zero-mass
        # loop (round-4 advice); reject both directions up front
        raise ValueError(
            "masses keys must match sources: "
            f"missing {sorted(set(sources) - set(masses))}, "
            f"extra {sorted(set(masses) - set(sources))}"
        )
    for name, m in masses.items():
        if w[name] > 0 and m <= 0:
            raise ValueError(f"source {name!r} has zero mass but positive weight")

    if total is None:
        total = min(
            max_epochs * masses[s] / w[s] for s in sources if w[s] > 0
        )

    parts = []
    for name in sorted(sources):
        if w[name] == 0:
            continue
        df = sources[name]
        epochs = w[name] * total / masses[name]
        if epochs > max_epochs * (1 + 1e-9):
            raise ValueError(
                f"source {name!r} needs {epochs:.2f} epochs for this total; "
                f"cap is {max_epochs} — lower total or raise max_epochs"
            )
        n_full = int(epochs)
        frac = epochs - n_full
        key_cols = [F.col(k) for k in keys]
        copies = df.withColumn(
            epoch_col,
            F.explode(F.sequence(F.lit(0), F.lit(n_full))),
        )
        # copy index n_full is the fractional epoch: hash-gated on
        # (seed, epoch, keys) so each repeat draws an independent subset
        gate = _unit(seed, [F.col(epoch_col), *key_cols], hash_mode) < F.lit(float(frac))
        kept = copies.filter((F.col(epoch_col) < n_full) | gate)
        parts.append(kept.withColumn(source_col, F.lit(name)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    cap: int,
    keys: list[str],
    seed: str = "cap",
    hash_mode: str = "xxh64",
) -> DataFrame:
    """Deterministic per-group frequency cap — "at most ``cap``
    documents per domain", the standard web-corpus curation rule
    (C4/Dolma cap pages per site so one mega-domain can't dominate the
    mixture). Which rows survive is decided by the key hash (same
    tie-break family as ``hash_sample``), so re-runs and re-shards
    keep the identical subset.

    Scale shape: counting every group and windowing every row would
    sort the whole corpus per group. Instead:

    1. one groupBy counts group sizes (map-side combine; output is one
       row per group, tiny relative to the corpus);
    2. ONLY the over-cap group set — rare in web corpora, bounded by
       corpus_rows/cap in the worst case — is broadcast (broadcasting
       the under-cap majority would ship ~every distinct domain to
       every executor); rows of under-cap groups pass through on a
       LEFT-ANTI against it with ZERO window work;
    3. only rows of over-cap groups enter the row_number window,
       ordered by (hash, keys) for determinism.

    Group matching is null-safe (``eqNullSafe``): rows whose group
    value is NULL form a real group that is capped like any other,
    never silently dropped.

    Spark's rank-limit pushdown (WindowGroupLimit, partial mode) then
    caps each over-cap group to its top-``cap`` rows map-side BEFORE
    the exchange — so even a pathological mega-group ships at most
    cap × n_upstream_tasks rows into the final per-group sort, not its
    full row count. Pair with ``hash_sample`` pre-thinning only for
    caps large enough that cap × tasks itself hurts."""
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    from functools import reduce

    from pyspark.sql.window import Window as W

    sizes = df.groupBy(*group_cols).agg(F.count("*").alias("_gn"))
    big = F.broadcast(
        sizes.filter(F.col("_gn") > cap).select(
            *[F.col(c).alias(f"_big_{c}") for c in group_cols]
        )
    )
    cond = reduce(
        lambda a, b: a & b,
        [df[c].eqNullSafe(F.col(f"_big_{c}")) for c in group_cols],
    )
    under = df.join(big, cond, "left_anti")
    h = _unit(seed, [F.col(k) for k in keys], hash_mode)
    w = W.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        h.asc(), *[F.col(k).asc() for k in keys]
    )
    trimmed = (
        df.join(big, cond, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return under.unionByName(trimmed)
