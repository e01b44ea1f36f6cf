"""Mergeable HyperLogLog sketches as pure relational algebra —
persistable distinct-count partials (Flajolet et al. 2007, with the
small-range correction).

Beyond-reference operator (the reference has plain COUNT(DISTINCT);
BASELINE.json's profiling family motivates sketches). Spark's own
``approx_count_distinct`` IS an HLL++, but its state lives only inside
one aggregation — it cannot be persisted, shipped, or merged across
jobs. These operators materialize the sketch itself as a column
(``map<bucket, rho>``, sparse — empty registers are absent), which is
what a 100 TB deployment needs: compute per-partition/per-day partials
once, store them (kilobytes per group), and answer "distinct users
this quarter" by merging 90 daily sketches instead of re-scanning a
quarter of raw events.

Everything is column expressions: bucket/rho from ``xxhash64`` via
``shiftrightunsigned`` + ``bin`` string length (EXACT leading-zero
count — ``floor(log2(w))`` on doubles is off-by-one near powers of
two), registers via one groupBy max, merge via explode + max (or
``map_zip_with`` + ``greatest`` for two columns). Deterministic hash ⇒
merged registers are byte-equal to direct registers, so
merge-vs-direct equality is EXACT, not approximate (tested).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _alpha(m: int) -> float:
    if m <= 16:
        return 0.673
    if m <= 32:
        return 0.697
    if m <= 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _bucket_rho(value: Column, p: int, base: str = "xxhash64") -> tuple[Column, Column]:
    """(bucket, rho) for one value: low p hash bits pick the register,
    rho = leading-zero count of the remaining nbits-p bits, + 1.

    ``base``: "xxhash64" (default, 64-bit, fastest) or "md5" — the
    60-bit md5 slice (functions/hashing.md5_long) that DuckDB reproduces
    bit-for-bit, making register tables cross-engine hash-checkable
    (the same portability trick as the MinHash/SimHash families). The
    4 lost hash bits only shrink the max observable rho (56 vs 60 at
    p=9), irrelevant below ~10^16 distincts."""
    if base == "md5":
        from ..functions.hashing import md5_long

        h, nbits = md5_long(value), 60
    elif base == "xxhash64":
        h, nbits = F.xxhash64(value), 64
    else:
        raise ValueError(f"base must be 'xxhash64' or 'md5', got {base!r}")
    bucket = h.bitwiseAND(F.lit((1 << p) - 1))
    w = F.shiftrightunsigned(h, p)
    # bin(w) drops leading zeros → its length is floor(log2(w)) + 1,
    # exactly; w == 0 means all nbits-p bits are zero → rho = nbits-p+1
    rho = F.when(w == 0, F.lit(nbits - p + 1)).otherwise(
        F.lit(nbits - p + 1) - F.length(F.bin(w))
    )
    return bucket, rho


def hll_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 9,
    base: str = "xxhash64",
) -> DataFrame:
    """One sparse HLL sketch per group: (group_cols..., hll
    map<int,int>). 2^p registers (p=9 → ~2.3 % standard error, ≤ ~4 KB
    per group). Two narrow shuffles of register-sized data: (group,
    bucket) max then the per-group re-pack — partial aggregation
    collapses duplicate values map-side before the first. NULL values
    are excluded, matching COUNT(DISTINCT) semantics (xxhash64(NULL)
    is the seed constant — without the filter every null-bearing group
    gains one phantom distinct). ``base`` picks the hash family — see
    :func:`_bucket_rho` ("md5" = the DuckDB-portable 60-bit slice)."""
    if not 4 <= p <= 16:
        raise ValueError(f"p must be in [4, 16], got {p}")
    bucket, rho = _bucket_rho(F.col(value_col), p, base)
    regs = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, bucket.alias("_b"), rho.alias("_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.max("_r").alias("_r"))
    )
    return _pack_registers(regs, group_cols, "hll")


def _pack_registers(regs: DataFrame, group_cols: list[str], hll_col: str) -> DataFrame:
    """(group..., _b, _r) register rows → one sparse map per group."""
    return regs.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("_b", "_r"))).alias(hll_col)
    )


def hll_merge(a: Column, b: Column) -> Column:
    """Register-wise max of two sketch columns (either may be null —
    treated as empty). The merge is associative/commutative and
    lossless: merging partials equals sketching the union."""
    a_ = F.coalesce(a, F.map_from_arrays(F.array(), F.array()))
    b_ = F.coalesce(b, F.map_from_arrays(F.array(), F.array()))
    both = F.map_zip_with(a_, b_, lambda k, x, y: F.greatest(x, y))
    # map_zip_with keeps keys from both sides; greatest(null, v) = v
    return both


def hll_merge_agg(partials: DataFrame, group_cols: list[str], hll_col: str = "hll") -> DataFrame:
    """Merge MANY persisted sketch rows per group (e.g. daily partials
    → quarterly sketch): explode registers, max per bucket, re-pack.
    Linear in total register entries; two narrow shuffles of
    register-sized data ((group, bucket) then the per-group pack)."""
    regs = (
        partials.select(*group_cols, F.explode(F.col(hll_col)).alias("_b", "_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.max("_r").alias("_r"))
    )
    return _pack_registers(regs, group_cols, hll_col)


def hll_estimate(hll: Column, p: int = 9) -> Column:
    """Distinct-count estimate from a sparse sketch column. Harmonic
    mean over all 2^p registers (absent = 0 → contributes 2^0 = 1),
    with the small-range linear-counting correction when empty
    registers remain. ``p`` MUST match the sketch's build-time p — a
    mismatch is detected (a register key ≥ 2^p is impossible under the
    right p) and raises rather than returning garbage (a too-small p
    silently produced NEGATIVE estimates before this guard)."""
    m = 1 << p
    bad = F.coalesce(F.array_max(F.map_keys(hll)), F.lit(-1)) >= m
    vals = F.map_values(hll)
    sum_pow = F.aggregate(
        vals, F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double"))
    ) + (F.lit(m) - F.size(vals))  # absent registers: 2^-0 each
    raw = F.lit(_alpha(m) * m * m) / sum_pow
    zeros = F.lit(m) - F.size(vals)
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    est = F.round(F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)).cast("long")
    return F.when(
        bad,
        F.raise_error(
            F.lit(f"hll_estimate: register key >= {m} — sketch built with larger p")
        ).cast("long"),
    ).otherwise(est)


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    p: int = 9,
) -> DataFrame:
    """Convenience: per-group approximate distinct counts,
    (group_cols..., approx_distinct)."""
    parts = hll_partials(df, group_cols, value_col, p)
    return parts.select(
        *group_cols, hll_estimate(F.col("hll"), p).alias("approx_distinct")
    )


# --- DDSketch: mergeable relative-error quantiles ---------------------


def _gamma(rel_err: float) -> float:
    if not 0.0 < rel_err < 1.0:
        raise ValueError(f"rel_err must be in (0, 1), got {rel_err}")
    return (1.0 + rel_err) / (1.0 - rel_err)


def dd_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    rel_err: float = 0.01,
) -> DataFrame:
    """One DDSketch per group (Masson et al. 2019): (group_cols...,
    ddsketch map<int,long>) over POSITIVE values — bucket k =
    ceil(log_γ(x)) with γ = (1+ε)/(1-ε) guarantees every value in
    bucket k is within relative error ε of the bucket midpoint, so any
    quantile estimate is ε-accurate by construction. Mergeable by
    bucket-count ADDITION (exact — merging partials equals sketching
    the union, tested), persistable like the HLL sketches above, same
    two narrow register-sized shuffles. Nulls and non-positive values
    are excluded (log undefined; the paper's negative-store extension
    is out of scope, documented)."""
    g = _gamma(rel_err)
    x = F.col(value_col).cast("double")
    bucket = F.ceil(F.log(x) / F.lit(math.log(g))).cast("int")
    # NaN > 0 is TRUE under Spark's NaN-sorts-highest semantics — an
    # explicit isnan guard keeps NaNs out (they'd land in bucket 0 and
    # drag every quantile toward ~1.0)
    regs = (
        df.where(x.isNotNull() & ~F.isnan(x) & (x > 0))
        .select(*group_cols, bucket.alias("_b"))
        .groupBy(*group_cols, "_b")
        .agg(F.count("*").alias("_r"))
    )
    return _pack_registers(regs, group_cols, "ddsketch")


def dd_merge(a: Column, b: Column) -> Column:
    """Bucket-wise SUM of two sketch columns (null = empty)."""
    a_ = F.coalesce(a, F.map_from_arrays(F.array(), F.array()))
    b_ = F.coalesce(b, F.map_from_arrays(F.array(), F.array()))
    return F.map_zip_with(
        a_, b_, lambda k, x, y: F.coalesce(x, F.lit(0)) + F.coalesce(y, F.lit(0))
    )


def dd_merge_agg(
    partials: DataFrame, group_cols: list[str], dd_col: str = "ddsketch"
) -> DataFrame:
    """Fold many persisted sketch rows per group (daily → quarter):
    explode buckets, SUM per bucket, re-pack."""
    regs = (
        partials.select(*group_cols, F.explode(F.col(dd_col)).alias("_b", "_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.sum("_r").alias("_r"))
    )
    return _pack_registers(regs, group_cols, dd_col)


def dd_quantile(dd: Column, q: float, rel_err: float = 0.01) -> Column:
    """ε-relative-error quantile from a sketch column, pure
    expressions: sort the (bucket, count) entries, walk the cumulative
    counts with one ``aggregate`` fold to the bucket holding rank
    ceil(q·n), return the bucket midpoint 2γ^k/(γ+1). ``rel_err`` must
    match the sketch's build-time value (it determines γ; unlike HLL's
    p there is no impossible-key signature to detect a mismatch —
    document/centralize the constant in calling code)."""
    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    g = _gamma(rel_err)
    entries = F.array_sort(F.map_entries(dd))
    total = F.aggregate(entries, F.lit(0).cast("long"), lambda acc, e: acc + e["value"])
    rank = F.greatest(F.ceil(F.lit(q) * total.cast("double")).cast("long"), F.lit(1).cast("long"))
    # fold: acc = (cum, found_key); first bucket where cum >= rank wins
    found = F.aggregate(
        entries,
        F.struct(
            F.lit(0).cast("long").alias("cum"), F.lit(None).cast("int").alias("key")
        ),
        lambda acc, e: F.struct(
            (acc["cum"] + e["value"]).alias("cum"),
            F.when(acc["key"].isNotNull(), acc["key"])
            .when(acc["cum"] + e["value"] >= rank, e["key"])
            .alias("key"),
        ),
    )["key"]
    mid = F.lit(2.0) * F.pow(F.lit(g), found.cast("double")) / F.lit(g + 1.0)
    return F.when(total > 0, mid)


# --- Count-Min: mergeable frequency sketch + heavy hitters ------------


def _cm_key(value: Column, j: int, w: int, base: str = "xxhash64") -> Column:
    """Register key for hash row j: j*w + (hash_j(value) mod w).
    Packing (row, bucket) into one int keeps the sketch a flat
    map<int,long> like the HLL registers — same merge machinery.
    ``base="md5"`` uses the row-salted DuckDB-portable 60-bit md5 slice
    (functions/hashing.md5_long with seed=j) so register tables are
    cross-engine hash-checkable, the same trick as the HLL md5 base."""
    if base == "md5":
        from ..functions.hashing import md5_long

        b = F.pmod(md5_long(value, seed=str(j)), F.lit(w))
    elif base == "xxhash64":
        b = F.pmod(F.xxhash64(value, F.lit(j)), F.lit(w))
    else:
        raise ValueError(f"base must be 'xxhash64' or 'md5', got {base!r}")
    return (F.lit(j * w) + b).cast("int")


def cm_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    w: int = 1024,
    d: int = 4,
    base: str = "xxhash64",
) -> DataFrame:
    """One Count-Min sketch per group (Cormode & Muthukrishnan 2005):
    (group_cols..., cm map<int,long>) with d hash rows of w buckets.
    Point estimates are one-sided (never under-count) with error
    ≤ N·e/w at probability 1-e^-d. Like the HLL partials, the sketch
    is a persistable DataFrame column: build daily partials once,
    merge by bucket-wise ADDITION (linear ⇒ lossless), and answer
    "how often did domain X appear this quarter" without re-scanning.

    Build cost: d register rows per record, collapsed map-side by the
    (group, key) count — the shuffle carries at most d·w rows per
    group regardless of input size. NULLs are excluded."""
    if w < 2 or d < 1:
        raise ValueError(f"need w >= 2, d >= 1, got w={w}, d={d}")
    keys = F.array(*[_cm_key(F.col(value_col), j, w, base) for j in range(d)])
    regs = (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.explode(keys).alias("_b"))
        .groupBy(*group_cols, "_b")
        .agg(F.count(F.lit(1)).alias("_r"))
    )
    return _pack_registers(regs, group_cols, "cm")


def cm_merge(a: Column, b: Column) -> Column:
    """Bucket-wise SUM of two sketch columns (either may be null).
    Count-Min is linear, so the merge is exact: merged registers are
    byte-equal to a direct sketch of the concatenated data."""
    a_ = F.coalesce(a, F.map_from_arrays(F.array(), F.array()))
    b_ = F.coalesce(b, F.map_from_arrays(F.array(), F.array()))
    return F.map_zip_with(
        a_, b_, lambda k, x, y: F.coalesce(x, F.lit(0)) + F.coalesce(y, F.lit(0))
    )


def cm_merge_agg(
    partials: DataFrame, group_cols: list[str], cm_col: str = "cm"
) -> DataFrame:
    """Merge MANY persisted sketch rows per group: explode, sum per
    key, re-pack — two narrow register-sized shuffles."""
    regs = (
        partials.select(*group_cols, F.explode(F.col(cm_col)).alias("_b", "_r"))
        .groupBy(*group_cols, "_b")
        .agg(F.sum("_r").alias("_r"))
    )
    return _pack_registers(regs, group_cols, cm_col)


def cm_estimate(
    cm: Column, value: Column, w: int = 1024, d: int = 4, base: str = "xxhash64"
) -> Column:
    """Point frequency estimate: min over the d rows of the value's
    bucket counts (absent bucket = 0). w, d and base MUST match the
    build."""
    ests = [
        F.coalesce(F.element_at(cm, _cm_key(value, j, w, base)), F.lit(0))
        for j in range(d)
    ]
    return F.least(*ests)


def space_saving_candidates(
    df: DataFrame, value_col: str, capacity: int = 256
) -> DataFrame:
    """Per-partition SpaceSaving summaries (Metwally et al. 2005):
    ≤ ``capacity`` (value, est, err) rows PER PARTITION, kept across
    the partition's whole Arrow batch stream. Any item whose global
    frequency exceeds N/capacity is guaranteed to surface in at least
    one partition's summary (pigeonhole over the per-partition
    N_p/capacity guarantees) — the recall half of the distributed
    heavy-hitter contract; the precision half is an exact count of
    this SMALL candidate set."""
    if capacity < 1:
        raise ValueError(f"capacity must be >= 1, got {capacity}")
    import pandas as pd

    out_schema = f"`{value_col}` string, est long, err long"

    def gen(batches):
        counts: dict[str, list[int]] = {}  # value -> [est, err]
        for pdf in batches:
            # nulls are dropped and values cast to string SPARK-side
            # (see the select below) — gen only ever sees clean strings
            for v in pdf[value_col]:
                if v in counts:
                    counts[v][0] += 1
                elif len(counts) < capacity:
                    counts[v] = [1, 0]
                else:  # evict the minimum, inherit its count as error
                    mv = min(counts, key=lambda k: counts[k][0])
                    m_est = counts.pop(mv)[0]
                    counts[v] = [m_est + 1, m_est]
        yield pd.DataFrame(
            [(v, e, r) for v, (e, r) in counts.items()],
            columns=[value_col, "est", "err"],
        )

    # Cast to string SPARK-side, mirroring heavy_hitters' exact-count
    # pass: an Arrow batch carrying a null in an int column coerces the
    # pandas column to float64, so a Python-side str(v) would yield
    # '5.0' while the count pass casts to '5' — silently breaking the
    # candidate semi-join on any nullable input. Nulls are dropped
    # Spark-side for the same reason (a float NaN is not None).
    src = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias(value_col)
    )
    return src.mapInPandas(gen, schema=out_schema)


def heavy_hitters(
    df: DataFrame,
    value_col: str,
    threshold_ratio: float | None = None,
    top_k: int | None = None,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters without a full-cardinality shuffle:
    (value, count) for items above ``threshold_ratio``·N, or the
    ``top_k`` most frequent. Two passes — (1) bounded-memory
    SpaceSaving candidates per partition, (2) exact count of the
    candidate set via a BROADCAST semi-join — so the only groupBy runs
    over candidate rows, never the full domain. At 100 TB this is the
    difference between shuffling a billion-key domain histogram and
    broadcasting a few thousand candidates.

    The SpaceSaving guarantee makes pass-2 recall exact for any item
    with frequency > N/capacity; ``capacity`` defaults to enough
    headroom (4/threshold, or 8·top_k) that the guarantee covers the
    request. top_k additionally requires the k-th item to clear the
    N/capacity bar — true for any realistically skewed distribution
    at these capacities, and the returned counts are exact either
    way."""
    if (threshold_ratio is None) == (top_k is None):
        raise ValueError("pass exactly one of threshold_ratio or top_k")
    if threshold_ratio is not None and not 0.0 < threshold_ratio <= 1.0:
        raise ValueError(f"threshold_ratio must be in (0, 1], got {threshold_ratio}")
    if capacity is None:
        capacity = (
            max(64, int(4.0 / threshold_ratio))
            if threshold_ratio is not None
            else max(64, 8 * top_k)
        )
    cands = (
        space_saving_candidates(df, value_col, capacity)
        .select(value_col)
        .distinct()
    )
    src = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias(value_col)
    )
    counts = (
        src.join(F.broadcast(cands), value_col, "left_semi")
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).alias("count"))
    )
    if threshold_ratio is not None:
        n = src.count()
        return counts.where(F.col("count") >= math.ceil(threshold_ratio * n))
    return counts.orderBy(F.desc("count"), value_col).limit(top_k)


# --- KMV (k-minimum values): mergeable set-operation estimates --------


def _kmv_u(value: Column) -> Column:
    """Element hash normalized to (0, 1): unsigned xxhash64 / 2^64.
    Doubles keep 53 bits — collision probability is negligible at
    estimation precision, and the normalized form makes the
    (k-1)/u_k estimator direct."""
    h = F.xxhash64(value)
    return (h.cast("double") / F.lit(float(1 << 64))) + F.lit(0.5)


def kmv_partials(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """One KMV sketch per group (Bar-Yossef et al. 2002; the theta-
    sketch family): the k SMALLEST normalized hash values of the
    group's distinct elements, as a sorted array<double>. Unlike HLL,
    KMV supports SET OPERATIONS: intersection/Jaccard estimates
    between sketches — the corpus-overlap question (how much of
    training set A is inside B?) answered from two kilobyte
    summaries instead of a join of two 100 TB tables.

    Build is bounded-memory: (group, u) dedup, then per-group top-k
    via row_number (WindowGroupLimit pushes the limit into the sort),
    then one pack. A group with fewer than k distinct elements keeps
    ALL of them — estimates on such sketches are exact."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    from pyspark.sql import Window as W

    u = _kmv_u(F.col(value_col))
    w = W.partitionBy(*group_cols).orderBy("_u")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, u.alias("_u"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_u")).alias("kmv"))
    )


def kmv_merge(a: Column, b: Column, k: int = 256) -> Column:
    """Union-merge two sketches: distinct values, sorted, smallest k.
    Deterministic hashing makes the merge EXACT — byte-equal to a
    direct sketch of the concatenated data (tested)."""
    a_ = F.coalesce(a, F.array().cast("array<double>"))
    b_ = F.coalesce(b, F.array().cast("array<double>"))
    return F.slice(F.array_sort(F.array_distinct(F.concat(a_, b_))), 1, k)


def kmv_merge_agg(
    partials: DataFrame, group_cols: list[str], k: int = 256, kmv_col: str = "kmv"
) -> DataFrame:
    """Merge MANY persisted sketch rows per group: explode, per-group
    smallest-k, re-pack — register-sized shuffles only."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*group_cols).orderBy("_u")
    return (
        partials.select(*group_cols, F.explode(F.col(kmv_col)).alias("_u"))
        .distinct()
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_u")).alias(kmv_col))
    )


def kmv_estimate(kmv: Column, k: int = 256) -> Column:
    """Distinct-count estimate: exact sketch size when the group had
    fewer than k distinct elements, else the unbiased (k-1)/u_k."""
    full = F.size(kmv) >= k
    return F.when(
        full, F.round(F.lit(float(k - 1)) / F.element_at(kmv, k)).cast("long")
    ).otherwise(F.size(kmv).cast("long"))


def kmv_jaccard(a: Column, b: Column, k: int = 256) -> Column:
    """Jaccard similarity estimate between two sketches built with the
    SAME k: within the union's k smallest hashes (a uniform sample of
    the union), the fraction present in both sides. Exact when both
    sketches hold their full sets."""
    union_k = kmv_merge(a, b, k)
    common = F.size(F.array_intersect(union_k, F.array_intersect(a, b)))
    return F.when(F.size(union_k) == 0, F.lit(0.0)).otherwise(
        common.cast("double") / F.size(union_k)
    )


def kmv_intersection(a: Column, b: Column, k: int = 256) -> Column:
    """Intersection-size estimate: Jaccard × union estimate (the union
    sketch is just the merge)."""
    return F.round(
        kmv_jaccard(a, b, k) * kmv_estimate(kmv_merge(a, b, k), k)
    ).cast("long")


def dd_psi(a: Column, b: Column, eps: float = 1e-6) -> Column:
    """Population Stability Index between two DDSketch columns built
    with the SAME rel_err — the distribution-drift gate between
    training-data snapshots (PSI < 0.1 stable / 0.1-0.25 moderate /
    > 0.25 shifted, the standard reading): the sketches' shared
    log-bucketization IS the PSI binning, so drift between two 100 TB
    snapshots is a pure column expression over two kilobyte maps —
    no re-scan, no quantile inversion. Empty buckets smooth to
    ``eps`` (PSI's log needs support everywhere); the metric is
    symmetric and zero iff the bucket histograms match."""
    a_ = F.coalesce(a, F.map_from_arrays(F.array(), F.array()))
    b_ = F.coalesce(b, F.map_from_arrays(F.array(), F.array()))
    ta = F.aggregate(
        F.map_values(a_), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    tb = F.aggregate(
        F.map_values(b_), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    merged = F.map_zip_with(
        a_, b_,
        lambda k, x, y: F.struct(
            F.coalesce(x, F.lit(0)).cast("double").alias("x"),
            F.coalesce(y, F.lit(0)).cast("double").alias("y"),
        ),
    )
    def term(acc, s):
        pa = F.greatest(s["x"] / ta, F.lit(eps))
        pb = F.greatest(s["y"] / tb, F.lit(eps))
        return acc + (pa - pb) * F.log(pa / pb)

    return F.aggregate(F.map_values(merged), F.lit(0.0), term)
