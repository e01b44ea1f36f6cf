"""Deterministic sampling operators (operators/sampling.py):
reproducibility (the whole point), rate accuracy, stratification,
split disjointness/exhaustiveness, and the zero-shuffle plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import sampling as SP

N = 4000


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("stratum"),
    )


def test_hash_sample_is_deterministic_and_close(ids):
    a = {r["id"] for r in SP.hash_sample(ids, 0.25, ["id"]).collect()}
    b = {r["id"] for r in SP.hash_sample(ids, 0.25, ["id"]).collect()}
    assert a == b
    # binomial(4000, .25): ±5 sigma ≈ ±137
    assert abs(len(a) - N * 0.25) < 140
    # repartitioning must not change membership
    c = {r["id"] for r in SP.hash_sample(ids.repartition(13), 0.25, ["id"]).collect()}
    assert a == c


def test_hash_sample_nests_by_fraction(ids):
    small = {r["id"] for r in SP.hash_sample(ids, 0.1, ["id"]).collect()}
    big = {r["id"] for r in SP.hash_sample(ids, 0.5, ["id"]).collect()}
    assert small <= big  # same seed: cutoff growth only adds rows


def test_hash_sample_rejects_bad_fraction(ids):
    with pytest.raises(ValueError, match="fraction"):
        SP.hash_sample(ids, 1.5, ["id"])


def test_stratified_rates(ids):
    out = SP.stratified_hash_sample(
        ids, "stratum", {"0": 1.0, "1": 0.5, "2": 0.0}, ["id"]
    )
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts.get("0") == N // 4          # keep all
    assert "2" not in counts                   # drop all
    assert "3" not in counts                   # default_fraction=0
    assert abs(counts.get("1", 0) - N // 8) < 80


def test_assign_splits_disjoint_exhaustive_stable(ids):
    out = SP.assign_splits(ids, ["id"], {"train": 8, "val": 1, "test": 1})
    rows = out.collect()
    assert len(rows) == N                      # exhaustive, one split per row
    counts = {}
    for r in rows:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] - N * 0.8) < 150
    assert abs(counts["val"] - N * 0.1) < 100
    # determinism across invocations
    again = {(r["id"], r["split"]) for r in SP.assign_splits(ids, ["id"], {"train": 8, "val": 1, "test": 1}).collect()}
    assert again == {(r["id"], r["split"]) for r in rows}


def test_sampling_is_shuffle_free(ids):
    plan = SP.assign_splits(
        SP.hash_sample(ids, 0.5, ["id"]), ["id"], {"a": 1, "b": 1}
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- mixture composition ------------------------------------------------


@pytest.fixture(scope="module")
def two_sources(spark):
    big = spark.range(3000).select(F.col("id"), F.lit("web").alias("kind"))
    small = spark.range(300).select((F.col("id") + 100_000).alias("id"), F.lit("code").alias("kind"))
    return {"web": big, "code": small}


def test_mix_corpus_proportions_and_determinism(two_sources):
    out = SP.mix_corpus(
        two_sources, {"web": 0.5, "code": 0.5}, keys=["id"], max_epochs=4.0
    )
    rows = out.collect()
    counts = {}
    for r in rows:
        counts[r["mixture_source"]] = counts.get(r["mixture_source"], 0) + 1
    # default total: code (300 rows, weight .5) binds at 4 epochs →
    # total = 2400, 1200 per source; code = exactly 4 full epochs
    assert counts["code"] == 1200
    assert abs(counts["web"] - 1200) < 120  # hash-gated 0.4 fraction of 3000
    again = {(r["id"], r["epoch"], r["mixture_source"]) for r in
             SP.mix_corpus(two_sources, {"web": 0.5, "code": 0.5}, keys=["id"], max_epochs=4.0).collect()}
    assert again == {(r["id"], r["epoch"], r["mixture_source"]) for r in rows}


def test_mix_corpus_upsample_epochs_are_labeled(two_sources):
    out = SP.mix_corpus(
        two_sources, {"web": 0.5, "code": 0.5}, keys=["id"], max_epochs=4.0
    )
    code_epochs = (
        out.filter(F.col("mixture_source") == "code")
        .groupBy("epoch").count().collect()
    )
    assert {r["epoch"] for r in code_epochs} == {0, 1, 2, 3}
    assert all(r["count"] == 300 for r in code_epochs)


def test_mix_corpus_explicit_total_and_weight_col(spark):
    a = spark.range(1000).select(F.col("id"), F.lit(10).alias("n_tokens"))
    b = spark.range(1000, 1500).select(F.col("id"), F.lit(100).alias("n_tokens"))
    out = SP.mix_corpus(
        {"a": a, "b": b}, {"a": 1, "b": 1}, keys=["id"],
        total=20_000, weight_col="n_tokens",
    )
    got = out.groupBy("mixture_source").agg(F.sum("n_tokens").alias("toks")).collect()
    toks = {r["mixture_source"]: r["toks"] for r in got}
    # each side owes 10k tokens: a has 10k (exactly 1 epoch), b has 50k (0.2)
    assert toks["a"] == 10_000
    assert abs(toks["b"] - 10_000) < 2_500


def test_mix_corpus_validates(two_sources):
    with pytest.raises(ValueError, match="weights keys"):
        SP.mix_corpus(two_sources, {"web": 1.0}, keys=["id"])
    with pytest.raises(ValueError, match="epochs"):
        SP.mix_corpus(
            two_sources, {"web": 0.5, "code": 0.5}, keys=["id"],
            total=10_000_000, max_epochs=2.0,
        )


def test_deterministic_shuffle_is_stable_permutation(spark, ids):
    a = [r["id"] for r in SP.deterministic_shuffle(ids, ["id"]).collect()]
    b = [r["id"] for r in SP.deterministic_shuffle(ids.repartition(7), ["id"]).collect()]
    assert a == b                       # same order despite repartition
    assert sorted(a) == list(range(N))  # a permutation, nothing lost
    assert a != sorted(a)               # actually shuffled
    c = [r["id"] for r in SP.deterministic_shuffle(ids, ["id"], seed="epoch2").collect()]
    assert c != a and sorted(c) == sorted(a)  # fresh permutation per seed


def test_deterministic_shuffle_sharded_preserves_global_order(spark, ids):
    sharded = SP.deterministic_shuffle(ids, ["id"], n_shards=4)
    # collecting partition-by-partition must replay the global order
    parts = sharded.rdd.glom().collect()
    flat = [r["id"] for p in parts for r in p]
    assert flat == [r["id"] for r in SP.deterministic_shuffle(ids, ["id"]).collect()]
    with pytest.raises(ValueError, match="n_shards"):
        SP.deterministic_shuffle(ids, ["id"], n_shards=0)


def test_mix_corpus_plan_is_narrow(two_sources):
    plan = SP.mix_corpus(
        two_sources, {"web": 0.5, "code": 0.5}, keys=["id"], max_epochs=4.0,
        masses={"web": 3000.0, "code": 300.0},
    )._jdf.queryExecution().executedPlan().toString()
    # explode + filter + union only — no shuffle anywhere in the mixture
    assert "Exchange" not in plan


def test_mix_corpus_rejects_incomplete_masses(two_sources):
    with pytest.raises(ValueError, match=r"missing \['code'\]"):
        SP.mix_corpus(
            two_sources, {"web": 0.5, "code": 0.5}, keys=["id"],
            masses={"web": 3000.0},
        )
    # extra keys used to crash with a raw KeyError in the zero-mass
    # loop (round-4 advice); now a clear rejection
    with pytest.raises(ValueError, match=r"extra \['ghost'\]"):
        SP.mix_corpus(
            two_sources, {"web": 0.5, "code": 0.5}, keys=["id"],
            masses={"web": 3000.0, "code": 3000.0, "ghost": 1.0},
        )


def test_select_by_budget_takes_best_and_hits_budget(spark):
    n = 10_000
    df = spark.range(n).select(
        F.col("id"),
        (F.col("id") % 997).cast("double").alias("quality"),
        F.lit(100).alias("n_tokens"),
    )
    budget = 200_000  # 2000 of 10000 docs
    out = SP.select_by_budget(df, "n_tokens", budget, "quality", keys=["id"])
    rows = out.collect()
    got_tokens = sum(r["n_tokens"] for r in rows)
    # within one bin's granularity (total/1000 = 1000 tokens) + gate noise
    assert abs(got_tokens - budget) < 0.05 * budget
    # kept scores dominate: everything above the boundary bin is kept
    kept_q = sorted(r["quality"] for r in rows)
    cutoff = kept_q[0]
    n_better_rejected = df.filter(
        (F.col("quality") > cutoff + 997 / 1000)
    ).count() - sum(1 for q in kept_q if q > cutoff + 997 / 1000)
    assert n_better_rejected == 0
    # deterministic
    again = {r["id"] for r in SP.select_by_budget(df, "n_tokens", budget, "quality", keys=["id"]).collect()}
    assert again == {r["id"] for r in rows}


def test_select_by_budget_edges(spark):
    df = spark.range(10).select(
        F.col("id"), F.lit(10).alias("w"), F.col("id").cast("double").alias("q")
    )
    # budget exceeds total: keep everything
    assert SP.select_by_budget(df, "w", 1_000, "q", keys=["id"]).count() == 10
    with pytest.raises(ValueError, match="budget"):
        SP.select_by_budget(df, "w", 0, "q", keys=["id"])
    empty = df.filter(F.lit(False))
    assert SP.select_by_budget(empty, "w", 100, "q", keys=["id"]).count() == 0
    # all-NULL scores with weight above budget: there is no rank order —
    # must be a clear error, not a TypeError on float(None)
    nulls = df.withColumn("q", F.lit(None).cast("double"))
    with pytest.raises(ValueError, match="NULL"):
        SP.select_by_budget(nulls, "w", 50, "q", keys=["id"])


def test_temperature_weights(spark):
    from regpulse_lakehouse_spark.operators.sampling import temperature_weights

    masses = {"en": 1000.0, "fr": 100.0, "sw": 10.0}
    nat = temperature_weights(masses, 1.0)
    assert abs(nat["en"] - 1000 / 1110) < 1e-9  # tau=1: natural proportions
    uni = temperature_weights(masses, 0.0)
    assert all(abs(v - 1 / 3) < 1e-9 for v in uni.values())  # tau=0: uniform
    mid = temperature_weights(masses, 0.5)
    # intermediate: scarce sources upweighted vs natural, order preserved
    assert nat["sw"] < mid["sw"] < uni["sw"]
    assert mid["en"] > mid["fr"] > mid["sw"]
    assert abs(sum(mid.values()) - 1.0) < 1e-9
    with pytest.raises(ValueError, match="tau"):
        temperature_weights(masses, -0.5)
    with pytest.raises(ValueError, match="non-empty"):
        temperature_weights({}, 1.0)


def test_cap_per_group_exact_and_deterministic(spark):
    rows = [(f"d{i:03d}", "big.com" if i < 80 else f"site{i}.org") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id string, domain string")
    capped = SP.cap_per_group(df, ["domain"], cap=10, keys=["doc_id"])
    out = capped.groupBy("domain").count().collect()
    by_dom = {r["domain"]: r["count"] for r in out}
    assert by_dom["big.com"] == 10  # trimmed exactly to cap
    assert all(v == 1 for d, v in by_dom.items() if d != "big.com")  # untouched
    assert capped.count() == 10 + 20
    # deterministic: same subset on re-run
    a = sorted(r["doc_id"] for r in capped.collect())
    b = sorted(r["doc_id"] for r in SP.cap_per_group(df, ["domain"], 10, ["doc_id"]).collect())
    assert a == b
    # different seed → (almost surely) different survivors for the big group
    c = sorted(
        r["doc_id"]
        for r in SP.cap_per_group(df, ["domain"], 10, ["doc_id"], seed="other").collect()
    )
    assert a != c


def test_cap_per_group_edges(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("b", "x"), ("c", "y")], "doc_id string, domain string"
    )
    assert SP.cap_per_group(df, ["domain"], 0, ["doc_id"]).count() == 0
    assert SP.cap_per_group(df, ["domain"], 5, ["doc_id"]).count() == 3  # all under cap
    with pytest.raises(ValueError, match="cap"):
        SP.cap_per_group(df, ["domain"], -1, ["doc_id"])


def test_cap_per_group_under_cap_groups_skip_the_window(spark):
    """The under-cap leg must carry no window operator: only over-cap
    groups pay for a per-group sort."""
    rows = [(f"d{i}", f"s{i % 7}") for i in range(70)]
    df = spark.createDataFrame(rows, "doc_id string, domain string")
    capped = SP.cap_per_group(df, ["domain"], cap=100, keys=["doc_id"])
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # union of two legs; the under-cap leg is semi-join only. The window
    # operator appears once (over-cap leg), never on the under-cap leg,
    # and Spark's rank-limit pushdown caps rows BEFORE the exchange.
    assert plan.count("Window [") <= 1
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_cap_per_group_null_group_is_capped_not_dropped(spark):
    """Review fix: NULL group values form a real group — capped like
    any other, never silently dropped by null-rejecting join
    equality."""
    rows = [(f"d{i}", None) for i in range(20)] + [("dx", "real.com")]
    df = spark.createDataFrame(rows, "doc_id string, domain string")
    out = SP.cap_per_group(df, ["domain"], cap=5, keys=["doc_id"])
    by_dom = {r["domain"]: r["count"] for r in out.groupBy("domain").count().collect()}
    assert by_dom[None] == 5          # null group trimmed to cap
    assert by_dom["real.com"] == 1    # under-cap group untouched
    # under-cap null group passes through too
    df2 = spark.createDataFrame(rows[:3] + [("dx", "real.com")], "doc_id string, domain string")
    assert SP.cap_per_group(df2, ["domain"], cap=5, keys=["doc_id"]).count() == 4


def test_cap_per_group_broadcasts_only_overcap_groups(spark):
    """Review fix: the broadcast build side is the RARE over-cap set,
    not the under-cap majority (which at web scale is ~every domain)."""
    rows = [(f"d{i}", "big.com" if i < 30 else f"s{i}.org") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, domain string")
    capped = SP.cap_per_group(df, ["domain"], cap=10, keys=["doc_id"])
    plan = capped._jdf.queryExecution().executedPlan().toString()
    # under-cap leg: a LEFT-ANTI against the broadcast over-cap set,
    # with the window operator confined to the over-cap leg
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert plan.count("Window [") <= 1
    assert capped.count() == 10 + 30


def test_md5_mode_matches_hashlib_reimplementation(ids):
    """hash_mode='md5' is the engine-portable contract: an independent
    Python hashlib reimplementation (the same recipe the DuckDB oracle
    of sp_split_sample_cap uses) must reproduce every split decision."""
    import hashlib

    def unit(seed: str, key: int) -> float:
        h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()
        return float(int(h[:15], 16)) / float(1 << 60)

    got = {
        r["id"]: r["split"]
        for r in SP.assign_splits(
            ids, ["id"], {"train": 0.8, "val": 0.1, "test": 0.1},
            seed="split", hash_mode="md5",
        ).collect()
    }
    for key in range(0, N, 37):
        u = unit("split", key)
        want = "test" if u < 0.1 else ("train" if u < 0.9 else "val")
        assert got[key] == want, (key, u, got[key], want)

    kept = {
        r["id"]
        for r in SP.hash_sample(ids, 0.25, ["id"], seed="s", hash_mode="md5").collect()
    }
    for key in range(0, N, 37):
        assert (key in kept) == (unit("s", key) < 0.25), key


def test_md5_mode_rejects_unknown_hash_mode(ids):
    with pytest.raises(ValueError, match="hash_mode"):
        SP.hash_sample(ids, 0.5, ["id"], hash_mode="sha1")


def test_md5_mode_everywhere_matches_hashlib(spark, ids):
    """Every hash-gated op honors hash_mode='md5' with the same
    portable recipe — one hashlib twin checks cap ranking, budget
    boundary gating, mixture gates, and shuffle order alike."""
    import hashlib

    def unit(seed: str, *parts) -> float:
        joined = "\x1f".join(str(p) for p in parts)
        h = hashlib.md5(f"{seed}:{joined}".encode()).hexdigest()
        return float(int(h[:15], 16)) / float(1 << 60)

    # cap_per_group: survivors are the cap lowest (u, id) per stratum
    capped = {
        r["id"]
        for r in SP.cap_per_group(
            ids, ["stratum"], cap=3, keys=["id"], seed="c", hash_mode="md5"
        ).collect()
    }
    by_stratum: dict[str, list] = {}
    for key in range(N):
        by_stratum.setdefault(str(key % 4), []).append((unit("c", key), key))
    want = {k for v in by_stratum.values() for _, k in sorted(v)[:3]}
    assert capped == want

    # deterministic_shuffle: global order is ascending md5 order key
    df = ids.limit(500)
    got = [r["id"] for r in SP.deterministic_shuffle(df, ["id"], seed="s", hash_mode="md5").collect()]
    import hashlib as _h

    def ord_key(key):
        return int(_h.md5(f"s:{key}".encode()).hexdigest()[:15], 16)

    assert got == sorted(range(500), key=ord_key)


def test_md5_mode_mix_and_budget_smoke(spark, two_sources):
    """mix_corpus and select_by_budget accept hash_mode='md5' and stay
    deterministic (full hashlib twins for the shared gate live above)."""
    def mix_ids():
        return sorted(
            (r["id"], r["epoch"])
            for r in SP.mix_corpus(
                two_sources, {"web": 0.5, "code": 0.5}, keys=["id"], hash_mode="md5"
            ).collect()
        )

    m1, m2 = mix_ids(), mix_ids()
    assert m1 == m2 and m1

    df = two_sources["web"].withColumn("w", F.lit(1.0)).withColumn(
        "s", (F.col("id") % 10).cast("double")
    )
    def sel():
        return sorted(
            r["id"]
            for r in SP.select_by_budget(
                df, "w", budget=500.0, score_col="s", keys=["id"], hash_mode="md5"
            ).collect()
        )

    s1, s2 = sel(), sel()
    assert s1 == s2 and 400 <= len(s1) <= 600


def test_fraction_one_keeps_every_row_both_modes(ids):
    """fraction=1.0 must keep ALL rows: the unit hash can round to
    exactly 1.0 (int→double cast within half an ulp of the range top),
    so a literal `u < 1.0` filter would deterministically drop ~2^-53
    of keys (round-12 advice). Both modes take the fast path."""
    for mode in ("xxh64", "md5"):
        out = SP.hash_sample(ids, 1.0, ["id"], hash_mode=mode)
        assert out.count() == N
        # the fast path is a no-op plan: no Filter at all
        assert "Filter" not in out._jdf.queryExecution().executedPlan().toString()


def test_stratified_full_stratum_is_exact(ids):
    """A 1.0-fraction stratum keeps every one of its rows (the cutoff
    comparison allows cutoff >= 1.0 explicitly)."""
    out = SP.stratified_hash_sample(
        ids, "stratum", {"0": 1.0, "1": 1.0}, ["id"], hash_mode="md5"
    )
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"0": N // 4, "1": N // 4}


def test_md5_mode_rejects_null_keys(spark):
    """md5 mode refuses NULL key values at evaluation time: concat_ws
    silently skips NULLs, so ('a',NULL) and (NULL,'a') would hash
    identically and md5-mode decisions would silently diverge from
    xxh64-mode null handling (round-12 advice). xxh64 mode hashes the
    NULL as its own value and keeps working."""
    df = spark.createDataFrame(
        [("a", None), (None, "a"), ("b", "c")], "k1 string, k2 string"
    )
    # exact wrapper type varies by action path (SparkRuntimeException
    # vs Py4JJavaError); the contract is the raise + the message
    with pytest.raises(Exception, match="non-null key"):
        SP.hash_sample(df, 0.5, ["k1", "k2"], hash_mode="md5").count()
    # collect(), not count(): count() lets EliminateSorts drop the
    # order-by and prune _ord, so the guard expression never runs
    with pytest.raises(Exception, match="non-null key"):
        SP.deterministic_shuffle(df, ["k1", "k2"], hash_mode="md5").collect()
    # xxh64 path: NULL is a distinct hashed value, no error
    SP.hash_sample(df, 0.5, ["k1", "k2"], hash_mode="xxh64").count()
