"""HyperLogLog sketch operators: accuracy vs exact distinct, EXACT
merge-vs-direct register equality, persistence round-trip, per-group
behavior, and plan purity (no Python stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import sketches as SK


@pytest.fixture(scope="module")
def values(spark):
    # 3 groups with known distinct counts: 5000 / 700 / 1
    return spark.range(10_000).select(
        F.when(F.col("id") < 5000, "a").when(F.col("id") < 5700, "b").otherwise("c").alias("g"),
        F.when(F.col("id") < 5700, F.concat(F.lit("v"), F.col("id")))
        .otherwise(F.lit("constant"))
        .alias("v"),
    )


def test_estimate_accuracy_per_group(values):
    got = {r["g"]: r["approx_distinct"] for r in SK.hll_distinct(values, ["g"], "v", p=9).collect()}
    assert abs(got["a"] - 5000) / 5000 < 0.10   # p=9 → ~2.3% typical
    assert abs(got["b"] - 700) / 700 < 0.10
    assert got["c"] == 1                        # linear counting exact at tiny n


def test_merge_equals_direct_exactly(values, spark):
    """Deterministic hash ⇒ merged registers are byte-equal to direct
    registers — merge-vs-direct is EXACT equality, not approximate."""
    h1 = values.filter("v < 'v3'")
    h2 = values.filter("v >= 'v3'")
    p1 = SK.hll_partials(h1, ["g"], "v").withColumnRenamed("hll", "h1")
    p2 = SK.hll_partials(h2, ["g"], "v").withColumnRenamed("hll", "h2")
    merged = (
        p1.join(p2, "g", "full_outer")
        .select("g", SK.hll_merge(F.col("h1"), F.col("h2")).alias("hll"))
    )
    direct = SK.hll_partials(values, ["g"], "v")
    m = {r["g"]: dict(r["hll"]) for r in merged.collect()}
    d = {r["g"]: dict(r["hll"]) for r in direct.collect()}
    assert m == d


def test_merge_agg_many_partials(values, spark, tmp_path):
    """Daily-partials shape: N persisted sketch rows per group fold to
    the direct sketch; survives a parquet round-trip."""
    parts = []
    for i in range(4):
        parts.append(SK.hll_partials(values.filter(F.col("v").substr(2, 1) == str(i)), ["g"], "v"))
    rest = SK.hll_partials(
        values.filter(~F.col("v").substr(2, 1).isin(*[str(i) for i in range(4)])), ["g"], "v"
    )
    allp = rest
    for p_ in parts:
        allp = allp.unionByName(p_)
    path = str(tmp_path / "partials")
    allp.write.parquet(path)                        # persist the sketches
    reread = values.sparkSession.read.parquet(path)
    folded = SK.hll_merge_agg(reread, ["g"])
    d = {r["g"]: dict(r["hll"]) for r in SK.hll_partials(values, ["g"], "v").collect()}
    f = {r["g"]: dict(r["hll"]) for r in folded.collect()}
    assert f == d
    est = {r["g"]: r["approx_distinct"] for r in folded.select(
        "g", SK.hll_estimate(F.col("hll")).alias("approx_distinct")).collect()}
    assert abs(est["a"] - 5000) / 5000 < 0.10


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(1000).select(F.lit("g").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v"))
    dup = base.unionByName(base).unionByName(base)
    a = SK.hll_distinct(base, ["g"], "v").first()["approx_distinct"]
    b = SK.hll_distinct(dup, ["g"], "v").first()["approx_distinct"]
    assert a == b


def test_p_validation_and_plan_purity(values):
    with pytest.raises(ValueError, match="p must"):
        SK.hll_partials(values, ["g"], "v", p=2)
    plan = SK.hll_distinct(values, ["g"], "v")._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan


def test_null_values_do_not_count(spark):
    df = spark.createDataFrame(
        [("g", "x1"), ("g", "x2"), ("g", None)], "g string, v string"
    )
    assert SK.hll_distinct(df, ["g"], "v").first()["approx_distinct"] == 2


def test_estimate_p_mismatch_raises(spark):
    df = spark.range(20_000).select(
        F.lit("g").alias("g"), F.concat(F.lit("x"), F.col("id")).alias("v")
    )
    parts = SK.hll_partials(df, ["g"], "v", p=12)
    with pytest.raises(Exception, match="larger p"):
        parts.select(SK.hll_estimate(F.col("hll"), p=9)).collect()
    # matching p still fine
    est = parts.select(SK.hll_estimate(F.col("hll"), p=12).alias("e")).first()["e"]
    assert abs(est - 20_000) / 20_000 < 0.05


# --- DDSketch ---------------------------------------------------------


def test_dd_quantiles_within_relative_error(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    vals = np.exp(rng.randn(20_000) * 1.5 + 2.0)  # lognormal, positive
    df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
    sk = SK.dd_partials(df, ["g"], "v", rel_err=0.01)
    for q in (0.5, 0.9, 0.99):
        got = sk.select(SK.dd_quantile(F.col("ddsketch"), q, rel_err=0.01).alias("e")).first()["e"]
        exact = float(np.quantile(vals, q))
        assert abs(got - exact) / exact < 0.02, (q, got, exact)  # ε + rank slack


def test_dd_merge_equals_direct_exactly(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    vals = [float(v) for v in rng.exponential(10.0, 5000) + 0.001]
    df = spark.createDataFrame([("g", v) for v in vals], "g string, v double")
    h1, h2 = df.filter("v < 8"), df.filter("v >= 8")
    p1 = SK.dd_partials(h1, ["g"], "v").withColumnRenamed("ddsketch", "a")
    p2 = SK.dd_partials(h2, ["g"], "v").withColumnRenamed("ddsketch", "b")
    merged = p1.join(p2, "g", "full_outer").select(
        "g", SK.dd_merge(F.col("a"), F.col("b")).alias("ddsketch")
    )
    direct = SK.dd_partials(df, ["g"], "v")
    m = dict(merged.first()["ddsketch"])
    d = dict(direct.first()["ddsketch"])
    assert m == d  # bucket-count merge is EXACT
    # and the many-partials fold agrees too, through a parquet round-trip
    both = p1.withColumnRenamed("a", "ddsketch").unionByName(
        p2.withColumnRenamed("b", "ddsketch")
    )
    folded = SK.dd_merge_agg(both, ["g"])
    assert dict(folded.first()["ddsketch"]) == d


def test_dd_edge_cases(spark):
    df = spark.createDataFrame(
        [("g", 5.0), ("g", None), ("g", -1.0), ("g", 0.0)], "g string, v double"
    )
    sk = SK.dd_partials(df, ["g"], "v")
    # only the positive value sketched; q=0.5 lands on it within ε
    got = sk.select(SK.dd_quantile(F.col("ddsketch"), 0.5).alias("e")).first()["e"]
    assert abs(got - 5.0) / 5.0 < 0.01
    with pytest.raises(ValueError, match="rel_err"):
        SK.dd_partials(df, ["g"], "v", rel_err=1.5)
    with pytest.raises(ValueError, match="q must"):
        SK.dd_quantile(F.col("ddsketch"), 1.5)
    # empty sketch -> null quantile
    empty = spark.createDataFrame([("g", -1.0)], "g string, v double")
    esk = SK.dd_partials(empty, ["g"], "v")
    assert esk.count() == 0  # no positive values -> no sketch row


def test_dd_nan_values_are_excluded(spark):
    df = spark.createDataFrame(
        [("g", 5.0), ("g", float("nan")), ("g", 5.0)], "g string, v double"
    )
    sk = SK.dd_partials(df, ["g"], "v")
    # only the two 5.0 values sketched: one bucket, count 2
    m = dict(sk.first()["ddsketch"])
    assert list(m.values()) == [2]
    got = sk.select(SK.dd_quantile(F.col("ddsketch"), 0.5).alias("e")).first()["e"]
    assert abs(got - 5.0) / 5.0 < 0.01


# --- Count-Min + heavy hitters ---------------------------------------


def _freq_df(spark, seed=0, n=4000):
    """Skewed frequency fixture: zipf-ish domain counts, shuffled and
    spread over several partitions."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(40):
        rows += [f"dom{i:02d}"] * max(1, n // ((i + 1) * (i + 2)))
    rng.shuffle(rows)
    return spark.createDataFrame([(v,) for v in rows], ["domain"]).repartition(7)


def test_cm_estimate_one_sided_and_tight(spark):
    df = _freq_df(spark)
    truth = {r["domain"]: r["cnt"] for r in
             df.groupBy("domain").agg(F.count("*").alias("cnt")).collect()}
    cm = SK.cm_partials(df.withColumn("g", F.lit(1)), ["g"], "domain",
                        w=2048, d=4)
    probe = spark.createDataFrame([(v,) for v in truth], ["domain"]).crossJoin(
        F.broadcast(cm.select("cm"))
    )
    est = {
        r["domain"]: r["est"]
        for r in probe.select(
            "domain", SK.cm_estimate(F.col("cm"), F.col("domain"), 2048, 4).alias("est")
        ).collect()
    }
    n = sum(truth.values())
    for v, t in truth.items():
        assert est[v] >= t, f"{v}: under-count {est[v]} < {t}"
        assert est[v] - t <= max(2, n * 3 // 2048), f"{v}: error too large"


def test_cm_merge_equals_direct_exactly(spark, tmp_path):
    """Linearity: sum-merged halves == direct sketch, register for
    register — through a parquet round trip (the persistence story)."""
    df = _freq_df(spark, seed=1)
    idx = df.withColumn("_i", F.monotonically_increasing_id())
    half1 = idx.where(F.col("_i") % 2 == 0).withColumn("g", F.lit(1))
    half2 = idx.where(F.col("_i") % 2 == 1).withColumn("g", F.lit(1))
    p1 = SK.cm_partials(half1, ["g"], "domain", w=512, d=3)
    p2 = SK.cm_partials(half2, ["g"], "domain", w=512, d=3)
    path = str(tmp_path / "cm_parts")
    p1.unionByName(p2).write.parquet(path)
    merged = SK.cm_merge_agg(df.sparkSession.read.parquet(path), ["g"])
    direct = SK.cm_partials(
        half1.unionByName(half2), ["g"], "domain", w=512, d=3
    )
    m = dict(merged.first()["cm"])
    d_ = dict(direct.first()["cm"])
    assert m == d_


def test_cm_two_column_merge(spark):
    df = _freq_df(spark, seed=2)
    idx = df.withColumn("_i", F.monotonically_increasing_id())
    p1 = SK.cm_partials(idx.where(F.col("_i") % 2 == 0).withColumn("g", F.lit(1)),
                        ["g"], "domain", w=256, d=3).withColumnRenamed("cm", "a")
    p2 = SK.cm_partials(idx.where(F.col("_i") % 2 == 1).withColumn("g", F.lit(1)),
                        ["g"], "domain", w=256, d=3).withColumnRenamed("cm", "b")
    both = p1.join(p2, "g").select(SK.cm_merge(F.col("a"), F.col("b")).alias("cm"))
    direct = SK.cm_partials(idx.withColumn("g", F.lit(1)), ["g"], "domain",
                            w=256, d=3)
    assert dict(both.first()["cm"]) == dict(direct.first()["cm"])


def test_space_saving_surfaces_global_heavy_items(spark):
    """Recall guarantee: every item with freq > N/capacity appears in
    at least one partition's summary, however the rows are spread."""
    df = _freq_df(spark, seed=3)
    n = df.count()
    cap = 64
    cands = {r["domain"] for r in
             SK.space_saving_candidates(df, "domain", cap).collect()}
    truth = {r["domain"]: r["cnt"] for r in
             df.groupBy("domain").agg(F.count("*").alias("cnt")).collect()}
    for v, c in truth.items():
        if c > n / cap:
            assert v in cands, f"{v} (freq {c} > {n}/{cap}) missed"


def test_heavy_hitters_threshold_exact(spark):
    df = _freq_df(spark, seed=4)
    n = df.count()
    phi = 0.05
    got = {r["domain"]: r["count"] for r in
           SK.heavy_hitters(df, "domain", threshold_ratio=phi).collect()}
    truth = {r["domain"]: r["cnt"] for r in
             df.groupBy("domain").agg(F.count("*").alias("cnt")).collect()}
    import math as _m

    expect = {v: c for v, c in truth.items() if c >= _m.ceil(phi * n)}
    assert got == expect  # exact counts AND exact membership


def test_heavy_hitters_topk_exact(spark):
    df = _freq_df(spark, seed=5)
    got = [(r["domain"], r["count"]) for r in
           SK.heavy_hitters(df, "domain", top_k=5).collect()]
    truth = sorted(
        ((r["domain"], r["cnt"]) for r in
         df.groupBy("domain").agg(F.count("*").alias("cnt")).collect()),
        key=lambda t: (-t[1], t[0]),
    )[:5]
    assert got == truth


def test_heavy_hitters_count_pass_broadcasts(spark):
    """The exact-count pass must BROADCAST the candidate set — a
    sort-merge join there would reintroduce the full shuffle the
    operator exists to avoid."""
    df = _freq_df(spark, seed=6)
    plan = (
        SK.heavy_hitters(df, "domain", top_k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_heavy_hitters_validation(spark):
    df = _freq_df(spark, seed=7)
    with pytest.raises(ValueError, match="exactly one"):
        SK.heavy_hitters(df, "domain")
    with pytest.raises(ValueError, match="exactly one"):
        SK.heavy_hitters(df, "domain", threshold_ratio=0.1, top_k=3)
    with pytest.raises(ValueError, match="threshold_ratio"):
        SK.heavy_hitters(df, "domain", threshold_ratio=1.5)
    with pytest.raises(ValueError, match="capacity"):
        SK.space_saving_candidates(df, "domain", 0)
    with pytest.raises(ValueError, match="w >= 2"):
        SK.cm_partials(df.withColumn("g", F.lit(1)), ["g"], "domain", w=1)


# --- KMV set-operation sketches --------------------------------------


def _two_sets(spark, n_a=3000, n_b=3000, overlap=1000):
    a = [(f"doc{i}",) for i in range(n_a)]
    b = [(f"doc{i}",) for i in range(n_a - overlap, n_a - overlap + n_b)]
    return (
        spark.createDataFrame(a, ["v"]).withColumn("g", F.lit("A")),
        spark.createDataFrame(b, ["v"]).withColumn("g", F.lit("B")),
    )


def test_kmv_distinct_estimate_accuracy(spark):
    a, _ = _two_sets(spark)
    sk = SK.kmv_partials(a, ["g"], "v", k=256)
    est = sk.select(SK.kmv_estimate(F.col("kmv"), 256).alias("e")).first()["e"]
    assert abs(est - 3000) / 3000 < 0.15  # ~1/sqrt(k) error


def test_kmv_small_sets_are_exact(spark):
    small = spark.createDataFrame([(f"x{i}",) for i in range(50)], ["v"]) \
        .withColumn("g", F.lit("s"))
    sk = SK.kmv_partials(small, ["g"], "v", k=256)
    assert sk.select(SK.kmv_estimate(F.col("kmv"), 256).alias("e")).first()["e"] == 50


def test_kmv_merge_equals_direct_exactly(spark, tmp_path):
    a, b = _two_sets(spark)
    both = a.unionByName(b).withColumn("g", F.lit("all"))
    pa = SK.kmv_partials(a.withColumn("g", F.lit("all")), ["g"], "v", 128)
    pb = SK.kmv_partials(b.withColumn("g", F.lit("all")), ["g"], "v", 128)
    path = str(tmp_path / "kmv")
    pa.unionByName(pb).write.parquet(path)
    merged = SK.kmv_merge_agg(spark.read.parquet(path), ["g"], 128)
    direct = SK.kmv_partials(both, ["g"], "v", 128)
    assert merged.first()["kmv"] == direct.first()["kmv"]
    # two-column merge agrees too
    two = (
        pa.withColumnRenamed("kmv", "x")
        .join(pb.withColumnRenamed("kmv", "y"), "g")
        .select(SK.kmv_merge(F.col("x"), F.col("y"), 128).alias("kmv"))
    )
    assert two.first()["kmv"] == direct.first()["kmv"]


def test_kmv_jaccard_and_intersection_track_truth(spark):
    """The corpus-overlap use case: |A|=|B|=3000 with 1000 shared ids
    → true Jaccard 0.2, true intersection 1000. Sketch estimates from
    two 256-value summaries must land within sampling error."""
    a, b = _two_sets(spark)
    sa = SK.kmv_partials(a, ["g"], "v", 256).select(F.col("kmv").alias("ka"))
    sb = SK.kmv_partials(b, ["g"], "v", 256).select(F.col("kmv").alias("kb"))
    row = sa.crossJoin(sb).select(
        F.round(SK.kmv_jaccard(F.col("ka"), F.col("kb"), 256), 4).alias("j"),
        SK.kmv_intersection(F.col("ka"), F.col("kb"), 256).alias("i"),
    ).first()
    assert abs(row["j"] - 0.2) < 0.08
    assert abs(row["i"] - 1000) < 400
    # exact on small (un-truncated) sketches
    small_a = spark.createDataFrame([(f"x{i}",) for i in range(40)], ["v"]).withColumn("g", F.lit("s"))
    small_b = spark.createDataFrame([(f"x{i}",) for i in range(20, 60)], ["v"]).withColumn("g", F.lit("s"))
    ra = SK.kmv_partials(small_a, ["g"], "v", 256).select(F.col("kmv").alias("ka"))
    rb = SK.kmv_partials(small_b, ["g"], "v", 256).select(F.col("kmv").alias("kb"))
    r = ra.crossJoin(rb).select(
        SK.kmv_jaccard(F.col("ka"), F.col("kb"), 256).alias("j"),
        SK.kmv_intersection(F.col("ka"), F.col("kb"), 256).alias("i"),
    ).first()
    assert r["i"] == 20 and abs(r["j"] - 20 / 60) < 1e-9


def test_kmv_validation(spark):
    a, _ = _two_sets(spark, n_a=10, n_b=10, overlap=0)
    with pytest.raises(ValueError, match="k must be >= 2"):
        SK.kmv_partials(a, ["g"], "v", k=1)


# --- PSI drift between DDSketch snapshots -----------------------------


def test_dd_psi_detects_distribution_drift(spark):
    """Same distribution → PSI ≈ 0; a shifted snapshot → PSI above the
    0.25 'shifted' reading; value matches an independent numpy PSI
    over the identical bucket histograms."""
    import math

    import numpy as np

    rng = np.random.RandomState(7)
    base = np.exp(rng.randn(20_000) * 0.8 + 1.0)
    same = np.exp(rng.randn(20_000) * 0.8 + 1.0)
    shifted = np.exp(rng.randn(20_000) * 0.8 + 2.0)

    def sk(vals, name):
        df = spark.createDataFrame([("g", float(v)) for v in vals], "g string, v double")
        return SK.dd_partials(df, ["g"], "v").select(F.col("ddsketch").alias(name))

    row = (
        sk(base, "a").crossJoin(sk(same, "b")).crossJoin(sk(shifted, "c"))
        .select(
            F.round(SK.dd_psi(F.col("a"), F.col("b")), 4).alias("stable"),
            F.round(SK.dd_psi(F.col("a"), F.col("c")), 4).alias("drift"),
            F.round(SK.dd_psi(F.col("a"), F.col("a")), 6).alias("self"),
            F.round(
                SK.dd_psi(F.col("a"), F.col("c"))
                - SK.dd_psi(F.col("c"), F.col("a")),
                6,
            ).alias("asym"),
        )
        .first()
    )
    assert row["self"] == 0.0
    assert row["asym"] == 0.0  # symmetric
    assert row["stable"] < 0.1
    assert row["drift"] > 0.25

    # independent numpy PSI over the same bucket maps
    ha = dict(sk(base, "a").withColumnRenamed("a", "s").first()["s"])
    hc = dict(sk(shifted, "c").withColumnRenamed("c", "s").first()["s"])
    keys = set(ha) | set(hc)
    ta, tc = sum(ha.values()), sum(hc.values())
    psi = 0.0
    for kk in keys:
        pa = max(ha.get(kk, 0) / ta, 1e-6)
        pc = max(hc.get(kk, 0) / tc, 1e-6)
        psi += (pa - pc) * math.log(pa / pc)
    assert abs(psi - row["drift"]) < 1e-3


def test_heavy_hitters_exact_on_nullable_int_column(spark):
    """ADVICE r9: an int column carrying nulls coerces to float64 in
    the Arrow→pandas candidate pass, so str(v) yielded '5.0' while the
    exact-count pass cast to '5' — the semi-join silently emptied. The
    Spark-side string cast must keep both passes on identical keys."""
    rows = [(5,)] * 40 + [(7,)] * 30 + [(None,)] * 10 + [(i,) for i in range(20)]
    df = spark.createDataFrame(rows, "user_id int").repartition(4)
    got = {r["user_id"]: r["count"] for r in
           SK.heavy_hitters(df, "user_id", threshold_ratio=0.2).collect()}
    # N counts non-null rows only (90): threshold = ceil(0.2*90) = 18
    assert got == {"5": 41, "7": 31}  # 40+1 and 30+1: range(20) adds one each
    # candidate pass itself must emit clean integer strings, never '5.0'
    cands = {r["user_id"] for r in
             SK.space_saving_candidates(df, "user_id", 64).collect()}
    assert "5" in cands and "5.0" not in cands


def test_hll_md5_base_matches_python_reimplementation(spark):
    """The r12 md5 hash base (the DuckDB-portable 60-bit slice): bucket
    and rho must match an independent Python reimplementation value for
    value, and the merge of two disjoint-partition sketches must equal
    the direct sketch exactly (deterministic hash)."""
    import hashlib

    from pyspark.sql import functions as F

    from regpulse_lakehouse_spark.operators.sketches import (
        hll_merge_agg,
        hll_partials,
    )

    p, m = 9, 512
    vals = [f"user-{i}" for i in range(300)]
    df = spark.createDataFrame(
        [("g", i % 2, v) for i, v in enumerate(vals)], ["grp", "half", "v"]
    )
    direct = hll_partials(df, ["grp"], "v", p=p, base="md5").collect()[0]["hll"]
    merged = hll_merge_agg(
        hll_partials(df, ["grp", "half"], "v", p=p, base="md5"), ["grp"]
    ).collect()[0]["hll"]
    assert dict(merged) == dict(direct)

    expect: dict[int, int] = {}
    for v in vals:
        h60 = int(hashlib.md5(v.encode()).hexdigest()[:15], 16)
        b, w = h60 & (m - 1), h60 >> p
        rho = (60 - p + 1) if w == 0 else (60 - p + 1) - (len(bin(w)) - 2)
        expect[b] = max(expect.get(b, 0), rho)
    assert dict(direct) == expect
