"""Sketch-family queries — the driver-graded face of
operators/sketches.py (beyond-reference training-pipeline surface;
the approximate members — HLL, DDSketch, Count-Min, KMV — are
pytest-verified by exact-merge equivalence, while heavy hitters is
EXACT by construction and so carries a plain-SQL oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from . import register


@register(
    "hh_heavy_hitters",
    oracle="""
    WITH src AS (
      SELECT CAST(user_id % 97 AS VARCHAR) AS shard
      FROM events WHERE user_id IS NOT NULL
    )
    SELECT shard, COUNT(*) AS n_events
    FROM src
    GROUP BY shard
    HAVING COUNT(*) >= CEIL(0.01 * (SELECT COUNT(*) FROM src))
    """,
)
def hh_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-shard detection: hash shards (user_id mod 97) carrying at
    least 1% of event traffic, via operators/sketches.heavy_hitters —
    bounded-memory SpaceSaving candidates per partition (mapInPandas),
    then an EXACT count of the candidate set through a BROADCAST
    semi-join, so the only groupBy runs over candidate rows, never the
    full key domain (plan-asserted BroadcastHashJoin, no
    full-cardinality shuffle — tests/test_sketches.py::
    test_heavy_hitters_count_pass_broadcasts). Exactness
    is by construction, not luck: capacity defaults to 4/threshold =
    400 ≥ any item above N/400, so every shard at the 1% bar is a
    guaranteed candidate and the recount makes its count exact — which
    is why this approximate-family member can carry a plain GROUP
    BY/HAVING oracle. At 100 TB the same plan broadcasts a few hundred
    candidates instead of shuffling a billion-key histogram."""
    from ..operators.sketches import heavy_hitters

    ev = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 97).alias("shard")
    )
    return heavy_hitters(ev, "shard", threshold_ratio=0.01).select(
        "shard", F.col("count").alias("n_events")
    )


def _hll_oracle(p: int = 9) -> str:
    """DuckDB replica of the md5-base HLL register/estimate pipeline —
    the md5 60-bit slice is bit-portable (functions/hashing.md5_long),
    so buckets, rhos, register maxima, the harmonic-mean estimate and
    the small-range linear-counting correction are all reproducible in
    plain integer/double SQL (the alpha·m² constant is rendered from
    the same Python float Spark's hll_estimate embeds via F.lit)."""
    from ..operators.sketches import _alpha

    m = 1 << p
    alpha_m2 = _alpha(m) * m * m
    return f"""
    WITH v AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS u
      FROM events WHERE user_id IS NOT NULL
    ),
    h AS (
      SELECT event_type, ('0x' || substr(md5(u), 1, 15))::BIGINT AS h60 FROM v
    ),
    br AS (
      SELECT event_type, h60 & {m - 1} AS bucket,
             CASE WHEN (h60 >> {p}) = 0 THEN {60 - p + 1}
                  ELSE {60 - p + 1} - length(bin(h60 >> {p})) END AS rho
      FROM h
    ),
    regs AS (
      SELECT event_type, CAST(bucket AS INT) AS bucket,
             CAST(MAX(rho) AS INT) AS register
      FROM br GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             SUM(POWER(2.0, -register)) + ({m} - COUNT(*)) AS sum_pow,
             {m} - COUNT(*) AS zeros
      FROM regs GROUP BY 1
    ),
    est AS (
      SELECT event_type,
             CAST(ROUND(CASE WHEN ({alpha_m2!r} / sum_pow) <= {2.5 * m!r}
                              AND zeros > 0
                        THEN {float(m)!r} * ln({float(m)!r} / zeros)
                        ELSE {alpha_m2!r} / sum_pow END) AS BIGINT) AS est_distinct
      FROM stats
    )
    SELECT r.event_type, r.bucket, r.register, e.est_distinct
    FROM regs r JOIN est e USING (event_type)
    """


@register("hh_hll_merge", oracle=_hll_oracle())
def hh_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-sketch contract, hash-graded end to end: per
    (event_type, event_id%2 half) HLL PARTIALS over distinct users
    (operators/sketches.hll_partials, md5 base — the DuckDB-portable
    60-bit family), merged across halves (hll_merge_agg: explode + max —
    the "store daily partials, answer quarterly" 100 TB shape), and the
    merged registers emitted row-per-bucket alongside the per-group
    estimate (hll_estimate: harmonic mean + small-range linear-counting
    correction).

    Two hard gates in one row: (1) the IN-PLAN merge-vs-direct gate —
    every merged register is full-outer-joined against the single-pass
    sketch of the whole table and raise_error fires on any divergence
    (deterministic hash ⇒ merge is exactly lossless, so inequality is a
    real bug, never noise); (2) the DRIVER hash gate — registers AND
    estimate must match the DuckDB replica bit for bit."""
    from ..operators.sketches import hll_estimate, hll_merge_agg, hll_partials

    p = 9
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.pmod("event_id", F.lit(2)).alias("half"),
        F.col("user_id").cast("string").alias("u"),
    )
    parts = hll_partials(ev, ["event_type", "half"], "u", p=p, base="md5")
    merged = hll_merge_agg(parts, ["event_type"])
    direct = hll_partials(ev, ["event_type"], "u", p=p, base="md5")

    m_regs = merged.select(
        "event_type", F.explode("hll").alias("bucket", "_rm")
    )
    d_regs = direct.select(
        "event_type", F.explode("hll").alias("bucket", "_rd")
    )
    est = merged.select(
        "event_type", hll_estimate(F.col("hll"), p).alias("est_distinct")
    )
    gate = F.when(
        F.col("_rm").isNull() | F.col("_rd").isNull() | (F.col("_rm") != F.col("_rd")),
        F.raise_error(F.lit("hll merge-vs-direct register divergence")),
    ).otherwise(F.col("_rm"))
    return (
        m_regs.join(d_regs, ["event_type", "bucket"], "full_outer")
        .select("event_type", "bucket", gate.cast("int").alias("register"))
        .join(est, "event_type")
        .select("event_type", "bucket", "register", "est_distinct")
    )


def _cm_oracle(w: int = 256, d: int = 4, probe: str = "42") -> str:
    """DuckDB replica of the md5-base Count-Min pipeline: register key
    for hash row j is j·w + (md5_60('j:'‖value) mod w) — bit-portable —
    and both the register counts and the min-over-rows point estimate
    are plain integer SQL. CM is linear, so the direct sketch the
    oracle builds equals the Spark side's merged-across-halves sketch
    exactly (gated in-plan over there)."""
    from ..functions.hashing import md5_long_sql

    keys = ", ".join(
        f"({j * w} + ({md5_long_sql('u', seed=str(j))} % {w}))" for j in range(d)
    )
    probe_keys = ", ".join(
        f"({j * w} + ({md5_long_sql(repr(probe), seed=str(j))} % {w}))"
        for j in range(d)
    )
    return f"""
    WITH v AS (
      SELECT event_type, CAST(user_id AS VARCHAR) AS u
      FROM events WHERE user_id IS NOT NULL
    ),
    keyed AS (
      SELECT event_type, unnest([{keys}]) AS k FROM v
    ),
    regs AS (
      SELECT event_type, CAST(k AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS register
      FROM keyed GROUP BY 1, 2
    ),
    est AS (
      -- absent probe buckets count as 0 (the Spark side coalesces
      -- element_at to 0 before the min) — a WHERE .. IN formulation
      -- would DROP groups whose probe buckets are all empty
      SELECT g.event_type,
             CAST(MIN(COALESCE(r.register, 0)) AS BIGINT) AS est_probe
      FROM (SELECT DISTINCT event_type FROM v) g
      CROSS JOIN (SELECT unnest([{probe_keys}]) AS pk) pks
      LEFT JOIN regs r ON r.event_type = g.event_type AND r.bucket = pks.pk
      GROUP BY g.event_type
    ),
    exact AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_probe
      FROM v WHERE u = '{probe}' GROUP BY event_type
    )
    SELECT r.event_type, r.bucket, r.register,
           e.est_probe, COALESCE(x.n_probe, 0) AS n_probe
    FROM regs r
    JOIN est e USING (event_type)
    LEFT JOIN exact x USING (event_type)
    """


@register("hh_cm_freq", oracle=_cm_oracle())
def hh_cm_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch, hash-graded end to end (the second
    mergeable-sketch member to get a driver row after hh_hll_merge):
    per-(event_type, event_id%2 half) CM PARTIALS over user ids
    (operators/sketches.cm_partials, md5 base — row-salted portable
    60-bit slices), merged across halves by bucket-wise ADDITION
    (cm_merge_agg — CM is linear so the merge is exact, not just
    register-max like HLL), emitted row-per-bucket alongside the
    min-over-rows point estimate for the fixed probe key '42' and that
    key's exact count.

    Three hard gates in one row: (1) IN-PLAN merge-vs-direct equality —
    any additive drift raises; (2) IN-PLAN one-sidedness — CM must
    never under-count, so est < exact raises (the Cormode-Muthukrishnan
    guarantee, checked live per group); (3) the DRIVER hash gate —
    registers, estimate, and exact count must match the DuckDB replica
    bit for bit. w=256, d=4: small enough that the ~1.5k distinct users
    per group actually collide (registers carry multi-key sums — the
    estimate is a real overcount, not a disguised exact count)."""
    from ..operators.sketches import cm_estimate, cm_merge_agg, cm_partials

    w, d, probe = 256, 4, "42"
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.pmod("event_id", F.lit(2)).alias("half"),
        F.col("user_id").cast("string").alias("u"),
    )
    parts = cm_partials(ev, ["event_type", "half"], "u", w=w, d=d, base="md5")
    merged = cm_merge_agg(parts, ["event_type"])
    direct = cm_partials(ev, ["event_type"], "u", w=w, d=d, base="md5")

    m_regs = merged.select("event_type", F.explode("cm").alias("bucket", "_rm"))
    d_regs = direct.select("event_type", F.explode("cm").alias("bucket", "_rd"))
    est = merged.select(
        "event_type",
        cm_estimate(F.col("cm"), F.lit(probe), w=w, d=d, base="md5").alias(
            "est_probe"
        ),
    )
    exact = (
        ev.filter(F.col("u") == probe)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_probe"))
    )
    reg_gate = F.when(
        F.col("_rm").isNull() | F.col("_rd").isNull() | (F.col("_rm") != F.col("_rd")),
        F.raise_error(F.lit("cm merge-vs-direct register divergence")),
    ).otherwise(F.col("_rm"))
    one_sided = F.when(
        F.col("est_probe") < F.col("n_probe"),
        F.raise_error(F.lit("cm under-counted a key — one-sided guarantee broken")),
    ).otherwise(F.col("est_probe"))
    return (
        m_regs.join(d_regs, ["event_type", "bucket"], "full_outer")
        .select("event_type", "bucket", reg_gate.cast("long").alias("register"))
        .join(est, "event_type")
        .join(exact, "event_type", "left")
        .withColumn("n_probe", F.coalesce("n_probe", F.lit(0)))
        .select(
            "event_type",
            "bucket",
            "register",
            one_sided.alias("est_probe"),
            F.col("n_probe"),
        )
    )
