"""Declarative table-level data-quality constraints — the Deequ/
dbt-test shape, Spark-first: a suite of checks over one table compiles
into the FEWEST passes the constraint mix allows (every row-local
check folds into ONE aggregate over ONE scan; uniqueness adds one
groupBy; referential integrity adds one broadcast anti-join per
referenced table) and returns a small report DataFrame, one row per
check.

Complements the row-level V1/V2 routing (operators/validate.py, the
reference's governance parity): that transform tags and routes
individual rows; this verifies TABLE invariants — the gate a 100 TB
ingest runs after each batch, where "read the table once" vs "once
per constraint" is the whole cost model.

Beyond-reference operator (the reference validates per-row in
ontology/validator.ts; it has no table-constraint engine)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    name: str
    kind: str
    # row-local checks carry a violation predicate column; the others
    # carry their own parameters
    violation: Column | None = None
    cols: tuple[str, ...] = ()
    ref: DataFrame | None = field(default=None, compare=False)
    ref_cols: tuple[str, ...] = ()


def not_null(col: str) -> Check:
    return Check(f"not_null({col})", "row", F.col(col).isNull())


def in_range(col: str, lo, hi) -> Check:
    """NULLs pass (compose with not_null to forbid them) — matching
    SQL CHECK semantics where NULL comparisons are not violations."""
    c = F.col(col)
    return Check(
        f"in_range({col},{lo},{hi})", "row",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def accepted_values(col: str, values) -> Check:
    c = F.col(col)
    return Check(
        f"accepted_values({col})", "row",
        c.isNotNull() & ~c.isin(*list(values)),
    )


def matches_regex(col: str, pattern: str) -> Check:
    c = F.col(col)
    return Check(
        f"matches_regex({col})", "row", c.isNotNull() & ~c.rlike(pattern)
    )


def satisfies(name: str, predicate: Column) -> Check:
    """Arbitrary row predicate that must hold; NULL results count as
    violations (an unknown invariant is a failed invariant)."""
    return Check(f"satisfies({name})", "row", ~F.coalesce(predicate, F.lit(False)))


def unique(*cols: str) -> Check:
    return Check(f"unique({','.join(cols)})", "unique", None, tuple(cols))


def foreign_key(cols, ref: DataFrame, ref_cols=None) -> Check:
    """Every non-null key tuple must exist in ``ref`` (broadcast
    anti-join — the referenced side is a dimension by assumption)."""
    cols = tuple([cols] if isinstance(cols, str) else cols)
    ref_cols = tuple([ref_cols] if isinstance(ref_cols, str) else (ref_cols or cols))
    if len(cols) != len(ref_cols):
        raise ValueError(f"foreign_key: {cols} vs {ref_cols} length mismatch")
    return Check(f"foreign_key({','.join(cols)})", "fk", None, cols, ref, ref_cols)


def run_checks(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate a suite and return (check, kind, total, violations,
    passed) — one report row per check. All 'row' checks evaluate as
    conditional counts inside ONE aggregation over ONE scan of ``df``
    (plan-asserted in tests); each unique/fk check costs its own
    bounded job (a narrow groupBy on the key, a broadcast anti-join).
    The report is a small driver-built DataFrame — suites are dozens
    of rows, never data-sized."""
    if not checks:
        raise ValueError("empty check suite")
    names = [c.name for c in checks]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate check names: {sorted(names)}")
    spark = df.sparkSession
    rows: list[tuple[str, str, int, int]] = []

    row_checks = [c for c in checks if c.kind == "row"]
    if row_checks:
        aggs = [F.count(F.lit(1)).alias("_total")] + [
            F.count_if(c.violation).alias(f"_v{i}")
            for i, c in enumerate(row_checks)
        ]
        r = df.agg(*aggs).first()
        total = int(r["_total"])
        for i, c in enumerate(row_checks):
            rows.append((c.name, c.kind, total, int(r[f"_v{i}"])))
    else:
        total = df.count()

    for c in checks:
        if c.kind == "unique":
            dup = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") > 1)
                .agg(F.coalesce(F.sum("_n"), F.lit(0)).alias("_rows"))
                .first()
            )
            rows.append((c.name, c.kind, total, int(dup["_rows"])))
        elif c.kind == "fk":
            # SQL MATCH SIMPLE semantics: a key tuple with ANY null
            # component satisfies the constraint and is skipped
            all_set = F.lit(True)
            for b in c.ref_cols:
                all_set = all_set & F.col(b).isNotNull()
            keyed = df.select(
                *[F.col(a).alias(b) for a, b in zip(c.cols, c.ref_cols)]
            ).where(all_set)
            missing = (
                keyed.join(
                    F.broadcast(c.ref.select(*c.ref_cols).distinct()),
                    list(c.ref_cols),
                    "left_anti",
                ).count()
            )
            rows.append((c.name, c.kind, total, int(missing)))

    order = {n: i for i, n in enumerate(names)}
    rows.sort(key=lambda t: order[t[0]])
    return spark.createDataFrame(
        [(n, k, t, v, v == 0) for n, k, t, v in rows],
        "check string, kind string, total long, violations long, passed boolean",
    )


def verify_checks(df: DataFrame, checks: list[Check]) -> None:
    """Run the suite and raise ValueError naming every failed check —
    the post-ingest gate form."""
    failed = [
        (r["check"], r["violations"])
        for r in run_checks(df, checks).collect()
        if not r["passed"]
    ]
    if failed:
        raise ValueError(
            "data-quality checks failed: "
            + "; ".join(f"{n} ({v} violations)" for n, v in failed)
        )
