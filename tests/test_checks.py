"""Table-level data-quality constraints (operators/checks.py): report
correctness against hand-computed violations, SQL-style NULL
semantics, single-scan plan shape for row-local suites, and the
raising gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from regpulse_lakehouse_spark.operators import checks as C
from regpulse_lakehouse_spark.sources.tpch import load_table


def _tbl(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.com", 10.0, "eu", 1),
            (2, "b@x.com", 55.0, "us", 2),
            (3, None, 120.0, "eu", 3),
            (4, "not-an-email", -5.0, "mars", None),
            (4, "d@x.com", 70.0, "us", 99),
        ],
        "id long, email string, score double, region string, nation long",
    )


def _ref(spark):
    return spark.createDataFrame([(1,), (2,), (3,)], "nation long")


def test_report_counts_match_hand_computation(spark):
    df = _tbl(spark)
    rep = {
        r["check"]: (r["violations"], r["passed"])
        for r in C.run_checks(
            df,
            [
                C.not_null("email"),
                C.in_range("score", 0.0, 100.0),
                C.accepted_values("region", ["eu", "us"]),
                C.matches_regex("email", r"^[^@]+@[^@]+$"),
                C.satisfies("score_vs_id", F.col("score") > F.col("id")),
                C.unique("id"),
                C.foreign_key("nation", _ref(spark)),
            ],
        ).collect()
    }
    assert rep["not_null(email)"] == (1, False)
    assert rep["in_range(score,0.0,100.0)"] == (2, False)  # 120, -5
    assert rep["accepted_values(region)"] == (1, False)  # mars
    assert rep["matches_regex(email)"] == (1, False)  # not-an-email (null passes)
    # satisfies: NULL result counts as violation — none here, 120>3 etc;
    # -5 > 4 false → violation; 10>1 ok, 55>2 ok, 70>4 ok
    assert rep["satisfies(score_vs_id)"] == (1, False)
    assert rep["unique(id)"] == (2, False)  # both id=4 rows count
    # fk: nation=99 missing; the NULL nation row passes (MATCH SIMPLE)
    assert rep["foreign_key(nation)"] == (1, False)


def test_all_green_suite_and_gate(spark):
    df = _tbl(spark).where(F.col("id") < 3)
    checks = [
        C.not_null("email"),
        C.in_range("score", 0.0, 100.0),
        C.unique("id"),
        C.foreign_key("nation", _ref(spark)),
    ]
    rep = C.run_checks(df, checks)
    assert all(r["passed"] for r in rep.collect())
    C.verify_checks(df, checks)  # no raise
    with pytest.raises(ValueError, match=r"not_null\(email\) \(1 violations\)"):
        C.verify_checks(_tbl(spark), checks)


def test_row_local_suite_is_one_scan_one_agg(spark):
    """Any number of row-local checks must compile to a single
    aggregate over a single scan — the cost model the operator
    promises. (No shuffle beyond the one global agg exchange, no
    repeated relation.)"""
    df = _tbl(spark)
    checks = [
        C.not_null("email"),
        C.in_range("score", 0.0, 100.0),
        C.accepted_values("region", ["eu", "us"]),
        C.matches_regex("email", r"@"),
        C.satisfies("pos", F.col("score") > -1000),
    ]
    aggs = [F.count(F.lit(1)).alias("_total")] + [
        F.count_if(c.violation).alias(f"_v{i}") for i, c in enumerate(checks)
    ]
    plan = df.agg(*aggs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1
    assert "Exchange" not in plan.split("HashAggregate")[-1]  # single-partition final only


def test_real_table_fk_and_ranges(spark, sf_dir):
    """The gate shape on real data: orders' customer keys must resolve
    against customer, totals positive, status in the enum."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    rep = {
        r["check"]: r["passed"]
        for r in C.run_checks(
            orders,
            [
                C.foreign_key("o_custkey", customer, "c_custkey"),
                C.satisfies("positive_total", F.col("o_totalprice") > 0),
                C.accepted_values("o_orderstatus", ["F", "O", "P"]),
                C.unique("o_orderkey"),
            ],
        ).collect()
    }
    assert all(rep.values()), rep


def test_validation_errors(spark):
    df = _tbl(spark)
    with pytest.raises(ValueError, match="empty check suite"):
        C.run_checks(df, [])
    with pytest.raises(ValueError, match="duplicate check names"):
        C.run_checks(df, [C.not_null("email"), C.not_null("email")])
    with pytest.raises(ValueError, match="length mismatch"):
        C.foreign_key(["a", "b"], _ref(spark), ["x"])
