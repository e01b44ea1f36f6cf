"""Physical-plan quality gates (SURVEY.md §4; BASELINE.md engineering
stance: pushdown + pruning + broadcast dims + no accidental cross
products).

These assert on `.explain`/`queryExecution` output, not timings — the
properties that survive a 100× scale-up:

- predicate pushdown reaches the parquet scan (PushedFilters);
- column pruning keeps metadata-only plans off wide columns
  (ReadSchema);
- dimension joins broadcast;
- the hot relational path stays inside whole-stage codegen;
- no registered query plans a cartesian product (the one deliberate
  cross join, g5, is exempted — it reproduces the reference's
  item×requirement cross product over two tiny inputs).
"""

from __future__ import annotations

import pytest

from regpulse_lakehouse_spark.queries import load_all

REGISTRY = load_all()

# g5 reproduces merge.ts:147-158's deliberate small×small cross join.
CROSS_JOIN_EXEMPT = {"g1_u3_g4_g5_node_layout"}  # the G5 leg's deliberate cross join


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = REGISTRY["s1_s2_scan_filter"].fn(spark, sf_dir)
    plan = _formatted(df)
    assert "PushedFilters" in plan
    assert "EqualTo(l_returnflag,R)" in plan.replace(" ", "").replace("'", "")


def test_column_pruning_metadata_only_plan(spark, sf_dir):
    # mm_frame_sample_plan must never read the text/props payloads —
    # at 100 TB this is the difference between a metadata query and a
    # full-corpus scan. (Unregistered r10 — the ts_gapfill fold — so
    # driven directly; this assert is the property the row existed for.)
    from regpulse_lakehouse_spark.queries.multimodal_q import mm_frame_sample_plan

    df = mm_frame_sample_plan(spark, sf_dir)
    plan = _formatted(df)
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert read_schema, "no ReadSchema in formatted plan"
    line = read_schema[0]
    assert "props" not in line and "user_id" not in line


def test_dimension_join_broadcasts(spark, sf_dir):
    df = REGISTRY["j2_fk_lookup_chain"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan


def test_bm25_row_plan_shape(spark, sf_dir):
    """The graded BM25 row must keep its engineered shape: term filter
    before any aggregate (the explode stream carries only query-term
    postings), broadcast df join, TakeOrdered top-k — never a global
    sort or a shuffled join on the tiny df side."""
    df = REGISTRY["rt_bm25_topk"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    fmt = _formatted(df).replace("'", "")
    assert "IN (dup,vector,scan)" in fmt  # term filter survives into the plan
    # and it sits directly on the explode output, upstream of every
    # aggregate: in the node-detail section the Filter's input is the
    # Generate's output column set (doc_id, text, term)
    import re

    m = re.search(r"\(\d+\) Filter\nInput \[3\]: \[[^\]]*term[^\]]*\]\nCondition : term#\d+ IN \(dup,vector,scan\)", fmt)
    assert m, "query-term filter is not applied directly to the exploded stream"


def test_flagship_stays_in_codegen(spark, sf_dir):
    df = REGISTRY["flagship_pricing_summary"].fn(spark, sf_dir)
    df.collect()  # AQE finalizes THIS df's plan only when it executes
    plan = _physical_plan(df)
    assert "isFinalPlan=true" in plan
    # "*(n) Op" prefixes mark whole-stage-codegen spans in plan strings
    assert "*(" in plan, "no whole-stage-codegen span in final plan"
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_decontam_row_broadcasts_eval_grams(spark, sf_dir):
    """tx_decontam_overlap's 100 TB contract: the eval gram set ships
    as a broadcast, so the train-corpus gram stream joins map-side —
    never a shuffled sort-merge join of train data against the
    benchmark."""
    df = REGISTRY["tx_decontam_overlap"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_no_cartesian_product(spark, sf_dir, name):
    if name in CROSS_JOIN_EXEMPT:
        pytest.skip("deliberate reference-parity cross join")
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"


# Shuffle budgets for the plans whose exchange counts were explicitly
# engineered (first-matching-band dedup, narrow-key upsert/endpoints).
# Counted on the PRE-AQE physical plan: every Exchange node is a
# potential full-data shuffle at 100 TB, so a regression here is a
# scale bug even if sf0.1 timings stay flat. Budgets are ceilings, not
# exact counts, so legitimate optimizer changes that REMOVE shuffles
# still pass.
SHUFFLE_BUDGET = {
    # core LSH (fan_out + sig groupBy + band self-join pair, 4) plus
    # the r13 exact-clique pre-collapse: content-hash window (embedded
    # twice pre-AQE: members + reps branches), the two member-expansion
    # joins and the intra-clique self-join — every added exchange moves
    # only the narrow (id, rep) membership table or the pair table,
    # linear data on 8-byte keys, in return for candidate generation
    # bounded by DISTINCT-content cardinality (the old plan shipped
    # B²/2 signature-payload rows per B-copy exact-dup clique)
    "dd_minhash_lsh_pairs": 10,
    "dd_simhash_near_dup": 8,
    # one dedup/anti exchange pair on the narrow edge key + final union
    # (S6 leg) + the S3 leg's anti-join + groupBy — merged row, r12
    "s3_s6_upsert_antijoin": 5,
    # edge leg: per-relation narrow-key distincts; placeholder leg: one
    # endpoints-distinct + anti-join against nodes — merged row, r12
    "g2_j5_edges_placeholders": 8,
    # TakeOrderedAndProject legs only, plus the merged T6 leg's single
    # groupBy exchange (r12)
    "t4_t6_topk_limits": 1,
    # tf agg + count_distinct df pair + final per-doc sum; the df side
    # must stay a BroadcastExchange, never a shuffled sort-merge join
    "rt_bm25_topk": 4,
    # fan_out + the (train,benchmark) pair groupBy; the eval gram join
    # is a BroadcastExchange (asserted separately) — more exchanges
    # here would mean train-corpus grams started shuffling
    "tx_decontam_overlap": 4,
    # bucketized range join with broadcast_intervals=True: the exploded
    # anchor side broadcasts, points never shuffle AT ALL — any
    # Exchange here means the bucketize→equi-join shape regressed
    "rj_interval_join": 0,
    # visible post-checkpoint stages only (the gram detection pass sits
    # behind a lazy localCheckpoint and runs as its own job): strip
    # join-back + per-doc aggregate + union alignment
    "dd_dup_spans": 3,
    # split/strat legs are row-local filters; the cap leg pays the
    # group-size count + the over-cap window + the union alignment
    # (WindowGroupLimit bounds the window exchange map-side — asserted
    # in test_sampling.py)
    "sp_split_sample_cap": 3,
    # chunk leg is a pure projection (zero exchanges); the r13 pack
    # leg pays the shard exchange into the FFD applyInPandas, the
    # per-pack groupBy, the countDistinct pair, and four one-row
    # aggregate exchanges. The textual pre-AQE count double-embeds the
    # shared shard/per-pack subtrees (pack_stats, uniq, shard_ok all
    # consume them; AQE reuses the materialized exchanges at runtime),
    # and the 1-row stats tables join by BROADCAST on a literal key —
    # every counted exchange carries (pack_id, longs) or a single row
    "ch_sp_chunk_pack": 11,
}


def test_range_join_is_hash_join_not_nested_loop(spark, sf_dir):
    """The graded range-join row must compile to a broadcast HASH join
    on the bucket key — BroadcastNestedLoopJoin (what SparkSQL does
    with a raw BETWEEN join) is the quadratic shape the bucketize
    pipeline exists to avoid."""
    df = REGISTRY["rj_interval_join"].fn(spark, sf_dir)
    plan = _physical_plan(df)
    assert "BroadcastNestedLoop" not in plan, "range join fell back to nested loop"
    assert "BroadcastHashJoin" in plan, "anchor side is not broadcast-hash-joined"


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_shuffle_budget(spark, sf_dir, name):
    import re

    df = REGISTRY[name].fn(spark, sf_dir)
    plan = _physical_plan(df)
    # shuffle exchanges only — BroadcastExchange ships a small side and
    # is exactly what we WANT instead of a shuffle
    n = len(re.findall(r"(?<!Broadcast)Exchange ", plan))
    assert n <= SHUFFLE_BUDGET[name], (
        f"{name}: {n} Exchange nodes, budget {SHUFFLE_BUDGET[name]} — a "
        "shuffle crept back into an engineered plan"
    )


@pytest.mark.parametrize(
    "name",
    [
        n
        for n in sorted(REGISTRY)
        if n.startswith(
            ("s1", "s2", "f", "j", "a", "w", "t", "u", "v", "g", "rt", "sp_", "ch_", "rj_")
        )
        or n == "dd_dup_spans"
    ],
)
def test_relational_path_has_no_python_stages(spark, sf_dir, name):
    """Every reference-surface operator compiles to a pure JVM plan —
    Python appears only in the pluggable model/vector/multimodal stages."""
    df = REGISTRY[name].fn(spark, sf_dir)
    plan = _physical_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, f"{name} has a Python stage: {marker}"
