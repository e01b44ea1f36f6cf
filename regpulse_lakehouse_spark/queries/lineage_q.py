"""Lineage-graph queries — SURVEY.md §2.9 G1-G5 (+U3/J5).

The reference assembles a typed {nodes, edges} lineage graph from four
entity scans plus a typed edge list (services/api/src/lineage.ts:26-132,
jobs/scan.ts:107-167). Here the same algebra runs over the TPC-H entity
graph: customers/suppliers/orders are nodes, orders→customer and
lineitem→part/supplier relations are edges. Parts are deliberately NOT
projected as nodes so edge endpoints dangle — exercising the
placeholder anti-join (lineage.ts:88-101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tpch import load_table
from . import register


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed edge list with 5-tuple dedup (S6 unique-index semantics,
    schema.sql:101-102)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def edge(src_prefix: str, src: str, relation: str, dst_prefix: str, dst: str):
        return [
            F.concat(F.lit(f"{src_prefix}:"), F.col(src).cast("string")).alias("source"),
            F.lit(relation).alias("relation"),
            F.concat(F.lit(f"{dst_prefix}:"), F.col(dst).cast("string")).alias("target"),
        ]

    # Dedup on the narrow numeric key pairs BEFORE building the wide id
    # strings — the shuffle carries 16 bytes/row instead of ~40, and the
    # per-relation distincts make the final cross-relation dedup a no-op
    # (prefixed ids can't collide across relations).
    placed = orders.select(*edge("order", "o_orderkey", "placed_by", "customer", "o_custkey"))
    contains = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .select(*edge("order", "l_orderkey", "contains", "part", "l_partkey"))
    )
    supplied = (
        li.select("l_orderkey", "l_suppkey")
        .distinct()
        .select(*edge("order", "l_orderkey", "supplied_by", "supplier", "l_suppkey"))
    )
    return placed.unionByName(contains).unionByName(supplied)


#: packed-long node-id type bits for the PageRank graph (order keys
#: pack as themselves: type 0)
_T_ORDER, _T_CUSTOMER, _T_PART, _T_SUPPLIER = 0, 1, 2, 3


def _unpack_node(node) -> "F.Column":
    """`(type << 56) | key` packed long → the typed display id string
    (`order:NNN` …) — applied once on the final rank projection."""
    t = F.shiftright(node, 56)
    key = node.bitwiseAND(F.lit((1 << 56) - 1))
    prefix = (
        F.when(t == _T_ORDER, F.lit("order:"))
        .when(t == _T_CUSTOMER, F.lit("customer:"))
        .when(t == _T_PART, F.lit("part:"))
        .otherwise(F.lit("supplier:"))
    )
    return F.concat(prefix, key.cast("string"))


def _graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame, int, DataFrame]:
    """(edges, base, n_nodes) for the lineage PageRank, computed per
    call from the parquet inputs in ONE pass over lineitem on narrow
    numeric keys. (The r15-build /tmp staging of these tables was
    removed: a bench invocation must compute from the inputs, not read
    a cross-run cache.)

    The old per-call build shuffled the materialized edge STRINGS
    three times (two lineitem pair-distincts to build them, then a
    node-distinct and an out-degree groupBy over ~1.2M `order:NNN`
    strings). Here every aggregation runs on the 8-byte numeric keys
    (the g2_j5 trick): lineitem collapses once via
    groupBy(l_orderkey) + collect_set — per-order part/supplier sets
    are bounded by order size, so no skew — and the degree of an
    order node is 1 + |parts| + |supps| read straight off that row.
    Dangling nodes (customers/parts/suppliers — edge targets only)
    come from three narrow single-column distincts. Id strings are
    built in the final projections, after all data movement.

    Assumes the join keys are non-null and o_orderkey is unique —
    both already baked into the graded row's oracle (NOT NULL TPC-H
    keys; the oracle's DISTINCT edge legs and this build agree on the
    fixtures at every sf, enforced by the driver differential)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    op = orders.select(
        F.col("o_orderkey").alias("okey"), F.col("o_custkey").alias("ckey")
    )
    li_agg = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.collect_set("l_partkey").alias("parts"),
        F.collect_set("l_suppkey").alias("supps"),
    )
    # pin the one-lineitem-pass aggregate: BOTH derived tables (the
    # edge list via the explodes below, the base table via order_nodes)
    # consume it, and without the pin the caller's edge checkpoint
    # re-runs the whole groupBy+collect_set a second time per call
    # (r15: measured as one of the two lineitem passes in the row's
    # profile; the count() in this function materializes the pin)
    onode = op.join(li_agg, "okey", "full_outer").localCheckpoint(eager=False)
    # Node ids stay PACKED LONGS through the whole iteration: id =
    # (type << 56) | key (TPC-H keys are far below 2^56 at any sf).
    # The r12 "dictionary encoding" experiment that measured worse used
    # two encode JOINS + a decode join; packing is join-free expression
    # work, cuts the checkpointed edge blocks from ~50 string bytes to
    # 16 numeric bytes per row, and makes every per-round shuffle hash/
    # compare longs instead of `order:NNN` strings. The display strings
    # are built ONCE, on the final 186k-row rank projection (and the
    # graded output is the top-200 of that) — see _unpack_node.
    src = F.col("okey")
    e_placed = onode.filter(F.col("ckey").isNotNull()).select(
        src.alias("source"),
        (F.col("ckey") + F.lit(_T_CUSTOMER << 56)).alias("target"),
    )
    def fanned(tbits: int, arr: str) -> DataFrame:
        return onode.select(src.alias("source"), F.explode(arr).alias("_t")).select(
            "source",
            (F.col("_t") + F.lit(tbits << 56)).alias("target"),
        )

    e_contains = fanned(_T_PART, "parts")
    e_supplied = fanned(_T_SUPPLIER, "supps")
    edges = e_placed.unionByName(e_contains).unionByName(e_supplied)

    deg = (
        F.when(F.col("ckey").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        + F.coalesce(F.size("parts"), F.lit(0))
        + F.coalesce(F.size("supps"), F.lit(0))
    ).cast("long")
    order_nodes = onode.select(src.alias("node"), deg.alias("_deg"))

    # Dangling nodes (customers/parts/suppliers — edge targets only)
    # from ONE pass over the pinned onode blocks: pack all three target
    # families into one array per order row, explode, one distinct
    # exchange over 8-byte longs. r16 (stage profile): the previous
    # shape ran three separate single-column distincts that re-scanned
    # orders and lineitem PARQUET (4 extra scan stages + 3 exchanges
    # per call) for ids the onode aggregate already holds in memory.
    targets = F.concat(
        F.when(
            F.col("ckey").isNotNull(),
            F.array(F.col("ckey") + F.lit(_T_CUSTOMER << 56)),
        ).otherwise(F.array().cast("array<bigint>")),
        F.transform(
            F.coalesce("parts", F.array().cast("array<bigint>")),
            lambda p: p + F.lit(_T_PART << 56),
        ),
        F.transform(
            F.coalesce("supps", F.array().cast("array<bigint>")),
            lambda s: s + F.lit(_T_SUPPLIER << 56),
        ),
    )
    dangling = (
        onode.select(F.explode(targets).alias("node"))
        .distinct()
        .select("node", F.lit(None).cast("long").alias("_deg"))
    )
    base = order_nodes.unionByName(dangling)
    # pin base once per call: every PageRank round scans it twice
    # (dangling agg + the rank join); the count() both materializes
    # the pin and supplies n to the loop as a literal
    base = base.localCheckpoint(eager=False)
    n_nodes = base.count()
    return edges, base, n_nodes, onode


_EDGES_SQL = """
    SELECT DISTINCT 'order:' || CAST(o_orderkey AS VARCHAR) AS source,
           'placed_by' AS relation,
           'customer:' || CAST(o_custkey AS VARCHAR) AS target
    FROM orders
    UNION
    SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR),
           'contains',
           'part:' || CAST(l_partkey AS VARCHAR)
    FROM lineitem
    UNION
    SELECT DISTINCT 'order:' || CAST(l_orderkey AS VARCHAR),
           'supplied_by',
           'supplier:' || CAST(l_suppkey AS VARCHAR)
    FROM lineitem
"""

_NODES_SQL = """
    SELECT 'customer:' || CAST(c_custkey AS VARCHAR) AS id,
           COALESCE(NULLIF(c_name, ''), 'Customer') AS label,
           'customer' AS node_type
    FROM customer
    UNION ALL
    SELECT 'supplier:' || CAST(s_suppkey AS VARCHAR),
           COALESCE(NULLIF(s_name, ''), 'Supplier'),
           'supplier'
    FROM supplier
    UNION ALL
    SELECT 'order:' || CAST(o_orderkey AS VARCHAR),
           o_orderstatus || ' · ' || strftime(o_orderdate, '%Y-%m-%d'),
           'order'
    FROM orders
"""


def _nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 per-type node projections with label fallback rules
    (lineage.ts:30-80: run label 'TYPE · date', doc label title||domain)."""
    c = load_table(spark, sf_dir, "customer").select(
        F.concat(F.lit("customer:"), F.col("c_custkey").cast("string")).alias("id"),
        F.coalesce(F.nullif(F.col("c_name"), F.lit("")), F.lit("Customer")).alias("label"),
        F.lit("customer").alias("node_type"),
    )
    s = load_table(spark, sf_dir, "supplier").select(
        F.concat(F.lit("supplier:"), F.col("s_suppkey").cast("string")).alias("id"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("")), F.lit("Supplier")).alias("label"),
        F.lit("supplier").alias("node_type"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.concat(F.lit("order:"), F.col("o_orderkey").cast("string")).alias("id"),
        F.concat(
            F.col("o_orderstatus"), F.lit(" · "), F.date_format("o_orderdate", "yyyy-MM-dd")
        ).alias("label"),
        F.lit("order").alias("node_type"),
    )
    return c.unionByName(s).unionByName(o)


@register(
    "g1_u3_g4_g5_node_layout",
    oracle=f"""
    WITH nodes AS ({_NODES_SQL})
    SELECT id, label, node_type,
           CASE node_type WHEN 'customer' THEN 0 WHEN 'order' THEN 1
                WHEN 'supplier' THEN 2 ELSE 3 END AS col_index,
           ROW_NUMBER() OVER (PARTITION BY node_type ORDER BY id) - 1 AS row_index
    FROM nodes
    UNION ALL
    SELECT r.r_name, p.prio, 'g5_mapping',
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT)
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority AS prio FROM orders) p
    """,
)
def g1_u3_g4_g5_node_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 typed node projections + U3 union (lineage.ts:26-80) + G4 column
    layout (LineageGraph.tsx:19,48-76: group nodes by type into ordered
    columns, row index within column — a window rank per type over the
    same node set, so one registry entry covers all three). The
    'g5_mapping' leg carries the G5 item×requirement mapped_to cross
    join (jobs/merge.ts:147-158 — the reference's faithful small-side
    cross product; the one deliberate cross join in the registry, see
    CROSS_JOIN_EXEMPT in test_plan_quality) — merged in the round-12
    continuation so the 50-row budget could fund
    ``ch_sp_chunk_pack``'s chunk leg."""
    nodes = _nodes(spark, sf_dir)
    w = W.partitionBy("node_type").orderBy("id")
    col_index = (
        F.when(F.col("node_type") == "customer", 0)
        .when(F.col("node_type") == "order", 1)
        .when(F.col("node_type") == "supplier", 2)
        .otherwise(3)
    )
    layout = nodes.select(
        "id",
        "label",
        "node_type",
        col_index.cast("long").alias("col_index"),
        (F.row_number().over(w) - 1).cast("long").alias("row_index"),
    )
    r = load_table(spark, sf_dir, "region").select("r_name")
    p = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderpriority").alias("prio"))
        .distinct()
    )
    g5 = r.crossJoin(p).select(
        F.col("r_name").alias("id"),
        F.col("prio").alias("label"),
        F.lit("g5_mapping").alias("node_type"),
        F.lit(None).cast("long").alias("col_index"),
        F.lit(None).cast("long").alias("row_index"),
    )
    return layout.unionByName(g5)


@register(
    "g2_j5_edges_placeholders",
    oracle=f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS ({_NODES_SQL}),
    endpoints AS (
      SELECT source AS id FROM edges UNION SELECT target FROM edges
    )
    SELECT 'edge' AS src, source AS c1, relation AS c2, target AS c3 FROM edges
    UNION ALL
    SELECT 'placeholder', e.id, 'Unknown', 'placeholder'
    FROM endpoints e
    WHERE NOT EXISTS (SELECT 1 FROM nodes n WHERE n.id = e.id)
    """,
)
def g2_j5_edges_placeholders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2 edge build + key dedup (lineage.ts:82-129: edges keyed
    source__relation__target; Map semantics → dropDuplicates) and J5
    placeholder synthesis for dangling edge endpoints (lineage.ts:88-101 —
    endpoints ∖ nodes via left-anti join), merged into one tagged union in
    round 12 (the 50-row budget funded the gr_pagerank_topk row, which
    exercises the same edge list at real iterative depth).

    The endpoint set of the edge list is exactly the union of each edge
    column's distinct (type, key) pairs, so this never materializes the
    pair-deduped edge table: five narrow typed-key projections feed ONE
    distinct on (ntype, key) — 8-byte keys instead of `order:NNN`
    strings — and the anti-join against the node set runs on the same
    narrow tuple, sharing its exchange. Id strings are built on the
    surviving placeholders only."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    def keyed(ntype: str, df: DataFrame, col: str) -> DataFrame:
        return df.select(
            F.lit(ntype).alias("ntype"), F.col(col).cast("long").alias("key")
        )

    endpoints = (
        keyed("order", orders, "o_orderkey")
        .unionByName(keyed("customer", orders, "o_custkey"))
        .unionByName(keyed("order", li, "l_orderkey"))
        .unionByName(keyed("part", li, "l_partkey"))
        .unionByName(keyed("supplier", li, "l_suppkey"))
        .distinct()
    )
    nodes = (
        keyed("customer", load_table(spark, sf_dir, "customer"), "c_custkey")
        .unionByName(keyed("supplier", load_table(spark, sf_dir, "supplier"), "s_suppkey"))
        .unionByName(keyed("order", orders, "o_orderkey"))
    )
    placeholders = endpoints.join(nodes, ["ntype", "key"], "left_anti").select(
        F.lit("placeholder").alias("src"),
        F.concat("ntype", F.lit(":"), F.col("key").cast("string")).alias("c1"),
        F.lit("Unknown").alias("c2"),
        F.lit("placeholder").alias("c3"),
    )
    edges = _edges(spark, sf_dir).select(
        F.lit("edge").alias("src"),
        F.col("source").alias("c1"),
        F.col("relation").alias("c2"),
        F.col("target").alias("c3"),
    )
    return edges.unionByName(placeholders)


# DuckDB twin of g3_posexplode, kept for the pytest differential
# (tests/test_oracle_diff.py) after the r9 registry fold.
G3_ORACLE = """
    SELECT vec_id,
           generate_subscripts(embedding, 1) - 1 AS pos,
           ROUND(CAST(unnest(embedding) AS DOUBLE), 4) + 0.0 AS component
    FROM embeddings
    WHERE vec_id < 50
    """


def g3_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3 citation explode (lineage.ts:114-128: evidence node per citation,
    id `item.id-index`) — posexplode over an array column.

    Registry-folded in round 9 (the 50-row budget funded the new
    `fz_editdist_pairs` row, whose q-gram explode grades the same
    posexplode algebra on the driver); this function stays
    pytest-differential-tested against ``G3_ORACLE``."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 50)
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "component")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        # + 0.0 normalizes IEEE negative zero on both sides
        (F.round(F.col("component").cast("double"), 4) + F.lit(0.0)).alias("component"),
    )


def _pagerank_oracle(n_iter: int = 3, damping: float = 0.85, k: int = 200) -> str:
    """Unrolled fixed-iteration PageRank in DuckDB, mirroring
    operators/graphrank.pagerank expression for expression: same edge
    list (_EDGES_SQL), same dangling-mass redistribution, same float64
    op ORDER inside each iteration — (1-d)/n + d*(in + dm/n) — so the
    only cross-engine drift is aggregation-sum reassociation (~1e-15),
    absorbed by the 12-dp rounding (values are ~1e-4: a 5e-13 rounding
    boundary leaves ~2 orders of magnitude of margin). All constants
    are CAST to DOUBLE before arithmetic — bare 0.85 is a DECIMAL in
    DuckDB and decimal math would NOT mirror Spark's doubles."""
    d = f"CAST({damping} AS DOUBLE)"
    iters = "".join(
        f""",
    r{i + 1} AS (
      SELECT b.node, b.d,
             (CAST(1.0 AS DOUBLE) - {d})/nn.n
             + {d} * (COALESCE(c.inr, CAST(0.0 AS DOUBLE)) + dm.m/nn.n) AS rank
      FROM base b
      CROSS JOIN nn
      CROSS JOIN (SELECT COALESCE(SUM(rank), CAST(0.0 AS DOUBLE)) AS m
                  FROM r{i} WHERE d IS NULL) dm
      LEFT JOIN (SELECT e.target AS node, SUM(r.rank / r.d) AS inr
                 FROM edges e JOIN r{i} r ON r.node = e.source
                 GROUP BY e.target) c
        ON b.node = c.node
    )"""
        for i in range(n_iter)
    )
    return f"""
    WITH edges AS ({_EDGES_SQL}),
    nodes AS (SELECT source AS node FROM edges UNION SELECT target FROM edges),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
    deg AS (SELECT source AS src, CAST(COUNT(*) AS BIGINT) AS d
            FROM edges GROUP BY source),
    base AS (SELECT node, d FROM nodes LEFT JOIN deg ON node = src),
    r0 AS (SELECT node, d, CAST(1.0 AS DOUBLE)/nn.n AS rank
           FROM base CROSS JOIN nn){iters}
    SELECT node, ROUND(rank, 12) AS rank
    FROM r{n_iter}
    ORDER BY ROUND(rank, 12) DESC, node
    LIMIT {k}
    """


@register("gr_pagerank_topk", oracle=_pagerank_oracle())
def gr_pagerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-authority ranking over the full typed lineage graph
    (operators/graphrank.pagerank) — the curation signal crawl pipelines
    rank by (Common Crawl publishes per-host centrality; RefinedWeb-style
    pipelines prioritize URLs with it). Exercises the G1-G5 edge algebra
    at real iterative depth: 3 power iterations with dangling-mass
    redistribution over the order→customer/part/supplier edge list
    (orders are the only sources, so every target is dangling — the
    hardest dangling-mass case), top-200 nodes by 12-dp-rounded rank
    with the node id as deterministic tie-break.

    Fixed-iteration float64 PageRank is exactly reproducible across
    engines up to aggregation-sum reassociation (~1e-15 on ranks ~1e-4);
    both sides round to 12 dp and SELECT on the rounded value, so the
    hash compare has ~2 orders of magnitude of margin. Spark shape: per
    iteration one edge⋈rank equi-join + one groupBy-sum (both keyed on
    the node id), the dangling term a 1-row broadcast literal, per-round
    localCheckpoint lineage truncation — no collect, no all-pairs.

    Shuffle partitions self-size from the lineitem input on an isolated
    ``newSession`` clone (the shingle-family pattern) with a floor of 8
    BELOW the core count: the loop's per-round cost at sf0.1 is
    task-scheduling overhead, not CPU (measured: 32 partitions 8.5 s
    warm → 16 partitions 6.8 s, identical plan and output); at sf10+
    the bytes formula takes over and grows the count. A long-id
    dictionary encoding of the node strings was measured WORSE (13.6 vs
    9.5 s — two encode joins + a decode join never amortize over 3
    iterations); the string-keyed shuffle stands.

    r14 cost work (the row was ~14% of the bench): ``checkpoint_every=3``
    skips the intermediate per-round materializations — safe at fixed
    depth 3 (ReuseExchange collapses the duplicated subtrees; see
    pagerank's docstring). r15 optimization round: the /tmp cross-run
    staging of the graph was REMOVED (a bench invocation must compute
    from the parquet inputs); in its place the per-call setup was
    restructured onto narrow numeric keys — ``_graph`` builds the edge
    list, the (node, _deg) base table and the node count in one
    lineitem pass + three single-column distincts, where the pre-r14
    per-call build shuffled the materialized edge strings three times
    (measured: see OPTIMIZATION_r15.md)."""
    import os as _os

    from ..operators.components import _free_blocks
    from ..operators.graphrank import pagerank
    from ..session import scoped_session, stat_fingerprint, tune_shuffle_for_input

    _li_path = f"{sf_dir}/lineitem.parquet"

    def _setup(s: SparkSession) -> None:
        tune_shuffle_for_input(s, _li_path, 1 << 20, floor=8)
        # r16 (stage profile): AQE's default 64 MB advisory coalesced
        # the CPU-DENSE stages of this row — the groupBy(okey)
        # collect_set aggregate (1.28 s serial in one task) and each
        # round's contrib aggregation — down to single tasks. These
        # stages do hash-aggregation work per byte far above a scan's,
        # so the right post-shuffle partition size is much smaller; 4 MB
        # keeps them 3-5 wide at sf0.1 while still coalescing the tiny
        # exchanges. Scoped to this clone only; at cluster scale the
        # bytes-per-partition tune above dominates the width anyway.
        s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        # AQE OFF for the loop clone (r16, interleaved same-process A/B:
        # warm 3.33 → 2.55 s median at sf0.1): the 3-round plan is ~10
        # tiny exchanges whose counts are already INPUT-AWARE via the
        # tune above, so AQE contributes only per-exchange
        # materialization barriers and a replan+codegen round per query
        # stage. The static shape is scale-safe for THIS graph (order
        # keys are near-uniform — no skew to split; the bytes formula
        # grows the width at sf10+, measured sub-linear in SCALING.md);
        # a skewed web graph should keep AQE on — the conf lives on this
        # row's clone only, never the generic pagerank operator. The
        # 4 MB advisory above stays as the sizing if AQE is re-enabled.
        s.conf.set("spark.sql.adaptive.enabled", "false")

    scoped = scoped_session(
        spark,
        f"pagerank:{_os.path.abspath(sf_dir)}",
        fingerprint=(
            stat_fingerprint(_li_path),
            1 << 20,
            "adv4m/noaqe",
            _os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS"),
        ),
        setup=_setup,
    )
    edges, base, n_nodes, onode = _graph(scoped, sf_dir)
    pr = pagerank(
        edges,
        src_col="source",
        dst_col="target",
        damping=0.85,
        n_iter=3,
        checkpoint_every=3,
        base=base,
        n_nodes=n_nodes,
    )
    # the returned frame is already materialized (pagerank checkpoints
    # its final round), so the per-call base and onode pins can be
    # released here — pagerank only frees setup frames it built itself
    _free_blocks(base)
    _free_blocks(onode)
    # unpack the long ids to the typed display strings here, once —
    # the string tie-break (rank DESC, node ASC) is on the decoded id,
    # exactly as when the strings rode the whole loop
    ranked = pr.select(
        _unpack_node(F.col("node")).alias("node"),
        F.round("rank", 12).alias("rank"),
    )
    return ranked.orderBy(F.desc("rank"), F.asc("node")).limit(200)
