"""PageRank over an edge table — the link-authority signal crawl
curation actually ranks by (Common Crawl publishes harmonic/PageRank
centrality per host; RefinedWeb-style pipelines filter and prioritize
URLs with it). Pure DataFrame power iteration:

    rank_{t+1}(v) = (1-d)/N + d · Σ_{u→v} rank_t(u) / outdeg(u)

with the standard dangling-mass redistribution (nodes with no
out-edges donate their rank uniformly) so total rank stays 1 and
ranks are comparable across graphs.

Spark shape: out-degrees computed once; each iteration is one
edge-join + one groupBy-sum (two narrow shuffles on the node key),
with per-round lineage truncation (operators/components.py helpers:
localCheckpoint locally, reliable ``checkpoint_dir`` on clusters) so
the plan cannot snowball across iterations. The dangling term is a
one-row aggregate, broadcast implicitly as a literal via crossJoin of
a 1-row frame — no driver-side loop over data, no collect of ranks.

Reference parity: none — the reference stores a citation/link graph
(SURVEY §2.9 G1-G5) but never ranks it; this is beyond-parity surface
for the crawl-curation north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import _free_blocks, _truncate_lineage


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    n_iter: int = 20,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 1,
    base: DataFrame | None = None,
    n_nodes: int | None = None,
) -> DataFrame:
    """Rank every node appearing in ``edges`` (as source or target).
    Returns (node, rank) with Σrank = 1. Parallel edges count with
    multiplicity (the usual treatment when edge weight = link count);
    pre-``distinct()`` the edges for the unweighted variant.

    Rounds run the SHUFFLE join keyed on the node id deliberately: a
    per-round ``F.broadcast(ranks)`` was tried (r12) and measured
    WORSE and erratic on the 186k-node lineage graph (warm 7.9 →
    6.4-25.6 s — each round pays a driver collect + broadcast rebuild
    of the freshly checkpointed rank table, the same broadcast-thread
    stall e4's history records), while the shuffle path reuses the
    node-keyed exchange round after round and is the only shape that
    holds on a 10^8-node web graph anyway.

    ``checkpoint_every``: lineage-truncate the rank table every Nth
    round (the final round always materializes). 1 (default) is the
    safe long-loop shape — plan depth stays constant for any
    ``n_iter``. Short fixed-depth runs can raise it to ``n_iter``:
    ranks feeds two consumers per round (dangling agg + contrib
    join), so an unchained K-round plan nominally duplicates the
    round-(K-1) subtree — but Spark's ReuseExchange collapses the
    copies and skipping the per-round materialization was measured
    −20% on the graded 3-iteration lineage row (7.2 → 5.7 s warm at
    sf0.1, identical output). Past ~5 unchained rounds compile time
    and the 2^K nominal tree win; keep the default there.

    ``base``/``n_nodes``: optionally supply the PRE-AGGREGATED setup
    table — (node, _deg) with NULL degree for dangling nodes, one row
    per node appearing in ``edges`` — and its row count. Both are pure
    functions of the edge list, so a caller that can derive them more
    cheaply than the generic string-keyed path here (the graded
    lineage row computes them on narrow numeric keys in one lineitem
    pass, queries/lineage_q._graph) skips the node-distinct, the
    out-degree groupBy, the degree join and the setup count()
    action on every call. Supplied frames are trusted as-is and must
    be cheap to re-scan (a parquet read qualifies) — every iteration
    reads ``base``. Supply both or neither."""
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if n_iter < 1:
        raise ValueError(f"n_iter must be >= 1, got {n_iter}")
    if checkpoint_every < 1:
        raise ValueError(f"checkpoint_every must be >= 1, got {checkpoint_every}")
    # materialize the edge list ONCE: the loop joins it every round, and
    # an un-checkpointed edge table re-executes the whole upstream plan
    # (for the lineage graph: two lineitem-wide distincts) once per
    # iteration — measured 7.2 s warm → 2.6 s at sf0.1 for the graded
    # 3-iteration row (same fix components.py has carried since r7)
    # eager=False (r16): the loop's first action materializes the edge
    # blocks together with round 1 instead of paying a separate driver
    # action for the checkpoint alone — same blocks, one fewer action
    # per call. Safe here because pagerank never frees e until after
    # the final round's materialization (below).
    e = _truncate_lineage(
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst")),
        checkpoint_dir,
        eager=False,
    )
    if (base is None) != (n_nodes is None):
        raise ValueError("supply base and n_nodes together or not at all")
    owns_base = base is None
    if owns_base:
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
        )
        outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
        # ONE checkpointed setup table: (node, _deg) — rank-donating
        # nodes carry their degree; dangling nodes (no out-edges) keep
        # _deg NULL and donate via the dangling term instead. r12
        # folded the separate node-set checkpoint into this frame and
        # reads n off its count — two materializations (nodes, r0)
        # fewer per call than the original nodes→base→r0 chain; r0
        # itself stays UN-checkpointed (base + one literal column —
        # round 1 reads base's blocks directly).
        base = _truncate_lineage(
            nodes.join(outdeg, nodes["node"] == outdeg["src"], "left").select(
                "node", "_deg"
            ),
            checkpoint_dir,
        )
        n_row = base.count()  # one action; also materializes the table
    else:
        base = base.select("node", "_deg")
        n_row = n_nodes
    if n_row == 0:
        raise ValueError("pagerank requires a non-empty edge table")

    ranks = base.select("node", "_deg", F.lit(1.0 / n_row).alias("rank"))
    prev_ckpt = None  # previously checkpointed rank frame, if any
    teleport = (1.0 - damping) / n_row
    for it in range(n_iter):
        dangling = (
            ranks.filter(F.col("_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("_deg")).alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        nxt = (
            base.join(contrib, "node", "left")
            .crossJoin(dangling)  # 1-row frame: a broadcast literal, not a blowup
            .select(
                "node",
                "_deg",
                (
                    F.lit(teleport)
                    + F.lit(damping)
                    * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.col("_dm") / n_row)
                ).alias("rank"),
            )
        )
        # round 0's ranks frame is a projection OVER base, not its own
        # checkpoint — only frames WE checkpointed get their blocks
        # freed when the next checkpoint supersedes them
        if (it + 1) % checkpoint_every == 0 or it == n_iter - 1:
            nxt = _truncate_lineage(nxt, checkpoint_dir)
            if prev_ckpt is not None:
                _free_blocks(prev_ckpt)
            prev_ckpt = nxt
        ranks = nxt
    # the returned frame is itself checkpointed — the edge/base blocks
    # can go (base feeds each round's plan but the LAST round is
    # already materialized); without this an embedding pipeline pins
    # one edge-list copy per pagerank call for the process lifetime
    _free_blocks(e)
    if owns_base:
        _free_blocks(base)
    return ranks.select("node", "rank")
