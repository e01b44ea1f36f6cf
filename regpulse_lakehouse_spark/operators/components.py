"""Connected components over a candidate-pair graph — turns the LSH
near-dup PAIR lists (operators/dedup.py, operators/vector.py) into
transitive duplicate CLUSTERS, so "keep one representative per
duplicate group" means the group closure, not just pairwise losers.

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round, every node takes the minimum label in its
closed neighborhood; converged when no label changes. Rounds needed =
graph diameter — and duplicate-cluster graphs are SHALLOW (a dup
cluster is a near-clique via shared bands, so diameter is a few hops
even for thousand-document clusters), which is why plain propagation
beats the fancier large-star/small-star dance here.

Scale shape per round: one join of the (src, dst) edge list against
the label table (shuffle on node id, the same key every round, so AQE
reuses the partitioning), one groupBy-min, one equality check via a
count aggregate. The edge list is symmetrized once up front.
``localCheckpoint`` truncates lineage each round so the plan doesn't
grow with the iteration count (the classic iterative-algorithm trap).

The driver-side loop (one ``count()`` per round to test convergence)
is the textbook structure for iterative DataFrame algorithms — the
per-round data never touches the driver, only the change count does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    src_col: str = "a",
    dst_col: str = "b",
    id_col: str = "id",
    max_iterations: int = 20,
) -> DataFrame:
    """(id, component) for every node, where ``component`` is the
    minimum node id reachable through ``pairs``. ``nodes`` (optional,
    single-column ``id_col``) adds isolated nodes as their own
    singleton components. Raises after ``max_iterations`` rounds
    without convergence — with shallow dup-cluster graphs that means
    the input is not the pair list this operator is for."""
    # materialize the symmetrized edges ONCE: the loop below joins this
    # every round, and an un-checkpointed edge list would re-execute the
    # whole upstream pair-generation plan (in prepare_corpus: the full
    # LSH banding pipeline) once per round
    edges = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .distinct()
        .localCheckpoint()
    )
    members = edges.select(F.col("s").alias(id_col))
    if nodes is not None:
        members = members.unionByName(nodes.select(F.col(id_col)))
    labels = members.distinct().select(
        F.col(id_col), F.col(id_col).alias("component")
    ).localCheckpoint()

    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["s"] == labels[id_col])
            .groupBy(F.col("d").alias(id_col))
            .agg(F.min("component").alias("_nbr_min"))
        )
        updated = (
            labels.join(neighbor_min, id_col, "left")
            .select(
                F.col(id_col),
                F.least(F.col("component"), F.coalesce("_nbr_min", "component")).alias(
                    "component"
                ),
                (F.coalesce("_nbr_min", "component") < F.col("component")).alias(
                    "_changed"
                ),
            )
        ).localCheckpoint()
        changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds — "
        "graph diameter exceeds the dup-cluster regime this is built for"
    )


def cluster_representatives(
    pairs: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    src_col: str = "a",
    dst_col: str = "b",
    max_iterations: int = 50,
) -> DataFrame:
    """Transitive dedup: collapse every duplicate CLUSTER (connected
    component of the pair graph) to its minimum-id representative.
    Returns the corpus rows that survive — documents with no near-dup
    pair pass through untouched (they never enter the component
    computation, which runs only on the pair graph's nodes).

    ``max_iterations`` defaults higher than connected_components' own:
    near-dup similarity is NOT transitive, so long revision CHAINS
    (daily snapshots, successive edits — each version similar only to
    its neighbors) are legitimate inputs with diameter ≈ chain length;
    rounds are cheap once the edge list is checkpointed."""
    comp = connected_components(
        pairs,
        src_col=src_col,
        dst_col=dst_col,
        id_col=id_col,
        max_iterations=max_iterations,
    )
    losers = comp.filter(F.col(id_col) != F.col("component")).select(id_col)
    return corpus.join(losers, id_col, "left_anti")
