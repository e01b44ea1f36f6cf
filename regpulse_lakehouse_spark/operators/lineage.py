"""Domain lineage graph — SURVEY.md §2.9 G1-G4 over the 12-table
catalog (services/api/src/lineage.ts:26-132).

Node projections per entity type with the reference's label rules and
read caps (runs 50, docs/items/requirements 200 — lineage.ts:30,43,56,
70), typed edges from ``links`` plus synthesized ``extracted_from`` FK
edges and ``supported_by`` citation-explode edges, placeholder nodes
for dangling endpoints, and the column-layout window.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

NODE_PREFIX = {
    "Run": "run",
    "SourceDocument": "doc",
    "RegulationItem": "item",
    "Requirement": "req",
    "Evidence": "ev",
}

# Display column order (LineageGraph.tsx:19)
TYPE_COLUMN = {"run": 0, "doc": 1, "item": 2, "req": 3, "ev": 4, "placeholder": 5}


def _pid(prefix: str, col: str = "id") -> F.Column:
    return F.concat(F.lit(f"{prefix}:"), F.col(col))


@dataclass
class LineageGraph:
    nodes: DataFrame  # (id, label, node_type)
    edges: DataFrame  # (source, relation, target)
    layout: DataFrame  # (id, node_type, col_index, row_index)


def build_nodes(
    runs: DataFrame,
    documents: DataFrame,
    items: DataFrame,
    requirements: DataFrame,
    runs_cap: int = 50,
    entity_cap: int = 200,
) -> DataFrame:
    """G1 (lineage.ts:30-80): per-type projections with label fallback
    rules — run: 'TYPE · date'; doc: title||domain; item: title;
    req: family||'Requirement' — each top-N by recency (T4 caps)."""
    run_nodes = (
        runs.orderBy(F.desc("started_at"), F.desc("id"))
        .limit(runs_cap)
        .select(
            _pid("run").alias("id"),
            F.concat(
                F.upper("run_type"), F.lit(" · "), F.date_format("started_at", "yyyy-MM-dd")
            ).alias("label"),
            F.lit("run").alias("node_type"),
        )
    )
    doc_nodes = (
        documents.orderBy(F.desc("retrieved_at"), F.desc("id"))
        .limit(entity_cap)
        .select(
            _pid("doc").alias("id"),
            F.coalesce(F.nullif(F.col("title"), F.lit("")), F.col("domain")).alias("label"),
            F.lit("doc").alias("node_type"),
        )
    )
    item_nodes = (
        items.orderBy(F.desc("created_at"), F.desc("id"))
        .limit(entity_cap)
        .select(
            _pid("item").alias("id"),
            F.col("title").alias("label"),
            F.lit("item").alias("node_type"),
        )
    )
    req_nodes = (
        requirements.orderBy(F.desc("created_at"), F.desc("id"))
        .limit(entity_cap)
        .select(
            _pid("req").alias("id"),
            F.coalesce(
                F.nullif(F.col("requirement_family"), F.lit("")), F.lit("Requirement")
            ).alias("label"),
            F.lit("req").alias("node_type"),
        )
    )
    return (
        run_nodes.unionByName(doc_nodes)
        .unionByName(item_nodes)
        .unionByName(req_nodes)
        .dropDuplicates(["id"])  # U3
    )


def build_edges(links: DataFrame, items: DataFrame) -> DataFrame:
    """G2 (lineage.ts:82-129): typed links + synthesized FK edges +
    citation explode, deduped on (source, relation, target)."""
    def prefix_of(col: str) -> F.Column:
        return F.coalesce(
            *[
                F.when(F.col(col) == full, F.lit(short))
                for full, short in NODE_PREFIX.items()
            ],
            F.lower(F.col(col)),
        )

    link_edges = links.select(
        F.concat(prefix_of("from_type"), F.lit(":"), F.col("from_id")).alias("source"),
        F.col("relation"),
        F.concat(prefix_of("to_type"), F.lit(":"), F.col("to_id")).alias("target"),
    )
    fk_edges = items.filter(F.col("source_document_id").isNotNull()).select(
        F.concat(F.lit("doc:"), "source_document_id").alias("source"),
        F.lit("extracted_from").alias("relation"),
        F.concat(F.lit("item:"), "id").alias("target"),
    )
    # G3 citation explode (lineage.ts:114-128): evidence node per
    # citation with id `item.id-index`.
    citation_edges = items.select(
        F.col("id"), F.posexplode_outer("evidence.citations").alias("pos", "citation")
    ).where(F.col("citation").isNotNull()).select(
        F.concat(F.lit("item:"), "id").alias("source"),
        F.lit("supported_by").alias("relation"),
        F.concat(F.lit("ev:"), F.col("id"), F.lit("-"), F.col("pos")).alias("target"),
    )
    return (
        link_edges.unionByName(fk_edges)
        .unionByName(citation_edges)
        .dropDuplicates(["source", "relation", "target"])
    )


def add_placeholders(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """J5 (lineage.ts:88-101): placeholder node for any edge endpoint
    absent from the node set (left-anti join)."""
    endpoints = (
        edges.select(F.col("source").alias("id"))
        .unionByName(edges.select(F.col("target").alias("id")))
        .distinct()
    )
    placeholders = endpoints.join(nodes, "id", "left_anti").select(
        "id", F.lit("Unknown").alias("label"), F.lit("placeholder").alias("node_type")
    )
    return nodes.unionByName(placeholders)


def layout(nodes: DataFrame) -> DataFrame:
    """G4 (LineageGraph.tsx:19,48-76): type → display column, row index
    within column via window rank."""
    col_index = F.coalesce(
        *[F.when(F.col("node_type") == t, F.lit(c)) for t, c in TYPE_COLUMN.items()],
        F.lit(9),
    )
    w = W.partitionBy("node_type").orderBy("id")
    return nodes.select(
        "id",
        "node_type",
        col_index.alias("col_index"),
        (F.row_number().over(w) - 1).alias("row_index"),
    )


def build_graph(
    runs: DataFrame, documents: DataFrame, items: DataFrame, requirements: DataFrame,
    links: DataFrame,
) -> LineageGraph:
    nodes = build_nodes(runs, documents, items, requirements)
    edges = build_edges(links, items)
    nodes = add_placeholders(nodes, edges)
    return LineageGraph(nodes=nodes, edges=edges, layout=layout(nodes))
