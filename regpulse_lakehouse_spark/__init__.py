"""regpulse_lakehouse_spark — a PySpark-native analytics engine.

A ground-up Spark rebuild of the query / data-processing capabilities of
``hydradrianfyh/regpulse-lakehouse`` (reference surveyed in SURVEY.md):
a 12-table regulatory-intelligence lakehouse with governed ingestion,
validation/routing, lineage graphs, vector search, and dashboard
analytics — re-expressed as declarative DataFrame/SQL plans that
Catalyst can optimize, plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal
plumbing) the reference lacks.

Design stance (SURVEY.md §4, §7):
- every operator is a single lazily-planned DataFrame DAG — no
  driver-side row loops, no ``collect()`` inside transforms;
- dimension joins are broadcast; big joins/aggs shuffle on their keys;
- external-model stages (LLM extract/merge, embedding) sit behind
  deterministic, testable interfaces implemented with Pandas UDFs.
"""

__version__ = "0.1.0"

from .tmpstate import cleanup  # noqa: E402  (process-lifetime /tmp teardown)

__all__ = ["cleanup", "__version__"]
