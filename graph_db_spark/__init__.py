"""graph_db_spark — a PySpark-native engine with the query and
data-processing capabilities of nikita-volkov/graph-db.

The reference (/root/reference) is an in-memory OLTP property-graph store
driven by a 9-operation transaction DSL (library/GraphDB/Action.hs:11-21).
This package re-expresses those capabilities Spark-first:

- ``graph``      — immutable snapshot tables (vertices / edges / edge_index),
                   the 9-op transactional surface, index-guided traversal
                   (``get_targets``/``get_sources``), and BFS stats.
- ``model``      — typed vertex/edge kinds + write-time index emission
                   (the reference's ``Edge.indexes`` hook, Model.hs:36-39).
- ``storage``    — event-log (WAL) + checkpoint/recovery/time-travel
                   semantics (Storage.hs / Persistent/Log.hs).
- ``pregel``     — iterative analytics: BFS levels, connected components,
                   weighted SSSP, PageRank.
- ``functions``  — shared expression library (vector math, tokenization).
- ``operators``  — relational + LLM-data-pipeline operators (dedup,
                   similarity search, text analysis, temporal, multimodal,
                   skew mitigation).
- ``sources``    — format connectors + partitioned/bucketed writers.
- ``streaming``  — Structured Streaming over the mutation log, windowed
                   aggs, custom stateful sessions.
- ``plans``      — physical-plan inspection (pushdown/codegen audits).
"""

from graph_db_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
