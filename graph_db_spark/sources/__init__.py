"""Sources & sinks.

The reference's I/O surface is its checkpoint serialize/deserialize and
the WAL file append/replay (Storage.hs, Graph.hs:145-228) — covered by
graph_db_spark.storage as parquet snapshot dirs + parquet WAL generations.
This package adds the general connector layer a Spark-native engine is
expected to have: format-agnostic readers/writers with explicit schemas,
partitioned writes, and import-try-gated lakehouse formats.
"""

from graph_db_spark.sources.connectors import read_table, write_table

__all__ = ["read_table", "write_table"]
