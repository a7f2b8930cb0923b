"""Format-agnostic table readers/writers.

Parquet is the native format (columnar, pushdown, statistics). CSV/JSON
readers require explicit schemas (inference = a second full scan and
nondeterministic types). ORC supported natively. Delta/Iceberg/Hudi need
their jars — gated behind import-try and reported cleanly when absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

NATIVE_FORMATS = {"parquet", "orc", "json", "csv"}
LAKEHOUSE_FORMATS = {"delta", "iceberg", "hudi"}


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    **options,
) -> DataFrame:
    fmt = fmt.lower()
    if fmt in LAKEHOUSE_FORMATS:
        try:
            return spark.read.format(fmt).options(**options).load(path)
        except Exception as e:  # jar not on classpath in this environment
            raise NotImplementedError(
                f"{fmt} requires its connector jar on the Spark classpath"
            ) from e
    if fmt not in NATIVE_FORMATS:
        raise ValueError(f"unknown format {fmt!r}")
    reader = spark.read
    if fmt in ("json", "csv") and schema is None:
        raise ValueError(f"{fmt} requires an explicit schema (no inference scans)")
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    return reader.options(**options).format(fmt).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "errorifexists",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    table_name: str | None = None,
    **options,
) -> None:
    """Write with layout controls.

    - ``partition_by``: hive-style directory partitioning — partition
      pruning for free on read.
    - ``bucket_by``: (n, cols) — co-located joins/aggs on the bucket key
      with no shuffle (requires a saveAsTable name).
    """
    fmt = fmt.lower()
    if fmt == "csv":
        options.setdefault("header", "true")
    writer = df.write.format(fmt).mode(mode).options(**options)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        if not table_name:
            raise ValueError("bucketBy requires table_name (saveAsTable)")
        writer.bucketBy(n, *cols).sortBy(*cols).saveAsTable(table_name, path=path)
        return
    writer.save(path)
