"""SparkSession factory tuned for this engine.

Local-mode testing uses ``local[$SPARK_GRAFT_CPUS]``; the configs are
chosen to also be sane defaults on a real cluster (AQE on, skew-join
handling, Arrow for the pandas-UDF slow path, UTC session timezone so
timestamps hash-match the DuckDB oracle).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "graph_db_spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", str(max(int(cpus), 8))))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_events(spark: SparkSession, sf_dir: str):
    """Load the events table and normalize its timestamp, exposing both:
      - ``ts_ns``  LONG       — exact nanosecond epoch, used for ordering,
                                gap arithmetic, and second/hour bucketing
                                (bit-for-bit reproducible in the oracle);
      - ``ts``     TIMESTAMP  — the instant as a session-tz timestamp, for
                                display/windows.

    The fixture's parquet ``ts`` has shipped in two physical encodings:
    TIMESTAMP(NANOS) (unreadable by Spark's vectorized reader as a
    timestamp — loaded as exact LONG nanos via the legacy conf) and
    TIMESTAMP(MICROS) with isAdjustedToUTC=false (loads as TIMESTAMP_NTZ
    on Spark 4.x). We branch on the *loaded* dtype so either encoding —
    and either Spark major — produces identical ``ts_ns``/``ts`` columns.
    """
    from pyspark.sql import functions as F

    try:
        # Lets genuine TIMESTAMP(NANOS) columns load as exact nanos longs
        # instead of failing with PARQUET_TYPE_ILLEGAL. No effect on
        # micros columns. Guarded: a future Spark may drop the conf.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        # nanos-as-long: the long IS the exact ns epoch
        return df.withColumn("ts_ns", F.col("ts").cast("long")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    # timestamp / timestamp_ntz: Spark timestamps carry at most micro
    # precision, so micros*1000 is lossless. The ntz→ltz cast is an
    # identity on the instant because the session timezone is UTC.
    ts = F.col("ts").cast("timestamp")
    return df.withColumn("ts_ns", F.unix_micros(ts) * F.lit(1000)).withColumn("ts", ts)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver's parquet tables from *sf_dir* as a dict of DataFrames."""
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in names}


def spread_small_input(df, factor: int = 1):
    """Repartition *df* to the cluster's parallelism iff it scans fewer
    partitions than that — the guard for single-file / single-row-group
    inputs whose downstream per-row work (explode + hashing) would
    otherwise run as one task.

    At real scale the corpus arrives in thousands of splits and this is a
    no-op (no shuffle is ever added to an already-wide input); on the
    local fixtures it turns a 1-task scan stage into a full-width one at
    the cost of shuffling the (small, by premise) raw input once."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
