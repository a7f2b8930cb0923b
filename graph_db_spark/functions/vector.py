"""Vector math over ARRAY<FLOAT/DOUBLE> columns — built-in higher-order
functions only (zip_with/aggregate/transform stay inside whole-stage
codegen; no Python in the hot path, which is the difference between
~100 MB/s/core and ~1 MB/s/core at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ via zip_with + aggregate (codegen'd, no UDF)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(v: Column) -> Column:
    """L2 norm."""
    return F.sqrt(dot(v, v))


def with_norm(df: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Cast the vector to double and attach its L2 norm as ``__norm``."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    return df.withColumn(vec_col, v).withColumn("__norm", norm(F.col(vec_col)))


def hyperplane_signature(
    df: DataFrame,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "",
) -> DataFrame:
    """Deterministic random-hyperplane LSH signature → (id, bucket).

    Plane p's component for dimension d is ±1 from the parity of the first
    hex char of md5('<seed><p>|<d>') — fully portable (any engine with md5
    derives the identical planes; no RNG state to ship). The sign of
    vec·plane gives bit p; the n-bit string is the bucket. Cosine-similar
    vectors collide with high probability (SimHash/Charikar scheme);
    *seed* derives independent plane sets for multi-table LSH.

    Plan shape: one posexplode (narrow) + one groupBy(id) with n_planes
    SUM aggregates — map-side combinable, a single shuffle of partial sums.
    """
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("d", "x"),
    )
    bit_aggs = []
    for p in range(n_planes):
        sign = F.when(
            F.ascii(
                F.substring(F.md5(F.concat(F.lit(f"{seed}{p}|"), F.col("d").cast("string"))), 1, 1)
            )
            % 2
            == 1,
            F.col("x"),
        ).otherwise(-F.col("x"))
        bit_aggs.append(
            F.when(F.sum(sign) > 0, F.lit("1")).otherwise(F.lit("0")).alias(f"b{p}")
        )
    sig = pairs.groupBy("id").agg(*bit_aggs)
    return sig.select("id", F.concat(*[F.col(f"b{p}") for p in range(n_planes)]).alias("bucket"))


def hyperplane_signatures_multi(
    df: DataFrame,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All *n_tables* LSH table buckets in ONE pass → (id, table, bucket).

    Same per-table signatures as ``hyperplane_signature(seed=f"t{t}:")``,
    but every table's bits are aggregates of the same groupBy — one
    posexplode + one shuffle total instead of one per table (the
    difference between 1 and n_tables scans of a 100 TB corpus).
    """
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.transform(F.col(vec_col), lambda x: x.cast("double"))).alias("d", "x"),
    )
    bit_aggs = []
    for t in range(n_tables):
        for p in range(n_planes):
            sign = F.when(
                F.ascii(
                    F.substring(
                        F.md5(F.concat(F.lit(f"t{t}:{p}|"), F.col("d").cast("string"))), 1, 1
                    )
                )
                % 2
                == 1,
                F.col("x"),
            ).otherwise(-F.col("x"))
            bit_aggs.append(
                F.when(F.sum(sign) > 0, F.lit("1")).otherwise(F.lit("0")).alias(f"t{t}b{p}")
            )
    sig = df.sparkSession.createDataFrame([], "id long") if not bit_aggs else pairs.groupBy("id").agg(*bit_aggs)
    buckets = F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                F.concat(*[F.col(f"t{t}b{p}") for p in range(n_planes)]).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )
    return sig.select("id", F.explode(buckets).alias("tb")).select(
        "id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket")
    )
