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


def plane_sign(seed: str, d: int) -> float:
    """±1 component of a deterministic md5-parity hyperplane — the Python
    twin of ``ascii(substr(md5('<seed><d>'), 1, 1)) % 2`` (any engine's
    md5 of the same constant string derives the identical plane)."""
    import hashlib

    c = hashlib.md5(f"{seed}{d}".encode()).hexdigest()[0]
    return 1.0 if ord(c) % 2 == 1 else -1.0


def hyperplane_signatures_multi(
    df: DataFrame,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """All *n_tables* LSH table buckets → (id, table, bucket).

    The planes are md5-parity functions of CONSTANTS (table, plane, dim) —
    so they are computed once driver-side (hashlib md5 ≡ the engines' md5
    of the same strings) and embedded as literal sign arrays. Each
    signature is then a pure per-row zip_with/aggregate expression:
    ZERO shuffles and zero per-row hashing, versus the posexplode +
    64-agg groupBy formulation whose inline md5 ran n_tables×n_planes
    times per vector component (~16M digests at sf0.1). The fold order
    is the array order — deterministic across runs and engines.

    The kernel is a dense matmul — vectors (n × dim) against the sign
    matrix (dim × tables·planes) — which Spark's expression language has
    no native operator for (a per-plane fold compiles to a huge expression
    tree whose codegen cost dwarfs the data at any batch size). So this is
    one of the few deliberate Pandas-path operators: an Arrow-batched
    numpy matmul via mapInPandas — partition-local, zero shuffle, and the
    batch matmul runs at memory bandwidth (the documented exception to
    "built-ins first" when the built-in encoding is structurally worse).

    When *dim* is not given, the sign matrix is derived executor-side
    from each batch's vector length — the planes are pure functions of
    constants, so every executor derives bit-identical planes and no
    driver-side row probe (``.first()``) is ever needed. Vectors must
    share one length; pass *dim* only to pin it explicitly.
    """
    import numpy as np
    import pandas as pd

    def sign_matrix(d: int) -> "np.ndarray":
        # d × (tables·planes) sign matrix, plane-major within each table
        return np.array(
            [
                [plane_sign(f"t{t}:{p}|", dd) for t in range(n_tables) for p in range(n_planes)]
                for dd in range(d)
            ],
            dtype=np.float64,
        )

    fixed_W = sign_matrix(dim) if dim is not None else None

    def op(batches):
        W = fixed_W
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__vec"]])
            if W is None or W.shape[0] != X.shape[1]:
                W = sign_matrix(X.shape[1])
            bits = (X @ W) > 0  # (n, tables·planes)
            ids = pdf["id"].to_numpy()
            out_ids, out_tables, out_buckets = [], [], []
            for t in range(n_tables):
                chunk = bits[:, t * n_planes : (t + 1) * n_planes]
                strs = ["".join("1" if b else "0" for b in row) for row in chunk]
                out_ids.extend(ids)
                out_tables.extend([t] * len(ids))
                out_buckets.extend(strs)
            yield pd.DataFrame({"id": out_ids, "table": out_tables, "bucket": out_buckets})

    return (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("__vec"))
        .filter(F.col("__vec").isNotNull())
        .mapInPandas(op, schema="id long, table int, bucket string")
    )
