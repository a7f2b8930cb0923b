"""Skew mitigation for joins and aggregations at 100 TB.

AQE's skew-join handling (spark.sql.adaptive.skewJoin) splits oversized
partitions at runtime and is the first line of defense; explicit salting
is the declarative fallback when one join key dominates so heavily that
even split partitions overwhelm a task, or when AQE is off (streaming).

``salted_join``: replicate the small side across N salt values and spread
the big side's hot keys over them — the shuffle key becomes (key, salt),
so a hot key occupies N reducers instead of one. Salt assignment is a
deterministic hash of the big side's row (replay-safe, no rand()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SALT = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over *n_salts*
    reducers. Result is identical to ``big.join(small, on, how)`` for the
    supported *how* values; only the shuffle distribution changes. The
    small side is replicated n_salts-fold — keep it the dimension side.

    Only big-side-preserving joins are supported: for ``right``/``full``
    (outer on the small side) the n_salts-fold replication would emit
    unmatched small-side rows once per salt — refused rather than wrong.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti", "semi", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} unsupported — the replicated small "
            "side duplicates unmatched rows under right/full joins"
        )
    non_key = [c for c in big.columns if c not in on] or on
    salted_big = big.withColumn(
        SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(n_salts)).cast("int"),
    )
    salted_small = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(salted_small, [*on, SALT], how).drop(SALT)


def salted_count_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase distinct count for skewed groups: phase 1 dedups
    (group, salt(value), value) — hot groups spread over n_salts reducers;
    phase 2 sums per-salt partial counts. Exact (a value lands in exactly
    one salt), unlike approx_count_distinct.
    """
    salted = df.select(
        *group_cols,
        F.col(value_col).alias("__v"),
        F.pmod(F.xxhash64(value_col), F.lit(n_salts)).cast("int").alias(SALT),
    ).dropDuplicates([*group_cols, SALT, "__v"])
    partial = salted.groupBy(*group_cols, SALT).agg(F.count("__v").alias("__c"))
    return partial.groupBy(*group_cols).agg(F.sum("__c").alias("n_distinct"))
