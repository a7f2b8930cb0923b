"""Temporal join operators Spark lacks natively: as-of join and range join.

As-of join (for each left row, the latest right row at-or-before its
timestamp, per key) is implemented with the union + last-non-null window
trick: tag both sides, union on (key, ts), and carry the most recent right
payload forward. One shuffle on (key), no UDF, scales linearly — the
alternative (`applyInPandas` + ``pd.merge_asof`` per key) is kept as the
fallback for semantics the window trick can't express (tolerance,
nearest-direction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """For each left row: the right row with the greatest ``right_ts`` ≤
    (``<`` if strict) the left row's ``left_ts``, within the same ``key``.

    Union trick: right rows sort before left rows at equal timestamps
    (side=0 vs 1) unless strict, so `last(..., ignorenulls)` over the
    ordered window yields exactly the as-of match. Ties inside the right
    side resolve to the latest (max ts, then max side order).

    ``right_cols`` may not collide with left columns (other than *key*) —
    the union trick needs the right payload under its own names; a silent
    rename would surprise callers, so collisions raise."""
    collisions = set(right_cols) & {c for c in left.columns if c != key}
    if collisions:
        raise ValueError(
            f"asof_join: right_cols {sorted(collisions)} collide with left "
            "columns — rename one side before joining"
        )
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    order = [F.col("__ts"), F.col("__side")] if not strict else [F.col("__ts"), -F.col("__side")]
    w = (
        W.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True)
            .over(w)
            .alias(f"__asof_{c}")
            for c in right_cols
        ],
    )
    out = carried.filter(F.col("__side") == 1).drop("__ts", "__side", *right_cols)
    for c in right_cols:
        out = out.withColumnRenamed(f"__asof_{c}", c)
    return out


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join with tolerance/direction semantics the window trick
    can't express — ``pd.merge_asof`` per key group via applyInPandas
    (Arrow-batched; both sides shuffle once on *key*, each group joins
    in-memory).

    *tolerance* is in the timestamp column's own units (pass ns/us/s
    consistently); *direction* ∈ backward | forward | nearest. Use
    ``asof_join`` (pure window, no Python) when plain at-or-before
    semantics suffice — this variant is the documented fallback for the
    richer semantics. Per-key groups must fit executor memory (true for
    time-partitioned telemetry; pre-split hot keys by time bucket first
    at 100 TB)."""
    collisions = (set(right_cols) | {right_ts}) & {c for c in left.columns if c != key}
    if collisions:
        raise ValueError(
            f"asof_join_grouped: right columns {sorted(collisions)} collide "
            "with left columns — rename one side before joining"
        )
    import pandas as pd
    from pyspark.sql import types as T

    lschema = left.schema
    out_fields = list(lschema.fields) + [
        right.schema[c] for c in right_cols
    ]
    out_schema = T.StructType(out_fields)
    r = right.select(key, right_ts, *right_cols)
    l_tagged = left.withColumn("__side", F.lit(1))
    r_tagged = r.withColumn("__side", F.lit(0))
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    left_cols = left.columns

    def per_key(pdf: pd.DataFrame):
        # the union leaves NaN in each side's absent columns, so pandas may
        # type the two ts columns differently — coerce both to float64
        # (exact for tolerances/timestamps below 2^53)
        lp = pdf[pdf["__side"] == 1][left_cols].sort_values(left_ts, kind="mergesort")
        rp = pdf[pdf["__side"] == 0][[key, right_ts, *right_cols]].sort_values(
            right_ts, kind="mergesort"
        )
        if lp.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        lp = lp.assign(**{left_ts: lp[left_ts].astype("float64")})
        rp = rp.assign(**{right_ts: rp[right_ts].astype("float64")})
        merged = pd.merge_asof(
            lp,
            rp.drop(columns=[key]),
            left_on=left_ts,
            right_on=right_ts,
            tolerance=None if tolerance is None else float(tolerance),
            direction=direction,
        )
        if right_ts not in left_cols and right_ts in merged.columns and right_ts not in right_cols:
            merged = merged.drop(columns=[right_ts])
        return merged[[f.name for f in out_fields]]

    return unioned.groupBy(key).applyInPandas(per_key, schema=out_schema)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_lo: str,
    right_hi: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join without a full cross product: bucketize the
    point and every bucket the interval overlaps, equi-join on the bucket,
    then filter the exact containment. Turns O(n·m) into a hash join whose
    fan-out is interval_width / bucket_width."""
    lb = left.withColumn("__b", (F.col(left_point) / bucket_width).cast("long"))
    rb = right.withColumn(
        "__b",
        F.explode(
            F.sequence(
                (F.col(right_lo) / bucket_width).cast("long"),
                (F.col(right_hi) / bucket_width).cast("long"),
            )
        ),
    )
    return lb.join(rb, "__b").filter(
        (F.col(left_point) >= F.col(right_lo)) & (F.col(left_point) <= F.col(right_hi))
    ).drop("__b")
