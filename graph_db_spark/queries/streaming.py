"""Streaming batch-twin family: tumbling/sliding/session windows, as-of joins, time-weighted aggregates (oracle-checkable twins of the streaming surface).

Split out of the monolithic queries.py in round 15; registration
order within the family preserves the original file order.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from graph_db_spark.catalogue import OFFSETS, tpch_graph
from graph_db_spark.model import ROOT_ID
from graph_db_spark.operators import dedup as D, similarity as S, text as TX

from graph_db_spark.queries._core import (  # noqa: F401
    REGISTRY,
    Q,
    q,
    _t,
    _parquet_rows,
    _dec,
    _hex_int_sql,
    _hex_int,
    _kmeans_sampled_init_sql,
    _kmeans_iter_sql,
    _STORE_FMT,
    _dedup_store_path,
    _DRIVER_COVERED,
    driver_order,
    all_queries,
    all_oracles,
)

@q(
    "tumbling_hour_events",
    """
    SELECT CAST(floor(date_part('epoch', date_trunc('hour', ts))) AS BIGINT) AS hour_epoch,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_hour_events(spark, sf_dir):
    """Tumbling-window aggregation (batch form of the streaming windowed
    agg — the streaming twin lives in graph_db_spark.streaming)."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    return e.groupBy(
        (F.expr("ts_ns DIV 3600000000000") * 3600).alias("hour_epoch"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
    )

@q(
    "sessionize_events_gaps",
    """
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM x)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           CAST(floor(date_part('epoch', max(ts))) - floor(date_part('epoch', min(ts))) AS BIGINT) AS dur_seconds
    FROM s GROUP BY user_id, session_id
    """,
)
def sessionize_events_gaps(spark, sf_dir):
    """Sessionization via gaps-and-islands (lag + cumulative sum) — the
    batch expression of session windows; 30-minute inactivity gap. Gap
    arithmetic runs on exact nanosecond longs (matches the oracle's
    ns-precision INTERVAL comparison)."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    x = e.withColumn(
        "new_s",
        F.when(
            F.lag("ts_ns").over(w).isNull()
            | (F.col("ts_ns") > F.lag("ts_ns").over(w) + F.lit(1_800_000_000_000)),
            1,
        ).otherwise(0),
    )
    s = x.withColumn("session_id", F.sum("new_s").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.expr("max(ts_ns) DIV 1000000000") - F.expr("min(ts_ns) DIV 1000000000")).alias(
            "dur_seconds"
        ),
    )

@q(
    "asof_join_click_error",
    """
    WITH l AS (SELECT event_id, user_id, epoch_us(ts) AS tus FROM events WHERE event_type = 'click'),
         r AS (SELECT event_id AS match_event_id, user_id, value AS match_value,
                      epoch_us(ts) AS tus FROM events WHERE event_type = 'error')
    SELECT l.event_id, l.user_id, r.match_event_id, r.match_value
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.tus >= r.tus
    """,
)
def asof_join_click_error(spark, sf_dir):
    """As-of join (absent in both the reference and stock Spark): for each
    click, the latest error at-or-before it per user — union + last-non-
    null window trick, one shuffle, no UDF. Timestamps compared at μs to
    match the oracle's precision."""
    from graph_db_spark.operators.temporal import asof_join
    from graph_db_spark.session import load_events

    ev = load_events(spark, sf_dir).withColumn("tus", F.expr("ts_ns DIV 1000"))
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "tus")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("match_event_id"),
        "user_id",
        F.col("value").alias("match_value"),
        "tus",
    )
    out = asof_join(
        clicks,
        errors,
        key="user_id",
        left_ts="tus",
        right_ts="tus",
        right_cols=["match_event_id", "match_value"],
    )
    return out.select("event_id", "user_id", "match_event_id", "match_value")

# ---------------------------------------------------------------------------
# Batch 4: sliding windows, weighted SSSP + PageRank (Pregel), LSH ANN,
# BPE-ish token counting
# ---------------------------------------------------------------------------


@q(
    "sliding_window_events",
    """
    WITH slotted AS (
      SELECT CAST(floor(date_part('epoch', ts) / 900) AS BIGINT) AS slot,
             event_type, value FROM events),
    expanded AS (
      SELECT (slot - o.k) * 900 AS win_epoch, event_type, value
      FROM slotted CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) o)
    SELECT win_epoch, event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
    FROM expanded GROUP BY win_epoch, event_type
    """,
)
def sliding_window_events(spark, sf_dir):
    """Sliding-window agg (1 h window, 15 min slide): each event lands in 4
    windows. Window assignment is exact ns arithmetic (ts_ns DIV), not the
    us-truncated timestamp, so boundaries match the oracle bit-for-bit.
    Same shape as F.window(ts, '1 hour', '15 minutes') — unrolled so the
    slot math stays on exact longs."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    return (
        e.withColumn("slot", F.expr("ts_ns DIV 900000000000"))
        .withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(3))))
        .groupBy(
            ((F.col("slot") - F.col("k")) * 900).alias("win_epoch"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value", 6)).cast("double").alias("sum_value"),
        )
    )

@q(
    "window_rolling_1h_user",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(date_part('epoch', ts) * 1e6) AS BIGINT) AS ts_us,
             value
      FROM events)
    SELECT user_id, event_id,
           CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_last_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def window_rolling_1h_user(spark, sf_dir):
    """Time-based rolling window: per user, events in the trailing hour —
    RANGE frame over exact microsecond longs (tie-safe: peer rows share
    frames), decimal-summed values cast to double at the edge."""
    from pyspark.sql import Window as W

    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir).select(
        "user_id",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("ts_us"),
        _dec("value", 6).alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("ts_us").rangeBetween(-3_600_000_000, W.currentRow)
    return e.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum("v").over(w).cast("double").alias("sum_last_hour"),
    )

@q(
    "event_time_weighted_avg",
    """
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(date_part('epoch', ts) * 1e6) AS BIGINT) AS ts_us,
             CAST(value AS DECIMAL(18,6)) AS v
      FROM events),
    w AS (
      SELECT user_id, v,
             lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
               - ts_us AS dur
      FROM e)
    SELECT user_id,
           round(CAST(sum(v * dur) AS DOUBLE) / sum(dur), 6) AS tw_avg,
           CAST(sum(dur) AS BIGINT) AS span_us
    FROM w WHERE dur IS NOT NULL
    GROUP BY user_id HAVING sum(dur) > 0
    """,
)
def event_time_weighted_avg(spark, sf_dir):
    """Time-weighted average of a sampled signal per user — the
    observability/finance aggregate (each reading holds until the next
    one, so it weighs by holding duration, not sample count; a sensor
    that reports rarely at a high value is not drowned out by a chatty
    one). Duration arithmetic in exact integer microseconds, the
    weighted sum in DECIMAL (order-independent across partitionings),
    one user-partitioned lead window + one grouped agg — two shuffles on
    user_id that AQE can plan as a single exchange reuse. The last
    reading per user has no successor and drops out (standard
    left-open convention); users whose every duration is zero
    (all-simultaneous events) are excluded by the HAVING guard."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    base = e.select(
        "user_id",
        "event_id",
        F.expr("ts_ns DIV 1000").alias("ts_us"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    dur = base.select(
        "user_id",
        "v",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("dur"),
    )
    return (
        dur.filter(F.col("dur").isNotNull())
        .groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("v") * F.col("dur")).cast("double") / F.sum("dur"), 6
            ).alias("tw_avg"),
            F.sum("dur").alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
    )
