"""Relational family: the TPC-H Q1-Q22 plan shapes plus join/agg/window/setop/scalar breadth (SURVEY §2.4-§2.9).

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

# ---------------------------------------------------------------------------
# Relational core (SURVEY §2.4-§2.9 breadth on the driver's tables)
# ---------------------------------------------------------------------------


@q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: filter → grouped agg (map-side partial agg, one
    shuffle on the two group keys). Decimal sums → exact, order-free."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02 00:00:00"))
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).cast("double").alias("sum_disc_price"),
        F.round(F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1)), 6).alias("avg_qty"),
        F.round(F.sum(_dec("l_discount")).cast("double") / F.count(F.lit(1)), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )

@q(
    "q3_shipping_priority",
    """
    WITH r AS (
      SELECT l.l_orderkey, o.o_orderdate,
             CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
      GROUP BY l.l_orderkey, o.o_orderdate
    )
    SELECT l_orderkey, o_orderdate, revenue
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS rn FROM r)
    WHERE rn <= 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """3-table join + agg + deterministic top-k. The join shuffles on the
    keys; the global top-10 is orderBy().limit(), which Spark compiles to
    TakeOrderedAndProject — per-partition top-10 + a driver merge of 10
    rows per partition — never a single-partition window."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    r = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    return (
        r.orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "o_orderdate", "revenue")
    )

@q(
    "q5_region_revenue",
    """
    SELECT n.n_name,
           CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5: 6-table join. nation/region are broadcast (tiny dims);
    the fact-side joins shuffle on their keys; AQE reorders/broadcasts."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    l = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == l.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )

@q(
    "filter_pushdown_scan",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_quantity > 45
    """,
)
def filter_pushdown_scan(spark, sf_dir):
    """Projection + predicate — both reach the parquet scan (PushedFilters
    in .explain); reads 5 of 11 columns."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
            & (F.col("l_quantity") > 45)
        )
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )

@q(
    "join_semi_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 200000)
    """,
)
def join_semi_exists(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")

@q(
    "join_anti_not_exists",
    """
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_not_exists(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")

@q(
    "join_outer_order_counts",
    """
    SELECT c.c_custkey, count(o.o_orderkey) AS n_orders,
           CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,4))), 0) AS DOUBLE) AS total_spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def join_outer_order_counts(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0)).cast("double").alias("total_spend"),
        )
    )

@q(
    "agg_distinct_segments",
    """
    SELECT n.n_name, count(*) AS n_customers,
           count(DISTINCT c.c_mktsegment) AS n_segments
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def agg_distinct_segments(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )

@q(
    "agg_rollup_geo",
    """
    SELECT r.r_name, n.n_name, count(*) AS n_customers,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
)
def agg_rollup_geo(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(F.broadcast(r), r.r_regionkey == n.n_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal")).cast("double").alias("sum_acctbal"),
        )
    )

@q(
    "window_topk_orders_per_cust",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS INT) AS rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def window_topk_orders_per_cust(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )

@q(
    "window_running_user_value",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq_in_user
    FROM events
    """,
)
def window_running_user_value(spark, sf_dir):
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.sum(_dec("value", 6)).over(w.rowsBetween(W.unboundedPreceding, 0)).cast("double").alias("running_value"),
        F.row_number().over(w).alias("seq_in_user"),
    )

@q(
    "sort_limit_top_lineitems",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def sort_limit_top_lineitems(spark, sf_dir):
    """orderBy().limit() → Spark's distributed TakeOrderedAndProject (no
    full sort materialization)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .orderBy(F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )

@q(
    "setop_customer_cohorts",
    """
    SELECT c AS c_custkey, 'both' AS cohort FROM (
      SELECT c_custkey AS c FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                                     AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    UNION ALL
    SELECT c AS c_custkey, 'building_only' AS cohort FROM (
      SELECT c_custkey AS c FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
                                     AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00')
    """,
)
def setop_customer_cohorts(spark, sf_dir):
    """intersect / except / union — SURVEY §2.8."""
    bld = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey"))
    )
    active = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01"))
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    both = bld.intersect(active).withColumn("cohort", F.lit("both"))
    only = bld.exceptAll(active.distinct()).distinct().withColumn("cohort", F.lit("building_only"))
    return both.unionByName(only)

@q(
    "scalar_functions_showcase",
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 12) AS name_prefix,
           CAST(length(p_name) AS INT) AS name_len,
           concat_ws('#', p_brand, p_type) AS brand_type,
           abs(p_size - 25) AS size_dev,
           round(p_retailprice * 1.1, 2) AS bumped,
           lpad(p_brand, 12, '*') AS brand_pad,
           reverse(p_type) AS type_rev,
           greatest(p_size, 25) AS size_hi
    FROM part
    """,
)
def scalar_functions_showcase(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 12).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws("#", "p_brand", "p_type").alias("brand_type"),
        F.abs(F.col("p_size") - 25).alias("size_dev"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("bumped"),
        F.lpad("p_brand", 12, "*").alias("brand_pad"),
        F.reverse("p_type").alias("type_rev"),
        F.greatest("p_size", F.lit(25)).alias("size_hi"),
    )

@q(
    "pivot_nation_segment",
    """
    SELECT n.n_name,
           count(*) FILTER (c.c_mktsegment = 'AUTOMOBILE') AS automobile,
           count(*) FILTER (c.c_mktsegment = 'BUILDING')   AS building,
           count(*) FILTER (c.c_mktsegment = 'FURNITURE')  AS furniture,
           count(*) FILTER (c.c_mktsegment = 'HOUSEHOLD')  AS household,
           count(*) FILTER (c.c_mktsegment = 'MACHINERY')  AS machinery
    FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
)
def pivot_nation_segment(spark, sf_dir):
    """Pivot: customer counts per nation × market segment (fixed pivot
    values → no extra discovery pass)."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    piv = (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .groupBy("n_name")
        .pivot("c_mktsegment", segs)
        .count()
        .na.fill(0, segs)
    )
    for s in segs:
        piv = piv.withColumnRenamed(s, s.lower())
    return piv

# ---------------------------------------------------------------------------
# Relational breadth, batch 3: cube/grouping-sets, correlated subqueries,
# analytic windows, percentiles, string/date scalar ops, n-gram similarity
# ---------------------------------------------------------------------------


@q(
    "agg_cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_status_priority(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
    )

@q(
    "agg_grouping_sets",
    """
    SELECT r_name, c_mktsegment, count(*) AS n
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
    """,
)
def agg_grouping_sets(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    j = c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey")).join(
        F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey")
    )
    j.createOrReplaceTempView("__gs_cust")
    return spark.sql(
        """
        SELECT r_name, c_mktsegment, count(*) AS n FROM __gs_cust
        GROUP BY GROUPING SETS ((r_name), (c_mktsegment), (r_name, c_mktsegment))
        """
    )

@q(
    "correlated_above_nation_avg",
    """
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def correlated_above_nation_avg(spark, sf_dir):
    """Correlated scalar subquery — decorrelated by Catalyst into an
    aggregate + join (same shape the oracle's optimizer produces).
    avg() compares, never projects → float equality is safe here because
    both engines compute avg over the identical double set."""
    c = _t(spark, sf_dir, "customer")
    avgs = c.groupBy("c_nationkey").agg(F.avg("c_acctbal").alias("__avg"))
    return (
        c.join(F.broadcast(avgs), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", "c_acctbal")
    )

@q(
    "window_lead_lag_ntile",
    """
    SELECT event_id, user_id,
           lag(event_id)  OVER w AS prev_event,
           lead(event_id) OVER w AS next_event,
           CAST(ntile(4) OVER w AS INT) AS quartile,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def window_lead_lag_ntile(spark, sf_dir):
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_ns", "event_id")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_id").over(w).alias("prev_event"),
        F.lead("event_id").over(w).alias("next_event"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )

@q(
    "percentiles_by_segment",
    """
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.5), 6) AS median_bal,
           round(quantile_cont(c_acctbal, 0.9), 6) AS p90_bal,
           round(CAST(min(c_acctbal) AS DOUBLE), 6) AS min_bal,
           round(CAST(max(c_acctbal) AS DOUBLE), 6) AS max_bal
    FROM customer GROUP BY c_mktsegment
    """,
)
def percentiles_by_segment(spark, sf_dir):
    """Exact interpolated percentiles (Spark percentile == DuckDB
    quantile_cont: both linear-interpolate on the sorted set)."""
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.round(F.expr("percentile(c_acctbal, 0.5)"), 6).alias("median_bal"),
        F.round(F.expr("percentile(c_acctbal, 0.9)"), 6).alias("p90_bal"),
        F.round(F.min("c_acctbal").cast("double"), 6).alias("min_bal"),
        F.round(F.max("c_acctbal").cast("double"), 6).alias("max_bal"),
    )

@q(
    "string_match_filters",
    """
    SELECT p_partkey, p_name, p_type FROM part
    WHERE p_name LIKE '%red%'
      AND p_type NOT LIKE 'SMALL%'
      AND regexp_matches(p_name, '^[a-z]+ ')
    """,
)
def string_match_filters(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%red%")
        & ~F.col("p_type").like("SMALL%")
        & F.col("p_name").rlike(r"^[a-z]+ ")
    ).select("p_partkey", "p_name", "p_type")

@q(
    "date_arithmetic_orders",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,  -- DuckDB Sunday=0, Spark Sunday=1
           o_orderdate + INTERVAL 90 DAY AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS INT) AS days_since_95
    FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    """,
)
def date_arithmetic_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "1997-01-01")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.expr("o_orderdate + INTERVAL 90 DAYS").alias("due_date"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
    )

@q(
    "having_filter_nations",
    """
    SELECT n_name, count(*) AS n_cust
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name HAVING count(*) > 5
    """,
)
def having_filter_nations(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_cust"))
        .filter(F.col("n_cust") > 5)
    )

@q(
    "json_extract_events",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
    FROM events GROUP BY event_type
    """,
)
def json_extract_events(spark, sf_dir):
    """JSON path extraction on the events.props payload column (the typed
    escape hatch for semi-structured event properties) + grouped agg over
    the extracted value — stays entirely in built-in expressions."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
    )

@q(
    "window_range_frame",
    """
    SELECT o_orderkey, o_custkey,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY price_c
                RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_similar,
           CAST(sum(price_c) OVER (PARTITION BY o_custkey ORDER BY price_c
                RANGE BETWEEN 5000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS sum_similar_c
    FROM (SELECT o_orderkey, o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c
          FROM orders)
    """,
)
def window_range_frame(spark, sf_dir):
    """RANGE-framed window (value-based frame, tie-safe by construction —
    every peer row sees the identical frame regardless of physical order):
    per customer, orders within $50k below the current order's price.
    Prices are exact integer cents so both engines frame identically."""
    from pyspark.sql import Window as W

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        (_dec("o_totalprice", 2) * 100).cast("bigint").alias("price_c"),
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("price_c")
        .rangeBetween(-5_000_000, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_similar"),
        F.sum("price_c").over(w).alias("sum_similar_c"),
    )

@q(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric,
           CAST(CAST(p_retailprice AS DECIMAL(18,4)) AS DOUBLE) AS value FROM part
    """,
)
def unpivot_part_metrics(spark, sf_dir):
    """Wide→long unpivot (melt) — the inverse of pivot_nation_segment;
    single scan, no shuffle (the plan is a union of two projections over
    one file scan)."""
    p = _t(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        _dec("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="value",
    )

@q(
    "funnel_click_purchase",
    """
    WITH clicks AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts FROM events
      WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts FROM events
      WHERE event_type = 'purchase')
    SELECT c.user_id, c.click_id,
           min(p.purchase_id) AS first_purchase_id,
           count(*) AS n_purchases_1h
    FROM clicks c JOIN purchases p
      ON p.user_id = c.user_id
     AND p.purchase_ts > c.click_ts
     AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
    GROUP BY c.user_id, c.click_id
    """,
)
def funnel_click_purchase(spark, sf_dir):
    """Funnel / sequential-pattern analysis: for every click, purchases by
    the same user within the following hour. The self-join is an equi-join
    on user_id with a range predicate — at scale the user_id hash join
    bounds the pair space, and interval arithmetic runs on exact ns longs
    (same closed/open bounds as the oracle's INTERVAL comparison)."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts_ns").alias("click_ns")
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts_ns").alias("purchase_ns")
    )
    hour_ns = 3_600_000_000_000
    joined = clicks.join(purch, "user_id").filter(
        (F.col("purchase_ns") > F.col("click_ns"))
        & (F.col("purchase_ns") <= F.col("click_ns") + hour_ns)
    )
    return joined.groupBy("user_id", "click_id").agg(
        F.min("purchase_id").alias("first_purchase_id"),
        F.count(F.lit(1)).alias("n_purchases_1h"),
    )

@q(
    "cohort_hourly_retention",
    """
    WITH first_seen AS (
      SELECT user_id,
             CAST(floor(date_part('epoch', min(ts)) / 3600) AS BIGINT) AS cohort_hour
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(floor(date_part('epoch', ts) / 3600) AS BIGINT) AS active_hour
      FROM events)
    SELECT f.cohort_hour,
           CAST(a.active_hour - f.cohort_hour AS BIGINT) AS hours_since,
           count(DISTINCT a.user_id) AS n_users
    FROM first_seen f JOIN activity a USING (user_id)
    GROUP BY f.cohort_hour, hours_since
    """,
)
def cohort_hourly_retention(spark, sf_dir):
    """Cohort retention triangle: users grouped by first-seen hour, counted
    per hours-since-cohort of later activity — two grouped aggs + one join
    on user_id (both shuffles on the same key, so AQE coalesces them into
    co-partitioned stages). Hour bucketing on exact ns longs."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    hours = e.select("user_id", F.expr("ts_ns DIV 3600000000000").alias("h"))
    first_seen = hours.groupBy("user_id").agg(F.min("h").alias("cohort_hour"))
    activity = hours.distinct().withColumnRenamed("h", "active_hour")
    return (
        first_seen.join(activity, "user_id")
        .groupBy("cohort_hour", (F.col("active_hour") - F.col("cohort_hour")).alias("hours_since"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )

@q(
    "agg_collect_sorted_lists",
    """
    SELECT n_regionkey AS regionkey,
           string_agg(n_name, '|' ORDER BY n_name) AS nations,
           CAST(len(list(n_name)) AS INT) AS n_nations
    FROM nation GROUP BY n_regionkey
    """,
)
def agg_collect_sorted_lists(spark, sf_dir):
    """Array aggregation with deterministic ordering: collect_list is
    order-nondeterministic under parallelism, so the engine-portable form
    sorts the collected array (DuckDB's string_agg(x, '|' ORDER BY x)
    twin). The sorted array is joined to a flat '|'-delimited string so
    the top-level output schema stays scalar — driver hash harnesses
    (pandas-based canonicalizers) cannot hash array cells, and the
    registry lint rejects array/map/struct output columns outright."""
    n = _t(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").alias("regionkey")).agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), "|").alias("nations"),
        F.size(F.collect_list("n_name")).alias("n_nations"),
    )

@q(
    "anomaly_zscore_events",
    """
    WITH stats AS (
      SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round((e.value - s.mu) / s.sigma, 6) AS z
    FROM events e JOIN stats s USING (event_type)
    WHERE abs((e.value - s.mu) / s.sigma) >= 3
    """,
)
def anomaly_zscore_events(spark, sf_dir):
    """Z-score outlier detection per event type: one grouped moment pass
    (map-side combinable) broadcast back over the scan — the data-quality
    filter pass of an ingestion pipeline. |z| >= 3 flags the tails."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    stats = e.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        e.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) >= 3)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )

@q(
    "histogram_event_values",
    """
    SELECT event_type,
           CAST(floor(value / 50.0) AS BIGINT) AS bin,
           count(*) AS n,
           CAST(min(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS bin_min,
           CAST(max(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS bin_max
    FROM events GROUP BY event_type, bin
    """,
)
def histogram_event_values(spark, sf_dir):
    """Fixed-width value histogram per event type (the data-profiling
    pass): floor-based binning is engine-exact, min/max per bin on exact
    decimals. One grouped agg, map-side combinable."""
    from graph_db_spark.session import load_events

    e = load_events(spark, sf_dir)
    return e.groupBy(
        "event_type", F.floor(F.col("value") / 50.0).cast("long").alias("bin")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(_dec("value", 6)).cast("double").alias("bin_min"),
        F.max(_dec("value", 6)).cast("double").alias("bin_max"),
    )

# ---------------------------------------------------------------------------
# Round 3 — relational breadth: the TPC-H optimizer-shape suite
# (SURVEY §2.5-§2.7 superset; each exercises a distinct Catalyst plan shape
# the traversal/pipeline queries don't: disjunctive two-dimension joins,
# multi-way star joins with expression aggs, ranked top-k membership,
# correlated scalar-aggregate filters, and HAVING-subquery semi-joins.)
# ---------------------------------------------------------------------------


@q(
    "q7_volume_shipping",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bidirectional nation-pair trade volume. The plan
    shape this adds: the same dimension (nation) joined twice under a
    disjunctive cross-pair predicate — Catalyst must keep both broadcast
    copies alive and evaluate the OR after both joins.

    100 TB shape: nation is broadcast twice (25 rows); the fact table is
    filtered on shipdate at the scan (pushed down), and the only shuffle
    is the final 3-key grouped agg with map-side partials."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") <= "1997-12-31")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum("volume").cast("double").alias("revenue"))
    )

@q(
    "q9_product_type_profit",
    """
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4))) AS amount
      FROM lineitem
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN nation   ON n_nationkey = s_nationkey
      WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_type_profit(spark, sf_dir):
    """TPC-H Q9 shape (adapted: the driver schema has no partsupp, so
    profit is discounted revenue): 5-way star join with a LIKE-filtered
    part dimension, grouped by supplier nation and order year.

    100 TB shape: part/supplier/nation broadcast (the LIKE prune happens
    before the join, shrinking part further); lineitem never shuffles
    until the final 2-key agg. Catalyst orders the star joins from the
    selective dimension outward under CBO/AQE."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            (_dec("l_extendedprice") * (1 - _dec("l_discount"))).alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
    )

@q(
    "q10_returned_items",
    """
    WITH rev AS (
      SELECT c_custkey, c_name, n_name,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1996-04-01'
      GROUP BY c_custkey, c_name, n_name)
    SELECT c_custkey, c_name, n_name, revenue
    FROM (SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey) AS rk FROM rev)
    WHERE rk <= 20
    """,
)
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in a
    quarter. Revenue is decimal-summed (exact, order-independent) so the
    ranking — and therefore top-20 *membership* — is deterministic; ties
    break on c_custkey.

    100 TB shape: the returnflag+date filters push to the scans; one
    grouped agg shuffled on custkey; the global top-20 is orderBy().limit()
    → TakeOrderedAndProject (per-partition top-20s merged on the driver),
    never a full sort or a single-partition window."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (1 - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
    )
    return rev.orderBy(F.col("revenue").desc(), F.col("c_custkey")).limit(20)

@q(
    "q17_small_quantity_revenue",
    """
    WITH pavg AS (
      SELECT l_partkey AS pk, sum(l_quantity) / count(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey)
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))) / 7.0, 4) AS DOUBLE)
             AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN pavg ON pk = l_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: revenue from small-quantity orders of one brand,
    gated by a correlated per-part average — rewritten (as every engine's
    optimizer does) into a grouped agg + equi-join back to the fact table.
    l_quantity is integral, so sum(l_quantity) is exact in double and the
    0.2*avg comparison is bitwise identical across engines.

    100 TB shape: the per-part avg aggregates map-side before one shuffle
    on partkey; the brand filter broadcasts part; no row explosion."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    pavg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(pavg, li.l_partkey == pavg.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec("l_extendedprice")) / 7.0, 4)
            .cast("double")
            .alias("avg_yearly")
        )
    )

@q(
    "q18_large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(l_quantity) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 280)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: large-volume orders via an IN subquery with a
    HAVING aggregate — planned as a semi-join against the grouped fact
    table. Quantity sums are integral-exact.

    100 TB shape: the HAVING agg and the outer agg share the l_orderkey
    shuffle key (one exchange reused); customer joins after the heavy
    filter has shrunk orders to the hot few."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 280)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "bk"), F.col("o_orderkey") == F.col("bk"), "left_semi")
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
    )

@q(
    "q2_min_price_supplier",
    """
    WITH mp AS (
      SELECT l_partkey AS pk, min(l_extendedprice) AS min_price
      FROM lineitem GROUP BY l_partkey)
    SELECT p_partkey, p_name, min_price, min(s_suppkey) AS supp_key
    FROM lineitem
    JOIN mp   ON pk = l_partkey AND l_extendedprice = min_price
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 5
    GROUP BY p_partkey, p_name, min_price
    """,
)
def q2_min_price_supplier(spark, sf_dir):
    """TPC-H Q2 shape (adapted: no partsupp table — supply price is the
    lineitem extendedprice): for each small part, the supplier quoting
    the minimum price. The correlated-min subquery becomes a grouped min
    + join back on (partkey, price); ties resolve to the lowest suppkey
    so the row set is deterministic.

    100 TB shape: both the min-agg and the join-back shuffle on
    l_partkey — one exchange, reused by AQE; part is broadcast after the
    size prune."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 5)
    s = _t(spark, sf_dir, "supplier")
    mp = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.min("l_extendedprice").alias("min_price")
    )
    return (
        li.join(mp, (li.l_partkey == mp.pk) & (li.l_extendedprice == mp.min_price))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("p_partkey", "p_name", "min_price")
        .agg(F.min("s_suppkey").alias("supp_key"))
    )

# ---------------------------------------------------------------------------
# Round 4 — TPC-H optimizer-shape completion: the remaining canonical
# plan patterns (exists/anti subqueries, scan-only agg, CASE pivots,
# conditional ratios, disjunctive pushdown, scalar-subquery gating), each
# adapted to the driver's column set with an exact DuckDB oracle.
# ---------------------------------------------------------------------------


@q(
    "q4_order_priority_exists",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
      AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority_exists(spark, sf_dir):
    """TPC-H Q4 shape (adapted: the EXISTS predicate is "has a returned
    line" — the driver's lineitem carries no commit/receipt dates): order
    counts by priority over a date slice, gated by an EXISTS subquery →
    planned as a left-semi join.

    100 TB shape: the returnflag filter prunes lineitem at the scan, the
    semi-join shuffles only (orderkey) pairs, and the tiny priority agg
    is map-side combined."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1994-01-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )

@q(
    "q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6: the purest scan shape — no join, all four predicates
    pushable to parquet, one global agg. The optimizer test is that the
    plan is scan → partial agg → single-row exchange and nothing else;
    revenue accumulates in decimal so the sum order can't perturb the
    hash.

    100 TB shape: this is the query whose entire cost is I/O; predicate
    pushdown + column pruning (3 columns of 11) decide everything."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )

@q(
    "q12_priority_case_pivot",
    """
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
                AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_case_pivot(spark, sf_dir):
    """TPC-H Q12 shape (adapted: group by l_linestatus — the driver's
    lineitem has no shipmode): CASE-pivot counts of urgent vs other
    priorities per line status. The optimizer pattern is conditional
    aggregation folded into one pass over the join.

    100 TB shape: one fact-fact equi-join on orderkey (both sides huge →
    shuffle join on the same key), integer CASE-sums map-side combined."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )

@q(
    "q14_promo_revenue_ratio",
    """
    SELECT CAST(round(
             100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                          THEN CAST(l_extendedprice AS DECIMAL(18,4)) *
                               (1 - CAST(l_discount AS DECIMAL(18,4))) ELSE 0 END) /
             sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                 (1 - CAST(l_discount AS DECIMAL(18,4)))), 6) AS DOUBLE) AS promo_pct
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-09-01 00:00:00'
    """,
)
def q14_promo_revenue_ratio(spark, sf_dir):
    """TPC-H Q14: promo revenue share — a conditional-ratio aggregate
    whose numerator and denominator come from the same pass (no second
    scan). Both sums run in decimal; only the final ratio rounds to
    double.

    100 TB shape: part is the small side → broadcast; the date filter
    prunes the fact scan; a single partial-agg shuffle of two decimals."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-06-01") & (F.col("l_shipdate") < "1995-09-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(F.lit(100.00) * F.sum(promo) / F.sum(rev), 6)
            .cast("double")
            .alias("promo_pct")
        )
    )

@q(
    "q16_supplier_cnt_antijoin",
    """
    SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%' AND p_size IN (1, 4, 9, 16, 25)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_cnt_antijoin(spark, sf_dir):
    """TPC-H Q16 shape (partsupp stands in as lineitem's part-supplier
    pairs; the excluded-supplier predicate is "negative account balance"
    in place of complaint comments): distinct supplier counts per
    (brand, type, size) after a NOT-IN anti-join.

    100 TB shape: the NOT-IN list is a filtered dim → broadcast
    anti-join (null-safe not needed: s_suppkey is non-null); distinct
    count shuffles (group keys, suppkey) once before the final agg."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("MEDIUM%"))
        & (F.col("p_size").isin(1, 4, 9, 16, 25))
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )

@q(
    "q19_disjunctive_pushdown",
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                    (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_pushdown(spark, sf_dir):
    """TPC-H Q19: the disjunctive-predicate stress test — three OR'd
    brand/size/quantity clauses spanning both join sides. The optimizer
    pattern: common sub-predicates (p_size >= 1, quantity bounds union)
    are derivable per side, the rest evaluates post-join; no clause may
    force a cartesian plan.

    100 TB shape: part broadcasts; the OR is a row filter after the
    broadcast hash join, not a join condition blowup."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    clause = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return j.filter(clause).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )

@q(
    "q22_dormant_rich_customers",
    """
    WITH thresh AS (
      SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
    SELECT c_mktsegment,
           count(*) AS n_cust,
           CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS total_bal
    FROM customer, thresh
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
)
def q22_dormant_rich_customers(spark, sf_dir):
    """TPC-H Q22 shape (grouped by market segment — the driver's
    customer has no phone country code): above-average-balance customers
    who never placed an URGENT order. Two classic patterns in one plan:
    an uncorrelated scalar subquery (the global average, computed once
    and broadcast as a 1-row cross join) and a NOT EXISTS over a
    filtered subquery → filter + left-anti join.

    100 TB shape: the scalar agg is one tiny job; the anti-join
    shuffles custkeys only; balance sums in decimal."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    thresh = c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum(_dec("c_acctbal")), 4).cast("double").alias("total_bal"),
        )
    )

@q(
    "window_distribution_functions",
    """
    SELECT o_orderkey, o_custkey,
           CAST(round(percent_rank() OVER w, 6) AS DOUBLE) AS pr,
           CAST(round(cume_dist() OVER w, 6) AS DOUBLE) AS cd,
           CAST(first_value(o_orderkey) OVER w AS BIGINT) AS cheapest,
           CAST(last_value(o_orderkey)
                OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                AS BIGINT) AS priciest
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_distribution_functions(spark, sf_dir):
    """Distribution-window breadth (SURVEY §2.7's ordering surface):
    percent_rank / cume_dist / first_value / last_value per customer,
    ordered by order value. The (o_totalprice, o_orderkey) sort key is
    unique, so ranks are engine-independent.

    100 TB shape: one window shuffle on o_custkey; all five functions
    share the same ordered frame (single sort, single exchange)."""
    o = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 6).cast("double").alias("pr"),
        F.round(F.cume_dist().over(w), 6).cast("double").alias("cd"),
        F.first("o_orderkey").over(w).alias("cheapest"),
        F.last("o_orderkey").over(wfull).alias("priciest"),
    )

# ---------------------------------------------------------------------------
# Round 5 — the last six canonical TPC-H plan shapes (Q8/Q11/Q13/Q15/Q20/
# Q21), completing all 22. The driver's tables lack partsupp and the
# commit/receipt dates, so each is adapted to the available column set
# while preserving the optimizer pattern the original exercises (the same
# approach as the round-4 completions above).
# ---------------------------------------------------------------------------


@q(
    "q8_nation_market_share",
    """
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,4)) *
               (1 - CAST(l_discount AS DECIMAL(18,4))) AS volume,
             ns.n_name AS supp_nation
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation nc ON c_nationkey = nc.n_nationkey
      JOIN region   ON nc.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ns ON s_nationkey = ns.n_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00')
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
                 CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY o_year
    """,
)
def q8_nation_market_share(spark, sf_dir):
    """TPC-H Q8 shape (national market share): six-way join — fact ⋈ fact
    (lineitem ⋈ orders) plus four broadcastable dims on both the customer
    and supplier legs — then a conditional-ratio agg by order year.
    Adapted: market share of supplier nation NATION_7 within EUROPE-
    customer revenue, 1995-1996 (the driver's parts carry no p_type line).

    100 TB shape: the only shuffle is lineitem ⋈ orders on orderkey (the
    date filter pushes into the orders scan first); customer, supplier,
    nation×2, region all broadcast; the year-level agg is 2 rows."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    nc = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), F.col("n_regionkey")
    )
    ns = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    vol = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(F.broadcast(c.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), "c_nationkey")
        .join(F.broadcast(r.select(F.col("r_regionkey").alias("n_regionkey"))), "n_regionkey")
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), "s_nationkey")
        .select(
            F.year("o_orderdate").alias("o_year"),
            (_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_7", F.col("volume")).otherwise(zero))
            .cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )

@q(
    "q11_important_inventory",
    """
    WITH pv AS (
      SELECT l_partkey AS p_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                 (1 - CAST(l_discount AS DECIMAL(18,4)))) AS pvd
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_3'
      GROUP BY l_partkey)
    SELECT p_partkey, round(CAST(pvd AS DOUBLE), 2) AS part_value
    FROM pv
    WHERE CAST(pvd AS DECIMAL(30,8)) * 1000 > (SELECT sum(pvd) FROM pv)
    """,
)
def q11_important_inventory(spark, sf_dir):
    """TPC-H Q11 shape (important stock): grouped value per part, kept
    only when it exceeds a fraction of the GLOBAL total — the scalar-
    subquery-as-threshold pattern. Adapted: shipped value from NATION_3's
    suppliers stands in for partsupp supplycost×availqty (no partsupp
    table).

    The threshold comparison stays DECIMAL end to end, and the 0.001
    fraction is applied as an EXACT integer multiply on the other side
    (pvd*1000 > total) — no float sum (partition-order-dependent), no
    decimal division (engine-specific result scale/rounding), so a value
    at the boundary can never flip between Spark partitionings or vs the
    oracle. DOUBLE appears only in the final projection.

    100 TB shape: one shuffle per branch for the per-part agg; the 1-row
    threshold broadcasts back as a filter (never a window over an
    un-partitioned frame). Catalyst inlines the pv subtree into both
    branches (two pruned lineitem scans — same as the SQL CTE); at 100 TB
    you'd persist pv once and filter the persisted frame."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    pv = (
        li.join(F.broadcast(s.select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n.select(F.col("n_nationkey").alias("s_nationkey"))), "s_nationkey")
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("pvd")
        )
    )
    total = pv.agg(F.sum("pvd").alias("threshold"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("pvd").cast("decimal(30,8)") * F.lit(1000) > F.col("threshold"))
        .select("p_partkey", F.round(F.col("pvd").cast("double"), 2).alias("part_value"))
    )

@q(
    "q13_customer_orders_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
          FROM customer LEFT JOIN orders
            ON c_custkey = o_custkey AND o_orderstatus <> 'P'
          GROUP BY c_custkey)
    GROUP BY c_count
    """,
)
def q13_customer_orders_distribution(spark, sf_dir):
    """TPC-H Q13 shape (customer distribution): left outer join with a
    predicate INSIDE the join condition (orders in pending status don't
    count, but the customer still appears with c_count=0), then a
    two-level aggregation — orders-per-customer, then the histogram of
    that count. Adapted: status filter stands in for the o_comment
    NOT LIKE pattern (no comment column).

    100 TB shape: the outer join and first agg share the custkey
    partitioning (one shuffle); the histogram agg is tiny."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_orderstatus")
    per_cust = (
        c.join(o, (c["c_custkey"] == o["o_custkey"]) & (o["o_orderstatus"] != "P"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))

@q(
    "q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey AS s_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                 (1 - CAST(l_discount AS DECIMAL(18,4)))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-04-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1995-07-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s_name, CAST(rev.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s JOIN rev ON s.s_suppkey = rev.s_suppkey
    WHERE rev.total_rev = (SELECT max(total_rev) FROM rev)
    """,
)
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): a revenue view over a quarter,
    then select the supplier(s) achieving the view's MAX — the
    view + scalar-subquery-equality pattern. Exact decimal revenue, so
    the max-equality comparison is not float-fragile.

    100 TB shape: one shuffle per branch for the per-supplier agg; the
    max is a 1-row broadcast (not a global sort), and the supplier dim
    joins broadcast. Catalyst inlines the rev subtree into both branches
    (two pruned scans — same as the SQL CTE); at 100 TB you'd persist
    rev once."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-04-01") & (F.col("l_shipdate") < "1995-07-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("mx"))
        .join(F.broadcast(s), "s_suppkey")
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )

@q(
    "q20_promotion_suppliers",
    """
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING sum(l_quantity) > 50)
    """,
)
def q20_promotion_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): chained semi-joins —
    suppliers (nation-filtered) IN (grouped-HAVING subquery over
    lineitem ⋈ part). Adapted: "shipped > 50 units of a small% part in
    1996" stands in for the partsupp availqty comparison.

    100 TB shape: the part name-filter broadcasts into the lineitem
    scan; the HAVING agg shuffles on (suppkey, partkey); the final
    supplier probe is a broadcast left-semi — supplier never shuffles."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    qualified = (
        li.join(F.broadcast(p.select(F.col("p_partkey").alias("l_partkey"))), "l_partkey")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        s.join(F.broadcast(n.select(F.col("n_nationkey").alias("s_nationkey"))), "s_nationkey")
        .join(qualified, "s_suppkey", "left_semi")
        .select("s_suppkey", "s_name")
    )

@q(
    "q21_waiting_suppliers",
    """
    SELECT s_name, numwait FROM (
      SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      FROM lineitem l1
      JOIN orders   ON l1.l_orderkey = o_orderkey
      JOIN supplier ON l1.l_suppkey = s_suppkey
      WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_returnflag = 'R')
      GROUP BY s_name)
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the hardest
    subquery pattern — EXISTS and NOT EXISTS against the SAME fact table
    with a different-supplier correlation. Adapted: "sole returning
    supplier in a finished multi-supplier order" stands in for the
    late-receipt predicate (no commit/receipt dates). Top-20 by count,
    name-tiebroken (names are unique → total order, deterministic).

    100 TB shape: all three lineitem legs hash-shuffle on orderkey once
    each (semi + anti join, no fact-side broadcast); supplier broadcasts;
    the per-supplier agg is 100s of rows."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_returnflag")
    ok = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    l1 = li.filter(F.col("l_returnflag") == "R").join(ok, "l_orderkey")
    l2 = li.select(F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3"))
    )
    waiting = (
        l1.join(l2, (l1["l_orderkey"] == l2["o2"]) & (l1["l_suppkey"] != l2["s2"]), "left_semi")
        .join(l3, (l1["l_orderkey"] == l3["o3"]) & (l1["l_suppkey"] != l3["s3"]), "left_anti")
    )
    s = _t(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(s), "l_suppkey")
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(20)
        .select("s_name", "numwait")
    )
