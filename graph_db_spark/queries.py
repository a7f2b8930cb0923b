"""Query registry: every SURVEY §2 operator as a (Spark builder, oracle SQL)
pair for the driver's DuckDB correctness gate.

Conventions (driver compares row-count + schema + order-insensitive
value-hash, columns sorted by name):
- every computed column is aliased identically in Spark and SQL;
- float aggregation goes through DECIMAL (exact, order-independent) and is
  cast to DOUBLE at the end; divisions are rounded;
- top-k is always deterministic (row_number with unique tie-break);
- md5 is the portable hash for dedup/minhash/fingerprints.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from graph_db_spark.catalogue import OFFSETS, tpch_graph
from graph_db_spark.model import ROOT_ID
from graph_db_spark.operators import dedup as D, similarity as S, text as TX

REGISTRY: dict[str, "Q"] = {}


@dataclass(frozen=True)
class Q:
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


def q(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Q(fn, oracle)
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _parquet_rows(sf_dir: str, name: str) -> int:
    """Exact row count straight from the parquet footer(s) (pyarrow,
    driver-side) — zero Spark jobs. Handles both the driver's
    single-file tables and Spark-written part-file directories (the
    scale-stress corpora). Callers pass it as corpus_rows /
    corpus-scaled thresholds to size-switched operators so the pick
    costs no count job at all (round-7 verdict item 8)."""
    import glob
    import os

    import pyarrow.parquet as pq

    p = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(p):
        return sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(p, "*.parquet"))
        )
    return pq.ParquetFile(p).metadata.num_rows


def _dec(c, scale=4):
    return F.col(c).cast(f"decimal(18,{scale})")


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


# ---------------------------------------------------------------------------
# Graph queries (the reference's traversal surface on the TPC-H-derived graph)
# ---------------------------------------------------------------------------

_REGION = OFFSETS["Region"]
_NATION = OFFSETS["Nation"]
_CUSTOMER = OFFSETS["Customer"]
_SUPPLIER = OFFSETS["Supplier"]
_ORDER = OFFSETS["Order"]
_PART = OFFSETS["Part"]


@q(
    "graph_1hop_region_lookup",
    f"""
    SELECT CAST({_REGION} + r_regionkey AS BIGINT) AS id, 'Region' AS kind,
           r_name AS name, CAST(r_regionkey AS BIGINT) AS uid
    FROM region WHERE r_name = 'EUROPE'
    """,
)
def graph_1hop_region_lookup(spark, sf_dir):
    """getTargets by exact-name index — the reference's sole navigation
    primitive (Graph.hs:129-133) as an edge_index filter."""
    g = tpch_graph(spark, sf_dir)
    return g.get_values(g.get_targets(ROOT_ID, "Catalogue_Region_Name", "EUROPE"))


@q(
    "graph_2hop_nations_of_europe",
    f"""
    SELECT CAST({_NATION} + n_nationkey AS BIGINT) AS id, n_name AS name
    FROM nation JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
    """,
)
def graph_2hop_nations_of_europe(spark, sf_dir):
    g = tpch_graph(spark, sf_dir)
    nations = g.get_targets(
        g.get_targets(ROOT_ID, "Catalogue_Region_Name", "EUROPE"), "Region_Nation"
    )
    return g.get_values(nations).select("id", "name")


@q(
    "graph_3hop_customers_in_region",
    f"""
    SELECT CAST({_CUSTOMER} + c_custkey AS BIGINT) AS id, c_name AS name
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
    """,
)
def graph_3hop_customers_in_region(spark, sf_dir):
    """The flagship: the reference's 3-hop lookupArtistsBySongGenreName
    (Benchmarks/GraphDB.hs:94-102; its own SQL twin Postgres.hs:78-87) —
    chained equi-joins over edge_index with the natural join flattening."""
    g = tpch_graph(spark, sf_dir)
    custs = g.get_targets(
        g.get_targets(
            g.get_targets(ROOT_ID, "Catalogue_Region_Name", "EUROPE"), "Region_Nation"
        ),
        "Nation_Customer",
    )
    return g.get_values(custs).select("id", "name")


@q(
    "graph_3hop_persisted_snapshot",
    f"""
    SELECT CAST({_CUSTOMER} + c_custkey AS BIGINT) AS id, c_name AS name
    FROM customer
    JOIN nation ON n_nationkey = c_nationkey
    JOIN region ON r_regionkey = n_regionkey
    WHERE r_name = 'EUROPE'
    """,
)
def graph_3hop_persisted_snapshot(spark, sf_dir):
    """The same 3-hop traversal as ``graph_3hop_customers_in_region`` but
    via the STEADY-STATE route: the graph is loaded from a persisted,
    src-bucketed snapshot store (built + checkpointed once on first call)
    instead of being re-derived from base parquet per query — the
    deployment shape matching the reference's always-resident graph
    (Graph.hs:27-34). The traversal plan carries no build-stage exchanges
    and no shuffle on the edge_index side (asserted in
    tests/test_plans_sources.py)."""
    from graph_db_spark.catalogue import tpch_graph_persisted

    g = tpch_graph_persisted(spark, sf_dir)
    custs = g.get_targets(
        g.get_targets(
            g.get_targets(ROOT_ID, "Catalogue_Region_Name", "EUROPE"), "Region_Nation"
        ),
        "Nation_Customer",
    )
    return g.get_values(custs).select("id", "name")


@q(
    "graph_5hop_parts_for_region",
    f"""
    SELECT DISTINCT CAST({_PART} + p_partkey AS BIGINT) AS id, p_name AS name
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
    """,
)
def graph_5hop_parts_for_region(spark, sf_dir):
    """Deep traversal root→region→nation→customer→order→part: five chained
    frontier joins; frontiers stay (id)-only until the final projection."""
    g = tpch_graph(spark, sf_dir)
    f = g.get_targets(ROOT_ID, "Catalogue_Region_Name", "ASIA")
    for tag in ("Region_Nation", "Nation_Customer", "Customer_Order", "Order_Part"):
        f = g.get_targets(f, tag)
    return g.get_values(f).select("id", "name")


@q(
    "graph_search_term_parts",
    f"""
    SELECT DISTINCT CAST({_PART} + p_partkey AS BIGINT) AS id, p_name AS name
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE list_contains(string_split(p_name, ' '), 'red')
    """,
)
def graph_search_term_parts(spark, sf_dir):
    """Tokenized search-term index lookup (Demo.hs:19-28): write-time
    explode(split(name,' ')) made a read-time equality filter."""
    g = tpch_graph(spark, sf_dir)
    hits = (
        g.edge_index.filter(
            (F.col("idx_tag") == "Order_Part_SearchTerm") & (F.col("idx_key") == "red")
        )
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    return g.get_values(hits).select("id", "name")


@q(
    "graph_reverse_sources_of_part",
    f"""
    SELECT DISTINCT CAST({_ORDER} + l_orderkey AS BIGINT) AS id
    FROM lineitem WHERE l_partkey = 42
    """,
)
def graph_reverse_sources_of_part(spark, sf_dir):
    """Reverse traversal (traverseSources, Graph.hs:79-80): orders that
    contain part 42 — the edges table joined on dst."""
    g = tpch_graph(spark, sf_dir)
    return g.get_sources(_PART + 42)


@q(
    "graph_stats_reachability",
    f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ptok AS (
      SELECT p_partkey, count(DISTINCT t) AS nt
      FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS t FROM part)
      GROUP BY p_partkey
    ),
    base AS (
      SELECT (SELECT count(*) FROM region)   AS nr,
             (SELECT count(*) FROM nation)   AS nn,
             (SELECT count(*) FROM customer) AS nc,
             (SELECT count(*) FROM supplier) AS ns,
             (SELECT count(*) FROM orders)   AS no,
             (SELECT count(DISTINCT l_partkey) FROM lineitem) AS np,
             (SELECT count(*) FROM op)       AS nop,
             (SELECT CAST(sum(2 + nt) AS BIGINT) FROM op JOIN ptok ON p_partkey = l_partkey) AS op_idx
    )
    SELECT CAST(1 + nr + nn + nc + ns + no + np AS BIGINT) AS nodes,
           CAST(nr + nn + nc + ns + no + nop AS BIGINT) AS edges,
           CAST(3*nr + 2*nn + 2*nc + 2*ns + 2*no + op_idx AS BIGINT) AS index_entries
    FROM base
    """,
)
def graph_stats_reachability(spark, sf_dir):
    """get_stats (Graph.hs:82-118): genuine iterative BFS in Spark; the
    oracle derives the same three counts arithmetically (the derived graph
    is a layered DAG where only lineitem-referenced parts are reachable)."""
    g = tpch_graph(spark, sf_dir)
    st = g.get_stats()
    return spark.createDataFrame(
        [(st.nodes, st.edges, st.index_entries)],
        "nodes LONG, edges LONG, index_entries LONG",
    )


# -- Steady-state (persisted-snapshot) twins of the registered graph
# surface. Every one routes through ``tpch_graph_persisted``: the graph is
# loaded from the src-bucketed snapshot store (built+checkpointed once),
# so the plan carries NO build stage — the deployment shape matching the
# reference's always-resident graph (Graph.hs:27-34). Same oracles as the
# cold-build twins above; plan shape asserted in test_plans_sources.py.


def _persisted(spark, sf_dir):
    from graph_db_spark.catalogue import tpch_graph_persisted

    return tpch_graph_persisted(spark, sf_dir)


@q(
    "graph_5hop_persisted_snapshot",
    f"""
    SELECT DISTINCT CAST({_PART} + p_partkey AS BIGINT) AS id, p_name AS name
    FROM part
    JOIN lineitem ON l_partkey = p_partkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    JOIN region   ON r_regionkey = n_regionkey
    WHERE r_name = 'ASIA'
    """,
)
def graph_5hop_persisted_snapshot(spark, sf_dir):
    """``graph_5hop_parts_for_region`` via the steady-state route: five
    chained frontier joins against the pre-bucketed edge_index, no build
    stage."""
    g = _persisted(spark, sf_dir)
    f = g.get_targets(ROOT_ID, "Catalogue_Region_Name", "ASIA")
    for tag in ("Region_Nation", "Nation_Customer", "Customer_Order", "Order_Part"):
        f = g.get_targets(f, tag)
    return g.get_values(f).select("id", "name")


@q(
    "graph_search_term_persisted",
    f"""
    SELECT DISTINCT CAST({_PART} + p_partkey AS BIGINT) AS id, p_name AS name
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE list_contains(string_split(p_name, ' '), 'red')
    """,
)
def graph_search_term_persisted(spark, sf_dir):
    """``graph_search_term_parts`` via the steady-state route: the
    tokenized search-term lookup is a single filter over the persisted
    bucketed index — at scale, a bucket-pruned scan, zero joins before
    the value projection."""
    g = _persisted(spark, sf_dir)
    hits = (
        g.edge_index.filter(
            (F.col("idx_tag") == "Order_Part_SearchTerm") & (F.col("idx_key") == "red")
        )
        .select(F.col("dst").alias("id"))
        .distinct()
    )
    return g.get_values(hits).select("id", "name")


@q(
    "graph_reverse_sources_persisted",
    f"""
    SELECT DISTINCT CAST({_ORDER} + l_orderkey AS BIGINT) AS id
    FROM lineitem WHERE l_partkey = 42
    """,
)
def graph_reverse_sources_persisted(spark, sf_dir):
    """``graph_reverse_sources_of_part`` via the steady-state route:
    traverseSources over the persisted edges table."""
    g = _persisted(spark, sf_dir)
    return g.get_sources(_PART + 42)


@q(
    "graph_stats_persisted",
    f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ptok AS (
      SELECT p_partkey, count(DISTINCT t) AS nt
      FROM (SELECT p_partkey, unnest(string_split(p_name, ' ')) AS t FROM part)
      GROUP BY p_partkey
    ),
    base AS (
      SELECT (SELECT count(*) FROM region)   AS nr,
             (SELECT count(*) FROM nation)   AS nn,
             (SELECT count(*) FROM customer) AS nc,
             (SELECT count(*) FROM supplier) AS ns,
             (SELECT count(*) FROM orders)   AS no,
             (SELECT count(DISTINCT l_partkey) FROM lineitem) AS np,
             (SELECT count(*) FROM op)       AS nop,
             (SELECT CAST(sum(2 + nt) AS BIGINT) FROM op JOIN ptok ON p_partkey = l_partkey) AS op_idx
    )
    SELECT CAST(1 + nr + nn + nc + ns + no + np AS BIGINT) AS nodes,
           CAST(nr + nn + nc + ns + no + nop AS BIGINT) AS edges,
           CAST(3*nr + 2*nn + 2*nc + 2*ns + 2*no + op_idx AS BIGINT) AS index_entries
    FROM base
    """,
)
def graph_stats_persisted(spark, sf_dir):
    """``graph_stats_reachability`` via the steady-state route: the BFS
    seeds from the persisted tables directly — the build stage (the
    widest part of the cold plan) is gone; only the iterative frontier
    joins remain."""
    g = _persisted(spark, sf_dir)
    st = g.get_stats()
    return spark.createDataFrame(
        [(st.nodes, st.edges, st.index_entries)],
        "nodes LONG, edges LONG, index_entries LONG",
    )


@q(
    "graph_mutation_net_effect",
    f"""
    SELECT CAST(0 AS BIGINT) AS src, 'Catalogue_Region_Name' AS idx_tag,
           CASE WHEN r_regionkey = 0 THEN 'EMEA' ELSE r_name END AS idx_key,
           CAST({_REGION} + r_regionkey AS BIGINT) AS dst
    FROM region
    UNION ALL
    SELECT CAST({_REGION} + n_regionkey AS BIGINT), 'Region_Nation',
           CAST(NULL AS VARCHAR), CAST({_NATION} + n_nationkey AS BIGINT)
    FROM nation WHERE n_nationkey NOT IN (0, 1)
    """,
)
def graph_mutation_net_effect(spark, sf_dir):
    """The mutation surface end-to-end: set_value re-indexing (rename a
    region), remove (unlink a nation from all sources), remove_target
    (unlink one specific nation), add_target with no matching edge-kind
    (edge exists, no index rows) — then read back edge_index."""
    from graph_db_spark.graph import GraphSession

    g = tpch_graph(spark, sf_dir)
    session = GraphSession(g, next_id=10_000_000_000_000)
    region_of_n1 = _REGION + int(
        g.vertices.sparkSession.read.parquet(f"{sf_dir}/nation.parquet")
        .filter(F.col("n_nationkey") == 1)
        .select("n_regionkey")
        .collect()[0][0]
    )

    def prog(tx):
        tx.set_value(_REGION + 0, "Region", name="EMEA", uid=0)
        tx.remove(_NATION + 0)
        tx.remove_target(region_of_n1, _NATION + 1)
        tx.add_target(ROOT_ID, _NATION + 7)  # no Root→Nation kind → no index rows

    session.write(prog, materialize=False)
    return session.snapshot.edge_index.filter(
        F.col("idx_tag").isin("Catalogue_Region_Name", "Region_Nation")
    )


# ---------------------------------------------------------------------------
# LLM-pipeline operators (north-star: dedup / similarity / text analysis)
# ---------------------------------------------------------------------------


@q(
    "dedup_exact_documents",
    "SELECT CAST(min(doc_id) AS BIGINT) AS id FROM documents GROUP BY md5(text)",
)
def dedup_exact_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.exact_dedup(d, ["text"], "doc_id")


@q(
    "dedup_minhash_lsh",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    tok AS (
      -- sub-k docs emit NO shingles (mirrors shingle_array's guard)
      SELECT id, unnest(list_distinct(
               CASE WHEN len(tk) >= 3
                    THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]
                    ELSE [] END
             )) AS token
      FROM toks
    ),
    sig AS (
      SELECT id,
             min(md5('0|' || token)) AS h0, min(md5('1|' || token)) AS h1,
             min(md5('2|' || token)) AS h2, min(md5('3|' || token)) AS h3,
             min(md5('4|' || token)) AS h4, min(md5('5|' || token)) AS h5,
             min(md5('6|' || token)) AS h6, min(md5('7|' || token)) AS h7
      FROM tok GROUP BY id
    ),
    banded AS (
      SELECT id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
      UNION ALL SELECT id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT l.id AS a, r.id AS b
      FROM banded l JOIN banded r ON l.band = r.band AND l.bkey = r.bkey AND l.id < r.id
    ),
    sz AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
    inter AS (
      SELECT c.a, c.b, count(*) AS inter
      FROM cand c JOIN tok ta ON ta.id = c.a JOIN tok tb ON tb.id = c.b AND tb.token = ta.token
      GROUP BY c.a, c.b
    )
    SELECT i.a, i.b, round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
    FROM inter i JOIN sz sa ON sa.id = i.a JOIN sz sb ON sb.id = i.b
    WHERE i.inter >= 0.7 * (sa.sz + sb.sz - i.inter)
    """,
)
def dedup_minhash_lsh(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.minhash_near_dup_pairs(
        d, "doc_id", "text", n_hashes=8, bands=4, threshold=0.7, shingle=3,
        corpus_rows=_parquet_rows(sf_dir, "documents"),
    )


@q(
    "dedup_banded_survivors",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    tok AS (
      SELECT id, unnest(list_distinct(
               CASE WHEN len(tk) >= 3
                    THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]
                    ELSE [] END
             )) AS token
      FROM toks
    ),
    sig AS (
      SELECT id,
             min(md5('0|' || token)) AS h0, min(md5('1|' || token)) AS h1,
             min(md5('2|' || token)) AS h2, min(md5('3|' || token)) AS h3,
             min(md5('4|' || token)) AS h4, min(md5('5|' || token)) AS h5,
             min(md5('6|' || token)) AS h6, min(md5('7|' || token)) AS h7
      FROM tok GROUP BY id
    ),
    banded AS (
      SELECT id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
      UNION ALL SELECT id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    dropped AS (
      SELECT DISTINCT r.id AS doc_id
      FROM banded l JOIN banded r ON l.band = r.band AND l.bkey = r.bkey AND l.id < r.id
    )
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
)
def dedup_banded_survivors(spark, sf_dir):
    """Pure banded-LSH survivor set (NO Jaccard verification): keep every
    doc that shares no band key with an earlier (lower-id) doc — exactly
    the recall tier of the STREAMING banded dedup
    (streaming.apply.stream_dedup_near_banded), whose per-bucket
    first-writer-wins claims reproduce this set whenever arrival order
    follows doc_id (true for the synthesized event time; on a real
    ingest the stream keys on arrival order — see its docstring).
    Registered as the oracle-paired batch twin of that streaming
    mode."""
    d = _t(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.shingles(d, "doc_id", "text", 3), n_hashes=8)
    dropped = (
        D.lsh_candidate_pairs(sigs, n_hashes=8, bands=4, corpus_rows=d.count())
        .select(F.col("b").alias("doc_id"))
        .distinct()
    )
    return d.select("doc_id").join(dropped, "doc_id", "left_anti")


@q(
    "dedup_exact_substring_spans",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT id, i + 1 AS pos,
             md5(array_to_string(tk[i+1:i+10], ' ')) AS g
      FROM (SELECT id, tk, unnest(range(len(tk) - 9)) AS i
            FROM toks WHERE len(tk) >= 10)
    ),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
    dp AS (SELECT id, pos FROM grams JOIN dupg USING (g)),
    cov AS (
      SELECT id, pos,
             greatest(0, pos + 10 - greatest(pos, coalesce(
               max(pos + 10) OVER (PARTITION BY id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), pos))) AS cov
      FROM dp
    ),
    per AS (SELECT id, sum(cov) AS dup_tokens FROM cov GROUP BY id)
    SELECT t.id AS id, CAST(len(t.tk) AS BIGINT) AS n_tok,
           CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
           round(coalesce(p.dup_tokens, 0) * 1.0 / greatest(len(t.tk), 1), 6) AS dup_frac
    FROM toks t LEFT JOIN per p USING (id)
    """,
)
def dedup_exact_substring_spans(spark, sf_dir):
    """Exact-substring duplication (Lee et al. 2022's criterion,
    relational form — operators.dedup.duplicated_span_coverage): per doc,
    the fraction of token positions covered by a 10-token window whose
    exact text occurs more than once in the corpus. The highest-precision
    tier of the dedup family (byte-identical spans, not similarity), used
    to cut boilerplate/licenses/repeated headers before training."""
    d = _t(spark, sf_dir, "documents")
    return D.duplicated_span_coverage(d, "doc_id", "text", k=10).withColumnRenamed(
        "id", "doc_id"
    ).select(F.col("doc_id").alias("id"), "n_tok", "dup_tokens", "dup_frac")


@q(
    "dedup_strip_substring_spans",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    grams AS (
      SELECT id, i + 1 AS pos,
             md5(array_to_string(tk[i+1:i+10], ' ')) AS g
      FROM (SELECT id, tk, unnest(range(len(tk) - 9)) AS i
            FROM toks WHERE len(tk) >= 10)
    ),
    dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) > 1),
    st AS (
      SELECT id, list_sort(list(pos)) AS starts
      FROM grams JOIN dupg USING (g) GROUP BY id
    ),
    joined AS (
      SELECT t.id, t.tk, coalesce(s.starts, []) AS starts
      FROM toks t LEFT JOIN st s USING (id)
    ),
    kept AS (
      SELECT id, len(tk) AS n_tok,
             [i FOR i IN range(1, len(tk) + 1)
              IF len(list_filter(starts, s -> s <= i AND i < s + 10)) = 0] AS ki,
             tk
      FROM joined
    )
    SELECT id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST(len(ki) AS BIGINT) AS n_kept,
           -- coalesce: DuckDB's array_to_string of an empty list is NULL
           -- where Spark's concat_ws is '' (fully-stripped docs)
           coalesce(array_to_string([tk[i] FOR i IN ki], ' '), '') AS clean_text
    FROM kept
    """,
)
def dedup_strip_substring_spans(spark, sf_dir):
    """Exact-substring REMOVAL (Lee et al. 2022's cleaning step —
    operators.dedup.strip_duplicated_spans): each document rebuilt with
    every token inside a corpus-duplicated 10-token window dropped.
    The duplicated-window starts collapse to one sorted array per doc;
    the rebuild is a row-local higher-order filter (no extra shuffle)."""
    d = _t(spark, sf_dir, "documents")
    return D.strip_duplicated_spans(d, "doc_id", "text", k=10).select(
        F.col("id"), "n_tok", "n_kept", "clean_text"
    )


@q(
    "text_stats_documents",
    r"""
    WITH t AS (SELECT doc_id, text,
                      list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
           CAST(length(text) AS INT) AS n_chars_measured,
           round(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
                 / greatest(len(toks), 1), 4) AS avg_token_len,
           CAST(length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS INT) AS n_punct
    FROM t
    """,
)
def text_stats_documents(spark, sf_dir):
    return TX.token_stats(_t(spark, sf_dir, "documents"))


@q(
    "ann_cosine_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    qn AS (SELECT vec_id, v, nrm FROM n WHERE vec_id < 5),
    scored AS (
      SELECT qn.vec_id AS qid, n.vec_id AS nid,
             round(list_dot_product(n.v, qn.v) / (n.nrm * qn.nrm), 6) AS cos
      FROM n CROSS JOIN qn WHERE n.vec_id <> qn.vec_id
    )
    SELECT qid, nid, cos, CAST(rank AS INT) AS rank FROM (
      SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def ann_cosine_topk(spark, sf_dir):
    e = _t(spark, sf_dir, "embeddings")
    return S.cosine_topk(e, e.filter(F.col("vec_id") < 5), k=5)


#: Names that already have a driver-green row in a past round's
#: CORRECTNESS_r*.json (the driver oracle-checks only the FIRST 50
#: entries of ``queries()``, and rounds 1-10 always exported plain
#: registration order — so exactly this prefix ever got a hard external
#: row). ``all_queries``/``all_oracles`` rotate the never-covered names
#: to the front, newest registration first, so each round's driver gate
#: exercises the newest / highest-risk surface (round-10 verdict item 2).
#: Maintenance: after a round lands, append the names from that round's
#: CORRECTNESS_r*.json to this tuple.
_DRIVER_COVERED: tuple[str, ...] = (
    "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
    "filter_pushdown_scan", "join_semi_exists", "join_anti_not_exists",
    "join_outer_order_counts", "agg_distinct_segments", "agg_rollup_geo",
    "window_topk_orders_per_cust", "window_running_user_value",
    "sort_limit_top_lineitems", "setop_customer_cohorts",
    "scalar_functions_showcase", "tumbling_hour_events",
    "sessionize_events_gaps", "graph_1hop_region_lookup",
    "graph_2hop_nations_of_europe", "graph_3hop_customers_in_region",
    "graph_3hop_persisted_snapshot", "graph_5hop_parts_for_region",
    "graph_search_term_parts", "graph_reverse_sources_of_part",
    "graph_stats_reachability", "graph_5hop_persisted_snapshot",
    "graph_search_term_persisted", "graph_reverse_sources_persisted",
    "graph_stats_persisted", "graph_mutation_net_effect",
    "dedup_exact_documents", "dedup_minhash_lsh", "dedup_banded_survivors",
    "dedup_exact_substring_spans", "dedup_strip_substring_spans",
    "text_stats_documents", "ann_cosine_topk", "graph_connected_components",
    "graph_connected_components_star", "graph_bfs_levels",
    "asof_join_click_error", "pivot_nation_segment", "dedup_simhash",
    "doc_fingerprint", "text_langid", "text_quality_score",
    "pii_redact_documents", "chunk_documents_strided",
    "embedding_cosine_pairs_exact", "embedding_near_dup_pairs",
    "multimodal_features",
    # round 11 (CORRECTNESS_r11.json — all green):
    "doc_similar_feature_hash", "graph_landmark_distances",
    "doc_feature_hash_embed", "quality_percentile_gate",
    "sample_cluster_balanced", "mix_sources_temperature",
    "split_stratified_holdout", "embedding_label_margin",
    "knn_label_agreement", "dedup_duplicate_clusters",
    "embedding_pca_scores", "dedup_semantic_tree", "dedup_semantic_default",
    "dedup_semantic_semdedup_hier", "dedup_semantic_semdedup",
    "ann_ivf_kmeans_topk", "bpe_encode_fixed_rules",
    "dedup_minhash_signature_groups", "q21_waiting_suppliers",
    "q20_promotion_suppliers", "q15_top_supplier",
    "q13_customer_orders_distribution", "q11_important_inventory",
    "q8_nation_market_share", "graph_hits_hubs_authorities",
    "window_distribution_functions", "q22_dormant_rich_customers",
    "q19_disjunctive_pushdown", "q16_supplier_cnt_antijoin",
    "q14_promo_revenue_ratio", "q12_priority_case_pivot",
    "q6_forecast_revenue", "q4_order_priority_exists",
    "graph_jaccard_link_prediction", "graph_personalized_ppr",
    "graph_label_propagation", "q2_min_price_supplier",
    "q18_large_volume_customers", "q17_small_quantity_revenue",
    "q10_returned_items", "q9_product_type_profit", "q7_volume_shipping",
    "pipeline_curated_pack", "ann_int8_topk", "bpe_merge_pair_counts",
    "source_token_drift", "graph_part_popularity", "dedup_simhash_banded",
    "graph_degree_histogram", "graph_kcore_part_supplier",
    # round 12 (CORRECTNESS_r12.json — 49 green; `agg_collect_sorted_lists`
    # recorded `err` (driver canonicalizer could not hash its former
    # array<string> column) and is deliberately NOT listed, so it rotates
    # to the front of round 13's gate and earns its green row with the
    # now-scalar output):
    "dedup_incremental_new_vs_store", "scd2_user_status_intervals",
    "shard_manifest_by_tokens", "dedup_repeated_lines",
    "dedup_simhash_banded_wide", "sample_stratified_sources",
    "boilerplate_ngrams", "doc_lm_mean_prob", "text_repetition_signals",
    "sketch_countmin_heavy_tokens", "sketch_kmv_distinct_tokens",
    "dsir_importance_weights", "mix_sources_weighted", "pack_sequences",
    "decontam_ngram_overlap", "histogram_event_values",
    "anomaly_zscore_events", "embedding_quantize_int8", "bigram_cond_probs",
    "training_examples_window", "tfidf_top_terms", "token_pmi_pairs",
    "vocab_top_tokens", "pipeline_training_corpus",
    "dedup_survivors_minhash", "window_rolling_1h_user",
    "cohort_hourly_retention", "embedding_dim_stats",
    "funnel_click_purchase", "unpivot_part_metrics", "window_range_frame",
    "json_extract_events", "graph_triangle_count", "ann_ivf_topk",
    "sample_hash_documents", "token_count_bpe", "ann_lsh_topk",
    "graph_pagerank", "graph_sssp_weighted", "sliding_window_events",
    "ngram_char_jaccard", "having_filter_nations", "date_arithmetic_orders",
    "string_match_filters", "percentiles_by_segment",
    "window_lead_lag_ntile", "correlated_above_nation_avg",
    "agg_grouping_sets", "agg_cube_status_priority",
    # round 13 (CORRECTNESS_r13.json — 50/50 green; the other 41 checked
    # names were rotation re-verifications already listed above):
    "dedup_incremental_persisted_store", "dedup_semantic_incremental_store",
    "ann_ivfpq_topk", "dedup_containment_exact_pairs", "ann_pq_adc_topk",
    "event_time_weighted_avg", "dedup_prefix_filter_pairs",
    "dedup_containment_pairs", "agg_collect_sorted_lists",
    # round 14 (CORRECTNESS_r14.json — 50/50 green; the other 49 checked
    # names were rotation re-verifications already listed above):
    "ann_ivfpq_residual_topk",
)


def driver_order() -> list[str]:
    """Registry names with every never-driver-checked query rotated to
    the front (newest registration first); already-covered names follow
    in coverage order (oldest driver row first), so once the fresh pool
    is smaller than the driver's 50-query gate the LEAST-recently
    re-verified queries rotate back into it."""
    covered_rank = {n: i for i, n in enumerate(_DRIVER_COVERED)}
    fresh = [n for n in REGISTRY if n not in covered_rank]
    fresh.reverse()
    covered = sorted(
        (n for n in REGISTRY if n in covered_rank), key=covered_rank.__getitem__
    )
    return fresh + covered


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: REGISTRY[name].build for name in driver_order()}


def all_oracles() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in driver_order()
        if REGISTRY[name].oracle is not None
    }


# ---------------------------------------------------------------------------
# Graph analytics (Pregel-style iteration) + temporal joins + more LLM ops
# ---------------------------------------------------------------------------


@q(
    "graph_connected_components",
    f"""
    SELECT CAST({_REGION} + r_regionkey AS BIGINT) AS id,
           CAST({_REGION} + r_regionkey AS BIGINT) AS component FROM region
    UNION ALL
    SELECT CAST({_NATION} + n_nationkey AS BIGINT),
           CAST({_REGION} + n_regionkey AS BIGINT) FROM nation
    UNION ALL
    SELECT CAST({_CUSTOMER} + c_custkey AS BIGINT),
           CAST({_REGION} + n_regionkey AS BIGINT)
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    UNION ALL
    SELECT CAST({_SUPPLIER} + s_suppkey AS BIGINT),
           CAST({_REGION} + n_regionkey AS BIGINT)
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    """,
)
def graph_connected_components(spark, sf_dir):
    """Connected components by min-label propagation over the root-less
    geography subgraph (region/nation/customer/supplier): each region's
    subtree is one component whose label is the region's id (region ids
    sort lowest by construction) — giving the oracle a closed form."""
    from graph_db_spark.pregel import connected_components

    g = tpch_graph(spark, sf_dir)
    lo, hi = _REGION, _ORDER  # [Region, Nation, Customer, Supplier] id range
    verts = g.vertices.filter((F.col("id") >= lo) & (F.col("id") < hi)).select("id")
    edges = g.edges.filter(
        (F.col("src") >= lo) & (F.col("src") < hi) & (F.col("dst") >= lo) & (F.col("dst") < hi)
    )
    return connected_components(verts, edges)


@q("graph_connected_components_star", REGISTRY["graph_connected_components"].oracle)
def graph_connected_components_star(spark, sf_dir):
    """Same component labelling through the large-star/small-star
    alternation (pregel.connected_components_star) — the high-diameter
    scale variant, checked against the identical closed-form oracle."""
    from graph_db_spark.pregel import connected_components_star

    g = tpch_graph(spark, sf_dir)
    lo, hi = _REGION, _ORDER
    verts = g.vertices.filter((F.col("id") >= lo) & (F.col("id") < hi)).select("id")
    edges = g.edges.filter(
        (F.col("src") >= lo) & (F.col("src") < hi) & (F.col("dst") >= lo) & (F.col("dst") < hi)
    )
    labels, _rounds = connected_components_star(verts, edges)
    return labels


@q(
    "graph_bfs_levels",
    f"""
    SELECT CAST(0 AS BIGINT) AS id, 0 AS level
    UNION ALL SELECT CAST({_REGION} + r_regionkey AS BIGINT), 1 FROM region
    UNION ALL SELECT CAST({_NATION} + n_nationkey AS BIGINT), 2 FROM nation
    UNION ALL SELECT CAST({_CUSTOMER} + c_custkey AS BIGINT), 3 FROM customer
    UNION ALL SELECT CAST({_SUPPLIER} + s_suppkey AS BIGINT), 3 FROM supplier
    UNION ALL SELECT CAST({_ORDER} + o_orderkey AS BIGINT), 4 FROM orders
    UNION ALL SELECT DISTINCT CAST({_PART} + l_partkey AS BIGINT), 5 FROM lineitem
    """,
)
def graph_bfs_levels(spark, sf_dir):
    """Multi-level BFS with hop distances (generalizes getStats' walk);
    the oracle knows the layered closed form."""
    from graph_db_spark.pregel import bfs_levels

    g = tpch_graph(spark, sf_dir)
    sources = spark.createDataFrame([(ROOT_ID,)], "id LONG")
    return bfs_levels(g.edges, sources)


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


@q(
    "dedup_simhash",
    r"""
    WITH tok AS (
      SELECT DISTINCT doc_id AS id, t AS token
      FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS t FROM documents)
      WHERE t <> ''
    ),
    b AS (
      SELECT id, j,
             sum(CASE WHEN ascii(substr(md5(token), j + 1, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s
      FROM tok, (SELECT unnest(range(32)) AS j)
      GROUP BY id, j
    )
    SELECT id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
    FROM b GROUP BY id
    """,
)
def dedup_simhash(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return D.simhash_bits(D.tokens(d, "doc_id", "text"), n_bits=32)


@q(
    "doc_fingerprint",
    r"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
               FROM documents),
    s AS (SELECT doc_id,
                 list_sort(list_distinct(
                   CASE WHEN len(tk) >= 3
                        THEN [md5(array_to_string(tk[i+1:i+3], ' '))
                              FOR i IN range(len(tk) - 2)]
                        ELSE [] END)) AS hs
          FROM t)
    SELECT doc_id, array_to_string(hs[1:4], '|') AS fingerprint FROM s
    """,
)
def doc_fingerprint(spark, sf_dir):
    return TX.fingerprint(_t(spark, sf_dir, "documents"), shingle=3, keep=4)


@q(
    "text_langid",
    r"""
    WITH t AS (SELECT doc_id, lang,
                      list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
               FROM documents),
    s AS (
      SELECT doc_id, lang, v.sc, v.lg
      FROM t, LATERAL (VALUES
        (len(list_filter(toks, x -> list_contains(['hash','join','batch','key'], x))), 'de'),
        (len(list_filter(toks, x -> list_contains(['the','a','table','row','order'], x))), 'en'),
        (len(list_filter(toks, x -> list_contains(['slow','agg','merge','vector'], x))), 'es'),
        (len(list_filter(toks, x -> list_contains(['scan','data','query','line'], x))), 'fr'),
        (len(list_filter(toks, x -> list_contains(['small','customer','column','stream'], x))), 'zh')
      ) AS v(sc, lg)
    ),
    r AS (SELECT doc_id, lang, sc, lg,
                 row_number() OVER (PARTITION BY doc_id ORDER BY sc DESC, lg DESC) AS rn
          FROM s)
    SELECT doc_id, lg AS pred_lang, CAST(sc AS BIGINT) AS score, lang
    FROM r WHERE rn = 1
    """,
)
def text_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return TX.lang_id(d).join(d.select("doc_id", "lang"), "doc_id")


@q(
    "text_quality_score",
    r"""
    WITH t AS (SELECT doc_id, text,
                      list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
               FROM documents),
    s AS (SELECT doc_id,
                 len(toks) AS n_tokens,
                 len(list_distinct(toks)) AS n_distinct,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
          FROM t)
    SELECT doc_id,
           round(least(n_tokens / 100.0, 1.0) * 0.5
                 + (n_distinct * 1.0 / greatest(n_tokens, 1)) * 0.4
                 - least(n_punct * 1.0 / greatest(n_chars, 1), 0.1), 6) AS quality
    FROM s
    """,
)
def text_quality_score(spark, sf_dir):
    return TX.quality_score(_t(spark, sf_dir, "documents"))


@q(
    "pii_redact_documents",
    r"""
    WITH s AS (
      SELECT doc_id,
             text || ' reach u' || doc_id || '@ex.org ip 10.0.'
                  || (doc_id % 256) || '.7 tel 555-123-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t0
      FROM documents
    ),
    e AS (SELECT doc_id,
                 len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
                 regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t1
          FROM s),
    i AS (SELECT doc_id, n_email,
                 len(regexp_extract_all(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ipv4,
                 regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IPV4]', 'g') AS t2
          FROM e),
    p AS (SELECT doc_id, n_email, n_ipv4,
                 len(regexp_extract_all(t2, '\b\d{3}-\d{3}-\d{4}\b')) AS n_phone,
                 regexp_replace(t2, '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g') AS t3
          FROM i)
    SELECT doc_id, CAST(n_email AS BIGINT) AS n_email, CAST(n_ipv4 AS BIGINT) AS n_ipv4,
           CAST(n_phone AS BIGINT) AS n_phone, t3 AS redacted
    FROM p
    """,
)
def pii_redact_documents(spark, sf_dir):
    """PII detection + redaction over documents (operators/text.pii_scrub).

    The synthetic corpus carries no real PII, so the fixture first appends
    a deterministic PII suffix derived from doc_id (one email, one IPv4,
    one phone per doc) — the redaction kernel then does real, verifiable
    work: counts are checked per category and the fully-redacted text is
    value-hashed against the oracle's staged regexp_replace chain."""
    d = _t(spark, sf_dir, "documents")
    seeded = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach u"),
            F.col("doc_id").cast("string"),
            F.lit("@ex.org ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 tel 555-123-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    r = TX.pii_scrub(seeded)
    return r.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_phone").cast("long").alias("n_phone"),
        "redacted",
    )


@q(
    "chunk_documents_strided",
    r"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
               FROM documents),
    b AS (SELECT doc_id, tk,
                 greatest(CAST(floor((len(tk) - 9) / 24.0) AS INT), 0) * 24 AS last_start
          FROM t WHERE len(tk) > 0),
    x AS (SELECT doc_id, tk, unnest(range(0, last_start + 1, 24)) AS s FROM b)
    SELECT doc_id,
           CAST(s // 24 AS BIGINT) AS chunk_id,
           CAST(len(tk[s + 1 : s + 32]) AS BIGINT) AS n_chunk_tokens,
           array_to_string(tk[s + 1 : s + 32], ' ') AS chunk_text
    FROM x
    """,
)
def chunk_documents_strided(spark, sf_dir):
    """RAG-style strided chunking (operators/text.chunk_tokens): 32-token
    windows advancing by 24 (8-token overlap), tail kept. Scan → project →
    posexplode, zero shuffle — the chunk pass of a retrieval-indexing or
    context-window-packing pipeline."""
    c = TX.chunk_tokens(_t(spark, sf_dir, "documents"), chunk=32, overlap=8)
    return c.select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("n_chunk_tokens").cast("long").alias("n_chunk_tokens"),
        "chunk_text",
    )


@q(
    "embedding_cosine_pairs_exact",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.45
    """,
)
def embedding_cosine_pairs_exact(spark, sf_dir):
    """Exact all-pairs cosine kernel at a loose threshold — the recall
    baseline for the LSH path. O(n²) by design: a correctness fixture at
    test scale, never the 100 TB path (that's embedding_near_dup_pairs)."""
    return S.exact_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.45)


@q(
    "embedding_near_dup_pairs",
    # Oracle is exact all-pairs over the same corpus ∪ perturbed-copies
    # frame; the Spark side generates candidates via LSH buckets — the
    # match PROVES recall 1.0 on this (deterministic) data.
    """
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pert AS (
      SELECT list_transform(range(0, len(v)), d ->
               v[d + 1] + 0.005 * CAST(((d * 31 + vec_id) % 5) - 2 AS DOUBLE)) AS v,
             vec_id + 100000 AS vec_id
      FROM base
    ),
    all_v AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM pert),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM all_v)
    SELECT a.vec_id AS a, b.vec_id AS b,
           round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cos
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.99
    """,
)
def embedding_near_dup_pairs(spark, sf_dir):
    """Near-duplicate embedding pairs at a true near-dup threshold (0.99),
    via LSH-bucketed candidates — no cross product in the plan.

    The raw corpus has no near-dups (max pairwise cos ≈ 0.6), so the query
    plants them: each vector gets a deterministically-perturbed copy
    (±0.01 per dim, cos ≈ 0.998 to its original). Detection must recover
    exactly the (i, i+100000) pairs; the DuckDB oracle computes the same
    frame exactly (all-pairs), so a hash-match certifies LSH recall 1.0."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = e.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, d: x
            + F.lit(0.005)
            * (((d * 31 + F.col("vec_id")) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    return S.lsh_near_dup_pairs(e.unionByName(pert), threshold=0.99)


@q(
    "multimodal_features",
    # The fake codec is pure md5-hex arithmetic (operators/multimodal.py:51-62):
    # digest = md5(utf8(text)); h = int(digest[:8], 16); dims/duration are
    # modular functions of h — all expressible in DuckDB (md5 + strpos-based
    # hex parse), so the mapInPandas plumbing gets a full value-hash oracle.
    """
    WITH a AS (
      SELECT doc_id AS asset_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS digest
      FROM documents
    ),
    h AS (
      SELECT *, CAST(list_sum(list_transform(range(0, 8), i ->
               (strpos('0123456789abcdef', substr(digest, i + 1, 1)) - 1)
               * power(16, 7 - i))) AS BIGINT) AS hv
      FROM a
    )
    SELECT asset_id, media_type, n_bytes, digest,
           CASE WHEN media_type = 'image' THEN CAST(64 + hv % 1024 AS INT) END AS width,
           CASE WHEN media_type = 'image' THEN CAST(64 + (hv // 1024) % 1024 AS INT) END AS height,
           CASE WHEN media_type <> 'image' THEN 1000 + hv % 600000 END AS duration_ms
    FROM h
    """,
)
def multimodal_features(spark, sf_dir):
    """Multimodal decode/feature plumbing over synthetic binary assets
    derived from documents (deterministic fake codec — see
    operators/multimodal.py)."""
    from graph_db_spark.operators.multimodal import extract_features, synthetic_assets

    d = _t(spark, sf_dir, "documents")
    assets = synthetic_assets(d, "doc_id", "text")
    return extract_features(assets).select(
        "asset_id", "media_type", "n_bytes", "digest", "width", "height", "duration_ms"
    )


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
    "ngram_char_jaccard",
    """
    WITH d AS (SELECT doc_id, lower(text) AS t FROM documents WHERE doc_id < 40),
    g AS (SELECT doc_id,
                 list_distinct([substr(t, i + 1, 4)
                                FOR i IN range(greatest(length(t) - 4, 0) + 1)]) AS gs
          FROM d),
    p AS (SELECT a.doc_id AS a, b.doc_id AS b,
                 len(list_intersect(a.gs, b.gs)) AS inter,
                 len(a.gs) + len(b.gs) - len(list_intersect(a.gs, b.gs)) AS uni
          FROM g a JOIN g b ON a.doc_id < b.doc_id)
    SELECT a, b, round(inter * 1.0 / uni, 6) AS jaccard
    FROM p WHERE inter * 1.0 / uni >= 0.2
    """,
)
def ngram_char_jaccard(spark, sf_dir):
    """Character 4-gram Jaccard similarity — the exact all-pairs kernel.

    The ``doc_id < 40`` bound is LOAD-BEARING: this is a correctness
    fixture for the Jaccard math on a fixed small subset, kept O(40²) by
    construction. The scale path for unbounded corpora is the bucketed
    pipeline (dedup_minhash_lsh / lsh_near_dup_pairs): signatures → band
    buckets → verify candidates only. Never lift the bound; widen coverage
    by adding buckets, not pairs."""
    d = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", F.lower("text").alias("t"))
    )
    g = d.select(
        "doc_id",
        F.array_distinct(F.expr("transform(sequence(0, greatest(length(t)-4, 0)), i -> substr(t, i+1, 4))")).alias("gs"),
    )
    a = g.select(F.col("doc_id").alias("a"), F.col("gs").alias("ga"))
    b = g.select(F.col("doc_id").alias("b"), F.col("gs").alias("gb"))
    pairs = (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.size(F.array_intersect("ga", "gb")).alias("inter"),
            (F.size("ga") + F.size("gb") - F.size(F.array_intersect("ga", "gb"))).alias("uni"),
        )
    )
    return (
        pairs.filter(F.col("inter") * 1.0 / F.col("uni") >= 0.2)
        .select("a", "b", F.round(F.col("inter") / F.col("uni"), 6).alias("jaccard"))
    )


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


def _part_chain_graph(spark, sf_dir, max_key=None):
    """Deterministic weighted digraph over part keys: i -> i+1 and i -> i+7,
    weight = (31*src + dst) mod 97 + 1. Gives genuine multi-path shortest-
    path structure (combinations of +1/+7 hops) that both engines derive
    from the same table."""
    nodes = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("id"))
    if max_key is not None:
        nodes = nodes.filter(F.col("id") <= max_key)
    a = nodes.select(F.col("id").alias("src"))
    b = nodes.select(F.col("id").alias("dst"))
    edges = a.join(
        b, (F.col("dst") == F.col("src") + 1) | (F.col("dst") == F.col("src") + 7)
    ).withColumn(
        "weight", ((F.col("src") * 31 + F.col("dst")) % 97 + 1).cast("double")
    )
    return nodes, edges


@q(
    "graph_sssp_weighted",
    """
    WITH RECURSIVE nodes AS (SELECT p_partkey AS id FROM part),
    edges AS (
      SELECT a.id AS src, b.id AS dst,
             CAST((a.id * 31 + b.id) % 97 + 1 AS DOUBLE) AS w
      FROM nodes a JOIN nodes b ON b.id = a.id + 1 OR b.id = a.id + 7),
    paths(id, dist, hops) AS (
      SELECT CAST(1 AS BIGINT), CAST(0 AS DOUBLE), 0
      UNION ALL
      SELECT e.dst, p.dist + e.w, p.hops + 1
      FROM paths p JOIN edges e ON e.src = p.id WHERE p.hops < 6)
    SELECT id, min(dist) AS dist FROM paths GROUP BY id
    """,
)
def graph_sssp_weighted(spark, sf_dir):
    """Weighted SSSP by synchronous Bellman-Ford (pregel.shortest_paths),
    hop-bounded at 6 rounds so it equals the oracle's bounded recursive
    CTE: after k rounds the frame holds min cost over paths of <= k edges.
    Weight sums are small-integer doubles -> exact across engines."""
    from graph_db_spark.pregel import shortest_paths

    nodes, edges = _part_chain_graph(spark, sf_dir)
    src = nodes.filter(F.col("id") == 1)
    return shortest_paths(edges, src, max_iters=6)


def _pagerank_oracle_sql(n_iters: int = 5, max_key: int = 500) -> str:
    """Unrolled fixed-iteration PageRank as a non-recursive CTE chain —
    each iteration is the same join+agg the Spark side runs. In-degree in
    the chain graph is <= 2, so every float sum has <= 2 addends and is
    order-independent -> exact double equality across engines."""
    ctes = [
        f"nodes AS (SELECT p_partkey AS id FROM part WHERE p_partkey <= {max_key})",
        "edges AS (SELECT a.id AS src, b.id AS dst FROM nodes a "
        "JOIN nodes b ON b.id = a.id + 1 OR b.id = a.id + 7)",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        "r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes)",
    ]
    for i in range(n_iters):
        ctes.append(
            f"r{i + 1} AS (SELECT n.id, (1 - 0.85) + 0.85 * coalesce(c.msum, 0) AS rank "
            f"FROM nodes n LEFT JOIN (SELECT e.dst AS id, sum(p.rank / d.deg) AS msum "
            f"FROM r{i} p JOIN edges e ON e.src = p.id JOIN deg d ON d.src = e.src "
            f"GROUP BY e.dst) c ON c.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, round(rank, 6) AS rank FROM r{n_iters}"
    )


@q("graph_pagerank", _pagerank_oracle_sql())
def graph_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank (pregel.pagerank) on the part chain graph;
    oracle = the same 5 iterations unrolled as a CTE chain. Base rank uses
    (1 - 0.85) in both engines so the IEEE value is identical."""
    from graph_db_spark.pregel import pagerank

    nodes, edges = _part_chain_graph(spark, sf_dir, max_key=500)
    ranks = pagerank(nodes, edges, n_iters=5, damping=0.85)
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def _lsh_oracle_sql(n_planes: int = 4, n_tables: int = 8, k: int = 5, n_queries: int = 5) -> str:
    """DuckDB twin of the multi-table LSH ANN pipeline: identical
    md5-parity hyperplanes per table (seed 't<t>:'), candidate = bucket
    match in ANY table (OR-amplification), exact cosine on the deduped
    candidates, windowed top-k."""
    table_ctes, cand_selects = [], []
    for t in range(n_tables):
        bits = ", ".join(
            "CASE WHEN sum(CASE WHEN ascii(substring(md5('t" + str(t) + ":" + str(p)
            + "|' || CAST(d AS VARCHAR)), 1, 1)) % 2 = 1 "
            "THEN x ELSE -x END) > 0 THEN '1' ELSE '0' END AS b" + str(p)
            for p in range(n_planes)
        )
        concat = " || ".join(f"b{p}" for p in range(n_planes))
        table_ctes.append(
            f"sig{t} AS (SELECT id, {bits} FROM pairs GROUP BY id), "
            f"bk{t} AS (SELECT id, {concat} AS bucket FROM sig{t})"
        )
        cand_selects.append(
            f"SELECT c.id AS nid, q.id AS qid FROM bk{t} c JOIN bk{t} q USING (bucket) "
            f"WHERE q.id < {n_queries} AND c.id <> q.id"
        )
    ctes = ",\n    ".join(table_ctes)
    cands = " UNION ".join(cand_selects)
    return f"""
    WITH pairs AS (
      SELECT vec_id AS id, CAST(unnest(embedding) AS DOUBLE) AS x,
             generate_subscripts(embedding, 1) - 1 AS d
      FROM embeddings),
    {ctes},
    cands AS ({cands}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    scored AS (
      SELECT cands.qid, cands.nid,
             round(list_dot_product(cn.v, qn.v) / (cn.nrm * qn.nrm), 6) AS cos
      FROM cands JOIN n cn ON cn.vec_id = cands.nid
      JOIN n qn ON qn.vec_id = cands.qid)
    SELECT qid, nid, cos, CAST(rank AS INT) AS rank FROM (
      SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      FROM scored)
    WHERE rank <= {k}
    """


@q("ann_lsh_topk", _lsh_oracle_sql())
def ann_lsh_topk(spark, sf_dir):
    """Scale-path ANN: hyperplane-LSH bucketing (operators.similarity.
    lsh_cosine_topk) so candidate generation is an equi-join on the 8-bit
    bucket signature instead of a cross product; 8 independent 4-bit
    tables OR-amplify recall. Oracle reproduces the identical planes, so even recall mismatches would be
    caught."""
    from graph_db_spark.operators.similarity import lsh_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return lsh_cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, n_planes=4, n_tables=8)


@q(
    "token_count_bpe",
    r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_word_tokens
    FROM documents
    """,
)
def token_count_bpe(spark, sf_dir):
    """BPE-ish token counting: split on letter-runs / digit-runs / single
    punctuation (the pre-tokenization most BPE vocabularies apply) plus a
    plain word count — one scan, built-in regexp (same RE semantics both
    engines)."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)).alias(
            "n_bpe_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit(r"[A-Za-z0-9]+"), 0)).alias("n_word_tokens"),
    )


@q(
    "sample_hash_documents",
    """
    SELECT doc_id, lang, n_chars FROM documents
    WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
    """,
)
def sample_hash_documents(spark, sf_dir):
    """Deterministic 1/8 corpus sample: hash-mod on the stable id — the
    replay-safe alternative to rand() sampling (same rows every run, every
    engine, any partitioning). The standard train/held-out split device
    for 100 TB corpora: no shuffle, pure scan-side filter."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1")
    ).select("doc_id", "lang", "n_chars")


@q(
    "ann_ivf_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT vec_id AS cell, v AS cv, nrm AS cnrm FROM n WHERE vec_id < 16),
    ca AS (
      SELECT vec_id AS nid, cell FROM (
        SELECT n.vec_id, cent.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n CROSS JOIN cent) WHERE r = 1),
    qa AS (
      SELECT vec_id AS qid, cell FROM (
        SELECT n.vec_id, cent.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n CROSS JOIN cent WHERE n.vec_id < 5) WHERE r <= 2),
    scored AS (
      SELECT DISTINCT qa.qid, ca.nid,
             round(list_dot_product(cn.v, qn.v) / (cn.nrm * qn.nrm), 6) AS cos
      FROM qa JOIN ca USING (cell)
      JOIN n cn ON cn.vec_id = ca.nid
      JOIN n qn ON qn.vec_id = qa.qid
      WHERE ca.nid <> qa.qid)
    SELECT qid, nid, cos, CAST(rank AS INT) AS rank FROM (
      SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed ANN (operators.similarity.ivf_cosine_topk): coarse
    quantize into 16 deterministic centroid cells, probe each query's 2
    nearest cells, exact cosine within probed cells only. The other scale
    path next to LSH; oracle reproduces the identical quantizer.
    Recall@5 = 0.92 vs brute force on the sf0.01 fixture."""
    from graph_db_spark.operators.similarity import ivf_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivf_cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5, n_centroids=16, n_probe=2)


@q(
    "graph_triangle_count",
    """
    WITH nodes AS (SELECT p_partkey AS id FROM part),
    e AS (
      SELECT a.id AS src, b.id AS dst
      FROM nodes a JOIN nodes b
        ON b.id = a.id + 1 OR b.id = a.id + 7 OR b.id = a.id + 8)
    SELECT count(*) AS n_triangles FROM e e1
    JOIN e e2 ON e2.src = e1.dst
    JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst
    """,
)
def graph_triangle_count(spark, sf_dir):
    """Distributed triangle counting: canonical (src<dst) edges, then the
    classic two-join enumeration e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c). Both joins
    are equi-joins on vertex ids — hash-partitioned and AQE-planned; at
    scale the standard degree-ordering optimization (orient edges from
    low- to high-degree) bounds the intermediate wedge count. Graph: part
    chain with +1/+7/+8 steps (1+7=8 closes two triangle families per
    node)."""
    nodes = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("id"))
    a = nodes.select(F.col("id").alias("src"))
    b = nodes.select(F.col("id").alias("dst"))
    e = a.join(
        b,
        (F.col("dst") == F.col("src") + 1)
        | (F.col("dst") == F.col("src") + 7)
        | (F.col("dst") == F.col("src") + 8),
    )
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = e1.join(e2, "b")
    tris = wedges.join(e3, ["a", "c"])
    return tris.agg(F.count(F.lit(1)).alias("n_triangles"))


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
    "embedding_dim_stats",
    """
    WITH pairs AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings)
    SELECT CAST(dim AS INT) AS dim,
           count(*) AS n,
           round(avg(x), 6) AS mean_x,
           round(min(x), 6) AS min_x,
           round(max(x), 6) AS max_x
    FROM pairs GROUP BY dim
    """,
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension corpus statistics over the embedding column (the
    normalization-fit step of a training pipeline): posexplode to
    (dim, x), one grouped agg — dims are few, so the shuffle is tiny
    regardless of corpus size (map-side partial aggs carry 64 rows per
    task)."""
    e = _t(spark, sf_dir, "embeddings")
    pairs = e.select(
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("dim", "x")
    )
    return pairs.groupBy(F.col("dim").cast("int").alias("dim")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("x"), 6).alias("mean_x"),
        F.round(F.min("x"), 6).alias("min_x"),
        F.round(F.max("x"), 6).alias("max_x"),
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


def _dedup_survivors_oracle() -> str:
    """Compose the minhash-LSH oracle with a bounded recursive closure:
    survivor = min doc id reachable in the undirected duplicate-pair graph
    (hop bound 8 >> observed cluster diameters; a larger real diameter
    would surface as an oracle mismatch against the exact Spark CC)."""
    minhash_sql = REGISTRY["dedup_minhash_lsh"].oracle
    return f"""
    WITH RECURSIVE dup AS ({minhash_sql}),
    und AS (SELECT a AS src, b AS dst FROM dup UNION SELECT b, a FROM dup),
    nodes AS (SELECT DISTINCT src AS id FROM und),
    reach(id, r, hops) AS (
      SELECT id, id, 0 FROM nodes
      UNION
      SELECT p.id, e.dst, p.hops + 1 FROM reach p JOIN und e ON e.src = p.r WHERE p.hops < 8)
    SELECT id AS doc_id, min(r) AS survivor FROM reach GROUP BY id
    """


@q("dedup_survivors_minhash", _dedup_survivors_oracle())
def dedup_survivors_minhash(spark, sf_dir):
    """Dedup resolution: cluster the MinHash near-dup pairs with
    connected components (pregel), keep min doc id per cluster as the
    canonical survivor — the step that turns pairwise similarity into an
    actionable keep/drop list. Composes two engine operators end-to-end."""
    from graph_db_spark.operators.dedup import minhash_near_dup_pairs
    from graph_db_spark.pregel import connected_components

    d = _t(spark, sf_dir, "documents")
    pairs = minhash_near_dup_pairs(
        d, "doc_id", "text", threshold=0.5,
        corpus_rows=_parquet_rows(sf_dir, "documents"),
    ).select("a", "b")
    nodes = (
        pairs.select(F.col("a").alias("id"))
        .unionByName(pairs.select(F.col("b").alias("id")))
        .distinct()
    )
    comp = connected_components(nodes, pairs.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    return comp.select(F.col("id").alias("doc_id"), F.col("component").alias("survivor"))


def _training_corpus_oracle() -> str:
    """Composed pipeline oracle: quality + language-ID + dedup-survivor
    filters stitched from the individual operators' oracle SQL."""
    qa = REGISTRY["text_quality_score"].oracle
    la = REGISTRY["text_langid"].oracle
    sv = REGISTRY["dedup_survivors_minhash"].oracle
    return f"""
    WITH qual AS ({qa}),
    lang AS ({la}),
    surv AS (SELECT * FROM ({sv})),
    kept AS (
      SELECT d.doc_id, q.quality, l.pred_lang
      FROM documents d
      JOIN qual q USING (doc_id)
      JOIN lang l USING (doc_id)
      LEFT JOIN surv s USING (doc_id)
      WHERE q.quality >= 0.5 AND (s.doc_id IS NULL OR s.survivor = d.doc_id))
    SELECT pred_lang, count(*) AS n_docs,
           round(avg(quality), 6) AS avg_quality
    FROM kept GROUP BY pred_lang
    """


@q("pipeline_training_corpus", _training_corpus_oracle())
def pipeline_training_corpus(spark, sf_dir):
    """The flagship training-data pipeline, end to end: score quality,
    identify language, resolve near-duplicate clusters to one survivor,
    keep quality >= 0.5 survivors, report the language distribution of the
    resulting corpus. Every stage is an engine operator; the oracle is the
    same pipeline stitched from each stage's SQL twin. At 100 TB each
    stage is a scan + one bounded shuffle (doc_id-keyed), and the dedup
    stage shuffles signatures, never text."""
    from graph_db_spark.operators.text import lang_id, quality_score
    from graph_db_spark.queries import dedup_survivors_minhash as _surv

    d = _t(spark, sf_dir, "documents")
    q_ = quality_score(d)
    l_ = lang_id(d)
    surv = _surv(spark, sf_dir)
    kept = (
        d.select("doc_id")
        .join(q_, "doc_id")
        .join(l_.select("doc_id", "pred_lang"), "doc_id")
        .join(surv, "doc_id", "left")
        .filter(
            (F.col("quality") >= 0.5)
            & (F.col("survivor").isNull() | (F.col("survivor") == F.col("doc_id")))
        )
    )
    return kept.groupBy("pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
    )


@q(
    "vocab_top_tokens",
    r"""
    WITH toks AS (
      SELECT lower(t.tok) AS token FROM documents,
      unnest(regexp_split_to_array(text, '\s+')) AS t(tok)
      WHERE t.tok <> '')
    SELECT token, count(*) AS freq FROM toks
    GROUP BY token
    ORDER BY freq DESC, token ASC
    LIMIT 100
    """,
)
def vocab_top_tokens(spark, sf_dir):
    """Vocabulary building: global token frequencies, top-100 with
    deterministic (freq desc, token asc) tie-break. One explode + one
    map-side-combinable count; the ORDER+LIMIT is a driver-side top-k over
    partial per-partition heaps (TakeOrderedAndProject in the plan) — no
    full sort at corpus scale."""
    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(100)
    )


@q(
    "token_pmi_pairs",
    r"""
    WITH toks AS (
      SELECT DISTINCT doc_id, lower(t.tok) AS token FROM documents,
      unnest(regexp_split_to_array(text, '\s+')) AS t(tok)
      WHERE t.tok <> ''),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    df AS (SELECT token, count(*) AS df FROM toks GROUP BY token),
    ft AS (
      SELECT t.doc_id, t.token FROM toks t JOIN df USING (token)
      WHERE df.df >= 50),
    co AS (
      SELECT a.token AS ta, b.token AS tb, count(*) AS co
      FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY a.token, b.token
      HAVING count(*) >= 50)
    SELECT ta, tb, co.co AS n_co,
           round(ln((CAST(co.co AS DOUBLE) * n.n) / (CAST(da.df AS DOUBLE) * db.df)), 6) AS pmi
    FROM co, n_docs n
    JOIN df da ON da.token = co.ta
    JOIN df db ON db.token = co.tb
    """,
)
def token_pmi_pairs(spark, sf_dir):
    """Pointwise mutual information over token co-occurrence (the classic
    collocation / phrase-mining statistic): document-level distinct
    tokens, a self-join on doc_id for co-occurrence counts, PMI from
    integer counts — the only float op is one final ln, rounded at 6dp in
    both engines.

    Scale guard: the pair join runs only over tokens with df >= support —
    a necessary condition for the final n_co >= support filter (n_co ≤
    min(dfa, dfb)), so the pruning is lossless but stops long documents'
    rare-token tails from exploding the self-join at 100 TB. The frequent
    vocabulary is small (sublinear in corpus size) → broadcast semi-join,
    no extra shuffle of the token table."""
    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("token")
    ).distinct()
    n_docs = d.select(F.countDistinct("doc_id").alias("n"))
    df_ = toks.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    frequent = df_.filter(F.col("df") >= 50).select("token")
    toks_f = toks.join(F.broadcast(frequent), "token", "left_semi")
    a = toks_f.select("doc_id", F.col("token").alias("ta"))
    b = toks_f.select("doc_id", F.col("token").alias("tb"))
    co = (
        a.join(b, "doc_id")
        .filter(F.col("ta") < F.col("tb"))
        .groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 50)
    )
    return (
        co.crossJoin(F.broadcast(n_docs))
        .join(F.broadcast(df_.select(F.col("token").alias("ta"), F.col("df").alias("dfa"))), "ta")
        .join(F.broadcast(df_.select(F.col("token").alias("tb"), F.col("df").alias("dfb"))), "tb")
        .select(
            "ta",
            "tb",
            "n_co",
            F.round(
                F.log((F.col("n_co").cast("double") * F.col("n")) / (F.col("dfa").cast("double") * F.col("dfb"))),
                6,
            ).alias("pmi"),
        )
    )


@q(
    "tfidf_top_terms",
    r"""
    WITH toks AS (
      SELECT doc_id, lower(t.tok) AS token FROM documents,
      unnest(regexp_split_to_array(text, '\s+')) AS t(tok)
      WHERE t.tok <> ''),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token),
    n_docs AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
    df AS (SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    scored AS (
      SELECT tf.doc_id, tf.token,
             round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf, n_docs n JOIN df ON df.token = tf.token)
    SELECT doc_id, token, tfidf, CAST(rnk AS INT) AS rnk FROM (
      SELECT doc_id, token, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rnk
      FROM scored)
    WHERE rnk <= 3
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """TF-IDF with the top-3 distinguishing terms per document: term
    frequencies and document frequencies are two grouped counts over the
    exploded token frame (both map-side combinable, keyed on token/doc),
    idf is broadcast, the per-doc top-k is a window with deterministic
    (score desc, token) tie-break."""
    from graph_db_spark.functions.text import ws_tokens
    from pyspark.sql import Window as W

    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = d.select(F.countDistinct("doc_id").alias("n"))
    df_ = toks.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            F.round(F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "token", "tfidf", "rnk")
    )


@q(
    "training_examples_window",
    r"""
    WITH toks AS (
      SELECT doc_id, list(lower(t.tok)) AS arr FROM (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok, 
               generate_subscripts(regexp_split_to_array(text, '\s+'), 1) AS pos
        FROM documents) AS t(doc_id, tok, pos)
      WHERE t.tok <> '' GROUP BY doc_id),
    ex AS (
      SELECT doc_id, p AS pos,
             array_to_string(arr[p:p+2], ' ') AS context,
             arr[p+3] AS target
      FROM toks, unnest(range(1, len(arr) - 2)) AS r(p))
    SELECT doc_id, CAST(pos AS INT) AS pos, context, target FROM ex
    """,
)
def training_examples_window(spark, sf_dir):
    """Next-token training-example generation: every length-4 sliding
    window of the document becomes (context of 3 tokens, target token) —
    the explode-shaped sample-construction pass of an LM data pipeline.
    Pure built-ins: one slice/transform per doc, no shuffle at all (the
    plan is scan → project → explode)."""
    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    arr = ws_tokens(F.lower(F.col("text")))
    with_arr = d.select("doc_id", arr.alias("arr")).filter(F.size("arr") >= 4)
    pos = F.sequence(F.lit(1), F.size("arr") - 3)
    return (
        with_arr.select("doc_id", "arr", F.explode(pos).alias("pos"))
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.concat_ws(" ", F.slice("arr", F.col("pos"), 3)).alias("context"),
            F.element_at("arr", F.col("pos") + 3).alias("target"),
        )
    )


@q(
    "bigram_cond_probs",
    r"""
    WITH toks AS (
      SELECT doc_id, list(lower(t.tok)) AS arr FROM (
        SELECT doc_id, unnest(regexp_split_to_array(text, '\s+')) AS tok
        FROM documents) AS t(doc_id, tok)
      WHERE t.tok <> '' GROUP BY doc_id),
    bi AS (
      SELECT arr[p] AS w1, arr[p+1] AS w2
      FROM toks, unnest(range(1, len(arr))) AS r(p)),
    uni AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
    pair AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2)
    SELECT pair.w1, pair.w2, pair.c12,
           round(CAST(pair.c12 AS DOUBLE) / uni.c1, 6) AS p_cond
    FROM pair JOIN uni ON uni.w1 = pair.w1
    WHERE pair.c12 >= 20
    """,
)
def bigram_cond_probs(spark, sf_dir):
    """Bigram language-model counts with conditional probabilities
    P(w2|w1) = c(w1,w2)/c(w1·) — the n-gram-LM statistics pass. Two
    grouped counts over one exploded bigram frame; ratio of exact integers
    rounded at 6dp."""
    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    arr = ws_tokens(F.lower(F.col("text")))
    with_arr = d.select(arr.alias("arr")).filter(F.size("arr") >= 2)
    bi = with_arr.select(F.explode(F.sequence(F.lit(1), F.size("arr") - 1)).alias("p"), "arr").select(
        F.element_at("arr", F.col("p")).alias("w1"),
        F.element_at("arr", F.col("p") + 1).alias("w2"),
    )
    uni = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    pair = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).filter(F.col("c12") >= 20)
    return pair.join(uni, "w1").select(
        "w1", "w2", "c12",
        F.round(F.col("c12").cast("double") / F.col("c1"), 6).alias("p_cond"),
    )


@q(
    "embedding_quantize_int8",
    """
    WITH pairs AS (
      SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(unnest(embedding) AS DOUBLE) AS x
      FROM embeddings),
    stats AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM pairs GROUP BY dim),
    quant AS (
      SELECT p.vec_id, p.dim,
             CAST(least(floor((p.x - s.lo) * 255.0 / (s.hi - s.lo)), 255) AS INT) AS qv
      FROM pairs p JOIN stats s USING (dim))
    SELECT vec_id,
           CAST(sum(qv) AS BIGINT) AS q_sum,
           CAST(min(qv) AS INT) AS q_min,
           CAST(max(qv) AS INT) AS q_max
    FROM quant GROUP BY vec_id
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Scalar int8 quantization of embeddings (the storage-compression
    pass before ANN indexing at scale): per-dim min/max fit (tiny
    broadcast) + floor-based bucketing — floor, not round, so the integer
    codes are bit-identical across engines. Output is per-vector code
    stats (sum/min/max) rather than 64 columns."""
    e = _t(spark, sf_dir, "embeddings")
    pairs = e.select(
        "vec_id",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias("dim", "x"),
    )
    stats = pairs.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    quant = pairs.join(F.broadcast(stats), "dim").select(
        "vec_id",
        F.least(
            F.floor((F.col("x") - F.col("lo")) * 255.0 / (F.col("hi") - F.col("lo"))),
            F.lit(255),
        )
        .cast("int")
        .alias("qv"),
    )
    return quant.groupBy("vec_id").agg(
        F.sum("qv").alias("q_sum"),
        F.min("qv").alias("q_min"),
        F.max("qv").alias("q_max"),
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
# Training-pipeline batch 4: decontamination, sequence packing, source
# mixing, and portable sketches (KMV distinct, count-min heavy hitters)
# ---------------------------------------------------------------------------


def _hex_int_sql(expr: str, n: int) -> str:
    """DuckDB twin of Spark's conv(substr(md5(x),1,n),16,10): parse the
    first *n* hex chars of *expr* into a BIGINT (n<=13 → <2^52, exact in
    the double-powered list_sum)."""
    return (
        f"CAST(list_sum(list_transform(range(0, {n}), i -> "
        f"(strpos('0123456789abcdef', substr({expr}, i + 1, 1)) - 1) "
        f"* power(16, {n} - 1 - i))) AS BIGINT)"
    )


def _hex_int(col, n: int):
    """First *n* hex chars of an md5 digest column as a long (n<=13)."""
    return F.conv(F.substring(col, 1, n), 16, 10).cast("long")


@q(
    "decontam_ngram_overlap",
    r"""
    WITH t AS (SELECT doc_id,
                      list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
               FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(tk) >= 4
                 THEN [array_to_string(tk[i+1:i+4], ' ') FOR i IN range(len(tk) - 3)]
                 ELSE [] END)) AS gram
          FROM t),
    bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0)
    SELECT g.doc_id, count(*) AS n_hits
    FROM g JOIN bench USING (gram)
    WHERE g.doc_id % 97 <> 0
    GROUP BY g.doc_id
    """,
)
def decontam_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination (the pretraining hygiene pass): flag
    corpus documents sharing any token 4-gram with a held-out benchmark
    slice (doc_id % 97 == 0 stands in for the eval set).

    100 TB shape: the benchmark n-gram set is tiny relative to the corpus
    → broadcast; corpus grams are generated by a narrow explode and only
    the (doc_id, gram) hits — not the text — reach the final groupBy.
    """
    from graph_db_spark.functions.text import shingle_array
    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    grams = d.select(
        "doc_id", F.explode(shingle_array(F.lower(F.col("text")), 4)).alias("gram")
    )
    bench = grams.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


@q(
    "pack_sequences",
    r"""
    WITH t AS (SELECT doc_id, source,
                      len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens
               FROM documents),
    s AS (SELECT doc_id, source, n_tokens,
                 CAST(coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
          FROM t)
    SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
           strt // 256 AS pack_id, strt % 256 AS pack_offset
    FROM s
    """,
)
def pack_sequences(spark, sf_dir):
    """Contiguous sequence packing (concat-then-chunk pretraining layout):
    per source, documents in doc_id order are laid head-to-tail and cut
    into fixed 256-token context windows; each doc reports its pack id and
    offset. One window cumsum per source partition — sources pack in
    parallel (the 100 TB answer to a global-order cumsum, which would
    funnel through one partition; provenance-local packing is also what a
    real mixture loader wants)."""
    from pyspark.sql import Window as W

    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    tk = d.select("doc_id", "source", F.size(ws_tokens(F.col("text"))).alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    return tk.select(
        "doc_id",
        "source",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("strt"),
    ).select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr("strt DIV 256").alias("pack_id"),
        (F.col("strt") % 256).alias("pack_offset"),
    )


@q(
    "mix_sources_weighted",
    f"""
    WITH r AS (
      SELECT doc_id, source,
             (1 + CAST(substr(source, 4) AS BIGINT) % 4) * 2500 AS rate_bp,
             {_hex_int_sql("md5(source || ':' || CAST(doc_id AS VARCHAR))", 8)} % 10000 AS gate
      FROM documents)
    SELECT doc_id, source FROM r WHERE gate < rate_bp
    """,
)
def mix_sources_weighted(spark, sf_dir):
    """Deterministic weighted source mixing (the data-mixture sampler):
    each source gets a sampling rate (25/50/75/100% by source number —
    stands in for a mixture config), and a document is kept iff a hash
    gate on (source, doc_id) lands under the rate. Pure expression — no
    RNG state, so the sample is stable across retries/replays and engines
    (the property that makes mixture reproducible at 100 TB); scan-local,
    no shuffle at all."""
    d = _t(spark, sf_dir, "documents")
    r = d.select(
        "doc_id",
        "source",
        ((F.substring("source", 4, 10).cast("long") % 4 + 1) * 2500).alias("rate_bp"),
        (
            _hex_int(F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))), 8)
            % 10000
        ).alias("gate"),
    )
    return r.filter(F.col("gate") < F.col("rate_bp")).select("doc_id", "source")


@q(
    "dsir_importance_weights",
    # Per-bucket log-ratios are rounded to 6dp and summed as DECIMALs
    # (exact multiples of 1e-6 → order-independent, cross-engine exact);
    # only the per-bucket ln and the per-doc Gumbel double-ln ride the
    # same round(ln,6) convention the PMI/TF-IDF oracles already use.
    f"""
    WITH toks AS (
      SELECT doc_id, source, t.tok AS token
      FROM (SELECT doc_id, source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents) t
      WHERE t.tok <> ''),
    bk AS (SELECT doc_id, source,
                  {_hex_int_sql("md5('dsir|' || token)", 8)} % 1024 AS bucket
           FROM toks),
    per_doc AS (SELECT doc_id, source, bucket, count(*) AS c
                FROM bk GROUP BY doc_id, source, bucket),
    raw AS (SELECT bucket, count(*) AS cq FROM bk GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS ct FROM bk WHERE source = 'src0' GROUP BY bucket),
    tot AS (SELECT count(*) AS tot_q,
                   sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS tot_t
            FROM bk),
    lam AS (
      SELECT r.bucket,
             round(ln(CAST(coalesce(g.ct, 0) + 1 AS DOUBLE) * (t.tot_q + 1024)
                      / (CAST(r.cq + 1 AS DOUBLE) * (t.tot_t + 1024))), 6) AS lam
      FROM raw r LEFT JOIN tgt g ON r.bucket = g.bucket CROSS JOIN tot t),
    w AS (
      SELECT p.doc_id, p.source,
             CAST(sum(CAST(l.lam AS DECIMAL(18,6)) * p.c) AS DOUBLE) AS dsir_weight
      FROM per_doc p JOIN lam l ON p.bucket = l.bucket
      GROUP BY p.doc_id, p.source)
    SELECT d.doc_id, d.source, coalesce(w.dsir_weight, 0.0) AS dsir_weight,
           round(coalesce(w.dsir_weight, 0.0) - ln(-ln((
             {_hex_int_sql("md5('g|' || CAST(d.doc_id AS VARCHAR))", 13)} + 0.5)
             / 4503599627370496.0)), 6) AS gumbel_key,
           coalesce(w.dsir_weight, 0.0) >= 0 AS selected
    FROM documents d LEFT JOIN w ON w.doc_id = d.doc_id
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR (Xie et al. 2023, arXiv:2302.03169): hashed-n-gram importance
    weights for target-distribution data selection. A bag-of-hashed-tokens
    unigram model is fit for the TARGET slice (source='src0') and the RAW
    corpus over 1024 md5 buckets with add-one smoothing; each document's
    weight is sum_b c_b * ln(p_target(b)/p_raw(b)). `gumbel_key` is the
    paper's Gumbel-perturbed resampling key made deterministic (uniform u
    from a 52-bit md5 hash of doc_id instead of RNG) — downstream top-k
    resampling is one orderBy/limit on it; `selected` is the row-local
    likelihood-ratio verdict (weight >= 0: the doc looks more target-like
    than raw-like).

    100 TB shape: token explode → ONE shuffle keyed (doc_id, bucket) for
    the per-doc counts; the feature models are two 1024-row aggregates
    broadcast back; weighting is map-side after the broadcast join, with
    the per-doc sum shuffling fixed-width (doc_id, decimal) rows. No
    global sort anywhere — ranking is deferred to the gumbel_key top-k.

    NOTE: this fixture's sources share one vocabulary distribution, so
    the weights hover near the smoothing-bias baseline — separation on a
    corpus with a real target signal is pinned by
    test_dsir_weights_favor_target_source's synthetic corpus."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "_is_tgt", F.col("source") == "src0"
    )
    return TX.dsir_weights(
        d, "_is_tgt", id_col="doc_id", text_col="text", keep_cols=("source",)
    )


@q(
    "sketch_kmv_distinct_tokens",
    f"""
    WITH toks AS (
      SELECT DISTINCT source, t.tok AS token
      FROM (SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents) t
      WHERE t.tok <> ''),
    h AS (SELECT source, token, {_hex_int_sql("md5(token)", 13)} AS hv FROM toks),
    rk AS (SELECT source, hv,
                  row_number() OVER (PARTITION BY source ORDER BY hv, token) AS rn
           FROM h),
    exact AS (SELECT source, count(*) AS n_exact FROM toks GROUP BY source)
    SELECT r.source,
           round((16 - 1) * 4503599627370496.0 / r.hv, 6) AS est_distinct,
           e.n_exact
    FROM rk r JOIN exact e USING (source)
    WHERE r.rn = 16
    """,
)
def sketch_kmv_distinct_tokens(spark, sf_dir):
    """KMV (bottom-k / k-minimum-values) distinct-count sketch per source,
    k=16: estimate = (k-1)·M / h_(k) with md5-derived 52-bit hashes
    (M = 2^52). The sketch state is 16 longs per group — constant-size,
    mergeable, exactly the shape a 1000-executor partial-agg wants; here
    the k-th minimum comes from one row_number window per source. The
    exact distinct count rides along to show the estimate's error. Fully
    deterministic (hash order + token tie-break), so the DuckDB twin
    produces the identical estimate."""
    from pyspark.sql import Window as W

    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("token")
    ).distinct()
    h = toks.select("source", "token", _hex_int(F.md5("token"), 13).alias("hv"))
    w = W.partitionBy("source").orderBy(F.col("hv").asc(), F.col("token").asc())
    kth = h.select("source", "hv", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") == 16
    )
    exact = toks.groupBy("source").agg(F.count(F.lit(1)).alias("n_exact"))
    return kth.join(exact, "source").select(
        "source",
        F.round(F.lit(15) * F.lit(4503599627370496.0) / F.col("hv"), 6).alias("est_distinct"),
        "n_exact",
    )


@q(
    "sketch_countmin_heavy_tokens",
    f"""
    WITH toks AS (
      SELECT t.tok AS token
      FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents) t
      WHERE t.tok <> ''),
    cnt AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    rows_ AS (SELECT unnest(range(4)) AS j),
    cells AS (
      SELECT r.j, {_hex_int_sql("md5(CAST(r.j AS VARCHAR) || '|' || c.token)", 8)} % 256 AS bucket,
             CAST(sum(c.n) AS BIGINT) AS cell_n
      FROM cnt c, rows_ r GROUP BY 1, 2),
    top AS (SELECT token, n, row_number() OVER (ORDER BY n DESC, token) AS rk FROM cnt
            QUALIFY rk <= 20)
    SELECT t.token, t.n AS n_exact, min(ce.cell_n) AS n_est
    FROM top t
    JOIN rows_ r ON true
    JOIN cells ce ON ce.j = r.j
      AND ce.bucket = {_hex_int_sql("md5(CAST(r.j AS VARCHAR) || '|' || t.token)", 8)} % 256
    GROUP BY t.token, t.n
    """,
)
def sketch_countmin_heavy_tokens(spark, sf_dir):
    """Count-min sketch (depth 4 × width 256) over token frequencies, read
    back for the exact top-20 tokens: n_est = min over rows of the
    hashed-bucket counters (always ≥ n_exact; equality when no collision).
    The sketch build is one grouped agg over (row, bucket) — 1024 cells of
    state regardless of corpus size, map-side combinable, mergeable across
    executors; md5-derived bucket hashing makes the DuckDB twin
    cell-for-cell identical."""
    from pyspark.sql import Window as W

    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    cnt = (
        d.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )

    def bucket(j_col, token_col):
        return (
            _hex_int(F.md5(F.concat(j_col.cast("string"), F.lit("|"), token_col)), 8) % 256
        )

    rows_ = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j")
    cells = (
        cnt.select("token", "n", rows_)
        .select("n", F.col("j"), bucket(F.col("j"), F.col("token")).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.sum("n").alias("cell_n"))
    )
    # top-k via TakeOrdered (distributed partial top-k per partition +
    # driver merge of 20), not a global row_number window — the vocab can
    # be 10^8+ at 100 TB and a single-partition sort would bottleneck.
    top = cnt.orderBy(F.col("n").desc(), F.col("token").asc()).limit(20)
    probes = top.select("token", "n", rows_).select(
        "token", "n", F.col("j"), bucket(F.col("j"), F.col("token")).alias("bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy(F.col("token"), F.col("n").alias("n_exact"))
        .agg(F.min("cell_n").alias("n_est"))
    )


# ---------------------------------------------------------------------------
# Training-pipeline batch 5: repetition-quality signals, LM-based document
# scoring, boilerplate n-gram detection, stratified sampling, and graph
# degree profiling
# ---------------------------------------------------------------------------


@q(
    "text_repetition_signals",
    r"""
    WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
                  FROM documents),
    tok AS (SELECT doc_id, unnest(tk) AS t FROM toks),
    n AS (SELECT doc_id, count(*) AS n_tok FROM tok GROUP BY doc_id),
    tc AS (SELECT doc_id, max(c) AS max_tok
           FROM (SELECT doc_id, t, count(*) AS c FROM tok GROUP BY doc_id, t) GROUP BY doc_id),
    bi AS (SELECT doc_id, unnest([array_to_string(tk[i+1:i+2], ' ') FOR i IN range(len(tk) - 1)]) AS g
           FROM toks WHERE len(tk) >= 2),
    bc AS (SELECT doc_id, max(c) AS max_bi
           FROM (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g) GROUP BY doc_id),
    tri AS (SELECT doc_id, unnest([array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]) AS g
            FROM toks WHERE len(tk) >= 3),
    trc AS (SELECT doc_id, count(*) AS n_tri, count(DISTINCT g) AS d_tri FROM tri GROUP BY doc_id)
    SELECT n.doc_id, CAST(n.n_tok AS BIGINT) AS n_tok,
           round(CAST(tc.max_tok AS DOUBLE) / n.n_tok, 6) AS top_token_frac,
           round(CAST(coalesce(bc.max_bi, 0) AS DOUBLE) / greatest(n.n_tok - 1, 1), 6) AS top_bigram_frac,
           round(CAST(coalesce(trc.n_tri - trc.d_tri, 0) AS DOUBLE) / greatest(coalesce(trc.n_tri, 1), 1), 6) AS dup_trigram_frac
    FROM n JOIN tc USING (doc_id) LEFT JOIN bc USING (doc_id) LEFT JOIN trc USING (doc_id)
    """,
)
def text_repetition_signals(spark, sf_dir):
    """Repetition-based quality signals (the Gopher/MassiveText repetition
    rules re-expressed per document): most-frequent-token fraction,
    most-frequent-bigram fraction of bigram slots, and duplicate-trigram
    fraction. High values flag degenerate/spammy documents before
    training.

    100 TB shape: every n-gram frame derives from one tokenized scan; all
    counts are per-doc grouped aggs (map-side combinable, shuffle keyed on
    doc_id — no cross-document state at all)."""
    from graph_db_spark.functions.text import ws_tokens

    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    tk = d.select("doc_id", ws_tokens(F.lower(F.col("text"))).alias("tk"))

    def grams(k: int):
        idx = F.sequence(F.lit(1), F.size("tk") - (k - 1))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice("tk", i, k)))

    tok = tk.select("doc_id", F.explode("tk").alias("t"))
    n = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    mt = (
        tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("max_tok"))
    )
    bc = (
        tk.filter(F.size("tk") >= 2)
        .select("doc_id", F.explode(grams(2)).alias("g"))
        .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("max_bi"))
    )
    trc = (
        tk.filter(F.size("tk") >= 3)
        .select("doc_id", F.explode(grams(3)).alias("g"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tri"), F.countDistinct("g").alias("d_tri"))
    )
    return (
        n.join(mt, "doc_id").join(bc, "doc_id", "left").join(trc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tok",
            F.round(F.col("max_tok").cast("double") / F.col("n_tok"), 6).alias("top_token_frac"),
            F.round(
                F.coalesce(F.col("max_bi"), F.lit(0)).cast("double")
                / F.greatest(F.col("n_tok") - 1, F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
            F.round(
                F.coalesce(F.col("n_tri") - F.col("d_tri"), F.lit(0)).cast("double")
                / F.greatest(F.coalesce(F.col("n_tri"), F.lit(1)), F.lit(1)),
                6,
            ).alias("dup_trigram_frac"),
        )
    )


@q(
    "doc_lm_mean_prob",
    r"""
    WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
                  FROM documents),
    bi AS (SELECT doc_id, tk[p] AS w1, tk[p+1] AS w2
           FROM toks, unnest(range(1, len(tk))) AS r(p)),
    uni AS (SELECT w1, count(*) AS c1 FROM bi GROUP BY w1),
    pair AS (SELECT w1, w2, count(*) AS c12 FROM bi GROUP BY w1, w2),
    p AS (SELECT w1, w2, CAST(round(CAST(c12 AS DOUBLE) / c1, 6) AS DECIMAL(18,6)) AS p6
          FROM pair JOIN uni USING (w1))
    SELECT bi.doc_id, count(*) AS n_bigrams,
           CAST(sum(p.p6) * 1000000 AS BIGINT) // count(*) AS mean_p_micro
    FROM bi JOIN p ON p.w1 = bi.w1 AND p.w2 = bi.w2
    GROUP BY bi.doc_id
    """,
)
def doc_lm_mean_prob(spark, sf_dir):
    """Language-model document scoring: fit a corpus-level bigram MLE model
    (P(w2|w1) = c12/c1), then score each document by the mean model
    probability of its bigrams — the cheap statistical stand-in for a
    perplexity quality filter. Probabilities are fixed-point DECIMAL(18,6)
    before the per-doc sum, and the mean is reported in integer
    micro-probability units (integer division), so every step is exact
    and order-free (logs and float rounding are deliberately avoided:
    libm/round-half behavior differs across engines at half boundaries).

    100 TB shape: everything derives from ONE (doc_id, w1, w2) grouped
    count of the exploded bigrams — the model counts (pair, then unigram
    as a rollup of pair) and the per-doc scoring both consume that
    frame's exchange, so the corpus text is read and exploded exactly
    once (ReuseExchange); the distinct-bigram model is
    vocabulary-bounded and broadcast; documents never shuffle."""
    from graph_db_spark.functions.text import ws_tokens

    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    tk = d.select("doc_id", ws_tokens(F.lower(F.col("text"))).alias("arr")).filter(
        F.size("arr") >= 2
    )
    bi = tk.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.size("arr") - 1)).alias("p"), "arr"
    ).select(
        "doc_id",
        F.element_at("arr", F.col("p")).alias("w1"),
        F.element_at("arr", F.col("p") + 1).alias("w2"),
    )
    bidoc = bi.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("nd"))
    pair = bidoc.groupBy("w1", "w2").agg(F.sum("nd").alias("c12"))
    uni = pair.groupBy("w1").agg(F.sum("c12").alias("c1"))
    p = pair.join(uni, "w1").select(
        "w1",
        "w2",
        F.round(F.col("c12").cast("double") / F.col("c1"), 6).cast("decimal(18,6)").alias("p6"),
    )
    return (
        bidoc.join(F.broadcast(p), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.sum("nd").alias("n_bigrams"),
            (F.sum(F.col("p6") * F.col("nd")) * 1_000_000).cast("long").alias("sum_p_micro"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.expr("sum_p_micro DIV n_bigrams").alias("mean_p_micro"),
        )
    )


@q(
    "boilerplate_ngrams",
    r"""
    WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk
                  FROM documents),
    g AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= 2
            THEN [array_to_string(tk[i+1:i+2], ' ') FOR i IN range(len(tk) - 1)] ELSE [] END)) AS gram
          FROM toks),
    boiler AS (SELECT gram FROM (SELECT gram, count(*) AS df FROM g GROUP BY gram)
               WHERE df >= greatest(40, (SELECT count(*) FROM documents) * 8 // 100)),
    per AS (SELECT g.doc_id, count(*) AS n_grams, count(b.gram) AS n_boiler
            FROM g LEFT JOIN boiler b USING (gram) GROUP BY g.doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams, CAST(n_boiler AS BIGINT) AS n_boiler,
           round(CAST(n_boiler AS DOUBLE) / n_grams, 6) AS boiler_frac
    FROM per
    """,
)
def boilerplate_ngrams(spark, sf_dir):
    """Boilerplate n-gram detection (the RefinedWeb/CCNet-style template
    filter): word bigrams appearing in at least 8% of the corpus's
    documents (floored at df >= 40 so tiny corpora keep a stable cut —
    at the 500-doc correctness scale the floor IS the gate, unchanged
    from earlier rounds) are deemed boilerplate; each document reports
    how much of its distinct-bigram surface is boilerplate. Downstream
    cleaning drops or down-weights high-boiler_frac docs.

    The RELATIVE threshold is the scale-correct form: an absolute df cut
    marks every common phrase "boilerplate" once the corpus outgrows it
    (the round-7 artifact: at 10x the docs, df>=40 flagged ~every bigram
    and the curated-pack pipeline emitted zero survivors), while 8%
    document frequency means the same thing at 500 docs or 500 million.

    100 TB shape: df counts are one map-side-combinable grouped agg over
    distinct per-doc grams; the corpus size comes from the parquet
    footer (driver-side, no job); the boilerplate set is small by
    construction (high-df tail) and broadcast for the per-doc
    membership count."""
    from graph_db_spark.functions.text import shingle_array

    from graph_db_spark.session import spread_small_input

    thr = max(40, _parquet_rows(sf_dir, "documents") * 8 // 100)
    d = spread_small_input(_t(spark, sf_dir, "documents"))
    g = d.select("doc_id", F.explode(shingle_array(F.lower(F.col("text")), 2)).alias("gram"))
    boiler = (
        g.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= thr)
        .select("gram", F.lit(1).alias("is_b"))
    )
    per = (
        g.join(F.broadcast(boiler), "gram", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("is_b").alias("n_boiler"))
    )
    return per.select(
        "doc_id",
        "n_grams",
        "n_boiler",
        F.round(F.col("n_boiler").cast("double") / F.col("n_grams"), 6).alias("boiler_frac"),
    )


@q(
    "sample_stratified_sources",
    """
    WITH r AS (SELECT doc_id, source, row_number() OVER (
                 PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
               FROM documents)
    SELECT doc_id, source, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5
    """,
)
def sample_stratified_sources(spark, sf_dir):
    """Stratified per-source sampling: a deterministic hash-ranked top-5
    per source — the balanced-mixture sampler that guarantees every
    stratum is represented regardless of source size (complementing the
    rate-based mix_sources_weighted). md5 ordering makes the draw
    reproducible across engines, retries, and replays.

    100 TB shape: one window per source partition; sources rank in
    parallel and only 5 rows per stratum survive."""
    d = _t(spark, sf_dir, "documents")
    w = W.partitionBy("source").orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


def _kcore_oracle(k: int, unroll: int) -> str:
    """Unrolled peeling oracle: *unroll* fixed rounds of (degree >= k)
    filtering as chained CTEs — exact iff the peel converges within
    *unroll* rounds (4 at both driver SFs for k=4/qty>=48; asserted with
    headroom by test_kcore_converges_within_oracle_unroll)."""
    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT CAST({_PART} + l_partkey AS BIGINT) AS src,"
        f" CAST({_SUPPLIER} + l_suppkey AS BIGINT) AS dst"
        " FROM lineitem WHERE l_quantity >= 48)"
    ]
    for r in range(unroll):
        ctes.append(
            f"d{r} AS MATERIALIZED (SELECT id, count(*) AS degree FROM "
            f"(SELECT src AS id FROM e{r} UNION ALL SELECT dst FROM e{r}) GROUP BY id)"
        )
        ctes.append(f"v{r} AS (SELECT id FROM d{r} WHERE degree >= {k})")
        ctes.append(
            f"e{r + 1} AS MATERIALIZED (SELECT e.src, e.dst FROM e{r} e "
            f"JOIN v{r} a ON e.src = a.id JOIN v{r} b ON e.dst = b.id)"
        )
    return (
        "WITH " + ",\n".join(ctes) + f"""
    SELECT id, CAST(count(*) AS BIGINT) AS degree
    FROM (SELECT src AS id FROM e{unroll} UNION ALL SELECT dst FROM e{unroll})
    GROUP BY id HAVING count(*) >= {k}
    """
    )


@q("graph_kcore_part_supplier", _kcore_oracle(k=4, unroll=8))
def graph_kcore_part_supplier(spark, sf_dir):
    """4-core of the part–supplier graph thinned to high-quantity
    lineitems (pregel.kcore): iterative peeling, one degree-agg + two
    semi-joins per round, converging in 4 rounds at both driver SFs.
    The thinning filter gives the bipartite graph real degree variance —
    without it every vertex clears k and the peel is vacuous."""
    from graph_db_spark.pregel import kcore

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.filter(F.col("l_quantity") >= 48)
        .select(
            (F.lit(_PART) + F.col("l_partkey").cast("long")).alias("src"),
            (F.lit(_SUPPLIER) + F.col("l_suppkey").cast("long")).alias("dst"),
        )
        .distinct()
    )
    out, _rounds = kcore(edges, k=4)
    return out


@q(
    "graph_degree_histogram",
    f"""
    WITH nodes AS (
      SELECT CAST(0 AS BIGINT) AS id, 'Root' AS kind
      UNION ALL SELECT {_REGION} + r_regionkey, 'Region' FROM region
      UNION ALL SELECT {_NATION} + n_nationkey, 'Nation' FROM nation
      UNION ALL SELECT {_CUSTOMER} + c_custkey, 'Customer' FROM customer
      UNION ALL SELECT {_SUPPLIER} + s_suppkey, 'Supplier' FROM supplier
      UNION ALL SELECT {_ORDER} + o_orderkey, 'Order' FROM orders
      UNION ALL SELECT {_PART} + p_partkey, 'Part' FROM part
    ),
    deg AS (
      SELECT CAST(0 AS BIGINT) AS id, CAST((SELECT count(*) FROM region) AS BIGINT) AS d
      UNION ALL SELECT {_REGION} + n_regionkey, count(*) FROM nation GROUP BY n_regionkey
      UNION ALL SELECT {_NATION} + nk, count(*) FROM (
        SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier) GROUP BY nk
      UNION ALL SELECT {_CUSTOMER} + o_custkey, count(*) FROM orders GROUP BY o_custkey
      UNION ALL SELECT {_ORDER} + l_orderkey, count(DISTINCT l_partkey) FROM lineitem GROUP BY l_orderkey
    )
    SELECT n.kind, CAST(coalesce(d.d, 0) AS BIGINT) AS outdeg, count(*) AS n_nodes
    FROM nodes n LEFT JOIN deg d USING (id) GROUP BY 1, 2
    """,
)
def graph_degree_histogram(spark, sf_dir):
    """Degree-distribution profiling over the graph (the getStats
    extension a capacity planner wants): out-degree histogram per vertex
    kind, zero-degree vertices included. The skew surface this exposes
    (max nation fan-out vs median) is exactly what decides salting /
    AQE-skew settings for the traversal joins at scale.

    100 TB shape: one grouped count over edges keyed by src, one left
    join against the (id, kind) vertex projection, one final tiny agg."""
    g = tpch_graph(spark, sf_dir)
    deg = g.edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("d"))
    return (
        g.vertices.select("id", "kind")
        .join(deg, "id", "left")
        .groupBy("kind", F.coalesce(F.col("d"), F.lit(0)).cast("long").alias("outdeg"))
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def _simhash_banded_oracle(n_bits: int, bands: int, max_hamming: int) -> str:
    """DuckDB twin of simhash_bits + simhash_near_dup_pairs at any
    (n_bits, bands, max_hamming): bit j = parity of hex char (j mod 32)
    of md5 chunk j div 32 (chunk 0 = md5(token), chunk c = md5(token ||
    '|' || c)) — the exact chunked-md5 arithmetic the Spark operator
    computes."""
    width = n_bits // bands
    return rf"""
    WITH t AS (SELECT doc_id AS id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
               FROM documents),
    tok AS (SELECT id, unnest(list_distinct(CASE WHEN len(tk) >= 3
              THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)] ELSE [] END)) AS token
            FROM t),
    b AS (SELECT id, j, sum(CASE WHEN ascii(substr(
               CASE WHEN j // 32 = 0 THEN md5(token)
                    ELSE md5(token || '|' || CAST(j // 32 AS VARCHAR)) END,
               (j % 32) + 1, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS s
          FROM tok, (SELECT unnest(range({n_bits})) AS j) GROUP BY id, j),
    sh AS (SELECT id, string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
           FROM b GROUP BY id),
    bands AS (SELECT id, k, substr(simhash, k*{width} + 1, {width}) AS bucket
              FROM sh, (SELECT unnest(range({bands})) AS k)),
    cand AS (SELECT DISTINCT x.id AS a, y.id AS b
             FROM bands x JOIN bands y ON x.k = y.k AND x.bucket = y.bucket AND x.id < y.id),
    ham AS (SELECT c.a, c.b,
              CAST(list_sum([CASE WHEN substr(sa.simhash, i+1, 1) <> substr(sb.simhash, i+1, 1)
                             THEN 1 ELSE 0 END FOR i IN range({n_bits})]) AS INT) AS hd
            FROM cand c JOIN sh sa ON sa.id = c.a JOIN sh sb ON sb.id = c.b)
    SELECT a, b, hd FROM ham WHERE hd <= {max_hamming}
    """


@q("dedup_simhash_banded", _simhash_banded_oracle(32, 4, 3))
def dedup_simhash_banded(spark, sf_dir):
    """SimHash near-dup detection with the banded scale path: 32-bit
    shingle-SimHash signatures, band-bucket candidate generation (4×8-bit
    slices — exact recall for Hamming <= 3 by pigeonhole), full Hamming
    verify on candidates only. The SimHash complement to
    dedup_minhash_lsh: one signature pass, one signature-only equi-join,
    no cross product (shingle signatures, because unigram SimHash over a
    shared vocabulary collapses — every doc looks like every other).

    NOTE (round 12): 8-bit buckets are a FIXTURE-SCALE setting — the
    candidate set carries an n²·bands/2^(width+1) collision term
    (measured 16× wall for 10× docs at 50k). Production corpora use
    ``dedup_simhash_banded_wide`` (64-bit signatures, 16-bit buckets,
    same recall pigeonhole); this query stays registered as the
    measured contrast and oracle-continuity baseline."""
    d = _t(spark, sf_dir, "documents")
    sigs = D.simhash_bits(D.shingles(d, "doc_id", "text", 3), n_bits=32)
    return D.simhash_near_dup_pairs(sigs, n_bits=32, bands=4, max_hamming=3)


@q("dedup_simhash_banded_wide", _simhash_banded_oracle(64, 4, 3))
def dedup_simhash_banded_wide(spark, sf_dir):
    """The corpus-scale SimHash banding: 64-bit signatures, 4×16-bit
    band buckets (same chunked-md5 bit rule and same exact-recall
    pigeonhole as the 32-bit form). The round-12 stage profile of
    pipeline_curated_pack measured the 8-bit buckets' n²/2^(width+1)
    collision term at 14× wall for 10× docs (50k→500k synthetic corpus);
    16-bit buckets keep the candidate set — and the stage — linear to
    ~10M docs, and the width knob extends the same plan to billions
    (operators/dedup.simhash_near_dup_pairs SCALE RULE)."""
    d = _t(spark, sf_dir, "documents")
    sigs = D.simhash_bits(D.shingles(d, "doc_id", "text", 3), n_bits=64)
    return D.simhash_near_dup_pairs(sigs, n_bits=64, bands=4, max_hamming=3)


@q(
    "graph_part_popularity",
    f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    agg AS (
      SELECT op.l_partkey AS part_key,
             count(*) AS n_orders,
             count(DISTINCT o.o_custkey) AS n_customers
      FROM op JOIN orders o ON o.o_orderkey = op.l_orderkey
      GROUP BY op.l_partkey)
    SELECT CAST({_PART} + part_key AS BIGINT) AS id, n_orders, n_customers
    FROM (SELECT *, row_number() OVER (ORDER BY n_orders DESC, part_key) AS rk FROM agg)
    WHERE rk <= 20
    """,
)
def graph_part_popularity(spark, sf_dir):
    """Hub analysis over the graph: top-20 part nodes by in-degree
    (n_orders) with 2-hop distinct-customer reach — the aggregate
    traversal (reverse edges → sources → their sources) that complements
    point traversals. Runs on the graph's edge frames, not the base
    tables.

    100 TB shape: in-degree is one grouped count on edges keyed by dst;
    the reach join walks order→customer edges (fixed-width ids only);
    top-20 is TakeOrdered, never a global sort."""
    g = tpch_graph(spark, sf_dir)
    parts = F.col("dst") >= _PART
    order_part = g.edges.filter(parts)  # order -> part
    cust_order = g.edges.filter(
        (F.col("dst") >= _ORDER) & (F.col("dst") < _PART)
    )  # customer -> order
    reach = (
        order_part.select(F.col("src").alias("order_id"), F.col("dst").alias("id"))
        .join(
            cust_order.select(
                F.col("src").alias("cust_id"), F.col("dst").alias("order_id")
            ),
            "order_id",
        )
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("cust_id").alias("n_customers"),
        )
    )
    return (
        reach.orderBy(F.col("n_orders").desc(), F.col("id").asc())
        .limit(20)
        .select("id", "n_orders", "n_customers")
    )


@q(
    "source_token_drift",
    r"""
    WITH tok AS (SELECT source, t AS token FROM (
        SELECT source, unnest(string_split_regex(lower(text), '\s+')) AS t FROM documents)
        WHERE t <> ''),
    corpus AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM corpus),
    per AS (SELECT source, token, count(*) AS ns FROM tok GROUP BY source, token),
    stot AS (SELECT source, CAST(sum(ns) AS BIGINT) AS ns_total FROM per GROUP BY source),
    grid AS (SELECT s.source, c.token, c.n, coalesce(p.ns, 0) AS ns
             FROM (SELECT DISTINCT source FROM tok) s
             CROSS JOIN corpus c
             LEFT JOIN per p ON p.source = s.source AND p.token = c.token)
    SELECT g.source,
           CAST(sum(abs((g.ns * 1000000) // st.ns_total - (g.n * 1000000) // t.n_total)) AS BIGINT) AS l1_micro
    FROM grid g JOIN stot st USING (source) CROSS JOIN tot t
    GROUP BY g.source
    """,
)
def source_token_drift(spark, sf_dir):
    """Distribution-shift detection per source: L1 distance between each
    source's token distribution and the corpus distribution, in exact
    integer micro-probability units (floor division — no float summation,
    so the metric is engine- and order-exact). The monitoring pass that
    flags a source whose content drifted from the mixture it was sampled
    for.

    100 TB shape: two grouped counts (map-side combinable); the
    (source × vocabulary) evaluation grid is vocabulary-bounded — sources
    are a tiny broadcast side against the corpus vocab frame, and no
    document text ever reaches the join."""
    from graph_db_spark.functions.text import ws_tokens

    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    tok = d.select("source", F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
    # Everything rolls up from the one (source, token) count, so the
    # corpus is read and exploded exactly once (ReuseExchange on per's
    # shuffle) — corpus counts, totals, and the source list are all
    # aggregates of `per`.
    per = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("ns"))
    corpus = per.groupBy("token").agg(F.sum("ns").alias("n"))
    stot = per.groupBy("source").agg(F.sum("ns").alias("ns_total"))
    n_total = corpus.agg(F.sum("n").alias("n_total"))
    sources = stot.select("source")
    grid = (
        sources.crossJoin(corpus)
        .join(per, ["source", "token"], "left")
        .withColumn("ns", F.coalesce(F.col("ns"), F.lit(0)))
    )
    return (
        grid.join(F.broadcast(stot), "source")
        .crossJoin(F.broadcast(n_total))
        .groupBy("source")
        .agg(
            F.sum(
                F.abs(
                    F.expr("(ns * 1000000) DIV ns_total")
                    - F.expr("(n * 1000000) DIV n_total")
                )
            ).alias("l1_micro")
        )
    )


@q(
    "bpe_merge_pair_counts",
    r"""
    WITH tok AS (SELECT t AS token FROM (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS t FROM documents) WHERE t <> ''),
    wc AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
    pairs AS (SELECT substr(token, i+1, 2) AS pair, CAST(sum(n) AS BIGINT) AS n_pair
              FROM wc, unnest(range(len(token) - 1)) AS r(i)
              GROUP BY pair)
    SELECT pair, n_pair FROM (
      SELECT *, row_number() OVER (ORDER BY n_pair DESC, pair) AS rk FROM pairs)
    WHERE rk <= 20
    """,
)
def bpe_merge_pair_counts(spark, sf_dir):
    """The BPE tokenizer-fit kernel: corpus-wide adjacent-symbol pair
    counts (the statistic behind each BPE merge step), computed over the
    word-frequency table rather than raw tokens — the standard
    train-a-tokenizer-at-scale trick (vocabulary-sized input, corpus
    occurrence counts carried as weights). Top-20 pairs by count.

    100 TB shape: the word-frequency table is one map-side-combinable
    count; pair explosion runs over vocabulary (bounded), not the
    corpus; top-k is TakeOrdered."""
    from graph_db_spark.functions.text import ws_tokens

    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    wc = (
        d.select(F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        wc.filter(F.length("token") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length("token") - 1),
                    lambda i: F.substring("token", i, F.lit(2)),
                )
            ).alias("pair"),
            "n",
        )
        .groupBy("pair")
        .agg(F.sum("n").alias("n_pair"))
    )
    return pairs.orderBy(F.col("n_pair").desc(), F.col("pair").asc()).limit(20)


@q(
    "ann_int8_topk",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    pairs AS (SELECT vec_id, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM e),
    stats AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM pairs GROUP BY dim),
    q AS (SELECT p.vec_id, p.dim,
                 CAST(least(floor((p.x - s.lo) * 255.0 / (s.hi - s.lo)), 255) AS BIGINT) AS qv
          FROM pairs p JOIN stats s USING (dim)),
    d AS (SELECT qa.vec_id AS qid, qb.vec_id AS nid,
                 CAST(sum((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS BIGINT) AS dist2
          FROM q qa JOIN q qb ON qa.dim = qb.dim AND qb.vec_id <> qa.vec_id
          WHERE qa.vec_id < 5
          GROUP BY qid, nid)
    SELECT qid, nid, dist2 FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY dist2, nid) AS rk FROM d)
    WHERE rk <= 5
    """,
)
def ann_int8_topk(spark, sf_dir):
    """Quantized-domain ANN: per-dim int8 codes (the embedding_quantize
    fit) and exact integer squared-L2 distances over the codes — the
    memory-bandwidth scale path (4× smaller vectors than float32, and
    every distance is a BIGINT, so ordering is engine-exact with no
    float-sum ambiguity). Top-5 per query vector, nid tie-break.

    100 TB shape: the per-dim fit is one grouped agg broadcast back as
    two 64-long arrays; codes are built scan-side (no explode shuffle);
    the 5 query code-arrays broadcast; the distance kernel is a codegen'd
    zip_with/aggregate over the corpus scan."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    pairs = e.select("vec_id", F.posexplode("v").alias("dim", "x"))
    stats = pairs.groupBy("dim").agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    stats_row = stats.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "lo"))), lambda s: s["lo"]
        ).alias("lo_arr"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "hi"))), lambda s: s["hi"]
        ).alias("hi_arr"),
    )
    code = F.expr(
        "transform(v, (x, i) -> CAST(least(floor((x - lo_arr[i]) * 255.0 / (hi_arr[i] - lo_arr[i])), 255) AS BIGINT))"
    )
    coded = e.crossJoin(F.broadcast(stats_row)).select("vec_id", code.alias("qv"))
    qs = coded.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("qv").alias("qv_q")
    )
    d = (
        coded.crossJoin(F.broadcast(qs))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            F.col("vec_id").alias("nid"),
            F.aggregate(
                F.zip_with("qv_q", "qv", lambda a, b: (a - b) * (a - b)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dist2"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("dist2").asc(), F.col("nid").asc())
    return d.select("qid", "nid", "dist2", F.row_number().over(w).alias("rk")).filter(
        F.col("rk") <= 5
    ).select("qid", "nid", "dist2")


def _curated_pack_oracle() -> str:
    """Curated-corpus pipeline oracle: repetition + boilerplate +
    decontamination + SimHash-dedup gates stitched from the stage
    oracles, survivors packed per source (pack_sequences layout)."""
    rep = REGISTRY["text_repetition_signals"].oracle
    bo = REGISTRY["boilerplate_ngrams"].oracle
    de = REGISTRY["decontam_ngram_overlap"].oracle
    # 64-bit/16-bit-bucket SimHash stage (round-12): the 8-bit-bucket
    # form's n²/2^(width+1) collision term was the pipeline's one
    # super-linear stage at the 500k-doc stress
    du = REGISTRY["dedup_simhash_banded_wide"].oracle
    return f"""
    WITH rep AS ({rep}),
    bo AS ({bo}),
    dec AS ({de}),
    dup AS ({du}),
    kept AS (
      SELECT d.doc_id, d.source, r.n_tok
      FROM documents d
      JOIN rep r USING (doc_id)
      JOIN bo b USING (doc_id)
      LEFT JOIN (SELECT DISTINCT doc_id, 1 AS hit FROM dec) h USING (doc_id)
      LEFT JOIN (SELECT DISTINCT dup.b AS doc_id, 1 AS isdup FROM dup) x USING (doc_id)
      WHERE d.doc_id % 97 <> 0
        AND r.top_token_frac <= 0.18
        AND b.boiler_frac <= 0.10
        AND h.hit IS NULL AND x.isdup IS NULL),
    s AS (SELECT doc_id, source, n_tok,
                 CAST(coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS strt
          FROM kept)
    SELECT doc_id, source, CAST(n_tok AS BIGINT) AS n_tokens,
           strt // 256 AS pack_id, strt % 256 AS pack_offset
    FROM s
    """


@q("pipeline_curated_pack", _curated_pack_oracle())
def pipeline_curated_pack(spark, sf_dir):
    """The curated-corpus pipeline end-to-end, v2 of the composed story:
    repetition-quality gate + boilerplate gate + benchmark
    decontamination + SimHash near-dup removal (keep the lower doc_id of
    each close pair), then contiguous per-source sequence packing of the
    survivors — i.e. the full shape of a pretraining data build: clean →
    decontaminate → dedup → lay out context windows.

    100 TB shape: each gate is the already-audited stage plan (grouped
    aggs + broadcast joins of small flag sets); the pack step is one
    window cumsum per source partition. The decontam-hit and dup-loser
    sets are small by construction and broadcast."""
    rep = text_repetition_signals(spark, sf_dir).select(
        "doc_id", "n_tok", "top_token_frac"
    )
    bo = boilerplate_ngrams(spark, sf_dir).select("doc_id", "boiler_frac")
    dec = (
        decontam_ngram_overlap(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    dup = (
        dedup_simhash_banded_wide(spark, sf_dir)
        .select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("isdup", F.lit(1))
    )
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    kept = (
        d.join(rep, "doc_id")
        .join(bo, "doc_id")
        .join(F.broadcast(dec), "doc_id", "left")
        .join(F.broadcast(dup), "doc_id", "left")
        .filter(
            (F.col("doc_id") % 97 != 0)
            & (F.col("top_token_frac") <= 0.18)
            & (F.col("boiler_frac") <= 0.10)
            & F.col("hit").isNull()
            & F.col("isdup").isNull()
        )
        .select("doc_id", "source", "n_tok")
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    return (
        kept.select(
            "doc_id",
            "source",
            F.col("n_tok").alias("n_tokens"),
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("strt"),
        )
        .select(
            "doc_id",
            "source",
            "n_tokens",
            F.expr("strt DIV 256").alias("pack_id"),
            (F.col("strt") % 256).alias("pack_offset"),
        )
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
# Round 3 — graph analytics breadth: communities, seeded ranking, link
# prediction (Pregel suite extensions; GraphX-parity analytics on the
# TPC-H-derived graphs)
# ---------------------------------------------------------------------------


def _lpa_oracle(n_iters: int = 4) -> str:
    """Unrolled synchronous label propagation: each iteration is the same
    (join → neighbor-label count → deterministic argmax → left-join
    update) the Spark side runs; ties break (count DESC, label ASC), so
    every step is integer-exact and order-independent."""
    ctes = [
        f"e0 AS MATERIALIZED (SELECT DISTINCT CAST({_PART} + l_partkey AS BIGINT) AS src,"
        f" CAST({_SUPPLIER} + l_suppkey AS BIGINT) AS dst"
        " FROM lineitem WHERE l_quantity >= 48)",
        "e AS MATERIALIZED (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0)",
        "l0 AS (SELECT DISTINCT src AS id, src AS label FROM e)",
    ]
    for i in range(n_iters):
        ctes.append(
            f"n{i} AS MATERIALIZED (SELECT e.dst AS id, l.label, count(*) AS cnt"
            f" FROM e JOIN l{i} l ON l.id = e.src GROUP BY e.dst, l.label)"
        )
        ctes.append(
            f"b{i} AS (SELECT id, label FROM (SELECT id, label,"
            f" row_number() OVER (PARTITION BY id ORDER BY cnt DESC, label) AS rk"
            f" FROM n{i}) WHERE rk = 1)"
        )
        ctes.append(
            f"l{i + 1} AS (SELECT v.id, coalesce(b.label, v.label) AS label"
            f" FROM l{i} v LEFT JOIN b{i} b USING (id))"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{n_iters}"


@q("graph_label_propagation", _lpa_oracle(n_iters=4))
def graph_label_propagation(spark, sf_dir):
    """Community detection by synchronous label propagation
    (pregel.label_propagation) on the high-quantity part–supplier
    bipartite graph — 4 fixed rounds, deterministic (count DESC, label
    ASC) tie-break; the oracle unrolls the identical rounds as CTEs.

    100 TB shape: each round is one edge⋈label join + one map-side-
    combinable (id,label) count + one argmax-by-struct agg — no windows,
    no driver data, lineage truncated per round."""
    from graph_db_spark.pregel import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    edges = (
        li.filter(F.col("l_quantity") >= 48)
        .select(
            (F.lit(_PART) + F.col("l_partkey").cast("long")).alias("src"),
            (F.lit(_SUPPLIER) + F.col("l_suppkey").cast("long")).alias("dst"),
        )
        .distinct()
    )
    return label_propagation(edges, n_iters=4)


def _ppr_oracle_sql(n_iters: int = 5, max_key: int = 500, seed: int = 1) -> str:
    """Unrolled personalized PageRank (teleport to a single seed) on the
    part chain graph — in-degree <= 2, so every float sum has <= 2
    addends and is order-independent -> exact double equality."""
    ctes = [
        f"nodes AS (SELECT p_partkey AS id FROM part WHERE p_partkey <= {max_key})",
        "edges AS (SELECT a.id AS src, b.id AS dst FROM nodes a "
        "JOIN nodes b ON b.id = a.id + 1 OR b.id = a.id + 7)",
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        f"base AS (SELECT id, CASE WHEN id = {seed} THEN CAST(1.0 AS DOUBLE)"
        f" ELSE CAST(0.0 AS DOUBLE) END AS b FROM nodes)",
        "r0 AS (SELECT id, b AS rank FROM base)",
    ]
    for i in range(n_iters):
        ctes.append(
            f"r{i + 1} AS (SELECT n.id, (1 - 0.85) * n.b + 0.85 * coalesce(c.msum, 0) AS rank "
            f"FROM base n LEFT JOIN (SELECT e.dst AS id, sum(p.rank / d.deg) AS msum "
            f"FROM r{i} p JOIN edges e ON e.src = p.id JOIN deg d ON d.src = e.src "
            f"GROUP BY e.dst) c ON c.id = n.id)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, round(rank, 9) AS rank FROM r{n_iters} WHERE rank > 0"
    )


@q("graph_personalized_ppr", _ppr_oracle_sql())
def graph_personalized_ppr(spark, sf_dir):
    """Personalized PageRank (pregel.personalized_pagerank) seeded at
    part 1 on the part chain graph: rank mass decays outward from the
    seed — the related-items/recommendation primitive. Oracle = the same
    5 rounds unrolled; only reached vertices (rank > 0) are emitted so
    the result is the seed's neighborhood, not the whole vertex set."""
    from graph_db_spark.pregel import personalized_pagerank

    nodes, edges = _part_chain_graph(spark, sf_dir, max_key=500)
    seeds = nodes.filter(F.col("id") == 1)
    ranks = personalized_pagerank(nodes, edges, seeds, n_iters=5, damping=0.85)
    return ranks.filter(F.col("rank") > 0).select("id", F.round("rank", 9).alias("rank"))


@q(
    "graph_jaccard_link_prediction",
    f"""
    WITH e AS (SELECT DISTINCT CAST(l_partkey AS BIGINT) AS p, l_suppkey AS s
               FROM lineitem WHERE l_quantity >= 48),
    deg AS (SELECT p, count(*) AS d FROM e GROUP BY p),
    com AS (SELECT a.p AS part_a, b.p AS part_b, count(*) AS common
            FROM e a JOIN e b ON a.s = b.s AND a.p < b.p
            GROUP BY a.p, b.p)
    SELECT part_a, part_b, CAST(common AS BIGINT) AS common,
           round(common * 1.0 / (da.d + db.d - common), 6) AS jaccard
    FROM com JOIN deg da ON da.p = part_a JOIN deg db ON db.p = part_b
    WHERE common >= 2
    """,
)
def graph_jaccard_link_prediction(spark, sf_dir):
    """Neighborhood-Jaccard link prediction: for part pairs sharing >= 2
    suppliers in the high-quantity graph, |N(a)∩N(b)| / |N(a)∪N(b)| —
    the classic common-neighbors score for 'parts that should be
    co-sourced'. Counts are integer-exact; the single float division is
    rounded identically in both engines.

    100 TB shape: pair generation groups by the SHARED neighbor (one
    shuffle on supplier), so cost is Σ deg(s)² over suppliers — the
    standard hub risk; at scale hub suppliers get capped/salted before
    pairing (same policy the PMI query applies to stopword tokens), which
    the l_quantity >= 48 thinning stands in for here."""
    li = _t(spark, sf_dir, "lineitem")
    e = (
        li.filter(F.col("l_quantity") >= 48)
        .select(F.col("l_partkey").cast("long").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg = e.groupBy("p").agg(F.count(F.lit(1)).alias("d"))
    a = e.select(F.col("p").alias("part_a"), "s")
    b = e.select(F.col("p").alias("part_b"), "s")
    com = (
        a.join(b, "s")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("common"))
        .filter(F.col("common") >= 2)
    )
    da = deg.select(F.col("p").alias("part_a"), F.col("d").alias("da"))
    db = deg.select(F.col("p").alias("part_b"), F.col("d").alias("db"))
    return (
        com.join(da, "part_a")
        .join(db, "part_b")
        .select(
            "part_a",
            "part_b",
            "common",
            F.round(F.col("common") / (F.col("da") + F.col("db") - F.col("common")), 6).alias(
                "jaccard"
            ),
        )
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


def _hits_oracle_sql(n_iters: int = 2, max_key: int = 500) -> str:
    """Unrolled HITS (hubs & authorities) on the bounded-degree chain
    graph (same synthetic graph as the PageRank twin: out-edges id+1 and
    id+7, so in/out degree <= 2 and every float sum has <= 2 addends —
    order-independent, exact across engines). Unnormalized mutual
    recursion: h_{k}(u) = sum a_{k-1}(v) over out-edges, then
    a_{k}(v) = sum h_{k}(u) over in-edges; 2 rounds keeps magnitudes
    integral-exact in double."""
    ctes = [
        f"nodes AS (SELECT p_partkey AS id FROM part WHERE p_partkey <= {max_key})",
        "edges AS (SELECT a.id AS src, b.id AS dst FROM nodes a "
        "JOIN nodes b ON b.id = a.id + 1 OR b.id = a.id + 7)",
        "h0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS h FROM nodes)",
        "a0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS a FROM nodes)",
    ]
    for i in range(n_iters):
        ctes.append(
            f"h{i + 1} AS (SELECT n.id, coalesce(s.v, 0) AS h FROM nodes n "
            f"LEFT JOIN (SELECT e.src AS id, sum(x.a) AS v FROM a{i} x "
            f"JOIN edges e ON e.dst = x.id GROUP BY e.src) s ON s.id = n.id)"
        )
        ctes.append(
            f"a{i + 1} AS (SELECT n.id, coalesce(s.v, 0) AS a FROM nodes n "
            f"LEFT JOIN (SELECT e.dst AS id, sum(x.h) AS v FROM h{i + 1} x "
            f"JOIN edges e ON e.src = x.id GROUP BY e.dst) s ON s.id = n.id)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT h{n_iters}.id, round(h{n_iters}.h, 6) AS hub,"
        f" round(a{n_iters}.a, 6) AS authority"
        f" FROM h{n_iters} JOIN a{n_iters} ON a{n_iters}.id = h{n_iters}.id"
    )


@q("graph_hits_hubs_authorities", _hits_oracle_sql())
def graph_hits_hubs_authorities(spark, sf_dir, n_iters: int = 2, max_key: int = 500):
    """HITS hubs/authorities — the mutually-recursive eigenvector pair,
    unrolled to fixed iterations exactly like the PageRank twin. Each
    half-step is one edge join + one map-side-combinable sum keyed on a
    node id.

    100 TB shape: per iteration two shuffles (src-keyed, dst-keyed) of
    (id, double) pairs only; the edge list partitioning is reusable
    across iterations; lineage stays flat because each step derives from
    the previous materialized frame (no loop-carried plan growth needed
    at 2 iterations)."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= max_key)
    nodes = p.select(F.col("p_partkey").alias("id"))
    b = nodes.select(F.col("id").alias("dst"))
    edges = (
        nodes.select(F.col("id").alias("src"))
        .join(b, (F.col("dst") == F.col("src") + 1) | (F.col("dst") == F.col("src") + 7))
    )
    h = nodes.select("id", F.lit(1.0).alias("h"))
    a = nodes.select("id", F.lit(1.0).alias("a"))
    for _ in range(n_iters):
        h = (
            nodes.join(
                edges.join(a.withColumnRenamed("id", "dst"), "dst")
                .groupBy("src")
                .agg(F.sum("a").alias("v"))
                .withColumnRenamed("src", "id"),
                "id",
                "left",
            )
            .select("id", F.coalesce("v", F.lit(0.0)).alias("h"))
        )
        a = (
            nodes.join(
                edges.join(h.withColumnRenamed("id", "src"), "src")
                .groupBy("dst")
                .agg(F.sum("h").alias("v"))
                .withColumnRenamed("dst", "id"),
                "id",
                "left",
            )
            .select("id", F.coalesce("v", F.lit(0.0)).alias("a"))
        )
    return h.join(a, "id").select(
        "id",
        F.round("h", 6).alias("hub"),
        F.round("a", 6).alias("authority"),
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


@q(
    "dedup_minhash_signature_groups",
    r"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents),
    sh AS (
      SELECT doc_id,
             CASE WHEN len(tk) >= 3
                  THEN list_distinct([array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)])
                  ELSE NULL END AS s
      FROM toks),
    sig AS (
      SELECT doc_id,
             list_min(list_transform(s, t -> md5('0|' || t))) || '|' ||
             list_min(list_transform(s, t -> md5('1|' || t))) || '|' ||
             list_min(list_transform(s, t -> md5('2|' || t))) || '|' ||
             list_min(list_transform(s, t -> md5('3|' || t))) || '|' ||
             list_min(list_transform(s, t -> md5('4|' || t))) || '|' ||
             list_min(list_transform(s, t -> md5('5|' || t))) || '|' ||
             list_min(list_transform(s, t -> md5('6|' || t))) || '|' ||
             list_min(list_transform(s, t -> md5('7|' || t))) AS sig
      FROM sh WHERE s IS NOT NULL)
    SELECT sig, min(doc_id) AS kept_id, CAST(count(*) AS BIGINT) AS n_members
    FROM sig GROUP BY sig
    """,
)
def dedup_minhash_signature_groups(spark, sf_dir):
    """MinHash signature dedup groups: (sig, kept_id, n_members) — the
    batch twin of the streaming near-dup suppressor
    (streaming.apply.stream_dedup_near). Signature equality is the
    high-precision near-dup tier: all 8 minima agree ⇒ shingle-set
    Jaccard ≈ 1.

    Computed via the explode + map-side-combinable MIN-agg form
    (whole-stage codegen); the stream instead uses the ROW-LOCAL fold
    (operators.dedup.row_minhash_signature — required inside a streaming
    projection, interpreted HOF eval so ~4× the batch cost), and
    test_stream_dedup_near_and_rowlocal_signature pins the two forms
    bit-identical, so this oracle certifies both.

    100 TB shape: shuffles carry (doc_id, token-hash) then (sig 263 B,
    doc_id) — never text; both aggs map-side combinable; short docs (no
    shingles) are excluded here and pass through unsuppressed in the
    stream."""
    d = _t(spark, sf_dir, "documents")
    tok = D.shingles(d, "doc_id", "text", 3)
    sigs = D.minhash_signatures(tok, 8)
    return (
        sigs.select(
            F.col("id").alias("doc_id"),
            F.concat_ws("|", *[F.col(f"h{i}") for i in range(8)]).alias("sig"),
        )
        .groupBy("sig")
        .agg(F.min("doc_id").alias("kept_id"), F.count(F.lit(1)).alias("n_members"))
    )


# Fixed BPE rule list for the oracle-checkable expression-path encode:
# chained multi-char merges (t+a → ta → tab → table; v+a → va → val;
# r+o → row) over the fixture's vocabulary.
_BPE_RULES = [
    ("t", "a"), ("ta", "b"), ("l", "e"), ("tab", "le"),
    ("v", "a"), ("va", "l"), ("r", "o"), ("ro", "w"),
]


def _bpe_oracle_sql(rules) -> str:
    """DuckDB twin of operators.bpe.encode_word_expr: each merge rule is
    one list_reduce fold over singleton-wrapped symbols — the same
    left-to-right non-overlapping semantics as the Spark aggregate."""
    expr = "list_transform(range(len(w)), i -> w[i+1:i+1])"
    for a, b in rules:
        expr = (
            f"(CASE WHEN len({expr}) <= 1 THEN {expr} ELSE "
            f"list_reduce(list_transform({expr}, s -> [s]), (x, y) -> "
            f"CASE WHEN x[-1] = '{a}' AND y[1] = '{b}' "
            f"THEN list_append(x[1:len(x)-1], '{a}{b}') "
            f"ELSE list_append(x, y[1]) END) END)"
        )
    return rf"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS words
      FROM documents)
    SELECT doc_id,
           array_to_string(list_transform(words, w ->
             array_to_string({expr}, '_')), ' ') AS encoded
    FROM docs
    """


@q("bpe_encode_fixed_rules", _bpe_oracle_sql(_BPE_RULES))
def bpe_encode_fixed_rules(spark, sf_dir):
    """BPE tokenizer APPLY, expression path: the 8 fixed merge rules
    unrolled into chained aggregate folds (operators.bpe.bpe_encode_expr)
    — whole-stage codegen, zero UDFs, and the DuckDB oracle reproduces
    every fold via list_reduce, certifying the merge semantics
    (left-to-right, non-overlapping, rank order) bit-for-bit.

    The scale path for real vocabularies (10k+ merges) is the
    Arrow-batched operators.bpe.bpe_encode UDF, tested equal to this
    expression form; fitting is operators.bpe.fit_bpe (distributed
    merge loop over the word-frequency table).

    100 TB shape: encode the word VOCABULARY once (folds run over the
    distinct-word table — Zipf-bounded, not corpus-sized) and broadcast
    the mapping back onto exploded (doc, pos, word) triples; re-assembly
    is one map-side-combinable sorted-collect per doc. Direct per-row
    encoding (bpe_encode_expr, kept for single-doc use and the
    path-equality test) re-folds every word OCCURRENCE — measured 7×
    slower at bench scale."""
    from graph_db_spark.functions.text import ws_tokens
    from graph_db_spark.operators.bpe import encode_word_expr

    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.posexplode_outer(ws_tokens(F.lower(F.col("text")))).alias("pos", "w"),
    )
    vocab = (
        words.select("w")
        .filter(F.col("w").isNotNull())
        .distinct()
        .select(
            "w",
            F.concat_ws("_", encode_word_expr(F.col("w"), _BPE_RULES)).alias("enc"),
        )
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("enc")))
                    ),
                    lambda p: p["enc"],
                ),
            ).alias("encoded")
        )
    )


def _kmeans_sampled_init_sql(k: int, mod: int, src: str = "e", pfx: str = "") -> str:
    """The sampled-fit prologue as CTEs: the deterministic int64
    hash-sample (twin of operators.similarity.kmeans_sample_pred) and the
    renumbered k-smallest-ids init — twin of kmeans_fit(sample_mod=mod).
    Iteration CTEs then run with src='{pfx}s' (codebook trains on the
    sample); the final assignment CTEs keep reading the full corpus.
    *pfx* prefixes the CTE names so several independent fits (the
    quantization-pyramid levels) can share one WITH clause."""
    return f"""
    {pfx}s AS (SELECT vec_id, v FROM {src}
          WHERE ((vec_id * 2654435761) % 4294967296) % {mod} = 0),
    {pfx}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS c
           FROM (SELECT vec_id, v FROM {pfx}s ORDER BY vec_id LIMIT {k}))"""


def _kmeans_iter_sql(n: int, p: int, src: str = "e", pfx: str = "") -> str:
    """One Lloyd's iteration as CTEs: assign (sequential-fold distances —
    identical doubles on any engine), decimal-exact per-(cell,dim) means,
    empty cells keep the previous centroid. Twin of
    operators.similarity.kmeans_fit. *src* names the (vec_id, v) corpus
    CTE and *pfx* prefixes this fit's CTE names, so a second independent
    fit (e.g. the hierarchical coarse codebook over fine centroids) can
    run in the same WITH clause."""
    return f"""
    {pfx}a{n} AS (SELECT vec_id, v, cell FROM (
        SELECT e.vec_id, e.v, c.cell,
               row_number() OVER (PARTITION BY e.vec_id ORDER BY
                 list_sum(list_transform(range(len(e.v)), i ->
                   (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC, c.cell ASC) AS rn
        FROM {src} e, {pfx}c{p} c) WHERE rn = 1),
    {pfx}m{n} AS (SELECT cell, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM {pfx}a{n}),
    {pfx}g{n} AS (SELECT cell, dim,
                    round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS val
             FROM {pfx}m{n} GROUP BY cell, dim),
    {pfx}c{n} AS (SELECT o.cell, coalesce(nn.c, o.c) AS c
             FROM {pfx}c{p} o LEFT JOIN
               (SELECT cell, list(val ORDER BY dim) AS c FROM {pfx}g{n} GROUP BY cell) nn
               ON o.cell = nn.cell)"""


def _semdedup_tree_sql(ks: list[int], mods: list[int], n_probe: int, tau: float) -> str:
    """The full ``semantic_dedup`` route as generated CTEs, for ANY
    pyramid depth — twin of operators.dedup.semantic_dedup composed of
    kmeans_fit per level (sampled init, 2 Lloyd iterations) +
    semantic_dedup_tree_verdicts (per-level child→parent routes,
    non-vacuous probe guard, top-down n_probe descent, within-cell
    pairwise prune). Expects the corpus CTE ``e (vec_id, v)`` to be
    already open in the WITH clause; returns the remaining CTEs + final
    SELECT. *ks*/*mods* are the per-level codebook sizes and fit-sample
    moduli the Spark side derives (fine level first) — inlined, like
    every planted-fixture oracle constant."""
    depth = len(ks)
    pfx = lambda i: "" if i == 0 else f"t{i}"  # noqa: E731
    parts = []
    for i in range(depth):
        src = "e" if i == 0 else f"f{i}"
        if i > 0:
            parts.append(f"f{i} AS MATERIALIZED (SELECT cell AS vec_id, c AS v FROM {pfx(i-1)}c2)")
        parts.append(_kmeans_sampled_init_sql(ks[i], mods[i], src=src, pfx=pfx(i)).lstrip(" \n"))
        parts.append(_kmeans_iter_sql(1, 0, src=f"{pfx(i)}s", pfx=pfx(i)).lstrip(" \n"))
        parts.append(_kmeans_iter_sql(2, 1, src=f"{pfx(i)}s", pfx=pfx(i)).lstrip(" \n"))
    parts.append("n AS MATERIALIZED (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)")
    for i in range(depth):
        parts.append(
            f"L{i} AS MATERIALIZED (SELECT cell, c AS cv, sqrt(list_dot_product(c, c)) AS cnrm"
            f" FROM {pfx(i)}c2)"
        )
    cos = lambda a, b: (  # noqa: E731
        f"round(list_dot_product({a}.v, {b}.cv) / ({a}.nrm * {b}.cnrm), 6)"
    )
    if depth == 1:
        parts.append(f"""asg AS MATERIALIZED (
      SELECT vec_id, cell, ccos FROM (
        SELECT n.vec_id, L0.cell, {cos('n', 'L0')} AS ccos,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {cos('n', 'L0')} DESC, L0.cell) AS rr
        FROM n CROSS JOIN L0
        WHERE {cos('n', 'L0')} IS NOT NULL) WHERE rr = 1)""")
    else:
        for i in range(depth - 1):
            ccos = (
                f"round(list_dot_product(c.cv, p.cv) / (c.cnrm * p.cnrm), 6)"
            )
            parts.append(f"""r{i} AS MATERIALIZED (
      SELECT child, parent FROM (
        SELECT c.cell AS child, p.cell AS parent,
               row_number() OVER (PARTITION BY c.cell ORDER BY
                 {ccos} DESC, p.cell) AS rr
        FROM L{i} c CROSS JOIN L{i + 1} p) WHERE rr = 1)""")
        parts.append("u1 AS MATERIALIZED (SELECT DISTINCT parent FROM r0)")
        for j in range(2, depth):
            parts.append(
                f"u{j} AS MATERIALIZED (SELECT DISTINCT r{j-1}.parent FROM r{j-1}"
                f" JOIN u{j-1} ON r{j-1}.child = u{j-1}.parent)"
            )
        t = depth - 1
        parts.append(f"""p{t} AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT n.vec_id, tt.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, tt.cv) / (n.nrm * tt.cnrm), 6) DESC,
                 tt.cell) AS rr
        FROM n CROSS JOIN (SELECT L{t}.* FROM L{t}
                           JOIN u{t} ON L{t}.cell = u{t}.parent) tt
        WHERE round(list_dot_product(n.v, tt.cv) / (n.nrm * tt.cnrm), 6) IS NOT NULL
      ) WHERE rr <= {n_probe})""")
        for j in range(depth - 2, 0, -1):
            parts.append(f"""p{j} AS MATERIALIZED (
      SELECT vec_id, cell FROM (
        SELECT n.vec_id, L{j}.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {cos('n', f'L{j}')} DESC, L{j}.cell) AS rr
        FROM p{j + 1} pp JOIN n ON n.vec_id = pp.vec_id
        JOIN r{j} ON r{j}.parent = pp.cell
        JOIN L{j} ON L{j}.cell = r{j}.child
        JOIN u{j} ON u{j}.parent = L{j}.cell
        WHERE {cos('n', f'L{j}')} IS NOT NULL
      ) WHERE rr <= {n_probe})""")
        parts.append(f"""asg AS MATERIALIZED (
      SELECT vec_id, cell, ccos FROM (
        SELECT n.vec_id, L0.cell, {cos('n', 'L0')} AS ccos,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 {cos('n', 'L0')} DESC, L0.cell) AS rr
        FROM p1 pp JOIN n ON n.vec_id = pp.vec_id
        JOIN r0 ON r0.parent = pp.cell
        JOIN L0 ON L0.cell = r0.child
        WHERE {cos('n', 'L0')} IS NOT NULL
      ) WHERE rr = 1)""")
    parts.append("""mem AS MATERIALIZED (SELECT a.vec_id, a.cell, a.ccos, n.v, n.nrm
            FROM asg a JOIN n ON n.vec_id = a.vec_id)""")
    parts.append(f"""pr AS (
      SELECT DISTINCT x.vec_id FROM mem x JOIN mem y ON x.cell = y.cell
        AND (y.ccos < x.ccos OR (y.ccos = x.ccos AND y.vec_id < x.vec_id))
      WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= {tau})""")
    return (
        ",\n    ".join(parts)
        + """
    SELECT e.vec_id, a.cell, a.ccos AS cent_cos,
           (p.vec_id IS NOT NULL) AS pruned
    FROM e LEFT JOIN asg a ON a.vec_id = e.vec_id
           LEFT JOIN pr p ON p.vec_id = e.vec_id
    """
    )


@q(
    "ann_ivf_kmeans_topk",
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
    + _kmeans_sampled_init_sql(8, 4)
    + ","
    + _kmeans_iter_sql(1, 0, src="s")
    + ","
    + _kmeans_iter_sql(2, 1, src="s")
    + """,
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT cell, c AS cv, sqrt(list_dot_product(c, c)) AS cnrm FROM c2),
    ca AS (
      SELECT vec_id AS nid, cell FROM (
        SELECT n.vec_id, cent.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n CROSS JOIN cent) WHERE r = 1),
    qa AS (
      SELECT vec_id AS qid, cell FROM (
        SELECT n.vec_id, cent.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n CROSS JOIN cent WHERE n.vec_id < 5) WHERE r <= 2),
    scored AS (
      SELECT DISTINCT qa.qid, ca.nid,
             round(list_dot_product(cn.v, qn.v) / (cn.nrm * qn.nrm), 6) AS cos
      FROM qa JOIN ca USING (cell)
      JOIN n cn ON cn.vec_id = ca.nid
      JOIN n qn ON qn.vec_id = qa.qid
      WHERE ca.nid <> qa.qid)
    SELECT qid, nid, cos, CAST(rank AS INT) AS rank FROM (
      SELECT qid, nid, cos, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def ann_ivf_kmeans_topk(spark, sf_dir):
    """IVF ANN over TRAINED cells: distributed Lloyd's k-means (k=8,
    2 iterations, SAMPLED fit — operators.similarity.kmeans_fit with
    sample_mod=4: the codebook trains on the deterministic int64
    hash-sample, broadcast assignment, one fixed-width shuffle per
    iteration, decimal-exact means) supplies the coarse quantizer that
    ann_ivf_topk stubs with lowest-id vectors; then the standard 2-probe
    cell search. The oracle re-derives the SAME sample, init, and
    centroids bit-for-bit (sequential-fold distances + decimal sums), so
    a hash-match certifies the whole sampled-fit+probe pipeline
    cross-engine.

    100 TB shape: the Lloyd passes read only the hash-sample (fix a
    sample_target and the fit cost is CONSTANT in corpus size); fit
    state is (cell, dim) triples — fixed width; the trained centroid
    table broadcasts into assignment and probing; the corpus shuffles
    once on cell id for the probe join."""
    from graph_db_spark.operators.similarity import ivf_cosine_topk, kmeans_fit

    emb = _t(spark, sf_dir, "embeddings")
    # sample_mod=4: the codebook trains on the deterministic ~25%
    # hash-sample (the n·k fit term drops with it; assignment and the
    # probe still read the full corpus). The oracle replicates the
    # sample + renumbered init bit-for-bit.
    cent = kmeans_fit(emb, k=8, n_iters=2, sample_mod=4)
    return ivf_cosine_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=5, n_probe=2, centroids=cent
    )


@q(
    "dedup_semantic_semdedup",
    # SemDeDup over the corpus ∪ planted perturbed copies: the oracle
    # re-derives the trained centroids bit-for-bit (same CTEs as the
    # IVF query), then replicates assignment, the (cent_cos ASC, id ASC)
    # keep-order, and the within-cell pairwise >= tau prune EXACTLY —
    # a hash-match certifies the whole cluster-bounded dedup pipeline.
    "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    """pert AS (
      SELECT list_transform(range(0, len(v)), d ->
               v[d + 1] + 0.005 * CAST(((d * 31 + vec_id) % 5) - 2 AS DOUBLE)) AS v,
             vec_id + 100000 AS vec_id
      FROM base
    ),
    e AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM pert),"""
    + _kmeans_sampled_init_sql(8, 4)
    + ","
    + _kmeans_iter_sql(1, 0, src="s")
    + ","
    + _kmeans_iter_sql(2, 1, src="s")
    + """,
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT cell, c AS cv, sqrt(list_dot_product(c, c)) AS cnrm FROM c2),
    asg AS (
      SELECT vec_id, cell, ccos FROM (
        SELECT n.vec_id, cent.cell,
               round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) AS ccos,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n CROSS JOIN cent) WHERE r = 1),
    mem AS (SELECT a.vec_id, a.cell, a.ccos, n.v, n.nrm
            FROM asg a JOIN n ON n.vec_id = a.vec_id),
    pr AS (
      SELECT DISTINCT x.vec_id FROM mem x JOIN mem y ON x.cell = y.cell
        AND (y.ccos < x.ccos OR (y.ccos = x.ccos AND y.vec_id < x.vec_id))
      WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.99)
    SELECT e.vec_id, a.cell, a.ccos AS cent_cos,
           (p.vec_id IS NOT NULL) AS pruned
    FROM e LEFT JOIN asg a ON a.vec_id = e.vec_id
           LEFT JOIN pr p ON p.vec_id = e.vec_id
    """,
)
def dedup_semantic_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): cluster-bounded semantic dedup over
    the embedding corpus ∪ its planted perturbed twins (the same
    deterministic near-dup construction embedding_near_dup_pairs uses —
    the raw corpus has no near-dups). The trained k-means centroids
    (k=8, 2 iterations, decimal-exact) localize the quadratic pairwise
    term to within-cell joins; each near-dup group keeps its
    least-centroid-similar member. Expect ~one verdict row per vector
    with the planted twins pruned.

    100 TB shape: centroids broadcast; ONE shuffle on cell id; pairwise
    work n·(n/k) with k scaled to the corpus (operators/dedup.py
    semantic_dedup_verdicts docstring)."""
    from graph_db_spark.operators.dedup import semantic_dedup_verdicts
    from graph_db_spark.operators.similarity import kmeans_fit

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = e.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, d: x
            + F.lit(0.005)
            * (((d * 31 + F.col("vec_id")) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    u = e.unionByName(pert)
    # sampled fit (deterministic ~25% hash-sample): the n·k Lloyd term —
    # the exact route's measured scale floor — trains on n/4 rows here
    # and on a FIXED sample_target at scale; the oracle replicates the
    # sample + renumbered init bit-for-bit
    cent = kmeans_fit(u, k=8, n_iters=2, sample_mod=4)
    return semantic_dedup_verdicts(u, cent, tau=0.99).select(
        F.col("id").alias("vec_id"), "cell", "cent_cos", "pruned"
    )


@q(
    "dedup_semantic_semdedup_hier",
    # Two-level SemDeDup: the oracle re-derives BOTH codebooks
    # bit-for-bit (fine k=8 over the corpus, coarse k'=3 over the fine
    # centroids — the prefixed second kmeans CTE chain), replicates the
    # fine→coarse route, the vector→coarse pick, the within-cell fine
    # pick, and the pairwise prune. A hash-match certifies the entire
    # hierarchical assignment path cross-engine.
    "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    """pert AS (
      SELECT list_transform(range(0, len(v)), d ->
               v[d + 1] + 0.005 * CAST(((d * 31 + vec_id) % 5) - 2 AS DOUBLE)) AS v,
             vec_id + 100000 AS vec_id
      FROM base
    ),
    e AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM pert),"""
    + _kmeans_sampled_init_sql(8, 4)
    + ","
    + _kmeans_iter_sql(1, 0, src="s")
    + ","
    + _kmeans_iter_sql(2, 1, src="s")
    + """,
    f AS (SELECT cell AS vec_id, c AS v FROM c2),
    kc0 AS (SELECT vec_id AS cell, v AS c FROM f WHERE vec_id < 3),"""
    + _kmeans_iter_sql(1, 0, src="f", pfx="k")
    + ","
    + _kmeans_iter_sql(2, 1, src="f", pfx="k")
    + """,
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
    cent AS (SELECT cell, c AS cv, sqrt(list_dot_product(c, c)) AS cnrm FROM c2),
    co AS (SELECT cell AS ccell, c AS cov, sqrt(list_dot_product(c, c)) AS conrm FROM kc2),
    fr AS (
      SELECT cell, ccell FROM (
        SELECT cent.cell, co.ccell,
               row_number() OVER (PARTITION BY cent.cell ORDER BY
                 round(list_dot_product(cent.cv, co.cov) / (cent.cnrm * co.conrm), 6) DESC,
                 co.ccell) AS r
        FROM cent CROSS JOIN co) WHERE r = 1),
    cou AS (SELECT * FROM co WHERE ccell IN (SELECT DISTINCT ccell FROM fr)),
    vc AS (
      SELECT vec_id, ccell FROM (
        SELECT n.vec_id, co.ccell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, co.cov) / (n.nrm * co.conrm), 6) DESC,
                 co.ccell) AS r
        FROM n CROSS JOIN cou co) WHERE r <= 2),
    asg AS (
      SELECT vec_id, cell, ccos FROM (
        SELECT n.vec_id, cent.cell,
               round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) AS ccos,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n JOIN vc ON vc.vec_id = n.vec_id
        JOIN fr ON fr.ccell = vc.ccell
        JOIN cent ON cent.cell = fr.cell) WHERE r = 1),
    mem AS (SELECT a.vec_id, a.cell, a.ccos, n.v, n.nrm
            FROM asg a JOIN n ON n.vec_id = a.vec_id),
    pr AS (
      SELECT DISTINCT x.vec_id FROM mem x JOIN mem y ON x.cell = y.cell
        AND (y.ccos < x.ccos OR (y.ccos = x.ccos AND y.vec_id < x.vec_id))
      WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.99)
    SELECT e.vec_id, a.cell, a.ccos AS cent_cos,
           (p.vec_id IS NOT NULL) AS pruned
    FROM e LEFT JOIN asg a ON a.vec_id = e.vec_id
           LEFT JOIN pr p ON p.vec_id = e.vec_id
    """,
)
def dedup_semantic_semdedup_hier(spark, sf_dir):
    """SemDeDup with hierarchical (coarse-quantized) assignment — the
    scale path for the exact variant's n·k assignment term (measured
    n^1.5 at k=sqrt(n), SCALE_STRESS_r08): a coarse codebook (k'=3,
    trained over the 8 fine centroids) routes each vector with
    n·(k' + n_probe·k/k') ~ n·3·sqrt(k) cosine evaluations (n_probe=2)
    instead of n·k. Same planted-twin corpus, same pairwise prune;
    verdicts can differ from the exact variant only for vectors whose
    true nearest fine centroid lies outside their 2 best coarse cells
    (the IVF n_probe trade), and the oracle replicates the two-level
    route exactly (vc's r <= 2 is the probe set)."""
    from graph_db_spark.operators.dedup import semantic_dedup_hier_verdicts
    from graph_db_spark.operators.similarity import kmeans_fit

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = e.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, d: x
            + F.lit(0.005)
            * (((d * 31 + F.col("vec_id")) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    u = e.unionByName(pert)
    # sampled fine fit (~25% hash-sample; renumbered cells 0..7 keep the
    # coarse fit's id<3 init valid — it trains over just k=8 rows, no
    # sampling needed there). Oracle replicates sample + init exactly.
    cent = kmeans_fit(u, k=8, n_iters=2, sample_mod=4)
    coarse = kmeans_fit(cent, k=3, n_iters=2)
    return semantic_dedup_hier_verdicts(u, cent, coarse, tau=0.99).select(
        F.col("id").alias("vec_id"), "cell", "cent_cos", "pruned"
    )


_SEMDEDUP_CORPUS_SQL = (
    "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    """pert AS (
      SELECT list_transform(range(0, len(v)), d ->
               v[d + 1] + 0.005 * CAST(((d * 31 + vec_id) % 5) - 2 AS DOUBLE)) AS v,
             vec_id + 100000 AS vec_id
      FROM base
    ),
    e AS (SELECT vec_id, v FROM base UNION ALL SELECT vec_id, v FROM pert),
    """
)


def _semdedup_planted_corpus(spark, sf_dir):
    """The shared planted-twin embedding corpus (base ∪ perturbed copies)
    every semantic-dedup query runs on — Spark twin of
    ``_SEMDEDUP_CORPUS_SQL``."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    pert = e.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, d: x
            + F.lit(0.005)
            * (((d * 31 + F.col("vec_id")) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    return e.unionByName(pert)


@q(
    "dedup_semantic_default",
    # The obvious-name entry point end to end under the CONSTANT-CELL
    # auto-k rule (round-10 verdict item 1): at the gate's sf0.01 corpus
    # (500 base + 500 twins) k = max(8, ceil(1000/1024)) = 8, the fit
    # sample modulus is 1 (target 10k > n; init is still the renumbered
    # 8-smallest-ids rule), and 8 ≤ branch=64 makes the pyramid depth 1
    # — exact assignment. The generated oracle replicates the sampled
    # fit, assignment, and prune bit-for-bit; dedup_semantic_tree below
    # pins the multi-level descent the same entry point takes once
    # k > branch.
    _SEMDEDUP_CORPUS_SQL + _semdedup_tree_sql([8], [1], n_probe=2, tau=0.99),
)
def dedup_semantic_default(spark, sf_dir):
    """The ``semantic_dedup`` convenience entry point (operators/dedup.py)
    run exactly as a user would call it — one frame in, auto-derived
    k = max(8, ceil(n/1024)) (CONSTANT cell size, k ∝ n — the SemDeDup
    paper's 50k-clusters-for-440M regime; round-10 verdict item 1
    retired the isqrt(n) rule whose within-cell pairwise term was
    n^1.5), sampled codebook fits at every pyramid level, branch-64
    top-down routing, verdicts out.

    The oracle inlines the constants the auto-derivation produces at the
    correctness gate's sf0.01 corpus (n=1000 → k=8, sample modulus 1,
    pyramid depth 1) via the same generator that pins the deep route
    (_semdedup_tree_sql) — at other SFs the Spark side derives different
    k; the oracle is pinned to the gate's scale like every planted-twin
    fixture."""
    from graph_db_spark.operators.dedup import semantic_dedup

    u = _semdedup_planted_corpus(spark, sf_dir)
    return semantic_dedup(u, tau=0.99).select(
        F.col("id").alias("vec_id"), "cell", "cent_cos", "pruned"
    )


@q(
    "dedup_semantic_tree",
    # The multi-level descent pinned at gate scale: cell_target=8 /
    # branch=5 force the pyramid to [125, 25, 5] on the 1000-vector
    # corpus (all fit-sample moduli 1), so the oracle replicates THREE
    # chained sampled k-means fits, two child→parent routing levels, the
    # non-vacuous probe guard, the n_probe=2 top-down descent, and the
    # pairwise prune bit-for-bit — the exact machinery the default
    # entry point engages once k > branch (n ≳ 65k at the production
    # cell_target=1024 / branch=64).
    _SEMDEDUP_CORPUS_SQL + _semdedup_tree_sql([125, 25, 5], [1, 1, 1], n_probe=2, tau=0.99),
)
def dedup_semantic_tree(spark, sf_dir):
    """``semantic_dedup`` through a forced 3-level quantization pyramid
    (operators/dedup.semantic_dedup_tree_verdicts): an explicit k=125 /
    branch=5 pins the pyramid to [125, 25, 5] at EVERY scale factor —
    the same ks the auto-derivation (cell_target=8) produces at the
    gate's 1000-vector corpus, so the oracle constants hold while the
    bench-scale run keeps a fixed fit budget instead of re-scaling k
    with n (the auto form's k=ceil(n/8)=500 at sf0.1 cost 41 s of
    mostly Lloyd evaluations). This exercises the same arbitrary-depth
    route a billion-vector corpus takes at the production defaults.
    Per-vector routing work is ~n_probe·branch per level (n·polylog(n)
    with k ∝ n) instead of the flat n·k exact assignment or the 2-level
    n·3·sqrt(k); the within-cell prune is unchanged. Verdicts differ
    from the exact baseline only for vectors whose true nearest fine
    centroid falls outside the probed subtree (the IVF n_probe trade,
    now paid per level)."""
    from graph_db_spark.operators.dedup import semantic_dedup

    u = _semdedup_planted_corpus(spark, sf_dir)
    return semantic_dedup(u, tau=0.99, k=125, branch=5).select(
        F.col("id").alias("vec_id"), "cell", "cent_cos", "pruned"
    )


def _pca_iter_sql(i: int, prev_v: str, n_rows: int) -> str:
    """One power-method iteration as CTEs — twin of the loop body in
    operators.similarity.pca_power_scores (products rounded to 12dp
    before the exact DECIMAL sums, direction renormalized to 9dp)."""
    return f"""
    y{i} AS (SELECT id, CAST(sum(CAST(round(xc * vd, 12) AS DECIMAL(38,14))) AS DOUBLE) AS y
           FROM xc JOIN {prev_v} USING (d) GROUP BY id),
    z{i} AS (SELECT d, round(CAST(sum(CAST(round(xc * y, 12) AS DECIMAL(38,14))) AS DOUBLE)
                          / {float(n_rows)}, 12) AS zd
           FROM xc JOIN y{i} USING (id) GROUP BY d),
    n{i} AS (SELECT sqrt(CAST(sum(CAST(round(zd * zd, 12) AS DECIMAL(38,14))) AS DOUBLE)) AS nrm
           FROM z{i}),
    v{i} AS (SELECT d, CASE WHEN nrm <> 0 THEN round(zd / nrm, 9) ELSE 0.0 END AS vd
           FROM z{i} CROSS JOIN n{i})"""


@q(
    "embedding_pca_scores",
    # Matrix-free power iteration, replicated bit-for-bit: per-dim
    # DECIMAL means, two Xᶜᵀ(Xᶜ·v)/n iterations with 12dp-rounded
    # products into exact decimal sums, 9dp-renormalized direction,
    # 6dp projection scores. n=500 at the gate corpus is inlined (the
    # Spark side derives it with one count), init v₀ = e₀.
    """
    WITH x AS (
      SELECT vec_id AS id, generate_subscripts(v, 1) - 1 AS d, unnest(v) AS val
      FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    ),
    m AS (SELECT d, round(CAST(sum(CAST(val AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS m
          FROM x GROUP BY d),
    xc AS (SELECT x.id, x.d, x.val - m.m AS xc FROM x JOIN m USING (d)),
    v0 AS (SELECT 0 AS d, 1.0 AS vd),"""
    + _pca_iter_sql(1, "v0", 500)
    + ","
    + _pca_iter_sql(2, "v1", 500)
    + """
    SELECT xc.id AS vec_id,
           round(CAST(sum(CAST(round(xc * vd, 12) AS DECIMAL(38,14))) AS DOUBLE), 6) AS pc1
    FROM xc JOIN v2 USING (d) GROUP BY xc.id
    """,
)
def embedding_pca_scores(spark, sf_dir):
    """Top-principal-component projection per embedding
    (operators/similarity.pca_power_scores): the PCA primitive an
    embedding-curation pipeline uses for dominant-direction whitening
    and spectral outlier screens, computed matrix-free — each power
    iteration is Xᶜᵀ(Xᶜ·v)/n as two map-side-combinable aggregations
    over (id, dim, value) triples; the d-row direction broadcasts back.
    No covariance matrix, no driver collect, nothing quadratic; all
    reductions DECIMAL-exact with fixed rounding points so the oracle
    re-derives means, both iterations, and the scores bit-for-bit."""
    from graph_db_spark.operators.similarity import pca_power_scores

    e = _t(spark, sf_dir, "embeddings")
    return pca_power_scores(e).select(F.col("id").alias("vec_id"), "pc1")


@q(
    "dedup_duplicate_clusters",
    # Duplicate-cluster canonicalization: the verified near-dup pairs
    # (the dedup_minhash_lsh chain, reused verbatim) become an edge
    # list; connected components give every document a CLUSTER id =
    # the min doc_id of its duplicate group, singletons included. The
    # oracle closes the pair graph with a recursive CTE (transitive
    # closure is safe at gate scale: clusters are planted-twin-sized)
    # and takes the per-doc min reachable id — exactly the star-CC
    # min-label contract.
    r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    tok AS (
      SELECT id, unnest(list_distinct(
               CASE WHEN len(tk) >= 3
                    THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]
                    ELSE [] END
             )) AS token
      FROM toks
    ),
    sig AS (
      SELECT id,
             min(md5('0|' || token)) AS h0, min(md5('1|' || token)) AS h1,
             min(md5('2|' || token)) AS h2, min(md5('3|' || token)) AS h3,
             min(md5('4|' || token)) AS h4, min(md5('5|' || token)) AS h5,
             min(md5('6|' || token)) AS h6, min(md5('7|' || token)) AS h7
      FROM tok GROUP BY id
    ),
    banded AS (
      SELECT id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
      UNION ALL SELECT id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT l.id AS a, r.id AS b
      FROM banded l JOIN banded r ON l.band = r.band AND l.bkey = r.bkey AND l.id < r.id
    ),
    sz AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
    inter AS (
      SELECT c.a, c.b, count(*) AS inter
      FROM cand c JOIN tok ta ON ta.id = c.a JOIN tok tb ON tb.id = c.b AND tb.token = ta.token
      GROUP BY c.a, c.b
    ),
    pr AS (
      SELECT i.a, i.b
      FROM inter i JOIN sz sa ON sa.id = i.a JOIN sz sb ON sb.id = i.b
      WHERE i.inter >= 0.7 * (sa.sz + sb.sz - i.inter)
    ),
    sym AS (SELECT a AS x, b AS y FROM pr UNION ALL SELECT b AS x, a AS y FROM pr),
    reach AS (
      SELECT x, y FROM sym
      UNION
      SELECT r.x, s.y FROM reach r JOIN sym s ON r.y = s.x
    )
    SELECT d.doc_id,
           CAST(least(d.doc_id, coalesce(min(r.y), d.doc_id)) AS BIGINT) AS cluster_id,
           d.doc_id = least(d.doc_id, coalesce(min(r.y), d.doc_id)) AS is_canonical
    FROM documents d LEFT JOIN reach r ON r.x = d.doc_id
    GROUP BY d.doc_id
    """,
)
def dedup_duplicate_clusters(spark, sf_dir):
    """Duplicate-cluster canonicalization — the step a dedup pipeline
    runs AFTER pair detection: verified MinHash near-dup pairs
    (operators/dedup.minhash_near_dup_pairs, the same chain as
    dedup_minhash_lsh) become an undirected graph whose connected
    components are the duplicate groups; every document gets
    (cluster_id = min doc_id of its group, is_canonical = it IS that
    min). Downstream keeps exactly the canonical rows — transitive
    duplicates (A~B, B~C but A≁C directly) collapse into ONE group,
    which per-pair survivor rules get wrong.

    Scale shape: the pair graph is tiny relative to the corpus (only
    near-dup docs appear), and components are resolved by
    large-star/small-star alternation (pregel.connected_components_star,
    O(log² n) rounds) — never a transitive-closure blowup; the closure
    lives only in the DuckDB oracle at gate scale. The corpus joins the
    label frame once for singleton back-fill."""
    from graph_db_spark.pregel import connected_components_star

    d = _t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(
        d, "doc_id", "text", n_hashes=8, bands=4, threshold=0.7, shingle=3,
        corpus_rows=_parquet_rows(sf_dir, "documents"),
    )
    verts = d.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    labels, _ = connected_components_star(verts, edges)
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("component").cast("long").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


@q(
    "knn_label_agreement",
    # Mislabel screening over the labeled embedding corpus: sampled-fit
    # codebook (k=8, mod 4 — same rule as the other k-means oracles),
    # n_probe=1 cell neighborhoods, within-cell cosine top-5, majority
    # vote (votes DESC, label ASC). The oracle replicates codebook,
    # assignment, ranking, and vote bit-for-bit.
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
    + _kmeans_sampled_init_sql(8, 4)
    + ","
    + _kmeans_iter_sql(1, 0, src="s")
    + ","
    + _kmeans_iter_sql(2, 1, src="s")
    + """,
    n AS (SELECT e.vec_id, e.v, sqrt(list_dot_product(e.v, e.v)) AS nrm, em.label
          FROM e JOIN embeddings em USING (vec_id)),
    cent AS (SELECT cell, c AS cv, sqrt(list_dot_product(c, c)) AS cnrm FROM c2),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT n.vec_id, cent.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n CROSS JOIN cent) WHERE r = 1),
    mem AS (SELECT a.vec_id, a.cell, n.v, n.nrm, n.label
            FROM asg a JOIN n ON n.vec_id = a.vec_id),
    top AS (
      SELECT xid, ylbl FROM (
        SELECT x.vec_id AS xid, y.vec_id AS yid, y.label AS ylbl,
               round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos,
               row_number() OVER (PARTITION BY x.vec_id ORDER BY
                 round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) DESC,
                 y.vec_id) AS r
        FROM mem x JOIN mem y ON x.cell = y.cell AND x.vec_id <> y.vec_id
        WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) IS NOT NULL
      ) WHERE r <= 5),
    votes AS (SELECT xid, ylbl, count(*) AS nv FROM top GROUP BY xid, ylbl),
    maj AS (
      SELECT xid, ylbl AS knn_label, nvt AS n_neighbors FROM (
        SELECT xid, ylbl, nv, sum(nv) OVER (PARTITION BY xid) AS nvt,
               row_number() OVER (PARTITION BY xid ORDER BY nv DESC, ylbl) AS r
        FROM votes) WHERE r = 1)
    SELECT em.vec_id AS id, em.label, m.knn_label,
           CAST(m.n_neighbors AS BIGINT) AS n_neighbors,
           CASE WHEN m.knn_label IS NOT NULL THEN m.knn_label = em.label END AS agree
    FROM embeddings em LEFT JOIN maj m ON m.xid = em.vec_id
    """,
)
def knn_label_agreement(spark, sf_dir):
    """Embedding-space mislabel screening over the labeled corpus
    (operators/similarity.knn_label_agreement): each vector's majority
    label among its 5 nearest cosine neighbors inside its trained IVF
    cell, with the agree flag a labeled-data curation pass filters on.
    The confident-learning-style signal, cluster-bounded exactly like
    SemDeDup so nothing is quadratic in the corpus.

    100 TB shape: sampled codebook fit (constant), broadcast assignment
    (one scan), ONE shuffle on cell id for the pair join, per-id window
    + vote argmax hash-partitioned on vector id."""
    from graph_db_spark.operators.similarity import kmeans_fit, knn_label_agreement

    e = _t(spark, sf_dir, "embeddings")
    cent = kmeans_fit(e, k=8, n_iters=2, sample_mod=4)
    return knn_label_agreement(e, cent, k=5, n_cells=8).select(
        "id", "label", "knn_label", "n_neighbors", "agree"
    )


@q(
    "embedding_label_margin",
    """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings),
    m AS (SELECT label, generate_subscripts(v, 1) - 1 AS dim, unnest(v) AS x FROM e),
    g AS (SELECT label, dim,
                 round(CAST(sum(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / count(*), 9) AS val
          FROM m GROUP BY label, dim),
    c AS (SELECT label AS clbl, list(val ORDER BY dim) AS cv FROM g GROUP BY label),
    cn AS (SELECT clbl, cv, sqrt(list_dot_product(cv, cv)) AS cnn FROM c),
    n AS (SELECT vec_id, v, label, sqrt(list_dot_product(v, v)) AS vn FROM e),
    sc AS (SELECT n.vec_id, n.label, cn.clbl,
                  CASE WHEN n.vn * cn.cnn <> 0
                       THEN round(list_dot_product(n.v, cn.cv) / (n.vn * cn.cnn), 6)
                  END AS cos
           FROM n CROSS JOIN cn),
    own AS (SELECT vec_id, label, cos AS own_cos FROM sc WHERE label = clbl),
    rival AS (
      SELECT vec_id, clbl AS rival_label, cos AS rival_cos FROM (
        SELECT vec_id, clbl, cos,
               row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, clbl) AS r
        FROM sc WHERE label <> clbl AND cos IS NOT NULL) WHERE r = 1)
    SELECT o.vec_id AS id, o.label, o.own_cos, r.rival_label, r.rival_cos,
           round(o.own_cos - r.rival_cos, 6) AS margin
    FROM own o LEFT JOIN rival r ON r.vec_id = o.vec_id
    """,
)
def embedding_label_margin(spark, sf_dir):
    """Linear-probe-proxy embedding evaluation
    (operators/similarity.label_centroid_margin): DECIMAL-exact
    per-label centroids, then each vector's margin between its own-label
    cosine and its best rival label's — negative margin marks the
    hard/mislabeled examples a curation pass surfaces first.

    100 TB shape: one fixed-width (label, dim) decimal-mean shuffle; the
    |labels|-row centroid table broadcasts back into a single corpus
    scan — the corpus itself never shuffles."""
    from graph_db_spark.operators.similarity import label_centroid_margin

    return label_centroid_margin(_t(spark, sf_dir, "embeddings")).select(
        "id", "label", "own_cos", "rival_label", "rival_cos", "margin"
    )


@q(
    "split_stratified_holdout",
    f"""
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT) AS n_holdout,
           CAST(sum(CASE WHEN h THEN 0 ELSE 1 END) AS BIGINT) AS n_train
    FROM (SELECT label,
                 {_hex_int_sql("md5('split|' || CAST(label AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR))", 8)} % 10000 < 1000 AS h
          FROM embeddings)
    GROUP BY label
    """,
)
def split_stratified_holdout(spark, sf_dir):
    """Deterministic stratified train/holdout split audit: the md5
    basis-point coin keyed ('split|' label : vec_id) holds out ~10% of
    every label independently of row order, partitioning, or reruns —
    the reproducible-split primitive every training pipeline needs (no
    randomSplit: its result depends on partitioning). Returns per-label
    (label, n_vecs, n_holdout, n_train).

    100 TB shape: the gate is a row-local expression evaluated at the
    scan; the per-label counts are one map-side-combinable agg of
    |labels| rows — nothing else moves."""
    e = _t(spark, sf_dir, "embeddings")
    h = (
        _hex_int(
            F.md5(
                F.concat(
                    F.lit("split|"),
                    F.col("label").cast("string"),
                    F.lit(":"),
                    F.col("vec_id").cast("string"),
                )
            ),
            8,
        )
        % 10000
        < 1000
    )
    return (
        e.withColumn("h", h)
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            F.sum(F.when(F.col("h"), 1).otherwise(0)).cast("long").alias("n_holdout"),
            F.sum(F.when(F.col("h"), 0).otherwise(1)).cast("long").alias("n_train"),
        )
        .select("label", "n_vecs", "n_holdout", "n_train")
    )


@q(
    "mix_sources_temperature",
    f"""
    WITH counts AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(sum(CAST(power(n_docs, 0.7) AS DECIMAL(28,12))) AS DOUBLE) AS z,
             CAST(sum(n_docs) AS BIGINT) AS n_total
      FROM counts),
    rates AS (
      SELECT c.source, c.n_docs,
             CAST(round(least(
               CAST(power(c.n_docs, 0.7) AS DOUBLE) / t.z * (0.5 * t.n_total) / c.n_docs,
               1.0) * 10000) AS BIGINT) AS rate_bp
      FROM counts c, tot t),
    kept AS (
      SELECT d.source, count(*) AS n_kept
      FROM documents d JOIN rates r ON d.source = r.source
      WHERE {_hex_int_sql("md5(d.source || ':' || CAST(d.doc_id AS VARCHAR))", 8)} % 10000
            < r.rate_bp
      GROUP BY d.source)
    SELECT r.source, r.n_docs, r.rate_bp,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates r LEFT JOIN kept k ON k.source = r.source
    """,
)
def mix_sources_temperature(spark, sf_dir):
    """Temperature-based source rebalancing (the multilingual-corpus
    T=1/0.7 upsampling rule): per-source sampling weight ∝ n^0.7, scaled
    to a 50%-of-corpus target, capped at 1, ROUNDED TO BASIS POINTS so
    the deterministic md5 gate compares integers (no float-boundary
    flake); small sources keep a larger share than their raw proportion.
    Returns (source, n_docs, rate_bp, n_kept).

    100 TB shape: source stats are a tiny agg (exact decimal sum of the
    pow terms — a double sum would vary with partial-sum order);
    the broadcast rate table gates rows at the scan, no shuffle of the
    corpus; the kept-count agg is map-side combinable."""
    d = _t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(
        F.sum(F.pow("n_docs", F.lit(0.7)).cast("decimal(28,12)"))
        .cast("double")
        .alias("z"),
        F.sum("n_docs").alias("n_total"),
    )
    rates = (
        counts.join(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.round(
                F.least(
                    F.pow("n_docs", F.lit(0.7)).cast("double")
                    / F.col("z")
                    * (F.lit(0.5) * F.col("n_total"))
                    / F.col("n_docs"),
                    F.lit(1.0),
                )
                * 10000
            )
            .cast("long")
            .alias("rate_bp"),
        )
    )
    gate = (
        _hex_int(
            F.md5(F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))), 8
        )
        % 10000
    )
    kept = (
        d.join(F.broadcast(rates.select("source", "rate_bp")), "source")
        .filter(gate < F.col("rate_bp"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        rates.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "rate_bp",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


@q(
    "sample_cluster_balanced",
    # The oracle re-derives the k-means codebook bit-for-bit (the same
    # CTE chain as the ANN/semdedup fits), takes the THIRD assignment
    # pass a3 as final membership (m3/g3/c3 are unreferenced and pruned
    # by the planner), then replicates the temperature-rate arithmetic
    # and the md5 basis-point gate integer-for-integer.
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),"
    + _kmeans_sampled_init_sql(8, 4)
    + ","
    + _kmeans_iter_sql(1, 0, src="s")
    + ","
    + _kmeans_iter_sql(2, 1, src="s")
    # iteration 3 reads the FULL corpus: its a3 is exactly
    # kmeans_assign(e, c2) — the membership the Spark side computes —
    # while its m3/g3/c3 CTEs are unreferenced and pruned by the planner
    + ","
    + _kmeans_iter_sql(3, 2, src="e")
    + f""",
    counts AS (SELECT cell, count(*) AS n_vecs FROM a3 GROUP BY cell),
    tot AS (
      SELECT CAST(sum(CAST(power(n_vecs, 0.7) AS DECIMAL(28,12))) AS DOUBLE) AS z,
             CAST(sum(n_vecs) AS BIGINT) AS n_total
      FROM counts),
    rates AS (
      SELECT c.cell, c.n_vecs,
             CAST(round(least(
               CAST(power(c.n_vecs, 0.7) AS DOUBLE) / t.z * (0.5 * t.n_total) / c.n_vecs,
               1.0) * 10000) AS BIGINT) AS rate_bp
      FROM counts c, tot t),
    kept AS (
      SELECT a.cell, count(*) AS n_kept
      FROM a3 a JOIN rates r ON a.cell = r.cell
      WHERE {_hex_int_sql("md5('cb|' || CAST(a.cell AS VARCHAR) || ':' || CAST(a.vec_id AS VARCHAR))", 8)} % 10000
            < r.rate_bp
      GROUP BY a.cell)
    SELECT r.cell, CAST(r.n_vecs AS BIGINT) AS n_vecs, r.rate_bp,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM rates r LEFT JOIN kept k ON k.cell = r.cell
    """,
)
def sample_cluster_balanced(spark, sf_dir):
    """Cluster-balanced (topic-balanced) corpus sampling: the
    mix_sources_temperature rule applied to UNSUPERVISED k-means topic
    clusters instead of source labels — the standard curation move when
    one topic dominates a crawl and no source metadata captures it
    (cluster the embeddings, then flatten the cluster histogram with a
    T=1/0.7 temperature; cf. the cluster-then-balance stage of
    SemDeDup-style pipelines). Membership is kmeans_assign — the same
    euclidean rule the fit iterates, so cells match the codebook — and
    the keep-gate is the deterministic md5 basis-point coin keyed
    ('cb|' cell : vec_id). Returns (cell, n_vecs, rate_bp, n_kept).

    100 TB shape: centroids broadcast into assignment (one corpus scan,
    map-side-combinable min-struct); cluster stats are a tiny agg with
    DECIMAL-exact pow sums; the rate table broadcasts back and gates
    rows at the scan — the corpus never shuffles."""
    from graph_db_spark.operators.similarity import kmeans_assign, kmeans_fit

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    # sampled fit (~25% hash-sample) — membership below still assigns
    # the FULL corpus; the oracle's a3 CTE replicates both exactly
    cent = kmeans_fit(e, k=8, n_iters=2, sample_mod=4)
    # Materialize the assignment ONCE (the semdedup/DSIR share-point
    # discipline): it feeds both the cluster histogram and the keep-gate
    # scan; without the cut the broadcast-assign subtree (a corpus scan
    # + the n*k min-struct agg) runs twice.
    asg = kmeans_assign(e, cent).localCheckpoint(eager=True)
    counts = asg.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = counts.agg(
        F.sum(F.pow("n_vecs", F.lit(0.7)).cast("decimal(28,12)"))
        .cast("double")
        .alias("z"),
        F.sum("n_vecs").alias("n_total"),
    )
    rates = counts.join(F.broadcast(tot)).select(
        "cell",
        "n_vecs",
        F.round(
            F.least(
                F.pow("n_vecs", F.lit(0.7)).cast("double")
                / F.col("z")
                * (F.lit(0.5) * F.col("n_total"))
                / F.col("n_vecs"),
                F.lit(1.0),
            )
            * 10000
        )
        .cast("long")
        .alias("rate_bp"),
    )
    gate = (
        _hex_int(
            F.md5(
                F.concat(
                    F.lit("cb|"),
                    F.col("cell").cast("string"),
                    F.lit(":"),
                    F.col("id").cast("string"),
                )
            ),
            8,
        )
        % 10000
    )
    kept = (
        asg.join(F.broadcast(rates.select("cell", "rate_bp")), "cell")
        .filter(gate < F.col("rate_bp"))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return rates.join(kept, "cell", "left").select(
        "cell",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        "rate_bp",
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
    )


@q(
    "quality_percentile_gate",
    r"""
    WITH t AS (SELECT doc_id, source, text,
                      list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
               FROM documents),
    s AS (SELECT doc_id, source,
                 len(toks) AS n_tokens,
                 len(list_distinct(toks)) AS n_distinct,
                 length(text) AS n_chars,
                 length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
          FROM t),
    qy AS (SELECT doc_id, source,
                  round(least(n_tokens / 100.0, 1.0) * 0.5
                        + (n_distinct * 1.0 / greatest(n_tokens, 1)) * 0.4
                        - least(n_punct * 1.0 / greatest(n_chars, 1), 0.1), 6) AS quality
           FROM s)
    SELECT doc_id, source, quality,
           round(percent_rank() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC), 6) AS pct,
           (round(percent_rank() OVER (PARTITION BY source ORDER BY quality DESC, doc_id ASC), 6) <= 0.6) AS kept
    FROM qy
    """,
)
def quality_percentile_gate(spark, sf_dir):
    """Per-source quality-percentile gating: keep each source's top 60%
    of documents by the heuristic quality score (the per-domain
    percentile filter used when absolute quality thresholds would
    silently empty low-resource domains — every source keeps its best
    slice instead of competing on one global bar). Rank is
    percent_rank over (quality DESC, doc_id ASC) — doc_id is unique, so
    the ordering and therefore the percentile is fully deterministic.
    Returns every doc with (doc_id, source, quality, pct, kept).

    100 TB shape: the quality score is row-local built-in arithmetic at
    the scan; the window shuffles once on source with an in-partition
    sort (AQE skew-split handles a hot source; with truly giant single
    sources you'd switch to the two-pass variant — exact per-source
    cutoff from a percentile agg, broadcast back as a gate — at the
    cost of a second scan)."""
    d = _t(spark, sf_dir, "documents")
    from graph_db_spark.operators.text import quality_expr

    qy = d.select("doc_id", "source", quality_expr(F.col("text")).alias("quality"))
    w = W.partitionBy("source").orderBy(F.col("quality").desc(), F.col("doc_id").asc())
    pct = F.round(F.percent_rank().over(w), 6)
    return qy.select(
        "doc_id",
        "source",
        "quality",
        pct.alias("pct"),
        (pct <= 0.6).alias("kept"),
    )


@q(
    "doc_feature_hash_embed",
    f"""
    WITH toks AS (
      SELECT doc_id, t.tok AS token
      FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents) t
      WHERE t.tok <> ''),
    tc AS (SELECT doc_id, token, count(*) AS n FROM toks GROUP BY doc_id, token),
    comp AS (
      SELECT doc_id,
             {_hex_int_sql("md5('i|' || token)", 4)} % 64 AS dim,
             CAST(sum((1 - 2 * ({_hex_int_sql("md5('s|' || token)", 1)} % 2)) * n)
                  AS BIGINT) AS v
      FROM tc GROUP BY 1, 2),
    nz AS (SELECT doc_id, dim, v FROM comp WHERE v <> 0),
    nrm AS (SELECT doc_id, sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm FROM nz GROUP BY doc_id)
    SELECT z.doc_id, z.dim, round(z.v / n.nrm, 6) AS val
    FROM nz z JOIN nrm n ON z.doc_id = n.doc_id
    """,
)
def doc_feature_hash_embed(spark, sf_dir):
    """Feature-hashing document embeddings (the hashing trick): every
    token maps to one of 64 dimensions by md5, with an md5-derived ±1
    sign to keep collisions unbiased (Weinberger et al. 2009); component
    values are exact signed integer counts, L2-normalized at the end —
    the norm is the sqrt of an exact integer sum, so the result is
    bit-identical on any engine and any partitioning. Gives a
    model-free embedding for every document, feeding the ANN / near-dup
    operators when no trained encoder is available. Sparse output
    (doc_id, dim, val), zero components omitted.

    100 TB shape: two map-side-combinable aggs keyed (doc, token) then
    (doc, dim) — fixed-width rows, never text after the first explode;
    no UDFs anywhere."""
    from graph_db_spark.functions.text import ws_tokens

    d = _t(spark, sf_dir, "documents")
    tc = (
        d.select("doc_id", F.explode(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sign = 1 - 2 * (_hex_int(F.md5(F.concat(F.lit("s|"), F.col("token"))), 1) % 2)
    comp = (
        tc.select(
            "doc_id",
            (_hex_int(F.md5(F.concat(F.lit("i|"), F.col("token"))), 4) % 64).alias("dim"),
            (sign * F.col("n")).alias("sv"),
        )
        .groupBy("doc_id", "dim")
        .agg(F.sum("sv").alias("v"))
        .filter(F.col("v") != 0)
    )
    nrm = comp.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v")).cast("double")).alias("nrm")
    )
    return comp.join(nrm, "doc_id").select(
        "doc_id", "dim", F.round(F.col("v") / F.col("nrm"), 6).alias("val")
    )


@q(
    "graph_landmark_distances",
    """
    WITH RECURSIVE nodes AS (SELECT p_partkey AS id FROM part),
    de AS (
      SELECT a.id AS src, b.id AS dst
      FROM nodes a JOIN nodes b ON b.id = a.id + 1 OR b.id = a.id + 7),
    edges AS (SELECT src, dst FROM de UNION ALL SELECT dst, src FROM de),
    paths(tag, id, hops) AS (
      SELECT CAST(lm AS BIGINT), CAST(lm AS BIGINT), 0
      FROM (VALUES (1), (50), (100)) t(lm)
      UNION ALL
      SELECT p.tag, e.dst, p.hops + 1
      FROM paths p JOIN edges e ON e.src = p.id WHERE p.hops < 6)
    SELECT id, tag AS landmark, CAST(min(hops) AS INT) AS dist
    FROM paths GROUP BY id, tag
    """,
)
def graph_landmark_distances(spark, sf_dir):
    """Landmark distance oracle (the classic shortest-path-estimation
    index: est(u,v) ≈ min over landmarks of d(u,l) + d(l,v)): hop
    distances from 3 landmark nodes over the undirected part-chain
    graph, built by pregel.tagged_bfs_levels — ONE BFS loop whose state
    is keyed (id, landmark), so k landmark walks cost one frontier join
    per level total instead of k separate traversals. Hop-bounded at 6
    to equal the oracle's bounded recursive CTE.

    100 TB shape: state rows are fixed-width (id, tag, level) triples
    hash-partitioned by the join key; at scale you'd pick ~16-64
    landmarks by degree and the same single loop builds the whole index
    in O(diameter) rounds."""
    from graph_db_spark.pregel import tagged_bfs_levels

    nodes, edges = _part_chain_graph(spark, sf_dir)
    landmarks = spark.createDataFrame([(1,), (50,), (100,)], "id LONG").select(
        "id", F.col("id").alias("tag")
    )
    out = tagged_bfs_levels(edges, landmarks, max_iters=6, directed=False)
    return out.select("id", F.col("tag").alias("landmark"), F.col("level").alias("dist"))


@q(
    "doc_similar_feature_hash",
    f"""
    WITH toks AS (
      SELECT doc_id, t.tok AS token
      FROM (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
            FROM documents) t
      WHERE t.tok <> ''),
    tc AS (SELECT doc_id, token, count(*) AS n FROM toks GROUP BY doc_id, token),
    comp AS (
      SELECT doc_id,
             {_hex_int_sql("md5('i|' || token)", 4)} % 64 AS dim,
             CAST(sum((1 - 2 * ({_hex_int_sql("md5('s|' || token)", 1)} % 2)) * n)
                  AS BIGINT) AS v
      FROM tc GROUP BY 1, 2),
    nz AS (SELECT doc_id, dim, v FROM comp WHERE v <> 0),
    nrm AS (SELECT doc_id, sqrt(CAST(sum(v * v) AS DOUBLE)) AS nrm FROM nz GROUP BY doc_id),
    unit AS (
      SELECT z.doc_id, z.dim, round(z.v / n.nrm, 6) AS val
      FROM nz z JOIN nrm n ON z.doc_id = n.doc_id),
    scored AS (
      SELECT q.doc_id AS qid, c.doc_id AS nid, round(sum(q.val * c.val), 6) AS cos
      FROM unit q JOIN unit c ON q.dim = c.dim AND c.doc_id <> q.doc_id
      WHERE q.doc_id < 5
      GROUP BY 1, 2)
    SELECT qid, nid, cos, CAST(rank AS INT) AS rank FROM (
      SELECT qid, nid, cos,
             row_number() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
)
def doc_similar_feature_hash(spark, sf_dir):
    """Model-free similar-document search: cosine top-5 over the
    feature-hashing embeddings (doc_feature_hash_embed) — unit vectors,
    so cosine = the sparse dot product, computed as an equi-join on the
    64 hash dimensions (query side broadcast) + a map-side-combinable
    sum per (query, candidate). Composes the hashing-trick embedding
    with the ANN ranking shape: near-dup/similarity retrieval with no
    trained encoder anywhere.

    100 TB shape: the corpus-side sparse components are fixed-width
    (doc, dim, val) triples; only rows sharing a dimension with a query
    vector are touched, the (qid, nid) partial sums combine map-side,
    and the top-k is a bounded window per query."""
    from graph_db_spark.functions.text import ws_tokens  # noqa: F401 (parity)

    unit = doc_feature_hash_embed(spark, sf_dir)
    qv = unit.filter(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("qid"), "dim", F.col("val").alias("qval")
    )
    cv = unit.select(F.col("doc_id").alias("nid"), "dim", F.col("val").alias("cval"))
    scored = (
        cv.join(F.broadcast(qv), "dim")
        .filter(F.col("nid") != F.col("qid"))
        .groupBy("qid", "nid")
        .agg(F.round(F.sum(F.col("qval") * F.col("cval")), 6).alias("cos"))
    )
    w = W.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("qid", "nid", "cos", "rank")
    )


# ---------------------------------------------------------------------------
# Round 12: corpus-curation breadth — repeated-line removal, token-budget
# shard manifests, SCD2 interval compression
# ---------------------------------------------------------------------------


@q(
    "dedup_repeated_lines",
    r"""
    WITH tk AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         t -> t <> '') AS t
      FROM documents),
    ln AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             array_to_string(t[(u.i*3+1):(u.i*3+3)], ' ') AS line
      FROM tk, UNNEST(range(0, CAST(ceil(len(t) / 3.0) AS BIGINT))) AS u(i)),
    df AS (
      SELECT md5(line) AS lh, count(DISTINCT doc_id) AS n_docs
      FROM ln GROUP BY md5(line))
    SELECT l.doc_id,
           count(*) AS n_lines,
           CAST(sum(CASE WHEN f.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_lines,
           CAST(coalesce(sum(CASE WHEN f.n_docs < 2
                                  THEN len(string_split(l.line, ' ')) END), 0)
                AS BIGINT) AS kept_tokens,
           md5(coalesce(string_agg(CASE WHEN f.n_docs < 2 THEN l.line END,
                                   ' ' ORDER BY l.i), '')) AS clean_md5
    FROM ln l JOIN df f ON md5(l.line) = f.lh
    GROUP BY l.doc_id
    """,
)
def dedup_repeated_lines(spark, sf_dir):
    """Corpus-wide repeated-line removal (the RefinedWeb / CCNet line-level
    exact dedup, Penedo et al. 2023 §3.3): segment every document into
    fixed 3-token "lines" (the fixture text has no newlines, so the
    segmenter stands in for the line splitter), count how many DISTINCT
    documents each line occurs in, drop every line that appears in >= 2
    documents, and reconstruct the cleaned document from the surviving
    lines in their original order. Output per doc: segment counts, kept
    token count, and an md5 fingerprint of the reconstructed text (the
    fingerprint makes the value-hash sensitive to reconstruction ORDER,
    not just the drop set).

    100 TB shape: the line-frequency table groups on md5(line) — a
    fixed-width key, so the df shuffle never carries raw line text —
    and is map-side combinable; the join back to the exploded lines is
    a hash equi-join on the same key (no broadcast assumption: at web
    scale the duplicated-line table is itself huge); reconstruction is
    one per-doc grouped agg over (pos, line) pairs. Nothing is
    quadratic, no cross-document state beyond the df counts.
    """
    from graph_db_spark.functions.text import ws_tokens
    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    tk = d.select("doc_id", ws_tokens(F.lower(F.col("text"))).alias("t"))
    n_seg = F.ceil(F.size("t") / F.lit(3.0))
    segs = F.when(
        F.size("t") > 0,
        F.transform(
            F.sequence(F.lit(1), n_seg),
            lambda i: F.concat_ws(" ", F.slice("t", (i - F.lit(1)) * 3 + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    lines = tk.select(
        "doc_id", F.posexplode(segs).alias("i", "line")
    ).withColumn("lh", F.md5("line"))
    df_tab = lines.groupBy("lh").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    joined = lines.join(df_tab, "lh")
    keep_line = F.when(F.col("n_docs") < 2, F.col("line"))
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum((F.col("n_docs") >= 2).cast("long")).alias("n_dup_lines"),
            F.coalesce(
                F.sum(F.when(F.col("n_docs") < 2, F.size(F.split("line", " ")))),
                F.lit(0),
            ).cast("long").alias("kept_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    F.col("n_docs") < 2,
                                    F.struct(F.col("i"), F.col("line")),
                                )
                            )
                        ),
                        lambda s: s["line"],
                    ),
                    " ",
                )
            ).alias("clean_md5"),
        )
        .select("doc_id", "n_lines", "n_dup_lines", "kept_tokens", "clean_md5")
    )


@q(
    "shard_manifest_by_tokens",
    r"""
    WITH nt AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                  t -> t <> '')) AS BIGINT) AS n_tok
      FROM documents),
    run AS (
      SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id) AS running
      FROM nt)
    SELECT doc_id, n_tok,
           CAST(floor((running - n_tok) / 2048.0) AS BIGINT) AS shard_id
    FROM run
    """,
)
def shard_manifest_by_tokens(spark, sf_dir):
    """Token-budget shard manifest (the training-shard writer pattern):
    assign documents, in deterministic doc_id order, to output shards of
    ~2048 tokens each — shard_id = floor(start_offset / budget) where
    start_offset is the global running token total before the doc. The
    manifest is what a distributed shard writer consumes to emit
    fixed-budget training files with stable, reproducible shard
    membership.

    The global running sum is the textbook two-level distributed prefix
    sum, NOT a global unpartitioned window (the q3/q10 round-11 lesson:
    "no partition defined" moves the corpus through one task): documents
    are range-bucketed by doc_id (bucket width from the parquet footer
    row count, zero jobs at plan time), stage 1 computes per-bucket token
    totals (map-side combinable), stage 2 turns the tiny bucket-total
    frame into exclusive bucket offsets with a triangular self-join
    (B^2 rows at B=256 — no window, no collect, stays lazy), and stage 3
    adds a WITHIN-bucket running sum (window partitioned by bucket) to
    the broadcast bucket offset. offset + local_running = the exact
    global running sum because the bucket function floor(doc_id / W) is
    monotone in doc_id.
    """
    from graph_db_spark.session import spread_small_input

    budget = 2048.0
    n_rows = max(1, _parquet_rows(sf_dir, "documents"))
    width = max(1, -(-n_rows // 256))  # ceil; ~256 contiguous id ranges
    d = spread_small_input(_t(spark, sf_dir, "documents"))
    nt = d.select(
        "doc_id",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != "")
        ).cast("long").alias("n_tok"),
        (F.col("doc_id") / F.lit(width)).cast("long").alias("bucket"),
    )
    totals = nt.groupBy("bucket").agg(F.sum("n_tok").alias("btot"))
    prior = totals.select(F.col("bucket").alias("pb"), F.col("btot").alias("ptot"))
    offsets = (
        totals.join(prior, F.col("pb") < F.col("bucket"), "left")
        .groupBy("bucket")
        .agg(F.coalesce(F.sum("ptot"), F.lit(0)).alias("offset"))
    )
    w = W.partitionBy("bucket").orderBy("doc_id")
    return (
        nt.join(F.broadcast(offsets), "bucket")
        .withColumn("running", F.col("offset") + F.sum("n_tok").over(w))
        .select(
            "doc_id",
            "n_tok",
            F.floor((F.col("running") - F.col("n_tok")) / F.lit(budget))
            .cast("long")
            .alias("shard_id"),
        )
    )


@q(
    "scd2_user_status_intervals",
    """
    WITH r AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rt
      FROM events),
    isl AS (
      SELECT user_id, event_type,
             min(ts) AS valid_from,
             min(event_id) AS first_event,
             count(*) AS n_events
      FROM r GROUP BY user_id, event_type, rn - rt)
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, first_event) AS valid_to,
           n_events
    FROM isl
    """,
)
def scd2_user_status_intervals(spark, sf_dir):
    """SCD2 interval build from an event log (gaps-and-islands): compress
    each user's event stream into maximal runs of consecutive identical
    event_type, emitting one validity interval [valid_from, valid_to)
    per run — valid_to = the next run's start, NULL for the user's
    current (open) state. The rn - rt island key is the classic
    row_number-difference trick: consecutive rows of one type share it,
    any interleaving row of another type breaks it.

    100 TB shape: every window is partitioned by user_id (never global),
    so state is bounded by one user's history per task; the island
    collapse is a grouped agg on (user, type, island) — map-side
    combinable; ordering ties are broken by the unique event_id so the
    intervals are reproducible run to run.
    """
    e = _t(spark, sf_dir, "events")
    w_u = W.partitionBy("user_id").orderBy("ts", "event_id")
    w_ut = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    r = e.select(
        "user_id", "event_type", "ts", "event_id",
        (F.row_number().over(w_u) - F.row_number().over(w_ut)).alias("isl"),
    )
    isl = r.groupBy("user_id", "event_type", "isl").agg(
        F.min("ts").alias("valid_from"),
        F.min("event_id").alias("first_event"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w_next = W.partitionBy("user_id").orderBy("valid_from", "first_event")
    return isl.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_next).alias("valid_to"),
        "n_events",
    )


@q(
    "dedup_incremental_new_vs_store",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    tok AS (
      SELECT id, unnest(list_distinct(
               CASE WHEN len(tk) >= 3
                    THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]
                    ELSE [] END
             )) AS token
      FROM toks
    ),
    sig AS (
      SELECT id,
             min(md5('0|' || token)) AS h0, min(md5('1|' || token)) AS h1,
             min(md5('2|' || token)) AS h2, min(md5('3|' || token)) AS h3,
             min(md5('4|' || token)) AS h4, min(md5('5|' || token)) AS h5,
             min(md5('6|' || token)) AS h6, min(md5('7|' || token)) AS h7
      FROM tok GROUP BY id
    ),
    banded AS (
      SELECT id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
      UNION ALL SELECT id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    -- integer arithmetic, matching Spark's (n*8)//10 exactly: floor(n*0.8)
    -- goes through a binary double and can disagree near integer crossings
    cut AS (SELECT (count(*) * 8) // 10 AS c FROM documents),
    cand AS (
      SELECT DISTINCT l.id AS a, r.id AS b
      FROM banded l
      JOIN banded r ON l.band = r.band AND l.bkey = r.bkey AND l.id < r.id
      JOIN cut ON r.id >= cut.c
    ),
    sz AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
    inter AS (
      SELECT c.a, c.b, count(*) AS inter
      FROM cand c JOIN tok ta ON ta.id = c.a
      JOIN tok tb ON tb.id = c.b AND tb.token = ta.token
      GROUP BY c.a, c.b
    ),
    ver AS (
      SELECT i.a, i.b,
             round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
      FROM inter i JOIN sz sa ON sa.id = i.a JOIN sz sb ON sb.id = i.b
      WHERE i.inter >= 0.7 * (sa.sz + sb.sz - i.inter)
    )
    SELECT b AS doc_id, min(a) AS dup_of,
           arg_min(jaccard, a) AS jaccard, count(*) AS n_dups
    FROM ver GROUP BY b
    """,
)
def dedup_incremental_new_vs_store(spark, sf_dir):
    """Incremental ingest dedup: drop NEW documents that near-dup the
    already-deduplicated STORE or an earlier arrival in the same batch —
    the production shape for continuous corpus growth, where the store
    side is assumed duplicate-free and must never be re-verified against
    itself. New = the top 20% of doc_ids (the "arriving batch"); store =
    the rest. Output per dropped arrival: its canonical duplicate
    (minimum matching id — store docs sort first, so a store match
    always wins over a same-batch one), that pair's Jaccard, and the
    total match count.

    The candidate prune is ASYMMETRIC and happens BEFORE the Jaccard
    verify: the banded equi-join's pairs are filtered to b >= cutoff
    while still signature-only rows, so store x store candidates — the
    quadratically dominant class on a mature corpus — never reach the
    token-intersection join at all. At 100 TB the store side reads its
    PERSISTED signature/band table (signatures are one-time per doc;
    the fixture recomputes them only because it ships raw text), the
    band join keys on fixed-width md5 buckets, and per-batch cost is
    |batch| x bands lookups + verification of the surviving candidates
    — independent of store size beyond the equi-join's hash lookup.
    """
    n = _parquet_rows(sf_dir, "documents")
    cutoff = (n * 8) // 10
    d = _t(spark, sf_dir, "documents")
    tok = D.shingles(d, "doc_id", "text", 3)
    cands = D.lsh_candidate_pairs(D.minhash_signatures(tok, 8), 8, 4, corpus_rows=n)
    pairs = D.jaccard_verify(cands.filter(F.col("b") >= cutoff), tok, 0.7)
    return pairs.groupBy("b").agg(
        F.min("a").alias("dup_of"),
        F.min_by("jaccard", "a").alias("jaccard"),
        F.count(F.lit(1)).alias("n_dups"),
    ).select(F.col("b").alias("doc_id"), "dup_of", "jaccard", "n_dups")


@q(
    "dedup_containment_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    tok AS (
      SELECT id, unnest(list_distinct(
               CASE WHEN len(tk) >= 3
                    THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]
                    ELSE [] END
             )) AS token
      FROM toks
    ),
    sig AS (
      SELECT id,
             min(md5('0|' || token)) AS h0, min(md5('1|' || token)) AS h1,
             min(md5('2|' || token)) AS h2, min(md5('3|' || token)) AS h3,
             min(md5('4|' || token)) AS h4, min(md5('5|' || token)) AS h5,
             min(md5('6|' || token)) AS h6, min(md5('7|' || token)) AS h7
      FROM tok GROUP BY id
    ),
    banded AS (
      SELECT id, 0 AS band, md5(h0 || '|' || h1) AS bkey FROM sig
      UNION ALL SELECT id, 1, md5(h2 || '|' || h3) FROM sig
      UNION ALL SELECT id, 2, md5(h4 || '|' || h5) FROM sig
      UNION ALL SELECT id, 3, md5(h6 || '|' || h7) FROM sig
    ),
    cand AS (
      SELECT DISTINCT l.id AS a, r.id AS b
      FROM banded l
      JOIN banded r ON l.band = r.band AND l.bkey = r.bkey AND l.id < r.id
    ),
    sz AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
    inter AS (
      SELECT c.a, c.b, count(*) AS inter
      FROM cand c JOIN tok ta ON ta.id = c.a
      JOIN tok tb ON tb.id = c.b AND tb.token = ta.token
      GROUP BY c.a, c.b
    )
    SELECT i.a, i.b,
           round(i.inter * 1.0 / least(sa.sz, sb.sz), 6) AS containment,
           round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
    FROM inter i JOIN sz sa ON sa.id = i.a JOIN sz sb ON sb.id = i.b
    WHERE i.inter >= 0.8 * least(sa.sz, sb.sz)
    """,
)
def dedup_containment_pairs(spark, sf_dir):
    """Asymmetric containment near-dup (quote / subset detection): exact
    |A∩B| / min(|A|,|B|) on MinHash-LSH candidate pairs, with Jaccard
    alongside so twins (both high) separate from subset pairs
    (containment high, Jaccard low). The criterion Lee et al.-style
    pipelines use for embedded-quotation suppression, where symmetric
    Jaccard misses a short doc copied wholesale into a long one.
    Candidate recall is LSH's (Jaccard-banded) — the honest recall tier
    for this generator; see ``containment_verify``'s docstring for the
    containment-native generator a 100 TB pipeline would feed it from."""
    n = _parquet_rows(sf_dir, "documents")
    d = _t(spark, sf_dir, "documents")
    tok = D.shingles(d, "doc_id", "text", 3)
    cands = D.lsh_candidate_pairs(D.minhash_signatures(tok, 8), 8, 4, corpus_rows=n)
    return D.containment_verify(cands, tok, 0.8)


@q(
    "dedup_prefix_filter_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    tok AS (
      SELECT id, unnest(list_distinct(
               CASE WHEN len(tk) >= 3
                    THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]
                    ELSE [] END
             )) AS token
      FROM toks
    ),
    sz AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
    dfq AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
    pos AS (
      SELECT t.id, t.token,
             row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.token) AS pos
      FROM tok t JOIN dfq d ON d.token = t.token
    ),
    pref AS (
      SELECT p.id, p.token
      FROM pos p JOIN sz ON sz.id = p.id
      -- integer overlap bound, matching Spark's (sz*7 + 9) DIV 10: the
      -- float route ceil(sz * 0.7) lands a 0.5-ulp above exact integers
      -- (10 * 0.7 == 7.000000000000001 -> ceil 8) on BOTH engines,
      -- silently shortening the prefix and breaking exact recall
      WHERE p.pos <= sz.sz - (sz.sz * 7 + 9) // 10 + 1
    ),
    cand AS (
      SELECT DISTINCT l.id AS a, r.id AS b
      FROM pref l JOIN pref r ON l.token = r.token AND l.id < r.id
    ),
    sized AS (
      SELECT c.a, c.b FROM cand c
      JOIN sz sa ON sa.id = c.a JOIN sz sb ON sb.id = c.b
      WHERE least(sa.sz, sb.sz) >= 0.7 * greatest(sa.sz, sb.sz)
    ),
    inter AS (
      SELECT c.a, c.b, count(*) AS inter
      FROM sized c JOIN tok ta ON ta.id = c.a
      JOIN tok tb ON tb.id = c.b AND tb.token = ta.token
      GROUP BY c.a, c.b
    )
    SELECT i.a, i.b,
           round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
    FROM inter i JOIN sz sa ON sa.id = i.a JOIN sz sb ON sb.id = i.b
    WHERE i.inter >= 0.7 * (sa.sz + sb.sz - i.inter)
    """,
)
def dedup_prefix_filter_pairs(spark, sf_dir):
    """Exact-recall Jaccard similarity join (prefix filtering, the
    PPJoin family) at t = 0.7 — the recall-GUARANTEED tier next to
    ``dedup_minhash_lsh``'s probabilistic banding: every qualifying pair
    is a candidate by the pigeonhole on the global df-ascending token
    order, so this is the route for decontamination-grade exactness.
    The result is a superset-or-equal of the LSH route's verified pairs
    at the same threshold (pytest asserts it)."""
    d = _t(spark, sf_dir, "documents")
    return D.prefix_filter_jaccard_pairs(d, "doc_id", "text", threshold=0.7, shingle=3)


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


@q(
    "ann_pq_adc_topk",
    # The oracle re-derives BOTH subspace codebooks bit-for-bit (the
    # kmeans CTE machinery, prefixed per subspace), the per-vector code
    # assignment (unrounded L2, cell tie-break — the kmeans assignment
    # convention), each query's m×k distance table (9dp), and the ADC
    # lookup-sum top-k. Ties are everywhere by construction (16 distinct
    # code combos), so the (adc, nid) tie-break carries the whole order.
    "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    "e1 AS (SELECT vec_id, v[1:32] AS v FROM base),\n"
    "e2 AS (SELECT vec_id, v[33:64] AS v FROM base),"
    + _kmeans_sampled_init_sql(4, 4, src="e1", pfx="p")
    + ","
    + _kmeans_iter_sql(1, 0, src="ps", pfx="p")
    + ","
    + _kmeans_iter_sql(2, 1, src="ps", pfx="p")
    + ","
    + _kmeans_sampled_init_sql(4, 4, src="e2", pfx="q")
    + ","
    + _kmeans_iter_sql(1, 0, src="qs", pfx="q")
    + ","
    + _kmeans_iter_sql(2, 1, src="qs", pfx="q")
    + """,
    enc1 AS (SELECT vec_id, cell AS c0 FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e1 e, pc2 c) WHERE rn = 1),
    enc2 AS (SELECT vec_id, cell AS c1 FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e2 e, qc2 c) WHERE rn = 1),
    qd1 AS (SELECT e.vec_id AS qid, c.cell AS c0,
                   round(list_sum(list_transform(range(len(e.v)), i ->
                     (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))), 9) AS d0
            FROM e1 e, pc2 c WHERE e.vec_id < 5),
    qd2 AS (SELECT e.vec_id AS qid, c.cell AS c1,
                   round(list_sum(list_transform(range(len(e.v)), i ->
                     (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))), 9) AS d1
            FROM e2 e, qc2 c WHERE e.vec_id < 5),
    adc AS (
      SELECT q0.qid, x.vec_id AS nid, round(q0.d0 + q1.d1, 9) AS adc
      FROM (SELECT a.vec_id, a.c0, b.c1 FROM enc1 a JOIN enc2 b USING (vec_id)) x
      JOIN qd1 q0 ON q0.c0 = x.c0
      JOIN qd2 q1 ON q1.c1 = x.c1 AND q1.qid = q0.qid
      WHERE x.vec_id <> q0.qid)
    SELECT qid, nid, adc FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk
      FROM adc)
    WHERE rk <= 5
    """,
)
def ann_pq_adc_topk(spark, sf_dir):
    """Product-quantization ANN with asymmetric distance (Jégou et al.
    2011 — the FAISS PQ index): m=2 subspaces × 4 codewords trained by
    the decimal-exact sampled kmeans, corpus seen only through its
    codes, query-to-codeword distance tables broadcast, candidate
    distance = sum of table lookups. The memory-bandwidth scale path for
    billion-vector corpora (768-dim float32 → m bytes); here the m×k
    tables make every distance a 2-lookup sum, so the scan does no
    per-dimension arithmetic at all. Top-5 per query, (adc, nid)
    tie-broken — with 16 code combos ties are the common case and the
    tie-break carries the order (the oracle replicates codebooks,
    codes, tables, and cut identically)."""
    from graph_db_spark.operators.similarity import pq_adc_topk, pq_fit

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    books = pq_fit(e, m=2, n_codes=4, n_iters=2, sample_mod=4)
    return pq_adc_topk(e, e.filter(F.col("vec_id") < 5), books, k=5)


@q(
    "dedup_containment_exact_pairs",
    r"""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk
      FROM documents
    ),
    tok AS (
      SELECT id, unnest(list_distinct(
               CASE WHEN len(tk) >= 3
                    THEN [array_to_string(tk[i+1:i+3], ' ') FOR i IN range(len(tk) - 2)]
                    ELSE [] END
             )) AS token
      FROM toks
    ),
    sz AS (SELECT id, count(*) AS sz FROM tok GROUP BY id),
    dfq AS (SELECT token, count(*) AS df FROM tok GROUP BY token),
    pos AS (
      SELECT t.id, t.token,
             row_number() OVER (PARTITION BY t.id ORDER BY d.df, t.token) AS pos
      FROM tok t JOIN dfq d ON d.token = t.token
    ),
    pref AS (
      SELECT p.id, p.token
      FROM pos p JOIN sz ON sz.id = p.id
      -- integer overlap bound matching Spark's (sz*4 + 4) DIV 5 (0.8
      -- snaps to the exact rational 4/5); see dedup_prefix_filter_pairs
      WHERE p.pos <= sz.sz - (sz.sz * 4 + 4) // 5 + 1
    ),
    cand AS (
      SELECT DISTINCT least(l.id, r.id) AS a, greatest(l.id, r.id) AS b
      FROM pref l JOIN tok r ON l.token = r.token AND l.id <> r.id
    ),
    inter AS (
      SELECT c.a, c.b, count(*) AS inter
      FROM cand c JOIN tok ta ON ta.id = c.a
      JOIN tok tb ON tb.id = c.b AND tb.token = ta.token
      GROUP BY c.a, c.b
    )
    SELECT i.a, i.b,
           round(i.inter * 1.0 / least(sa.sz, sb.sz), 6) AS containment,
           round(i.inter * 1.0 / (sa.sz + sb.sz - i.inter), 6) AS jaccard
    FROM inter i JOIN sz sa ON sa.id = i.a JOIN sz sb ON sb.id = i.b
    WHERE i.inter >= 0.8 * least(sa.sz, sb.sz)
    """,
)
def dedup_containment_exact_pairs(spark, sf_dir):
    """Exact-recall containment join at t = 0.8 — the one-sided prefix
    pigeonhole (smaller side's rarest tokens vs the other side's FULL
    set), completing the containment story: ``dedup_containment_pairs``
    verifies over Jaccard-banded LSH candidates (its honest recall
    tier), this route GUARANTEES every qualifying subset/quote pair.
    Superset-or-equal of the LSH-fed query's rows at the same threshold;
    brute-force equality pinned in pytest."""
    d = _t(spark, sf_dir, "documents")
    return D.prefix_filter_containment_pairs(d, "doc_id", "text", 0.8, 3)


@q(
    "ann_ivfpq_topk",
    # Oracle re-derives all THREE codebooks (coarse IVF on full vectors +
    # two PQ subspaces), the corpus coarse assignment, each query's
    # n_probe=2 probe list, the PQ codes and distance tables, and the
    # pruned ADC top-k — the complete IVF-PQ index, cross-engine exact.
    "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    "e0 AS (SELECT vec_id, v FROM base),\n"
    "e1 AS (SELECT vec_id, v[1:32] AS v FROM base),\n"
    "e2 AS (SELECT vec_id, v[33:64] AS v FROM base),"
    + _kmeans_sampled_init_sql(4, 4, src="e0", pfx="r")
    + ","
    + _kmeans_iter_sql(1, 0, src="rs", pfx="r")
    + ","
    + _kmeans_iter_sql(2, 1, src="rs", pfx="r")
    + ","
    + _kmeans_sampled_init_sql(4, 4, src="e1", pfx="p")
    + ","
    + _kmeans_iter_sql(1, 0, src="ps", pfx="p")
    + ","
    + _kmeans_iter_sql(2, 1, src="ps", pfx="p")
    + ","
    + _kmeans_sampled_init_sql(4, 4, src="e2", pfx="q")
    + ","
    + _kmeans_iter_sql(1, 0, src="qs", pfx="q")
    + ","
    + _kmeans_iter_sql(2, 1, src="qs", pfx="q")
    + """,
    ccell AS (SELECT vec_id, cell AS ccell FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e0 e, rc2 c) WHERE rn = 1),
    probes AS (SELECT vec_id AS qid, cell AS ccell FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e0 e, rc2 c WHERE e.vec_id < 5) WHERE rn <= 2),
    enc1 AS (SELECT vec_id, cell AS c0 FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e1 e, pc2 c) WHERE rn = 1),
    enc2 AS (SELECT vec_id, cell AS c1 FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e2 e, qc2 c) WHERE rn = 1),
    qd1 AS (SELECT e.vec_id AS qid, c.cell AS c0,
                   round(list_sum(list_transform(range(len(e.v)), i ->
                     (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))), 9) AS d0
            FROM e1 e, pc2 c WHERE e.vec_id < 5),
    qd2 AS (SELECT e.vec_id AS qid, c.cell AS c1,
                   round(list_sum(list_transform(range(len(e.v)), i ->
                     (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))), 9) AS d1
            FROM e2 e, qc2 c WHERE e.vec_id < 5),
    adc AS (
      SELECT pr.qid, x.vec_id AS nid, round(q0.d0 + q1.d1, 9) AS adc
      FROM (SELECT a.vec_id, a.c0, b.c1, cc.ccell
            FROM enc1 a JOIN enc2 b USING (vec_id)
            JOIN ccell cc USING (vec_id)) x
      JOIN probes pr ON pr.ccell = x.ccell
      JOIN qd1 q0 ON q0.qid = pr.qid AND q0.c0 = x.c0
      JOIN qd2 q1 ON q1.qid = pr.qid AND q1.c1 = x.c1
      WHERE x.vec_id <> pr.qid)
    SELECT qid, nid, adc FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk
      FROM adc)
    WHERE rk <= 5
    """,
)
def ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ composed index (the billion-vector FAISS recipe): a coarse
    4-cell k-means quantizer prunes each query's scan to its n_probe=2
    nearest cells, and within them candidates are scored by the PQ/ADC
    lookup sum — per-query work N·(n_probe/k_coarse) table lookups
    instead of N full-dimension distances. All three codebooks (coarse +
    2 subspaces), assignments, probe lists, tables, and the (adc, nid)
    tie-broken cut are deterministic and re-derived bit-for-bit by the
    oracle. Raw-vector PQ codes (FAISS's no-residual option);
    ``ann_ivfpq_residual_topk`` is the production residual refinement."""
    from graph_db_spark.operators.similarity import ivfpq_adc_topk, kmeans_fit, pq_fit

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    coarse = kmeans_fit(e, k=4, n_iters=2, sample_mod=4)
    books = pq_fit(e, m=2, n_codes=4, n_iters=2, sample_mod=4)
    return ivfpq_adc_topk(
        e, e.filter(F.col("vec_id") < 5), coarse, books, k=5, n_probe=2
    )


@q(
    "ann_ivfpq_residual_topk",
    # The oracle re-derives the COMPLETE residual index: coarse codebook
    # (pfx r) on full vectors, the corpus coarse assignment, the residual
    # frame v − centroid(cell) (plain IEEE subtractions of 9dp-rounded
    # centroids — bit-identical on both engines), BOTH residual-subspace
    # PQ codebooks (pfx p/q fitted on f1/f2), the residual codes, each
    # query's PER-PROBED-CELL residual distance tables (keyed qid, ccell,
    # code), and the pruned ADC top-k with the (adc, nid) tie-break.
    "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    "e0 AS (SELECT vec_id, v FROM base),"
    + _kmeans_sampled_init_sql(4, 4, src="e0", pfx="r")
    + ","
    + _kmeans_iter_sql(1, 0, src="rs", pfx="r")
    + ","
    + _kmeans_iter_sql(2, 1, src="rs", pfx="r")
    + """,
    ccell AS (SELECT vec_id, cell AS ccell FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e0 e, rc2 c) WHERE rn = 1),
    res AS (SELECT e.vec_id,
                   list_transform(range(len(e.v)), i -> e.v[i+1] - c.c[i+1]) AS v
            FROM e0 e JOIN ccell cc USING (vec_id)
            JOIN rc2 c ON c.cell = cc.ccell),
    f1 AS (SELECT vec_id, v[1:32] AS v FROM res),
    f2 AS (SELECT vec_id, v[33:64] AS v FROM res),"""
    + _kmeans_sampled_init_sql(4, 4, src="f1", pfx="p")
    + ","
    + _kmeans_iter_sql(1, 0, src="ps", pfx="p")
    + ","
    + _kmeans_iter_sql(2, 1, src="ps", pfx="p")
    + ","
    + _kmeans_sampled_init_sql(4, 4, src="f2", pfx="q")
    + ","
    + _kmeans_iter_sql(1, 0, src="qs", pfx="q")
    + ","
    + _kmeans_iter_sql(2, 1, src="qs", pfx="q")
    + """,
    enc1 AS (SELECT vec_id, cell AS c0 FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM f1 e, pc2 c) WHERE rn = 1),
    enc2 AS (SELECT vec_id, cell AS c1 FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM f2 e, qc2 c) WHERE rn = 1),
    probes AS (SELECT vec_id AS qid, cell AS ccell FROM (
      SELECT e.vec_id, c.cell,
             row_number() OVER (PARTITION BY e.vec_id ORDER BY
               list_sum(list_transform(range(len(e.v)), i ->
                 (e.v[i+1] - c.c[i+1]) * (e.v[i+1] - c.c[i+1]))) ASC,
               c.cell ASC) AS rn
      FROM e0 e, rc2 c WHERE e.vec_id < 5) WHERE rn <= 2),
    qres AS (SELECT pr.qid, pr.ccell,
                    list_transform(range(len(e.v)), i -> e.v[i+1] - c.c[i+1]) AS v
             FROM probes pr JOIN e0 e ON e.vec_id = pr.qid
             JOIN rc2 c ON c.cell = pr.ccell),
    qr1 AS (SELECT qid, ccell, v[1:32] AS v FROM qres),
    qr2 AS (SELECT qid, ccell, v[33:64] AS v FROM qres),
    qd1 AS (SELECT q.qid, q.ccell, c.cell AS c0,
                   round(list_sum(list_transform(range(len(q.v)), i ->
                     (q.v[i+1] - c.c[i+1]) * (q.v[i+1] - c.c[i+1]))), 9) AS d0
            FROM qr1 q, pc2 c),
    qd2 AS (SELECT q.qid, q.ccell, c.cell AS c1,
                   round(list_sum(list_transform(range(len(q.v)), i ->
                     (q.v[i+1] - c.c[i+1]) * (q.v[i+1] - c.c[i+1]))), 9) AS d1
            FROM qr2 q, qc2 c),
    adc AS (
      SELECT pr.qid, x.vec_id AS nid, round(q0.d0 + q1.d1, 9) AS adc
      FROM (SELECT a.vec_id, a.c0, b.c1, cc.ccell
            FROM enc1 a JOIN enc2 b USING (vec_id)
            JOIN ccell cc USING (vec_id)) x
      JOIN probes pr ON pr.ccell = x.ccell
      JOIN qd1 q0 ON q0.qid = pr.qid AND q0.ccell = pr.ccell AND q0.c0 = x.c0
      JOIN qd2 q1 ON q1.qid = pr.qid AND q1.ccell = pr.ccell AND q1.c1 = x.c1
      WHERE x.vec_id <> pr.qid)
    SELECT qid, nid, adc FROM (
      SELECT *, row_number() OVER (PARTITION BY qid ORDER BY adc, nid) AS rk
      FROM adc)
    WHERE rk <= 5
    """,
)
def ann_ivfpq_residual_topk(spark, sf_dir):
    """Residual-encoded IVF-PQ (the production FAISS ``IndexIVFPQ``
    default, Jégou et al. 2011 §IV.B): PQ trains on and encodes
    residuals v − coarse_centroid instead of raw vectors, buying a much
    finer quantization from the same m=2 × 4-codeword budget (residuals
    are near-zero-centered), at the textbook cost of per-(query, probed
    cell) distance tables. The recall rung above ``ann_ivfpq_topk``
    (pytest pins recall ≥ the raw variant on a planted fixture); every
    stage deterministic and oracle-re-derived."""
    from graph_db_spark.operators.similarity import ivfpq_residual_topk, kmeans_fit

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    coarse = kmeans_fit(e, k=4, n_iters=2, sample_mod=4)
    return ivfpq_residual_topk(
        e,
        e.filter(F.col("vec_id") < 5),
        coarse,
        k=5,
        n_probe=2,
        m=2,
        n_codes=4,
        n_iters=2,
        sample_mod=4,
    )


#: Index-format version folded into every persisted-store cache key.
#: BUMP whenever the DERIVATION of store content changes — shingling,
#: MinHash hashing, banding layout, k-means init/iteration rules — so a
#: code change never silently serves a stale, incompatible index from
#: spark-warehouse (round-13 advice: the key previously covered only
#: data fingerprint + parameters).
_STORE_FMT = "fmt=1"


def _dedup_store_path(sf_dir: str, table: str, params: str) -> str:
    """Cache location for a persisted dedup index (signature or semantic)
    of a fixture split — keyed like ``tpch_graph_persisted``'s snapshot
    store on the ABSOLUTE data path plus (mtime_ns, size) of every source
    parquet file plus the index parameters plus ``_STORE_FMT``, so a
    regenerated fixture, changed parameters, or changed index-derivation
    code never serves a stale index."""
    import hashlib
    import os

    src = os.path.join(sf_dir, f"{table}.parquet")
    fp = hashlib.sha256(os.path.abspath(src).encode())
    paths = [src] if os.path.isfile(src) else sorted(
        os.path.join(dp, f)
        for dp, _dn, fn in os.walk(src)
        for f in fn
        if f.endswith(".parquet")
    )
    for p in paths:
        st = os.stat(p)
        fp.update(f"{os.path.relpath(p, src)}|{st.st_mtime_ns}|{st.st_size}\n".encode())
    fp.update(f"{params}|{_STORE_FMT}".encode())
    root = os.environ.get(
        "SPARK_GRAFT_SNAPSHOT_ROOT",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "spark-warehouse",
            "sig_stores",
        ),
    )
    return os.path.join(root, fp.hexdigest()[:16])


def ensure_signature_store(
    spark, sf_dir: str, cutoff: int, n_hashes: int = 8, bands: int = 4, shingle: int = 3
) -> str:
    """Build-once publish of the store side's signature index (docs with
    id < *cutoff*): write to a scratch dir, atomic-rename into the cache
    path, skip entirely when already published. Returns the path."""
    import os
    import shutil
    import uuid

    path = _dedup_store_path(
        sf_dir, "documents", f"cut={cutoff}|nh={n_hashes}|b={bands}|sh={shingle}"
    )
    if os.path.isdir(path):
        return path
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    store_docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < cutoff)
    D.signature_store_write(
        store_docs, tmp, "doc_id", "text", n_hashes=n_hashes, bands=bands, shingle=shingle
    )
    try:
        os.rename(tmp, path)
    except OSError:
        # concurrent publisher won — identical content by construction
        shutil.rmtree(tmp, ignore_errors=True)
    return path


def ensure_semantic_store(
    spark, sf_dir: str, k: int = 8, n_iters: int = 2, sample_mod: int = 4
) -> str:
    """Build-once publish of the semantic dedup index (codebook +
    cell-partitioned members) over the fixture embeddings: scratch write,
    atomic rename, skip when published. Returns the path."""
    import os
    import shutil
    import uuid

    path = _dedup_store_path(sf_dir, "embeddings", f"k={k}|it={n_iters}|mod={sample_mod}")
    if os.path.isdir(path):
        return path
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    D.semantic_store_write(e, tmp, k=k, n_iters=n_iters, sample_mod=sample_mod)
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


@q(
    "dedup_semantic_incremental_store",
    # The oracle re-derives the persisted index bit-for-bit: the sampled
    # codebook (same CTEs as every kmeans-family oracle), the store
    # members' nearest-centroid assignment, the arrivals' assignment to
    # the SAME centroids (no re-fit), and the within-cell y.id < x.id
    # pairwise >= tau verify restricted to arrival x's.
    "WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),\n"
    "e AS (SELECT vec_id, v FROM base),"
    + _kmeans_sampled_init_sql(8, 4)
    + ","
    + _kmeans_iter_sql(1, 0, src="s")
    + ","
    + _kmeans_iter_sql(2, 1, src="s")
    + """,
    arr AS (
      SELECT list_transform(range(0, len(v)), d ->
               v[d + 1] + 0.005 * CAST(((d * 31 + vec_id) % 5) - 2 AS DOUBLE)) AS v,
             vec_id + 100000 AS vec_id
      FROM base WHERE vec_id % 2 = 0
      UNION ALL
      SELECT list_transform(range(0, len(v)), d -> v[len(v) - d]) AS v,
             vec_id + 200000 AS vec_id
      FROM base WHERE vec_id % 2 = 1
    ),
    n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e
          UNION ALL
          SELECT vec_id, v, sqrt(list_dot_product(v, v)) FROM arr),
    cent AS (SELECT cell, c AS cv, sqrt(list_dot_product(c, c)) AS cnrm FROM c2),
    asg AS (
      SELECT vec_id, cell FROM (
        SELECT n.vec_id, cent.cell,
               row_number() OVER (PARTITION BY n.vec_id ORDER BY
                 round(list_dot_product(n.v, cent.cv) / (n.nrm * cent.cnrm), 6) DESC,
                 cent.cell) AS r
        FROM n CROSS JOIN cent) WHERE r = 1),
    mem AS (SELECT a.vec_id, a.cell, n.v, n.nrm
            FROM asg a JOIN n ON n.vec_id = a.vec_id),
    pairs AS (
      SELECT y.vec_id AS a, x.vec_id AS b,
             round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos
      FROM mem x JOIN mem y ON x.cell = y.cell AND y.vec_id < x.vec_id
      WHERE x.vec_id >= 100000
        AND round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) >= 0.99)
    SELECT b AS vec_id, min(a) AS dup_of, arg_min(cos, a) AS cos,
           count(*) AS n_dups
    FROM pairs GROUP BY b
    """,
)
def dedup_semantic_incremental_store(spark, sf_dir):
    """Incremental SEMANTIC dedup against a persisted index — the
    embedding-family twin of ``dedup_incremental_persisted_store``
    (round-13 arc: indexes paid at write time, Graph.hs:57-61). The
    store's codebook + cell-partitioned member table are built once
    (``ensure_semantic_store``); the arriving batch — perturbed twins of
    the even store vectors (must be caught) plus reversed vectors of the
    odd ones (novel, must mostly pass) — pays one broadcast assignment
    and a within-TOUCHED-cell verify, never a Lloyd re-fit and never a
    store×store comparison. Output per dropped arrival: canonical
    duplicate (min matching id — store beats same-batch), its cosine,
    match count."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    store_path = ensure_semantic_store(spark, sf_dir, k=8, n_iters=2, sample_mod=4)
    pert = e.filter(F.col("vec_id") % 2 == 0).select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, d: x
            + F.lit(0.005) * (((d * 31 + F.col("vec_id")) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    rev = e.filter(F.col("vec_id") % 2 == 1).select(
        (F.col("vec_id") + F.lit(200000)).alias("vec_id"),
        F.reverse("embedding").alias("embedding"),
    )
    pairs = D.incremental_semantic_vs_store(
        spark, store_path, pert.unionByName(rev), tau=0.99
    )
    return pairs.groupBy("b").agg(
        F.min("a").alias("dup_of"),
        F.min_by("cos", "a").alias("cos"),
        F.count(F.lit(1)).alias("n_dups"),
    ).select(F.col("b").alias("vec_id"), "dup_of", "cos", "n_dups")


@q(
    "dedup_incremental_persisted_store",
    REGISTRY["dedup_incremental_new_vs_store"].oracle,
)
def dedup_incremental_persisted_store(spark, sf_dir):
    """The production route of ``dedup_incremental_new_vs_store``: the
    store side's MinHash signature/band table is PERSISTED once (indexes
    paid at write time — the reference's insert-time index principle,
    Graph.hs:57-61) and every arriving batch is served from it, so the
    per-batch plan never re-shingles or re-signs the store. Same oracle
    SQL as the recompute fixture — the routes are result-identical
    (signatures are deterministic md5 minima; pytest asserts equality) —
    which makes the driver row a cross-route correctness check, not just
    a second copy. Scale analysis lives on
    ``operators.dedup.incremental_near_dup_vs_store``; the store-size
    independence claim is measured in SCALE_STRESS_r13 (fixed batch vs
    1x/10x store)."""
    n = _parquet_rows(sf_dir, "documents")
    cutoff = (n * 8) // 10
    d = _t(spark, sf_dir, "documents")
    store_path = ensure_signature_store(spark, sf_dir, cutoff)
    pairs = D.incremental_near_dup_vs_store(
        spark,
        store_path,
        arrivals=d.filter(F.col("doc_id") >= cutoff),
        store_docs=d.filter(F.col("doc_id") < cutoff),
        threshold=0.7,
    )
    return pairs.groupBy("b").agg(
        F.min("a").alias("dup_of"),
        F.min_by("jaccard", "a").alias("jaccard"),
        F.count(F.lit(1)).alias("n_dups"),
    ).select(F.col("b").alias("doc_id"), "dup_of", "jaccard", "n_dups")


def ensure_ivfpq_store(
    spark,
    sf_dir: str,
    coarse_k: int = 4,
    m: int = 2,
    n_codes: int = 4,
    n_iters: int = 2,
    sample_mod: int = 4,
) -> str:
    """Build-once publish of the residual IVF-PQ index (coarse quantizer
    + residual subspace codebooks + cell-partitioned codes) over the
    fixture embeddings: scratch write, atomic rename, skip when
    published. Returns the path. Round-15 completion of the residual
    rung's own docstring plan (similarity.py: production "PERSISTS the
    residual CODES as a write-time index")."""
    import os
    import shutil
    import uuid

    from graph_db_spark.operators.similarity import ivfpq_residual_store_write

    path = _dedup_store_path(
        sf_dir,
        "embeddings",
        f"ivfpq|ck={coarse_k}|m={m}|nc={n_codes}|it={n_iters}|mod={sample_mod}",
    )
    if os.path.isdir(path):
        return path
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    ivfpq_residual_store_write(
        e, tmp, coarse_k=coarse_k, m=m, n_codes=n_codes, n_iters=n_iters,
        sample_mod=sample_mod,
    )
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


@q(
    "ann_ivfpq_residual_persisted",
    REGISTRY["ann_ivfpq_residual_topk"].oracle,
)
def ann_ivfpq_residual_persisted(spark, sf_dir):
    """The production route of ``ann_ivfpq_residual_topk``: the coarse
    quantizer, residual PQ codebooks, and per-vector residual codes are
    PERSISTED once as a write-time index (``ensure_ivfpq_store`` →
    ``similarity.ivfpq_residual_store_write``) and every query batch is
    served from it — probe the k persisted centroids, broadcast the
    per-(query, probed cell) distance tables, ADC-scan only the probed
    cells' code partitions (the store is partitioned BY ccell; dynamic
    partition pruning cuts the scan). No coarse re-assign, no residual
    materialization, no Lloyd re-fit at query time — the
    ``dedup_incremental_persisted_store`` arc applied to ANN, closing
    the fixture-scale localCheckpoint cut the in-query variant
    documents. Same oracle SQL as the in-query fixture — the routes are
    result-identical (the store caches a pure function of the corpus;
    pytest asserts frame equality) — so the driver row is a cross-route
    correctness check. Scale evidence: SCALE_STRESS_r15 ivfpq_persisted
    (fixed query batch vs 1x/10x store at constant-cell k)."""
    from graph_db_spark.operators.similarity import ivfpq_residual_topk_persisted

    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    store_path = ensure_ivfpq_store(spark, sf_dir)
    return ivfpq_residual_topk_persisted(
        spark, store_path, e.filter(F.col("vec_id") < 5), k=5, n_probe=2
    )
