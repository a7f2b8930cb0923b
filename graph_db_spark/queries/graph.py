"""Graph family: the reference's traversal surface on the TPC-H-derived graph, persisted-snapshot twins, and Pregel-style analytics (SURVEY §2.1-§2.2, §2.5).

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
