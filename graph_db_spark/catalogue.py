"""Graph models: the reference's music catalogue + a TPC-H-derived graph.

1. ``catalogue_schema()`` — the reference's canonical test/benchmark model
   (executables/APITests/Catalogue.hs:19-73, executables/Demo.hs:11-46,
   executables/Benchmarks/GraphDB.hs:14-57): Root/Artist/Genre/Song vertex
   kinds, UID/Name/SearchTerm/marker indexes. Used by the graph-core unit
   and property tests (mirrors the reference's own test model,
   executables/InternalTests/GraphTests.hs:22-49).

2. ``tpch_graph(spark, sf_dir)`` — the same graph machinery instantiated
   over the driver's deterministic TPC-H-ish parquet, so every graph query
   has a DuckDB-oracle twin (ids are pure arithmetic on the business keys;
   the oracle SQL reproduces them exactly). Shape:

       root(0) → region → nation → {customer, supplier}
                               customer → order → part (via lineitem)

   This mirrors the reference's layered catalogue (root → genre → song →
   artist) at a scale the driver controls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from graph_db_spark.graph import GraphSnapshot
from graph_db_spark.model import ROOT_ID, EdgeKind, GraphSchema, IndexSpec, VertexKind


def catalogue_schema() -> GraphSchema:
    """Music-catalogue model, index emission per APITests/Catalogue.hs:36-73
    and Demo.hs:19-45 (search terms = whitespace tokens of the name)."""
    return GraphSchema(
        vertex_kinds=(
            VertexKind("Root"),
            VertexKind("Artist", ("name", "uid")),
            VertexKind("Genre", ("name", "uid")),
            VertexKind("Song", ("name", "uid")),
        ),
        edge_kinds=(
            EdgeKind(
                "Root",
                "Artist",
                (
                    IndexSpec("Catalogue_Artist"),
                    IndexSpec("Catalogue_Artist_UID", "cast(uid as string)"),
                    IndexSpec("Catalogue_Artist_Name", "name"),
                    IndexSpec("Catalogue_Artist_SearchTerm", "split(name, ' ')", explode=True),
                ),
            ),
            EdgeKind(
                "Root",
                "Genre",
                (
                    IndexSpec("Catalogue_Genre"),
                    IndexSpec("Catalogue_Genre_UID", "cast(uid as string)"),
                    IndexSpec("Catalogue_Genre_Name", "name"),
                ),
            ),
            EdgeKind(
                "Root",
                "Song",
                (
                    IndexSpec("Catalogue_Song"),
                    IndexSpec("Catalogue_Song_UID", "cast(uid as string)"),
                    IndexSpec("Catalogue_Song_Name", "name"),
                ),
            ),
            EdgeKind("Genre", "Song", (IndexSpec("Genre_Song"),)),
            EdgeKind("Song", "Artist", (IndexSpec("Song_Artist"),)),
        ),
    )


# Deterministic id arithmetic — reproduced verbatim in the oracle SQL.
OFFSETS = {
    "Region": 1_000_000_000_000,
    "Nation": 2_000_000_000_000,
    "Customer": 3_000_000_000_000,
    "Supplier": 4_000_000_000_000,
    "Order": 5_000_000_000_000,
    "Part": 6_000_000_000_000,
}


def tpch_graph_schema() -> GraphSchema:
    return GraphSchema(
        vertex_kinds=(
            VertexKind("Root"),
            VertexKind("Region", ("name", "uid")),
            VertexKind("Nation", ("name", "uid")),
            VertexKind("Customer", ("name", "uid")),
            VertexKind("Supplier", ("name", "uid")),
            VertexKind("Order", ("name", "uid")),
            VertexKind("Part", ("name", "uid")),
        ),
        edge_kinds=(
            EdgeKind(
                "Root",
                "Region",
                (
                    IndexSpec("Catalogue_Region"),
                    IndexSpec("Catalogue_Region_UID", "cast(uid as string)"),
                    IndexSpec("Catalogue_Region_Name", "name"),
                ),
            ),
            EdgeKind(
                "Region",
                "Nation",
                (IndexSpec("Region_Nation"), IndexSpec("Region_Nation_Name", "name")),
            ),
            EdgeKind(
                "Nation",
                "Customer",
                (IndexSpec("Nation_Customer"), IndexSpec("Nation_Customer_Name", "name")),
            ),
            EdgeKind(
                "Nation",
                "Supplier",
                (IndexSpec("Nation_Supplier"), IndexSpec("Nation_Supplier_Name", "name")),
            ),
            EdgeKind(
                "Customer",
                "Order",
                (IndexSpec("Customer_Order"), IndexSpec("Customer_Order_UID", "cast(uid as string)")),
            ),
            EdgeKind(
                "Order",
                "Part",
                (
                    IndexSpec("Order_Part"),
                    IndexSpec("Order_Part_Name", "name"),
                    # Demo.hs:28's Text.words search-term index, on part names.
                    IndexSpec("Order_Part_SearchTerm", "split(name, ' ')", explode=True),
                ),
            ),
        ),
    )


def tpch_graph(spark: SparkSession, sf_dir: str) -> GraphSnapshot:
    """Build the TPC-H-derived graph snapshot. Pure DataFrame transforms —
    at scale this is one pass over each base table, no driver collection."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")

    def v(df, key, name_col, kind):
        return df.select(
            (F.lit(OFFSETS[kind]) + F.col(key).cast("long")).alias("id"),
            F.lit(kind).alias("kind"),
            F.col(name_col).cast("string").alias("name"),
            F.col(key).cast("long").alias("uid"),
        )

    root = spark.createDataFrame(
        [(ROOT_ID, "Root", None, None)], "id LONG, kind STRING, name STRING, uid LONG"
    )
    vertices = (
        root.unionByName(v(region, "r_regionkey", "r_name", "Region"))
        .unionByName(v(nation, "n_nationkey", "n_name", "Nation"))
        .unionByName(v(customer, "c_custkey", "c_name", "Customer"))
        .unionByName(v(supplier, "s_suppkey", "s_name", "Supplier"))
        .unionByName(
            orders.select(
                (F.lit(OFFSETS["Order"]) + F.col("o_orderkey").cast("long")).alias("id"),
                F.lit("Order").alias("kind"),
                F.col("o_orderstatus").cast("string").alias("name"),
                F.col("o_orderkey").cast("long").alias("uid"),
            )
        )
        .unionByName(v(part, "p_partkey", "p_name", "Part"))
    )

    def e(df, src_off, src_key, dst_off, dst_key):
        return df.select(
            (F.lit(src_off) + F.col(src_key).cast("long")).alias("src"),
            (F.lit(dst_off) + F.col(dst_key).cast("long")).alias("dst"),
        )

    # Set-semantic (src, dst) without a global dedup exchange (guide §2.4):
    # every branch's dst id-space is disjoint (per-kind OFFSETS), and each
    # PK-keyed branch (region/nation/customer/supplier/orders) emits a
    # unique dst per row, so the ONLY branch that can repeat a pair is
    # lineitem (one order can list the same part on several lines). Dedup
    # that branch alone and pass edges_distinct — the union is then
    # provably duplicate-free and the 5 narrow branches never shuffle.
    edges = (
        region.select(F.lit(ROOT_ID).cast("long").alias("src"),
                      (F.lit(OFFSETS["Region"]) + F.col("r_regionkey").cast("long")).alias("dst"))
        .unionByName(e(nation, OFFSETS["Region"], "n_regionkey", OFFSETS["Nation"], "n_nationkey"))
        .unionByName(e(customer, OFFSETS["Nation"], "c_nationkey", OFFSETS["Customer"], "c_custkey"))
        .unionByName(e(supplier, OFFSETS["Nation"], "s_nationkey", OFFSETS["Supplier"], "s_suppkey"))
        .unionByName(e(orders, OFFSETS["Customer"], "o_custkey", OFFSETS["Order"], "o_orderkey"))
        .unionByName(
            e(lineitem, OFFSETS["Order"], "l_orderkey", OFFSETS["Part"], "l_partkey")
            .dropDuplicates(["src", "dst"])
        )
    )
    return GraphSnapshot.from_tables(
        vertices, edges, tpch_graph_schema(), broadcast_vertices=True, edges_distinct=True
    )


def tpch_graph_persisted(
    spark: SparkSession,
    sf_dir: str,
    root: str | None = None,
    rebuild: bool = False,
) -> GraphSnapshot:
    """Steady-state route: the graph loaded from a persisted, src-bucketed
    snapshot store — the deployment shape, matching the reference's
    always-resident graph (Graph.hs:27-34).

    ``tpch_graph`` rebuilds vertices/edges/edge_index from the base
    parquet on every call — correct, but every registered traversal then
    carries the whole build stage (~18 exchanges) in front of its 2-3
    broadcast hops. A deployed store instead checkpoints the snapshot
    ONCE (``EventLogStorage.checkpoint`` writes edge_index bucketed by
    ``src`` — the traversal join key), and every later session loads the
    published tables: hop joins read pre-bucketed files with NO exchange
    on the index side and no build stage at all. At 100 TB this is the
    difference between re-deriving trillions of index rows per query and
    scanning only the buckets the frontier hashes into.

    First call (or ``rebuild=True``) builds + checkpoints; subsequent
    calls just load. The store keys on (sf basename, schema hash, data
    fingerprint) where the fingerprint hashes the ABSOLUTE sf_dir path
    plus (relpath, mtime_ns, size) of every parquet file under it — so
    neither a model change, nor two datasets whose directories share a
    basename, nor a fixture regenerated in place can serve a stale
    snapshot. (The stat walk is driver-side and costs microseconds per
    file; at deployment scale the equivalent is the table version /
    snapshot id of the catalog entry.)
    """
    import hashlib
    import os

    from graph_db_spark.graph import GraphSession
    from graph_db_spark.storage import EventLogStorage, schema_hash

    schema = tpch_graph_schema()
    if root is None:
        root = os.environ.get(
            "SPARK_GRAFT_SNAPSHOT_ROOT",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "spark-warehouse",
                "tpch_snapshots",
            ),
        )
    fp = hashlib.sha256(os.path.abspath(sf_dir).encode())
    # sorted() consumes the whole walk up front, making the fingerprint
    # deterministic by dirpath regardless of filesystem order
    for dirpath, _dirnames, filenames in sorted(os.walk(sf_dir)):
        for name in sorted(filenames):
            if not name.endswith(".parquet"):
                continue
            p = os.path.join(dirpath, name)
            st = os.stat(p)
            fp.update(
                f"{os.path.relpath(p, sf_dir)}|{st.st_mtime_ns}|{st.st_size}\n".encode()
            )
    store_path = os.path.join(
        root,
        f"{os.path.basename(os.path.normpath(sf_dir))}-"
        f"{schema_hash(schema)[:8]}-{fp.hexdigest()[:10]}",
    )
    store = EventLogStorage(spark, store_path, schema)
    versions = store._ckpt_versions()
    if rebuild or not versions:
        # writer lock: two sessions racing to build the same snapshot
        # would collide in the checkpoint staging dir; the loser waits for
        # the winner's publish and loads it instead of rebuilding.
        import time

        from graph_db_spark.storage import StorageLockedError

        try:
            store.acquire()
        except StorageLockedError:
            deadline = time.time() + 600
            while time.time() < deadline:
                versions = store._ckpt_versions()
                if versions:
                    return store.load_version(versions[-1], replay=False)
                time.sleep(1)
            raise
        try:
            store.checkpoint(GraphSession(tpch_graph(spark, sf_dir)))
        finally:
            store.release()
        versions = store._ckpt_versions()
    return store.load_version(versions[-1], replay=False)
