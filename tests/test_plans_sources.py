"""Plan-quality regression tests (+ source/sink connectors).

The scale contract (SURVEY §4): filters and projections reach the parquet
scan, small dims broadcast, the hot path stays inside whole-stage codegen.
These assert it programmatically so a plan regression fails CI, not a
benchmark run three rounds later."""

from pyspark.sql import functions as F, types as T

from graph_db_spark.plans import (
    has_broadcast_join,
    has_whole_stage_codegen,
    pushed_filters,
    read_schema_columns,
)
from graph_db_spark.queries import REGISTRY
from graph_db_spark.sources import read_table, write_table


def test_filter_and_projection_pushdown(spark, sf_dir):
    df = REGISTRY["filter_pushdown_scan"].build(spark, sf_dir)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    cols = set(read_schema_columns(df))
    # only the 5 referenced columns are read, not all 11
    assert cols == {"l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"}


def test_q5_broadcasts_dims_and_codegen(spark, sf_dir):
    df = REGISTRY["q5_region_revenue"].build(spark, sf_dir)
    assert has_broadcast_join(df)
    assert has_whole_stage_codegen(df)


def test_traversal_reads_only_index_columns(spark, sf_dir):
    """A get_targets chain projects (src, idx_tag, idx_key, dst) — the
    vertex payload is only read at the final get_values projection."""
    from graph_db_spark.catalogue import tpch_graph
    from graph_db_spark.model import ROOT_ID

    g = tpch_graph(spark, sf_dir)
    hops = g.get_targets(
        g.get_targets(ROOT_ID, "Catalogue_Region_Name", "EUROPE"), "Region_Nation"
    )
    assert has_whole_stage_codegen(hops)


def test_read_write_roundtrip_formats(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("g"), F.concat(F.lit("v"), F.col("id")).alias("s")
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("g", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    for fmt in ["parquet", "orc", "json", "csv"]:
        p = str(tmp_path / fmt)
        write_table(df, p, fmt=fmt)
        back = read_table(spark, p, fmt=fmt, schema=schema if fmt in ("json", "csv") else None)
        assert back.count() == 100
        assert {r["s"] for r in back.collect()} == {f"v{i}" for i in range(100)}


def test_partitioned_write_prunes(spark, tmp_path):
    df = spark.range(1000).select(F.col("id"), (F.col("id") % 5).alias("bucket"))
    p = str(tmp_path / "part")
    write_table(df, p, partition_by=["bucket"])
    back = read_table(spark, p).filter(F.col("bucket") == 3)
    assert back.count() == 200
    # partition pruning: the filter never reaches row-level PushedFilters
    # because the directory layout already eliminated the other buckets
    import re

    from graph_db_spark.plans import explain_str

    text = explain_str(back)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", text)
    assert m and "bucket" in m.group(1)


def test_csv_requires_schema(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError):
        read_table(spark, str(tmp_path), fmt="csv")


def test_lakehouse_gated(spark, tmp_path):
    import pytest

    with pytest.raises((NotImplementedError, Exception)):
        read_table(spark, str(tmp_path), fmt="delta")


def test_near_dup_pairs_no_cross_product(spark, sf_dir):
    """The registered near-dup query must generate candidates via LSH
    bucket equi-joins — a CartesianProduct/BroadcastNestedLoopJoin in its
    plan is a scale regression (O(n²) at 100 TB)."""
    from graph_db_spark.plans import explain_str

    df = REGISTRY["embedding_near_dup_pairs"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_lsh_near_dup_recall_matches_exact(spark, sf_dir):
    """LSH-bucketed near-dup pairs == exact all-pairs on the same frame
    (recall 1.0 at near-dup thresholds; deterministic planes, so this is a
    stable property, not a flaky probabilistic one)."""
    from graph_db_spark.operators.similarity import exact_near_dup_pairs, lsh_near_dup_pairs

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pert = e.select(
        (F.col("vec_id") + F.lit(100000)).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, d: x.cast("double")
            + F.lit(0.005) * (((d * 31 + F.col("vec_id")) % 5) - 2).cast("double"),
        ).alias("embedding"),
    )
    both = e.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    ).unionByName(pert)
    got = sorted(map(tuple, lsh_near_dup_pairs(both, threshold=0.99).collect()))
    want = sorted(map(tuple, exact_near_dup_pairs(both, threshold=0.99).collect()))
    assert got == want and len(got) > 0


def test_salted_join_equivalence(spark):
    from graph_db_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(k, i) for i in range(200) for k in ([1] * 5 + [2])], "k LONG, payload LONG"
    )
    small = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k LONG, v STRING")
    plain = big.join(small, ["k"]).groupBy("k", "v").count()
    salted = salted_join(big, small, ["k"], n_salts=4).groupBy("k", "v").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_count_distinct_exact(spark):
    from graph_db_spark.operators.skew import salted_count_distinct

    df = spark.createDataFrame(
        [(g, v % 37) for g in (1, 2) for v in range(500)], "g LONG, v LONG"
    )
    got = {r["g"]: r["n_distinct"] for r in salted_count_distinct(df, ["g"], "v").collect()}
    assert got == {1: 37, 2: 37}


def test_bucketed_join_no_shuffle(spark, tmp_path):
    """Bucketed tables co-locate the join: neither side shuffles (the plan
    has no Exchange over the scans) — the 100 TB answer to repeated
    large-x-large joins on the same key."""
    from graph_db_spark.sources.connectors import write_table

    spark.sql("DROP TABLE IF EXISTS bk_orders")
    spark.sql("DROP TABLE IF EXISTS bk_lineitem")
    o = spark.createDataFrame([(i, f"o{i}") for i in range(1000)], "okey LONG, tag STRING")
    l = spark.createDataFrame(
        [(i % 1000, i) for i in range(5000)], "okey LONG, item LONG"
    )
    write_table(o, str(tmp_path / "o"), bucket_by=(8, ["okey"]), table_name="bk_orders", mode="overwrite")
    write_table(l, str(tmp_path / "l"), bucket_by=(8, ["okey"]), table_name="bk_lineitem", mode="overwrite")
    # Force the shuffle-based strategy (tiny test tables would broadcast,
    # which sidesteps bucketing): bucketed SMJ must need NO Exchange.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_orders").join(spark.table("bk_lineitem"), "okey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "Bucketed: true" in plan, plan
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_simhash_banded_no_cross_product(spark, sf_dir):
    """SimHash banded near-dup must generate candidates via the
    (band, bucket) equi-join — no cross product anywhere in the plan."""
    from graph_db_spark.plans import explain_str

    for name in ("dedup_simhash_banded", "dedup_simhash_banded_wide"):
        plan = explain_str(REGISTRY[name].build(spark, sf_dir))
        assert "CartesianProduct" not in plan, (name, plan)
        assert "BroadcastNestedLoopJoin" not in plan, (name, plan)


def test_part_popularity_uses_take_ordered(spark, sf_dir):
    """The hub top-20 must be a distributed TakeOrdered (partial top-k
    per partition + driver merge), never a global sort."""
    from graph_db_spark.plans import explain_str

    df = REGISTRY["graph_part_popularity"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_tpch_global_topk_uses_take_ordered(spark, sf_dir):
    """q3 / q10 take their global top-k via orderBy().limit() →
    TakeOrderedAndProject (round-11 verdict item 2). A row_number() over
    an unpartitioned window would funnel every aggregated group through
    ONE partition at scale — assert no Window operator survives in
    either plan."""
    from graph_db_spark.plans import explain_str

    for name in ("q3_shipping_priority", "q10_returned_items"):
        plan = explain_str(REGISTRY[name].build(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, (name, plan)
        assert "Window" not in plan, (name, plan)


def test_simhash_banded_recall_exact(spark, sf_dir):
    """Band-bucket candidates lose nothing: for Hamming <= 3 with 4
    bands, every close pair agrees on at least one band (pigeonhole), so
    the banded result equals the exact all-pairs computation."""
    from pyspark.sql import functions as F

    from graph_db_spark.operators import dedup as D

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = D.simhash_bits(D.shingles(d, "doc_id", "text", 3), n_bits=32).localCheckpoint()

    banded = {
        (r["a"], r["b"], r["hd"])
        for r in D.simhash_near_dup_pairs(sigs, 32, 4, 3).collect()
    }
    sa = sigs.select(F.col("id").alias("a"), F.col("simhash").alias("sig_a"))
    sb = sigs.select(F.col("id").alias("b"), F.col("simhash").alias("sig_b"))
    hd = F.size(
        F.filter(
            F.sequence(F.lit(1), F.lit(32)),
            lambda i: F.substring(F.col("sig_a"), i, F.lit(1))
            != F.substring(F.col("sig_b"), i, F.lit(1)),
        )
    )
    exact = {
        (r["a"], r["b"], r["hd"])
        for r in sa.crossJoin(sb)
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", hd.alias("hd"))
        .filter(F.col("hd") <= 3)
        .collect()
    }
    assert banded == exact and exact  # non-empty at sf0.001


def test_simhash_wide_signatures_prefix_compatible(spark, sf_dir):
    """The round-12 chunked-md5 widening must leave bits 0..31 exactly
    as the original 32-bit form computed them (chunk 0 is md5(token)
    unchanged): the 64-bit signature's 32-char prefix equals the 32-bit
    signature per doc. Pins both oracle continuity and the 'widening
    only sharpens precision' claim — banded_wide pairs at the same
    (bands=4, max_hamming=3) must be a subset of the 32-bit pairs'
    (a, b) set."""
    from pyspark.sql import functions as F

    from graph_db_spark.operators import dedup as D

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tok = D.shingles(d, "doc_id", "text", 3).localCheckpoint()
    s32 = {r["id"]: r["simhash"] for r in D.simhash_bits(tok, n_bits=32).collect()}
    s64 = {r["id"]: r["simhash"] for r in D.simhash_bits(tok, n_bits=64).collect()}
    assert set(s32) == set(s64)
    for i, sig in s64.items():
        assert len(sig) == 64 and sig[:32] == s32[i], i
    wide = {
        (r["a"], r["b"])
        for r in D.simhash_near_dup_pairs(
            D.simhash_bits(tok, 64), 64, 4, 3
        ).collect()
    }
    narrow = {
        (r["a"], r["b"])
        for r in D.simhash_near_dup_pairs(
            D.simhash_bits(tok, 32), 32, 4, 3
        ).collect()
    }
    assert wide <= narrow


def test_spread_small_input_conditional(spark, sf_dir):
    """spread_small_input widens a narrow scan to cluster parallelism but
    is a no-op (no added shuffle) on an already-wide input."""
    from graph_db_spark.session import spread_small_input

    par = spark.sparkContext.defaultParallelism
    narrow = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert narrow.rdd.getNumPartitions() < par
    assert spread_small_input(narrow).rdd.getNumPartitions() == par

    wide = narrow.repartition(par * 2)
    assert spread_small_input(wide) is wide


def test_reloaded_edge_index_bucketed_no_index_shuffle(spark, tmp_path):
    """A RELOADED store's edge_index keeps its bucket layout (checkpoint
    writes it CLUSTERED BY src, the traversal join key): a post-reload
    traversal join shows no Exchange over the index-side scan — at 100x
    the alternative is re-shuffling the whole persisted index on every
    traversal after restart."""
    from graph_db_spark.catalogue import catalogue_schema
    from graph_db_spark.graph import GraphSession, GraphSnapshot
    from graph_db_spark.model import ROOT_ID
    from graph_db_spark.storage import EventLogStorage

    store = EventLogStorage(spark, str(tmp_path / "bstore"), catalogue_schema(), index_buckets=8)
    s = GraphSession(GraphSnapshot.empty(spark, catalogue_schema()), storage=store)

    def prog(tx):
        for i in range(200):
            a = tx.new_node("Artist", name=f"artist {i}", uid=i)
            tx.add_target(ROOT_ID, a)

    s.write(prog)
    store.checkpoint(s)

    reloaded = store.load(lambda sp, sch: GraphSnapshot.empty(sp, sch))
    snap = reloaded.snapshot
    frontier = snap.vertices.select("id")  # every node: too big a frontier to matter
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = snap.edge_index.join(frontier.withColumnRenamed("id", "src"), "src")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        # exactly one Exchange: the frontier side shuffling INTO the
        # index's bucket layout; the index scan itself must not shuffle
        assert plan.count("Exchange") == 1, plan
        # every index row's src (the root) is in the frontier — the join
        # must preserve the full index through the bucketed path
        assert joined.count() == snap.edge_index.count()
        # semantics survive the layout: indexed lookup still answers
        hits = snap.get_targets(ROOT_ID, "Catalogue_Artist_SearchTerm", "artist")
        assert hits.count() == 200
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_reload_not_stale_after_recreate(spark, tmp_path):
    """Re-creating a store at the SAME path with a DIFFERENT bucket count
    must not reuse the previous catalog spec (round-5 review finding:
    the reader table was keyed on path alone, so CREATE TABLE IF NOT
    EXISTS no-op'd and Spark trusted a stale CLUSTERED BY — wrong-bucket
    joins return wrong rows, silently)."""
    import shutil

    from graph_db_spark.catalogue import catalogue_schema
    from graph_db_spark.graph import GraphSession, GraphSnapshot
    from graph_db_spark.model import ROOT_ID
    from graph_db_spark.storage import EventLogStorage

    path = str(tmp_path / "restore")

    def build(n_buckets, n_artists):
        store = EventLogStorage(spark, path, catalogue_schema(), index_buckets=n_buckets)
        s = GraphSession(GraphSnapshot.empty(spark, catalogue_schema()), storage=store)

        def prog(tx):
            for i in range(n_artists):
                a = tx.new_node("Artist", name=f"artist {i}", uid=i)
                tx.add_target(ROOT_ID, a)

        s.write(prog)
        store.checkpoint(s)
        return store

    store = build(32, 50)
    first = store.load(lambda sp, sch: GraphSnapshot.empty(sp, sch))
    assert first.snapshot.get_targets(ROOT_ID, "Catalogue_Artist").count() == 50
    store.close()

    shutil.rmtree(path)
    store2 = build(8, 70)
    second = store2.load(lambda sp, sch: GraphSnapshot.empty(sp, sch))
    # a stale 32-bucket spec over 8-bucket files would mis-join here
    assert second.snapshot.get_targets(ROOT_ID, "Catalogue_Artist").count() == 70
    assert (
        second.snapshot.get_targets(ROOT_ID, "Catalogue_Artist_Name", "artist 69").count()
        == 1
    )
    store2.close()


def test_bucketed_reload_concurrent_stable_key_no_cross_resolution(spark, tmp_path):
    """Two concurrent loaders sharing a stable_key but targeting DIFFERENT
    paths (the streaming sink's _load_epoch after publish vs a concurrent
    load_published_snapshot, or two checkpoint versions of one store)
    must each resolve their OWN path. Before the per-entry lock, the
    drop+create+spark.table sequence could interleave so one loader's
    spark.table resolved the other loader's just-created entry —
    silently yielding an edge_index from a different epoch than its
    vertices/edges (round-7 advisor finding). Hammered across threads to
    make the interleave likely without the lock."""
    import threading

    from graph_db_spark.graph import edge_index_schema, local_frame
    from graph_db_spark.storage import read_edge_index_bucketed, write_edge_index_bucketed

    schema = edge_index_schema()
    paths = {}
    for tag in ("alpha", "beta"):
        rows = [
            {"src": 1, "idx_tag": tag, "idx_key": f"{tag}-{i}", "dst": 100 + i}
            for i in range(20)
        ]
        p = str(tmp_path / f"ei-{tag}")
        assert write_edge_index_bucketed(spark, local_frame(spark, rows, schema), p, 4) == 4
        paths[tag] = p

    errors = []
    barrier = threading.Barrier(2)

    def loader(tag: str):
        try:
            for _ in range(15):
                barrier.wait(timeout=30)
                df = read_edge_index_bucketed(
                    spark, paths[tag], 4, stable_key="race-shared-key"
                )
                tags = [r[0] for r in df.select("idx_tag").distinct().collect()]
                if tags != [tag]:
                    errors.append(f"{tag} resolved {tags}")
        except Exception as exc:  # noqa: BLE001 — surfaced via errors list
            errors.append(f"{tag}: {exc!r}")

    threads = [threading.Thread(target=loader, args=(t,)) for t in ("alpha", "beta")]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert not errors, errors


def test_persisted_tpch_snapshot_traversal_steady_state(spark, sf_dir, tmp_path):
    """The steady-state graph-query route (tpch_graph_persisted): loaded
    from a persisted src-bucketed snapshot store, a traversal's plan has
    NO build stage (no Union re-deriving vertices/edges/index from base
    parquet) and no exchange over the index side — and returns exactly
    the cold-build route's rows. At 100x the build stage is ~18 exchanges
    over every base table in front of every registered hop query."""
    from graph_db_spark.catalogue import tpch_graph, tpch_graph_persisted
    from graph_db_spark.model import ROOT_ID

    g = tpch_graph_persisted(spark, sf_dir, root=str(tmp_path / "snaps"))

    # -- single hop, broadcast disabled: the index scan itself must read
    # its bucket layout with no Exchange above it (only the frontier
    # shuffles into the index's partitioning)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        frontier = g.vertices.select("id").limit(10**9)  # opaque: no broadcast
        hop = g.edge_index.join(frontier.withColumnRenamed("id", "src"), "src")
        plan = hop._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan, plan
        assert plan.count("Exchange") <= 2, plan  # frontier side only
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # -- full 3-hop traversal under defaults: no build-stage Union, and
    # identical rows to the fresh-build route
    def three_hop(snap):
        f = snap.get_targets(ROOT_ID, "Catalogue_Region_Name", "EUROPE")
        for tag in ("Region_Nation", "Nation_Customer"):
            f = snap.get_targets(f, tag)
        return snap.get_values(f).select("id", "name")

    out = three_hop(g)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan, plan
    expected = three_hop(tpch_graph(spark, sf_dir))
    assert out.exceptAll(expected).unionByName(expected.exceptAll(out)).isEmpty()
    assert out.count() > 0


def test_persisted_registry_queries_have_no_build_stage(spark, sf_dir, monkeypatch, tmp_path):
    """Every REGISTERED steady-state twin (graph_*_persisted*) must carry
    no build stage in its executed plan — no Union re-deriving
    vertices/edges/index from base parquet — and agree with its
    cold-build twin row-for-row. This is the deployment contract: the
    registry, not a bespoke test harness, proves the always-resident
    graph shape (Graph.hs:27-34) for the whole traversal surface."""
    from graph_db_spark.queries import REGISTRY

    monkeypatch.setenv("SPARK_GRAFT_SNAPSHOT_ROOT", str(tmp_path / "snaps"))
    pairs = [
        ("graph_3hop_persisted_snapshot", "graph_3hop_customers_in_region"),
        ("graph_5hop_persisted_snapshot", "graph_5hop_parts_for_region"),
        ("graph_search_term_persisted", "graph_search_term_parts"),
        ("graph_reverse_sources_persisted", "graph_reverse_sources_of_part"),
    ]
    for persisted_name, cold_name in pairs:
        out = REGISTRY[persisted_name].build(spark, sf_dir)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan, f"{persisted_name}: build stage leaked\n{plan}"
        cold = REGISTRY[cold_name].build(spark, sf_dir)
        diff = out.exceptAll(cold).unionByName(cold.exceptAll(out))
        assert diff.isEmpty(), f"{persisted_name} != {cold_name}"
    # stats twin: no plan to inspect (driver-side struct), but the BFS
    # over the persisted tables must reproduce the cold-build counts.
    st_p = REGISTRY["graph_stats_persisted"].build(spark, sf_dir).collect()
    st_c = REGISTRY["graph_stats_reachability"].build(spark, sf_dir).collect()
    assert st_p == st_c


def test_persisted_snapshot_concurrent_builder_waits(spark, sf_dir, tmp_path):
    """Two sessions racing to build the same snapshot store must not
    collide in the staging dir: the loser of the writer lock loads the
    winner's published checkpoint instead of rebuilding."""
    import os

    from graph_db_spark.catalogue import tpch_graph_persisted
    from graph_db_spark.model import ROOT_ID

    root = str(tmp_path / "snaps")
    g = tpch_graph_persisted(spark, sf_dir, root=root)
    store_dir = next(
        os.path.join(root, d) for d in os.listdir(root) if not d.startswith(".")
    )
    # another builder "holds" the lock; a published version already exists
    lock = os.path.join(store_dir, ".lock")
    open(lock, "w").close()
    try:
        g2 = tpch_graph_persisted(spark, sf_dir, root=root, rebuild=True)
        n1 = g.get_targets(ROOT_ID, "Catalogue_Region").count()
        n2 = g2.get_targets(ROOT_ID, "Catalogue_Region").count()
        assert n1 == n2 > 0
    finally:
        os.remove(lock)


def test_lsh_band_join_strategy_is_stats_driven(spark, sf_dir):
    """The band self-join strategy must follow the corpus ROW COUNT, not
    Spark's byte-size broadcast hint: above LSH_BROADCAST_MAX_DOCS the
    plan is pinned to the shuffle join (the measured winner at 50k and
    500k docs — SCALE_STRESS_r06), below it Spark may broadcast."""
    from graph_db_spark.operators.dedup import (
        LSH_BROADCAST_MAX_DOCS,
        lsh_candidate_pairs,
        minhash_signatures,
        shingles,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(shingles(d, "doc_id", "text", 3), n_hashes=8)

    big = lsh_candidate_pairs(sigs, 8, 4, corpus_rows=LSH_BROADCAST_MAX_DOCS + 1)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in plan_big, plan_big

    small = lsh_candidate_pairs(sigs, 8, 4, corpus_rows=100)
    plan_small = small._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_small, plan_small

    # identical pairs either way
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, small.collect()))


def test_exact_substring_spans_plan_no_cross_product(spark, sf_dir):
    """The duplicated-span plan must keep its route-specific shape.

    Default (windowed single-compute, round 8): the positioned gram set
    — the expensive k-token concat + md5 per position — is computed
    ONCE, so the whole plan reads the documents table exactly twice
    (gram side + the final left-join back onto toks), with the dup
    decision a count over the gram-key Window; and still no cross
    product or broadcast nested loop anywhere.

    Join route (the AQE-skew fallback): dup grams come from a
    map-side-combinable count aggregate (partial_count), joined back as
    an equi-join."""
    from graph_db_spark.operators.dedup import duplicated_span_coverage
    from graph_db_spark.plans import explain_str
    from graph_db_spark.queries import REGISTRY

    df = REGISTRY["dedup_exact_substring_spans"].build(spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" in plan, plan
    # formatted explain prints each node in the tree AND a detail header;
    # count the "(n) Scan parquet" headers for the true scan-node count
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 2, plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    jplan = explain_str(
        duplicated_span_coverage(docs, "doc_id", "text", k=10, dup_count_via="join")
    )
    assert "CartesianProduct" not in jplan, jplan
    assert "BroadcastNestedLoopJoin" not in jplan, jplan
    assert "partial_count" in jplan, jplan


def test_round12_windows_are_partitioned(spark, sf_dir):
    """shard_manifest_by_tokens (two-level prefix sum) and
    scd2_user_status_intervals must never plan an UNPARTITIONED window —
    the q3/q10 single-partition funnel, applied at design time. In the
    plan string a partitioned spec leads with its partition columns
    (`windowspecdefinition(bucket#…, doc_id#… ASC …`); an unpartitioned
    one leads straight with a sort spec."""
    import re

    from graph_db_spark.plans import explain_str

    # round-13: dedup_prefix_filter_pairs' per-doc rank window joins the
    # same guarantee (partitioned on id — the df-order prefix rank)
    for name in (
        "shard_manifest_by_tokens",
        "scd2_user_status_intervals",
        "dedup_prefix_filter_pairs",
    ):
        plan = explain_str(REGISTRY[name].build(spark, sf_dir))
        specs = re.findall(r"windowspecdefinition\(([^,]+),", plan)
        assert specs, name  # the window is load-bearing in both plans
        for first_arg in specs:
            assert "ASC NULLS" not in first_arg and "DESC NULLS" not in first_arg, (
                name,
                first_arg,
            )
        # Structural second detector (round-12 advice: the literal
        # 'ASC NULLS' first-arg check would pass vacuously if a Spark
        # version changed sort-order rendering; both forms validated
        # against pyspark 4.1.2). A formatted-plan Window node prints
        #   Arguments: [funcs], [partitionSpec], [orderSpec]
        # when partitioned, but only TWO bracket groups —
        #   Arguments: [funcs], [orderSpec]
        # — when the partition spec is empty. Require every Window
        # node's Arguments line to carry the three-group tail with a
        # non-empty partition group.
        sections = re.split(r"(?m)^(\(\d+\) \w+)", plan)
        for header, body in zip(sections[1::2], sections[2::2]):
            if not re.match(r"\(\d+\) Window", header):
                continue
            m = re.search(r"(?m)^Arguments: (.+)$", body)
            assert m, (name, header)
            assert re.search(r"\], \[[^\[\]]+\], \[[^\[\]]+\]$", m.group(1)), (
                name,
                header,
                m.group(1),
            )


def test_ivfpq_persisted_plan_has_no_fit_stages_and_prunes_cells(spark, sf_dir):
    """The persisted residual IVF-PQ route's QUERY plan must contain
    none of the write-time work — no kmeans/pq aggregation over the
    corpus embeddings (only the store's parquet tables and the tiny
    query-side slice are scanned) — and the codes scan must be pruned
    to the probed coarse cells via dynamic partition pruning on the
    store's ccell partition column (the property that keeps query cost
    independent of corpus size at constant cell width)."""
    from graph_db_spark.plans import explain_str
    from graph_db_spark.queries import REGISTRY

    df = REGISTRY["ann_ivfpq_residual_persisted"].build(spark, sf_dir)
    plan = explain_str(df)
    # store tables present, raw embeddings absent from the corpus side:
    # the only embeddings.parquet scans are the vec_id < 5 query slice
    import re

    # every embeddings scan in the serving plan must be the vec_id<5
    # query slice (a corpus-side embeddings scan would mean the store is
    # not serving) — round-15 ADVICE: actually assert on the scans. The
    # SLICE legitimately appears in many subplans (per-book query
    # tables, coarse probes), so the assertion is per-scan-block on the
    # pushed filter, not a count bound: an unfiltered corpus-side scan
    # is exactly a block whose PushedFilters lack the vec_id predicate.
    emb_blocks = [b for b in plan.split("\n\n") if "embeddings.parquet" in b]
    assert emb_blocks, "no embeddings scan found at all (plan shape changed?)"
    for b in emb_blocks:
        pushed = [ln for ln in b.splitlines() if "PushedFilters" in ln]
        assert pushed and all("vec_id" in ln for ln in pushed), (
            f"embeddings scan without a pushed vec_id filter "
            f"(corpus-side scan in the serving plan):\n{b[:600]}"
        )
    assert "sig_stores" in plan or "coarse" in plan, plan[:2000]
    assert re.search(r"dynamicpruning", plan, re.IGNORECASE), (
        "codes scan must carry a dynamic-partition-pruning subquery on "
        "ccell; without it every query batch scans the whole code table"
    )
    # no Lloyd/PQ fit stages: the fits materialize at store-write time,
    # so the serving plan must carry no DECIMAL centroid aggregation
    assert "decimal(38" not in plan.lower(), (
        "kmeans-style DECIMAL aggregation found in the serving plan - "
        "a fit is running at query time"
    )
