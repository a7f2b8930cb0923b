"""ANN & embedding family: brute/LSH/IVF/PQ/IVF-PQ (raw + residual + persisted index), quantization, PCA, labeled-corpus screens.

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
    "embedding_hard_negatives",
    # Hard-negative mining: same codebook/assignment CTEs as the knn
    # screen (k=8, mod 4, n_probe=1), but the within-cell top-k keeps
    # the 3 highest-cosine OTHER-label neighbors per vector — the pair
    # rows a contrastive-training batch builder consumes. Replicates
    # codebook, assignment, pair ranking bit-for-bit.
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
            FROM asg a JOIN n ON n.vec_id = a.vec_id)
    SELECT id, label, neg_id, neg_label, cos, CAST(r AS INT) AS rank FROM (
      SELECT x.vec_id AS id, x.label AS label, y.vec_id AS neg_id,
             y.label AS neg_label,
             round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) AS cos,
             row_number() OVER (PARTITION BY x.vec_id ORDER BY
               round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) DESC,
               y.vec_id) AS r
      FROM mem x JOIN mem y ON x.cell = y.cell AND x.vec_id <> y.vec_id
                           AND x.label <> y.label
      WHERE round(list_dot_product(x.v, y.v) / (x.nrm * y.nrm), 6) IS NOT NULL
    ) WHERE r <= 3
    """,
)
def embedding_hard_negatives(spark, sf_dir):
    """Hard-negative mining over the labeled embedding corpus
    (operators/similarity.hard_negative_mining): per vector, the 3
    highest-cosine neighbors with a DIFFERENT label inside its trained
    IVF cell — the near-duplicate-but-differently-labeled pairs a
    contrastive/metric-learning pipeline feeds as hard negatives, and
    the complement of knn_label_agreement's mislabel screen (that op
    flags the vector; this one names the offending neighbors).

    100 TB shape identical to the knn screen: sampled codebook fit
    (constant), broadcast assignment (one scan), ONE salted shuffle on
    cell id for the pair join (pairwise work bounded by k ∝ corpus),
    vectors projected away before the id-partitioned top-k window."""
    from graph_db_spark.operators.similarity import hard_negative_mining, kmeans_fit

    e = _t(spark, sf_dir, "embeddings")
    cent = kmeans_fit(e, k=8, n_iters=2, sample_mod=4)
    return hard_negative_mining(e, cent, k=3, n_cells=8)

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
