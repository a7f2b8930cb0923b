"""Pipeline family: composed curation flows, sampling/mixing/packing, decontamination, sketches, manifests, SCD2.

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

# Composed pipelines call sibling families' query builders directly
# (the pre-split file had them in scope); text/dedup import before this
# module in the package __init__, so these are cycle-free.
from graph_db_spark.queries.dedup import dedup_simhash_banded_wide  # noqa: E402
from graph_db_spark.queries.text import (  # noqa: E402
    boilerplate_ngrams,
    text_repetition_signals,
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
    from graph_db_spark.operators.text import langid_struct, quality_expr
    from graph_db_spark.queries.dedup import dedup_survivors_minhash as _surv

    d = _t(spark, sf_dir, "documents")
    surv = _surv(spark, sf_dir)
    # quality_score and lang_id are row-local projections over the same
    # documents scan — computing both in ONE select removes two
    # doc_id self-joins (4 exchanges + 2 extra scans) from the plan
    # (guide §2.4); identical values by construction (same expressions,
    # 1:1 inner joins on the unique doc_id carried no filtering).
    kept = (
        d.select(
            "doc_id",
            quality_expr(F.col("text")).alias("quality"),
            langid_struct(F.col("text"))["lang"].alias("pred_lang"),
        )
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
        with_arr.select("doc_id", "arr", F.explode_outer(pos).alias("pos"))
        .filter(F.col("pos").isNotNull())
        .select(
            "doc_id",
            F.col("pos").cast("int").alias("pos"),
            F.concat_ws(" ", F.slice("arr", F.col("pos"), 3)).alias("context"),
            F.element_at("arr", F.col("pos") + 3).alias("target"),
        )
    )

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
        "doc_id", F.explode_outer(shingle_array(F.lower(F.col("text")), 4)).alias("gram")
    ).filter(F.col("gram").isNotNull())
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
    toks = (
        d.select(
            "source", F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token")
        )
        .filter(F.col("token").isNotNull())
        .distinct()
    )
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
        d.select(F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.col("token").isNotNull())
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
    tok = d.select(
        "source", F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.col("token").isNotNull())
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

    Cross-gate fusion (round 17, guide §6 "I/O" + §1.2): composing the
    four stage queries re-scanned AND re-tokenized `documents` once per
    gate subtree — 9-11 scan+regexp-split passes per run (rep's
    token/bigram/trigram branches, boiler's df+membership passes,
    decontam's bench+corpus sides, the SimHash signature build, plus the
    (doc_id, source) projection). The pipeline now tokenizes ONCE: a
    single corpus pass materializes (doc_id, source, lowered tokens, raw
    tokens) via localCheckpoint, and every gate derives its gram shape
    from those arrays (shingles_of_tokens == shingle_array's own body, so
    each gate's values are bit-identical to its standalone query — the
    oracle still stitches the four standalone CTEs and must hash-match).
    Gates are also pruned to exactly the columns the survivor filter
    reads: rep's unused bigram/trigram branches (two gram passes + two
    1:1 left joins) are dropped, and the decontam hit-set is a semi-join
    (set membership, not the standalone query's hit counts). At 100 TB
    the checkpointed token frame becomes an explicit intermediate table
    (DISK_ONLY persist / parquet); the structural point — one corpus
    read instead of ~10 — is the same.

    100 TB shape: each gate is a grouped agg + broadcast join of a small
    flag set over the shared token frame; the pack step is one window
    cumsum per source partition. The decontam-hit and dup-loser sets are
    small by construction and broadcast."""
    from graph_db_spark.functions.text import shingles_of_tokens, ws_tokens
    from graph_db_spark.operators.dedup import simhash_bits, simhash_near_dup_pairs
    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    # ONE corpus scan + tokenize: lowered tokens (rep/boiler/decontam
    # gates) and raw-case tokens (the SimHash gate tokenizes un-lowered
    # text), materialized once for every gate below.
    tkf = d.select(
        "doc_id",
        "source",
        ws_tokens(F.lower(F.col("text"))).alias("tk"),
        ws_tokens(F.col("text")).alias("tkr"),
    ).localCheckpoint(eager=True)

    # repetition gate — only the columns the survivor filter reads
    # (n_tok, top_token_frac); ONE exploded-token pass yields both
    # (sum of per-token counts == token count; max is the top token).
    tok = tkf.select("doc_id", F.explode_outer("tk").alias("t")).filter(
        F.col("t").isNotNull()
    )
    rep = (
        tok.groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_tok"), F.max("c").alias("max_tok"))
        .select(
            "doc_id",
            "n_tok",
            F.round(F.col("max_tok").cast("double") / F.col("n_tok"), 6).alias(
                "top_token_frac"
            ),
        )
    )

    # boilerplate gate (df-threshold + membership over distinct 2-grams)
    thr = max(40, _parquet_rows(sf_dir, "documents") * 8 // 100)
    g2 = tkf.select(
        "doc_id", F.explode_outer(shingles_of_tokens(F.col("tk"), 2)).alias("gram")
    ).filter(F.col("gram").isNotNull())
    boiler = (
        g2.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") >= thr)
        .select("gram", F.lit(1).alias("is_b"))
    )
    bo = (
        g2.join(F.broadcast(boiler), "gram", "left")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.count("is_b").alias("n_boiler"))
        .select(
            "doc_id",
            F.round(F.col("n_boiler").cast("double") / F.col("n_grams"), 6).alias(
                "boiler_frac"
            ),
        )
    )

    # decontamination gate: ANY shared 4-gram with the benchmark slice —
    # membership only, so a semi-join replaces the standalone hit count
    g4 = tkf.select(
        "doc_id", F.explode_outer(shingles_of_tokens(F.col("tk"), 4)).alias("gram")
    ).filter(F.col("gram").isNotNull())
    bench = g4.filter(F.col("doc_id") % 97 == 0).select("gram").distinct()
    dec = (
        g4.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(bench), "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )

    # SimHash near-dup gate (64-bit / 16-bit buckets) from raw-case
    # 3-shingles — the same (id, token) frame dedup_simhash_banded_wide
    # builds via shingles(documents), minus its scan+tokenize
    sh3 = tkf.select(
        F.col("doc_id").alias("id"),
        F.explode_outer(shingles_of_tokens(F.col("tkr"), 3)).alias("token"),
    ).filter(F.col("token").isNotNull())
    dup = (
        simhash_near_dup_pairs(simhash_bits(sh3, n_bits=64), n_bits=64, bands=4, max_hamming=3)
        .select(F.col("b").alias("doc_id"))
        .distinct()
        .withColumn("isdup", F.lit(1))
    )

    kept = (
        tkf.select("doc_id", "source")
        .join(rep, "doc_id")
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
