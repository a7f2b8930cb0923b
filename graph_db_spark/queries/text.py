"""Text-analysis family: language-ID, quality scoring, tokenization/BPE, TF-IDF/PMI, fingerprints, PII redaction, multimodal features.

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
    toks = d.select(
        F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.col("token").isNotNull())
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
    toks = (
        d.select(
            "doc_id", F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token")
        )
        .filter(F.col("token").isNotNull())
        .distinct()
    )
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
    toks = d.select(
        "doc_id", F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token")
    ).filter(F.col("token").isNotNull())
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
    bi = with_arr.select(
        F.explode_outer(F.sequence(F.lit(1), F.size("arr") - 1)).alias("p"), "arr"
    ).filter(F.col("p").isNotNull()).select(
        F.element_at("arr", F.col("p")).alias("w1"),
        F.element_at("arr", F.col("p") + 1).alias("w2"),
    )
    uni = bi.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    pair = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12")).filter(F.col("c12") >= 20)
    return pair.join(uni, "w1").select(
        "w1", "w2", "c12",
        F.round(F.col("c12").cast("double") / F.col("c1"), 6).alias("p_cond"),
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

    tok = tk.select("doc_id", F.explode_outer("tk").alias("t")).filter(
        F.col("t").isNotNull()
    )
    n = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tok"))
    mt = (
        tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("max_tok"))
    )
    bc = (
        tk.filter(F.size("tk") >= 2)
        .select("doc_id", F.explode_outer(grams(2)).alias("g"))
        .filter(F.col("g").isNotNull())
        .groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id").agg(F.max("c").alias("max_bi"))
    )
    trc = (
        tk.filter(F.size("tk") >= 3)
        .select("doc_id", F.explode_outer(grams(3)).alias("g"))
        .filter(F.col("g").isNotNull())
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
        "doc_id", F.explode_outer(F.sequence(F.lit(1), F.size("arr") - 1)).alias("p"), "arr"
    ).filter(F.col("p").isNotNull()).select(
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
    g = d.select(
        "doc_id", F.explode_outer(shingle_array(F.lower(F.col("text")), 2)).alias("gram")
    ).filter(F.col("gram").isNotNull())
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
        d.select(F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.col("token").isNotNull())
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
        d.select("doc_id", F.explode_outer(ws_tokens(F.lower(F.col("text")))).alias("token"))
        .filter(F.col("token").isNotNull())
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
