"""Dedup family: exact / MinHash-LSH / SimHash / exact-recall prefix joins / semantic (SemDeDup) / incremental persisted-store routes.

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
    from graph_db_spark.session import spread_small_input

    # The per-position transform+md5 is this query's dominant compute;
    # spread the (single-file) fixture scan so it runs at full width —
    # a no-op at real scale where the corpus arrives in many splits.
    d = spread_small_input(_t(spark, sf_dir, "documents"))
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
    from graph_db_spark.session import spread_small_input

    d = spread_small_input(_t(spark, sf_dir, "documents"))
    return D.strip_duplicated_spans(d, "doc_id", "text", k=10).select(
        F.col("id"), "n_tok", "n_kept", "clean_text"
    )

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

# ---------------------------------------------------------------------------
# Round 12: corpus-curation breadth — repeated-line removal, token-budget
# shard manifests, SCD2 interval compression
# ---------------------------------------------------------------------------



@q(
    "dedup_cluster_best_quality",
    # The production survivor policy on top of duplicate-cluster
    # canonicalization: same MinHash chain + transitive closure as
    # dedup_duplicate_clusters (CTEs reused verbatim), then the cluster
    # canonical is the BEST-QUALITY member (text_quality_score's exact
    # formula; ties on doc_id) instead of the min id — dedup should keep
    # the best duplicate, not the earliest. keep = this doc survives.
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
    ),
    lab AS (
      SELECT d.doc_id,
             CAST(least(d.doc_id, coalesce(min(r.y), d.doc_id)) AS BIGINT) AS cluster_id
      FROM documents d LEFT JOIN reach r ON r.x = d.doc_id
      GROUP BY d.doc_id
    ),
    qt AS (SELECT doc_id, text,
                  list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS qtoks
           FROM documents),
    qs AS (SELECT doc_id,
                  len(qtoks) AS n_tokens,
                  len(list_distinct(qtoks)) AS n_distinct,
                  length(text) AS n_chars,
                  length(text) - length(regexp_replace(text, '[.,;:!?]', '', 'g')) AS n_punct
           FROM qt),
    qq AS (SELECT doc_id,
                  round(least(n_tokens / 100.0, 1.0) * 0.5
                        + (n_distinct * 1.0 / greatest(n_tokens, 1)) * 0.4
                        - least(n_punct * 1.0 / greatest(n_chars, 1), 0.1), 6) AS quality
           FROM qs)
    SELECT doc_id, cluster_id, quality, rn = 1 AS keep FROM (
      SELECT l.doc_id, l.cluster_id, q.quality,
             row_number() OVER (PARTITION BY l.cluster_id
                                ORDER BY q.quality DESC, l.doc_id) AS rn
      FROM lab l JOIN qq q USING (doc_id))
    """,
)
def dedup_cluster_best_quality(spark, sf_dir):
    """Quality-aware duplicate-cluster survivor selection — the policy a
    production dedup actually ships: after pair detection and star-CC
    clustering (the dedup_duplicate_clusters chain, reused verbatim),
    each cluster keeps its BEST-QUALITY member (text_quality_score's
    exact deterministic formula, ties on doc_id) rather than the lowest
    id — min-id canonicalization silently prefers whatever was crawled
    first, best-of-cluster keeps the cleanest copy. Returns one row per
    document: (doc_id, cluster_id, quality, keep).

    Scale shape: identical to dedup_duplicate_clusters (banded pair
    graph, O(log²) star-CC rounds, one corpus back-join) plus one
    scan-local quality projection and a cluster-partitioned window —
    cluster sizes are duplicate-group-sized, so the window never sees an
    unbounded partition."""
    from graph_db_spark.pregel import connected_components_star

    d = _t(spark, sf_dir, "documents")
    pairs = D.minhash_near_dup_pairs(
        d, "doc_id", "text", n_hashes=8, bands=4, threshold=0.7, shingle=3,
        corpus_rows=_parquet_rows(sf_dir, "documents"),
    )
    verts = d.select(F.col("doc_id").alias("id"))
    edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    labels, _ = connected_components_star(verts, edges)
    lab = labels.select(
        F.col("id").alias("doc_id"), F.col("component").cast("long").alias("cluster_id")
    )
    joined = lab.join(TX.quality_score(d), "doc_id")
    w = W.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .select("doc_id", "cluster_id", "quality", (F.col("rn") == 1).alias("keep"))
    )


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
