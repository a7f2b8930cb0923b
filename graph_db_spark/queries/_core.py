"""Registry core: the @q decorator, REGISTRY, shared fixtures/helpers,
the driver-rotation ledger, and the driver_order/all_queries surface.
Split out of the monolithic queries.py in round 15 (VERDICT r14 item 7).
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
