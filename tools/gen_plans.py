"""Regenerate PLANS.md: physical-plan audit of the headline queries.

Usage: python tools/gen_plans.py [--sf DIR]

For each audited query: broadcast-join presence, exchange (shuffle) count,
pushed filters, and scan columns — the pushdown/pruning/broadcast contract
asserted loosely here and strictly (per query) in tests/test_plans_sources.py.
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "graph_3hop_customers_in_region",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "embedding_near_dup_pairs",
    "decontam_ngram_overlap",
    "sketch_countmin_heavy_tokens",
    "pack_sequences",
    "sliding_window_events",
    "window_topk_orders_per_cust",
    "filter_pushdown_scan",
    "funnel_click_purchase",
    "cohort_hourly_retention",
    "dedup_simhash_banded",
    "dedup_simhash_banded_wide",
    "ann_int8_topk",
    "pipeline_curated_pack",
    "source_token_drift",
    # round-4 TPC-H shape completions: the two purest pushdown tests
    "q6_forecast_revenue",
    "q19_disjunctive_pushdown",
    "q22_dormant_rich_customers",
    # round-5 full-TPC-H completion: the six remaining canonical shapes
    "q8_nation_market_share",
    "q11_important_inventory",
    "q13_customer_orders_distribution",
    "q15_top_supplier",
    "q20_promotion_suppliers",
    "q21_waiting_suppliers",
    # round-5 additions: streaming-dedup batch twin, BPE fold encoder,
    # k-means-trained IVF
    "dedup_minhash_signature_groups",
    "bpe_encode_fixed_rules",
    "ann_ivf_kmeans_topk",
    "mix_sources_temperature",
    "doc_feature_hash_embed",
    # round-6: the steady-state persisted-snapshot traversal (no build
    # stage, bucketed index scans)
    "graph_3hop_persisted_snapshot",
    # round-7: the rest of the persisted graph surface + the banded
    # streaming twin's batch recall set
    "graph_5hop_persisted_snapshot",
    "graph_search_term_persisted",
    "graph_reverse_sources_persisted",
    "dedup_banded_survivors",
    "dedup_exact_substring_spans",
    "dedup_strip_substring_spans",
    # round-8: cluster-bounded semantic dedup + DSIR importance weights
    "dedup_semantic_semdedup",
    "dsir_importance_weights",
    # round-8: hierarchical-assignment semdedup, cluster-balanced
    # sampling, per-source quality percentile gate
    "dedup_semantic_semdedup_hier",
    "sample_cluster_balanced",
    "quality_percentile_gate",
    # round-11: constant-cell auto-k default + forced 3-level pyramid
    "dedup_semantic_default",
    "dedup_semantic_tree",
    "knn_label_agreement",
    # round-12: line-level exact dedup (hash-keyed df join), the
    # two-level distributed prefix-sum shard manifest (must show NO
    # unpartitioned window), SCD2 islands (user-partitioned windows)
    "dedup_repeated_lines",
    "shard_manifest_by_tokens",
    "scd2_user_status_intervals",
    "dedup_incremental_new_vs_store",
    # round-13: the persisted-store route (the final plan is the verify
    # stage over the localCheckpoint cut — candidate discovery's
    # broadcast/scan shape is asserted in
    # test_incremental_dedup_persisted_matches_recompute on the
    # uncheckpointed form)
    "dedup_incremental_persisted_store",
    # round-13: exact-recall prefix-filtering join (id-partitioned rank
    # window, rare-token candidate join, no cartesian anywhere)
    "dedup_prefix_filter_pairs",
    "dedup_containment_pairs",
    "dedup_semantic_incremental_store",
    "ann_pq_adc_topk",
    "event_time_weighted_avg",
    # round-14: residual IVF-PQ (broadcast coarse codebook + per-cell
    # tables; corpus side scan + broadcast joins only)
    "ann_ivfpq_residual_topk",
    # round-15: the persisted residual-code route (store scans + the
    # probes join on the partition column — dynamic partition pruning —
    # and NO kmeans/pq stages in the query plan) and the exact-recall
    # containment join after the shuffled-hash candidate stage (no
    # full-side sort)
    "ann_ivfpq_residual_persisted",
    "dedup_containment_exact_pairs",
]

NOTES = """## Notes

- `graph_3hop_customers_in_region`'s exchange count includes the full
  `tpch_graph` build (bulk index emission) because the registered query
  constructs the graph from raw parquet each call; the traversal itself is
  3 broadcast-joined hops (see `graph_3hop` vs `graph_build_index` split
  in `bench.py`). In a deployment the snapshot tables are persisted once
  and traversals reuse them.
- `q1` keeps 2 exchanges: one partial→final agg shuffle + result exchange;
  the agg is map-side combined (partial_sum in the plan).
- `q3_shipping_priority` / `q10_returned_items` (round 12): the global
  top-k is `orderBy().limit()` → TakeOrderedAndProject (per-partition
  top-k + driver merge of k rows per partition), asserted window-free in
  tests/test_plans_sources.py::test_tpch_global_topk_uses_take_ordered —
  the round-11 single-partition `row_number()` window is gone.
- `dedup_simhash_banded_wide` (round 12) is the corpus-scale banding:
  identical plan shape to the 32-bit form (signature agg → band explode →
  (k, bucket) self-equi-join → Hamming verify), but 16-bit buckets keep
  candidate pairs ~n²·bands/2^17 instead of /2^9 — the measured
  difference between a linear and a 16×-per-10× stage at 500k docs
  (SCALE_STRESS_r12 pipeline_curated_pack_stages).
- Dedup/ANN pipelines shuffle fixed-width keys only (md5/bucket/cell ids),
  never document bodies or raw vectors beyond the first projection; the
  multi-table LSH signatures are a scan-local Arrow-batched numpy matmul
  (mapInPandas, zero shuffle) with executor-derived deterministic planes
  (hyperplane_signatures_multi).
- `embedding_near_dup_pairs` contains NO CartesianProduct or
  BroadcastNestedLoopJoin (asserted in tests): candidates come from LSH
  bucket equi-joins; exact cosine touches candidates only.
- `decontam_ngram_overlap` broadcasts the benchmark n-gram set; corpus
  grams are a narrow explode — only (doc_id, gram) hits shuffle.
- `pack_sequences` windows per source partition (parallel cumsums, no
  global-order funnel); `sketch_countmin_heavy_tokens`'s sketch is 1,024
  cells of map-side-combinable state, and its top-k is TakeOrdered, not a
  single-partition window.
- `funnel_click_purchase` / `cohort_hourly_retention` shuffle on user_id
  only; the range predicate is applied post-join inside codegen.
- `shard_manifest_by_tokens` (round 12): the global running token sum is
  a TWO-LEVEL prefix sum — per-bucket totals → triangular self-join for
  exclusive bucket offsets (B² tiny rows, no window, lazy) → a window
  partitioned BY BUCKET for the local cumsum. The plan must show no
  unpartitioned window (the q3/q10 lesson applied at design time, not
  retrofitted); the only broadcast is the ~256-row offset table.
- `dedup_repeated_lines` (round 12) groups and joins the corpus's line
  table on `md5(line)` — fixed-width keys, never raw text — so the df
  shuffle is ~2 KB/doc regardless of line length; reconstruction is one
  per-doc grouped agg over (pos, line) structs.
- `scd2_user_status_intervals` (round 12): all three windows partition
  by user_id — per-task state is one user's history, never a global
  sort.
- `dedup_semantic_semdedup` / `dsir_importance_weights` cut their plans
  with an eager localCheckpoint at the natural share point (the assigned
  member frame / the per-(doc, bucket) counts): several downstream
  branches consume it and per-branch column pruning would otherwise
  defeat exchange reuse and re-scan the corpus per branch. Their scan
  columns/pushed filters therefore show empty here — the (pruned,
  single) parquet scan runs at checkpoint build.
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from graph_db_spark.plans import explain_str, pushed_filters, read_schema_columns
    from graph_db_spark.queries import REGISTRY
    from graph_db_spark.session import get_spark

    spark = get_spark(app_name="gen_plans", cpus="8", shuffle_partitions=8)

    out = [
        "# PLANS — physical-plan audit of headline queries",
        "",
        "Generated by `tools/gen_plans.py` at sf0.01 (plan shapes are",
        "scale-independent; AQE re-plans sizes at runtime). Checked per query:",
        "predicate pushdown reaches the parquet scan, column pruning (ReadSchema),",
        "broadcast choice for dim joins, and exchange (shuffle) count.",
        "",
    ]
    for name in AUDITED:
        df = REGISTRY[name].build(spark, args.sf)
        text = explain_str(df)
        n_ex = len(re.findall(r"\bExchange\b", text))
        bcast = "yes" if "BroadcastHashJoin" in text else "no"
        out.append(f"## {name}")
        out.append("")
        out.append(f"- broadcast join: {bcast}; exchanges in plan: {n_ex}")
        out.append(f"- pushed filters: {pushed_filters(df)}")
        out.append(f"- scan columns: {sorted(set(read_schema_columns(df)))}")
        out.append("")
        print(f"audited {name}", flush=True)
    out.append(NOTES)
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print("PLANS.md written")


if __name__ == "__main__":
    main()
