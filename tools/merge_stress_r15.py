"""Assemble SCALE_STRESS_r15.json from the round's targeted runs, with
explicit provenance (the r10-r14 convention: runs are labeled, never
averaged). `notes` is a SIBLING of `ops` (round-13 advice).

Round-15 agenda (VERDICT r14 items 2, 4, 6):
- bfs_stats / cc_star / landmark_distances at 1x/10x/30x — the iterative
  graph flagships re-measured under the round-14 data-scaled exchange
  config (session.py AQE initialPartitionNum + cached-plan coalescing +
  capped_initial_partitions loops), vs their r12 rows.
- ivfpq_persisted (+ _build) — per-query-batch cost of the NEW persisted
  residual-code IVF-PQ index at 1x/10x store under the constant-cell
  k = max(8, n/1024) rule: the r13 signature-store demonstration
  applied to ANN.
- containment_exact (+ prefix_jaccard control, prefix_skew_profile) —
  the exact-recall containment join re-measured after the round-15
  shuffled-hash-join candidate stage (no full-side sort of df=n
  stopword rows), vs r14's 18.3x watch item.

Usage: python tools/merge_stress_r15.py graphs.json ivfpq.json \
           containment.json > SCALE_STRESS_r15.json
  graphs.json      — scale_stress.py --only=bfs_stats,cc_star,landmark_distances --x30
  ivfpq.json       — scale_stress.py --only=ivfpq_persisted
  containment.json — scale_stress.py --only=containment_exact,prefix_jaccard
"""

import json
import sys


def load(i, default):
    return json.load(open(sys.argv[i] if len(sys.argv) > i else default))


def take(run: dict, src: str, op: str) -> dict:
    """Pull *op* out of a run artifact, failing with the exact
    scale_stress invocation that produces it instead of a bare KeyError
    (round-15 ADVICE: an --only subset that skipped an op used to crash
    artifact assembly with an unhelpful traceback)."""
    ops = run.get("ops", run)
    if op not in ops:
        raise SystemExit(
            f"{src} is missing op '{op}' (has: {sorted(ops)}); produce it "
            f"with: python tools/scale_stress.py --only={op} [--x30]"
        )
    return dict(ops[op])


graphs = load(1, "/tmp/stress_graphs_r15.json")
ivfpq = load(2, "/tmp/stress_ivfpq_r15.json")
containment = load(3, "/tmp/stress_containment_r15.json")

ops: dict = {}
for op in ("bfs_stats", "cc_star", "landmark_distances"):
    ops[op] = take(graphs, "graphs.json", op)
for op in ("ivfpq_persisted_build", "ivfpq_persisted"):
    ops[op] = take(ivfpq, "ivfpq.json", op)
for op in ("containment_exact", "prefix_jaccard", "prefix_skew_profile"):
    ops[op] = take(containment, "containment.json", op)

out = {
    "round": 15,
    "config": "local[32], pyspark 4.1.2, round-14 exchange config "
    "(AQE initialPartitionNum=max(8*shuffle,256), cached-plan "
    "coalescing, capped iterative loops)",
    "ops": ops,
    "notes": {
        "graph_flagships": "targeted quiet run, one session, suite order "
        "bfs->cc->landmark per scale (r8 frame-reuse caveat applies to "
        "cc_star's in-suite reading; compare vs r12's targeted rows)",
        "ivfpq_persisted": "fixed 20-query batch served from a persisted "
        "residual-code store built at constant-cell k=max(8,n/1024); "
        "build rows are the one-time write-path cost",
        "containment_exact": "round-15 shuffled-hash candidate join (no "
        "full-side sort); compare wall ratio vs SCALE_STRESS_r14's 18.3",
    },
}
json.dump(out, sys.stdout, indent=1)
print()
