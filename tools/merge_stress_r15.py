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
- containment_exact_shj_probe (+ prefix_jaccard control,
  prefix_skew_profile) — the A/B that ADJUDICATES r14's 18.3x watch
  item: the candidate join re-run as a shuffled-hash join (no full-side
  sort of the df=n stopword rows, identical candidates). Measured
  strictly worse (same ~18x wall, 2.4x shuffle), proving the sort is
  NOT the dominant term; the SMJ form is kept (the r14 rows remain the
  standing values) and the hint is reverted — documented no-win.

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
# labeled extra cc_star readings (never averaged): the targeted rerun
# that landed in a measured co-tenant window, and — when a quiet window
# arrives — the gated quiet rerun
try:
    ops["cc_star_targeted_contended"] = take(
        load(4, "/tmp/stress_cc_targeted_r15.json"), "cc_targeted.json", "cc_star"
    )
except (FileNotFoundError, SystemExit):
    pass
try:
    ops["cc_star_targeted_quiet"] = take(
        load(5, "/tmp/stress_cc_quiet_r15.json"), "cc_quiet.json", "cc_star"
    )
except (FileNotFoundError, SystemExit):
    pass
for op in ("ivfpq_persisted_build", "ivfpq_persisted"):
    ops[op] = take(ivfpq, "ivfpq.json", op)
ops["containment_exact_shj_probe"] = take(
    containment, "containment.json", "containment_exact"
)
for op in ("prefix_jaccard", "prefix_skew_profile"):
    ops[op] = take(containment, "containment.json", op)

out = {
    "round": 15,
    "config": "local[32], pyspark 4.1.2, round-14 exchange config "
    "(AQE initialPartitionNum=max(8*shuffle,256), cached-plan "
    "coalescing, capped iterative loops)",
    "ops": ops,
    "notes": {
        "graph_flagships": "one session, suite order bfs->cc->landmark "
        "per scale (r8 frame-reuse caveat applies to cc_star's in-suite "
        "reading; compare vs r12's targeted rows). HOST LOAD caveat: the "
        "round-15 window carried heavy co-tenant load (loadavg 13-20 "
        "measured with zero own work; 32-core sentinel 0.41s vs ~0.1 "
        "quiet) — cc_star@10x read 53.0 in-suite and 106.1 in the "
        "targeted rerun (cc_star_targeted_contended) at IDENTICAL "
        "2,695.6MB shuffle and 4 rounds, i.e. environment, not plan; "
        "cc_star_targeted_quiet (load-gated rerun) adjudicates when "
        "present. The 30x reading 91.8s vs r11's 170.0 at the same "
        "~7.4GB shuffle is the config win the round set out to verify",
        "ivfpq_persisted": "fixed 20-query batch served from a persisted "
        "residual-code store built at constant-cell k=max(8,n/1024); "
        "build rows are the one-time write-path cost",
        "containment_exact_shj_probe": "A/B rows from the round-15 "
        "shuffled-hash candidate-join experiment (no full-side sort, "
        "identical 500/5,000 pairs): 26.33s/220.7MB at 50k docs, "
        "476.67s/2169.6MB at 500k vs the standing SMJ rows 24.5/90.3 and "
        "447.6/892.9 (SCALE_STRESS_r14) — strictly worse, so the sort is "
        "NOT the 18.3x term; hint reverted, SMJ form stands (watch item "
        "CLOSED by attribution: the cost is pref-x-FULL candidate volume "
        "+ shared prefix/verify stages, linear-shuffled, under the 20x "
        "bar)",
    },
}
json.dump(out, sys.stdout, indent=1)
print()
