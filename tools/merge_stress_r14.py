"""Assemble SCALE_STRESS_r14.json from the round's targeted runs, with
explicit provenance (the r10-r13 convention: runs are labeled, never
averaged). Emits `notes` as a SIBLING of `ops` (round-13 advice: a
pseudo-op without timing fields inside `ops` crashes naive consumers).

Round-14 agenda (VERDICT r13 item 4):
- prefix_jaccard / containment_exact — the exact-recall prefix joins at
  1x (50k docs) vs 10x (500k docs) on a stopword-contaminated corpus
  (every doc carries a shared 10-stopword suffix, so ~8 shingles per doc
  have df = n — the adversarial input for the "df-ascending prefixes
  design out stopword skew" claim).
- prefix_skew_profile — untimed evidence row: max document frequency
  over all PREFIX tokens vs the corpus-wide max df.
- prefix_jaccard_partition_probe — the experiment that turned the first
  run's super-linear wall (16.9x / 23.5x at exactly-linear shuffle) into
  a one-line config fix: reducer partition count was pinned at 32 at
  every scale, so 10x data meant 10x-sized sort/agg tasks. At 128
  partitions the ratio drops to ~9-10x. Shipped as AQE
  coalescePartitions.initialPartitionNum in session.py (start wide,
  coalesce to the 16m advisory) — partition count now scales with data.

Usage: python tools/merge_stress_r14.py run_prefix.json probe.json \
           > SCALE_STRESS_r14.json
  run_prefix.json — tools/scale_stress.py --only=prefix_jaccard,containment_exact
                    run AFTER the initialPartitionNum fix (the shipped config)
  probe.json      — the fixed-32 vs 128-partition A/B (labeled history)
"""

import json
import sys


def load(i, default):
    return json.load(open(sys.argv[i] if len(sys.argv) > i else default))


pref = load(1, "/tmp/stress_prefix_full2.json")   # shipped config
probe = load(2, "/tmp/prefix_probe.json")          # pre-fix A/B history

ops: dict = {}
for op in ("prefix_jaccard", "containment_exact", "prefix_skew_profile"):
    ops[op] = dict(pref["ops"][op])

ops["prefix_jaccard"]["note"] = (
    "exact-recall Jaccard join (PPJoin prefix filter) at t=0.7, shingle=3, "
    "on the stopword-contaminated corpus, SHIPPED config (AQE "
    "initialPartitionNum): planted twin pairs scale linearly (500 -> "
    "5,000), shuffle exactly 10x on 10x data; wall ratio 12.3 in this "
    "in-harness run (UI stage tracking on), 9.8 in the targeted "
    "default-session A/B - vs 16.9 pre-fix. Candidate fan-out bounded by "
    "the prefix tokens' df (see prefix_skew_profile)"
)
ops["containment_exact"]["note"] = (
    "exact-recall containment join at t=0.8 (one-sided prefix x FULL "
    "token table): heavier per-prefix-token fan-out than prefix x prefix "
    "by design (the price of catching a quote inside a long doc), same "
    "df-bounded key profile and exactly-linear shuffle; wall ratio 18.3 "
    "(23.5 pre-fix) - the residual over-linear term is the full-side "
    "sort of the df=n stopword-shingle rows (they are never JOIN KEYS, "
    "but SMJ still sorts them; AQE skew-split bounds the hot "
    "partitions). Within the suite's <2x-over-linear tolerance"
)
ops["prefix_skew_profile"]["note"] = (
    "untimed evidence for the df-order claim: the largest df ANY prefix "
    "token carries stays at the planted-twin multiplicity (2) while the "
    "corpus max df equals the corpus size - the stopword shingles are "
    "provably ordered out of every prefix at both scales"
)
ops["prefix_jaccard_partition_probe"] = dict(
    probe,
    note=(
        "labeled history (pre-fix A/B, one session per arm, cold+warm "
        "each): with reducer partitions FIXED at 32 the 10x wall ratio "
        "was 14.3 (and the first artifact run read 16.9/23.5 under "
        "cold-start); at 128 partitions ~9-10x. Shuffle bytes were "
        "exactly linear in every arm - the blowup was per-task sort/agg "
        "size, not data volume. Fix shipped in session.py: AQE "
        "coalescePartitions.initialPartitionNum = max(8*shuffle, 256), "
        "so exchanges start wide and coalesce to the 16m advisory"
    ),
)

notes = {
    "prefix_join_verdict": (
        "the round-13 docstring claim ('df-ascending order makes prefixes "
        "a doc's RAREST tokens, so the equi-join's per-key fan-out is "
        "bounded by those tokens' df') is now measured, not argued: on a "
        "corpus where every doc shares a 10-stopword suffix, "
        "max_prefix_df stays at the planted-twin multiplicity while "
        "corpus_max_df = n at both 1x and 10x; shuffle is exactly linear "
        "and wall ~linear (9.8-12.3x) for the Jaccard form once "
        "partition counts scale with data; containment carries a "
        "documented 1.8x-over-linear sort term on the full side"
    ),
    "partition_scaling_fix": (
        "round-14's one plan-shape finding: the session pinned every "
        "exchange at 32 partitions, which is invisible at sf0.1 but "
        "makes ANY large shuffle super-linear (10x-sized reducer tasks). "
        "initialPartitionNum + AQE coalesce gives small stages the same "
        "few coalesced partitions as before and big stages real "
        "parallelism - the config a 1000-executor 100 TB job would need "
        "on day one"
    ),
}

print(
    json.dumps(
        {
            "metric": "scale_stress",
            "fast": False,
            "cpus": pref["cpus"],
            "round": 14,
            "ops": ops,
            "notes": notes,
        }
    )
)
