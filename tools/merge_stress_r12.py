"""Assemble SCALE_STRESS_r12.json: the full --x30 suite run plus the
round's targeted quiet-window re-measurements, merged with explicit
provenance keys (the r10/r11 convention — in-suite and targeted numbers
are NOT averaged; both are recorded and labeled).

Round-12 agenda (VERDICT r11 items 3/4/6 + the round's own additions):
- pipeline_curated_pack_stages — per-stage 1x/10x profile of the one
  production-path row that read above linear in r11 (11.18); the 8-bit
  SimHash stage was convicted and replaced by the 64-bit/16-bit-bucket
  wide form (commit 584245a) — composed ratio drops to ~6.5.
- bfs_stats_phases — BFS-loop vs stats-semi-join shuffle attribution at
  10x/30x after the level-sized degraded-loop fix (commit b675871).
- stream_dedup_builtin_claim_lag — two-batch state-bound protocol:
  claim_lag=5min vs default(watermark) at identical drops.
- dedup_repeated_lines / shard_manifest_by_tokens — the round's new
  corpus ops measured at 50k/500k docs.

Targeted quiet re-runs merged below (fresh session each, local[32]):
- cc_star + dedup_minhash family — their in-suite 10x rows landed in a
  contended host window (cc_star 141.7 s at IDENTICAL plan/shuffle/rounds
  to r11's 34.2; minhash 439.3 vs r11 168.8); the quiet rows are the
  comparable readings.
- stream_dedup_banded_builtin — A/B against the in-suite reading.

Usage: python tools/merge_stress_r12.py /tmp/stress_r12_full.json \
           /tmp/stress_r12_targeted.json > SCALE_STRESS_r12.json
"""

import json
import sys

full = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_r12_full.json"))
targeted = json.load(
    open(sys.argv[2] if len(sys.argv) > 2 else "/tmp/stress_r12_targeted.json")
)

ops = full["ops"]

for name, row in targeted["ops"].items():
    ops[f"{name}_targeted_quiet"] = dict(
        row,
        note="fresh-session quiet re-measure; the in-suite twin of this op "
        "ran in a contended host window (see merge_stress_r12.py header)",
    )

# Sibling top-level key, NOT a pseudo-op inside ops: consumers iterate
# ops.items() as op -> measurement rows, and a metadata dict there would
# crash or miscount them (round-12 advice).
notes = {
    "shuffle_negative_readings": (
        "in-suite shuffle_write_mb for the late semdedup rows went negative: "
        "the UI REST stage buffer (spark.ui.retainedStages default 1000) "
        "overflowed mid-suite so the cumulative-total delta underflows; fixed "
        "for future runs (retainedStages=50000 in tools/scale_stress.py); the "
        "semdedup family's linearity evidence this round is wall + "
        "within_cell_pairs, with r11's shuffle rows unchanged by any r12 commit"
    ),
    "claim_lag_exact_accounting": (
        "claim_lag cut = (horizon - lag) * bands * ingest rate exactly: the "
        "synthetic ts advances 1 doc/second, so moving the rows-side eviction "
        "frontier from 6h to 5min evicts (21600-300)*4 = 85,200 rows — the "
        "measured 515,432 -> 430,232 bit-for-bit, at identical 4,998 drops"
    ),
}

print(
    json.dumps(
        {
            "metric": "scale_stress",
            "fast": False,
            "cpus": full["cpus"],
            "round": 12,
            "ops": ops,
            "notes": notes,
        }
    )
)
