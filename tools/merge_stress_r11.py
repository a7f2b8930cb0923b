"""Assemble SCALE_STRESS_r11.json: the full --x30 --spread suite run plus
the round's dedicated quiet-window measurements, merged with explicit
provenance keys (the r10 convention — in-suite and targeted numbers are
NOT averaged; both are recorded and labeled).

Targeted runs merged below (all local[32] unless keyed otherwise, quiet
machine, this session):
- semdedup_default  --only=semdedup_default          (constant-cell auto-k)
- stream_dedup_banded / _builtin  --only=...         (the round-11 A/B)
- cc_star --only=cc_star --x30 at BOTH local[16] and local[32]
  (the round-10 verdict's memory-bus attribution test: halving cores
  moves the 30x wall by ~5%, confirming bandwidth-bound, not CPU-bound)
"""

import json
import sys

full = json.load(open(sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_r11_full.json"))

TARGETED = {
    "semdedup_default_targeted_quiet": {
        "1x": {"sec": 27.7, "shuffle_write_mb": 26.1, "vectors": 20000,
               "pyramid_ks": [20], "pruned": 10806, "within_cell_pairs": 10106494},
        "10x": {"sec": 86.62, "shuffle_write_mb": 315.5, "vectors": 200000,
                "pyramid_ks": [196, 4], "pruned": 189925,
                "within_cell_pairs": 110742817},
        "ratio_10x": 3.13, "superlinear_blowup": False,
        "pairs_ratio_10x": 10.96, "superlinear_blowup_pairs": False,
        "note": "pre-salting run; the in-suite rows in this artifact carry "
                "the round-11 salted pair stage as well",
    },
    "stream_dedup_banded_targeted_quiet": {
        "1x": {"sec": 38.46, "dropped": 500, "state_rows": 171326,
               "state_commit_ms": 1723},
        "10x": {"sec": 391.49, "dropped": 4998, "state_rows": 171316,
                "state_commit_ms": 1439},
        "ratio_10x": 10.18, "superlinear_blowup": False,
    },
    "stream_dedup_banded_builtin_targeted_quiet": {
        "1x": {"sec": 17.14, "dropped": 500, "state_rows": 515452},
        "10x": {"sec": 91.91, "dropped": 4998, "state_rows": 515432},
        "ratio_10x": 5.36, "superlinear_blowup": False,
        "note": "identical planted-twin drops to the Python route at 4.3x "
                "less wall; dedup keys + both join-state sides = 3x state "
                "rows, watermark-bounded",
    },
    "cc_star_local16_targeted_quiet": {
        "1x": {"sec": 16.43, "shuffle_write_mb": 232.9, "rounds": 4,
               "shuffle_partitions": 16},
        "10x": {"sec": 39.96, "shuffle_write_mb": 2658.3, "rounds": 4,
                "shuffle_partitions": 39},
        "30x": {"sec": 179.14, "shuffle_write_mb": 7654.8, "rounds": 4,
                "shuffle_partitions": 117},
        "ratio_10x": 2.43, "ratio_30x_vs_10x": 4.48,
    },
    "cc_star_local32_targeted_quiet": {
        "1x": {"sec": 15.62, "shuffle_write_mb": 238.9, "rounds": 4,
               "shuffle_partitions": 32},
        "10x": {"sec": 34.19, "shuffle_write_mb": 2716.7, "rounds": 4,
                "shuffle_partitions": 39},
        "30x": {"sec": 169.95, "shuffle_write_mb": 7727.1, "rounds": 4,
                "shuffle_partitions": 117},
        "ratio_10x": 2.19, "ratio_30x_vs_10x": 4.97,
        "note": "memory-bus attribution CONFIRMED (round-10 verdict item "
                "5): halving cores 32 -> 16 moves the 30x wall only "
                "169.95 -> 179.14 s (+5.4%); a CPU-bound op would ~double. "
                "The 30x/10x wall excess over linear is bandwidth at fixed "
                "sockets — the axis that scales with executors on a real "
                "cluster.",
    },
    "cc_star_delta_frontier_pathgraph": {
        "plain": {"sec": 39.7, "rounds": 21, "components": 200001},
        "delta": {"sec": 163.7, "rounds": 21, "components": 200001},
        "note": "round-10 verdict item 6: opt-in delta-frontier variant on "
                "the favorable mixture (1M-vertex path, 21 rounds, + 200k "
                "round-1-converging blobs) is a documented NO-WIN: "
                "bit-identical output, ~4x slower (per-round diff+dilation "
                "bookkeeping exceeds the star-join savings). Kept opt-in, "
                "off everywhere.",
    },
}

full["ops"].update(TARGETED)
full["round"] = 11
out = "SCALE_STRESS_r11.json"
json.dump(full, open(out, "w"), indent=1)
print(f"wrote {out}: {len(full['ops'])} op rows")
