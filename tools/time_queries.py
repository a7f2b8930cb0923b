"""Isolated per-query timing under bench.py's exact protocol (round 16).

Usage: python tools/time_queries.py [--sf DIR] [--repeats N] [--desc]
           query [query ...]

Per query: sf0.001 plan warmup, target-sf table touch, then best-of-N
noop-sink timings (one wide sentinel before/after so readings carry
their own contention attribution). Emits one JSON line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_db_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="time_queries")
    from graph_db_spark.queries import REGISTRY

    def sentinel_wide() -> float:
        t0 = time.time()
        spark.range(0, 640_000_000, numPartitions=32).selectExpr("sum(id)").collect()
        return round(time.time() - t0, 3)

    # bench.py warmup protocol: tiny-sf plan compile + target-sf table touch
    for name in args.names:
        try:
            force(REGISTRY[name].build(spark, "/root/testdata/sf0.001"))
        except Exception:  # noqa: BLE001
            pass
    for t in ("lineitem", "orders", "customer", "events", "documents", "embeddings"):
        try:
            force(spark.read.parquet(f"{args.sf}/{t}.parquet"))
        except Exception:  # noqa: BLE001
            pass
    # MinHash-family first-touch at target sf (bench.py does the same)
    for name in ("dedup_minhash_lsh",):
        try:
            force(REGISTRY[name].build(spark, args.sf))
        except Exception:  # noqa: BLE001
            pass

    out: dict[str, dict] = {}
    for name in args.names:
        pre = sentinel_wide()
        best = None
        reps = []
        for _ in range(args.repeats):
            t0 = time.time()
            spark.sparkContext.setJobDescription(name)
            force(REGISTRY[name].build(spark, args.sf))
            spark.sparkContext.setJobDescription(None)
            dt = round(time.time() - t0, 3)
            reps.append(dt)
            best = dt if best is None else min(best, dt)
        post = sentinel_wide()
        out[name] = {"best": best, "reps": reps, "wide": max(pre, post)}
        print(f"[time] {name}: {best}s reps={reps} wide={max(pre, post)}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
