"""Per-query wall time + Spark job count (round 17, guide §1/§2.6).

Usage: python tools/profile_jobs.py [--sf DIR] [--repeats N] query [...]

The pregel fixed-point loops are job-latency-bound at fixture scale —
each checkpoint action is one driver-blocking job — so the metric that
proves a round-folding win is the JOB COUNT per query, not just wall.
Counts jobs via the UI REST API (exact, no listener plumbing).
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


def max_job_id(spark) -> int:
    """Job ids are globally monotone, so a delta of maxima counts jobs
    exactly even after the status store evicts old entries (works with
    spark.ui.enabled=false, unlike the REST API)."""
    ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
    return max(ids) if ids else -1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="profile_jobs")
    from graph_db_spark.queries import REGISTRY

    # warmup: tiny-sf plan compile + target-sf table touch (bench protocol)
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

    out: dict[str, dict] = {}
    for name in args.names:
        best, jobs_per = None, None
        for _ in range(args.repeats):
            j0 = max_job_id(spark)
            t0 = time.time()
            spark.sparkContext.setJobDescription(name)
            force(REGISTRY[name].build(spark, args.sf))
            spark.sparkContext.setJobDescription(None)
            dt = round(time.time() - t0, 3)
            j1 = max_job_id(spark)
            if best is None or dt < best:
                best = dt
            jobs_per = j1 - j0  # identical across repeats for these loops
        out[name] = {"best": best, "jobs": jobs_per}
        print(f"[profile] {name}: {best}s jobs={jobs_per}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
