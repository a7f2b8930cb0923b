"""Isolated timing of the graph build + persisted-checkpoint closures
(bench.py's graph_build_index / graph_persist_checkpoint shapes), with
wide sentinels for contention attribution. One JSON line on stdout.

Usage: python tools/time_build_ckpt.py [--repeats N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_db_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark(app_name="time_build_ckpt")
    from graph_db_spark.catalogue import tpch_graph, tpch_graph_persisted

    def sentinel_wide() -> float:
        t0 = time.time()
        spark.range(0, 640_000_000, numPartitions=32).selectExpr("sum(id)").collect()
        return round(time.time() - t0, 3)

    # warmup: sf0.001 build (plan compile) + target-sf table touch
    g0 = tpch_graph(spark, "/root/testdata/sf0.001")
    g0.edge_index.count()
    for t in ("lineitem", "orders", "customer", "part", "supplier", "nation", "region"):
        spark.read.parquet(f"{args.sf}/{t}.parquet").write.format("noop").mode(
            "overwrite"
        ).save()

    out: dict[str, dict] = {}

    holder: dict[str, object] = {}

    def build_index():
        prev = holder.get("g")
        if prev is not None:
            prev.edge_index.unpersist()
            prev.vertices.unpersist()
        gg = tpch_graph(spark, args.sf)
        gg.edge_index.cache()
        gg.vertices.cache()
        gg.edge_index.count()
        gg.vertices.count()
        holder["g"] = gg

    def persist_ckpt():
        holder["gp"] = tpch_graph_persisted(spark, args.sf, rebuild=True)

    for name, fn in (("graph_build_index", build_index), ("graph_persist_checkpoint", persist_ckpt)):
        pre = sentinel_wide()
        reps = []
        for _ in range(args.repeats):
            t0 = time.time()
            fn()
            reps.append(round(time.time() - t0, 3))
        post = sentinel_wide()
        out[name] = {"best": min(reps), "reps": reps, "wide": max(pre, post)}
        print(f"[time] {name}: {min(reps)}s reps={reps} wide={max(pre, post)}", file=sys.stderr, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
