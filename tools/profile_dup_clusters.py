"""Round-15 variance profile for dedup_duplicate_clusters (verdict item 1).

The entry read 7.7 s in the quiet round-14 driver run vs 2.88 s in the
builder's committed quiet run of the SAME code — a 2.7× entry-local
spread invisible to suite sentinels. This script times the query's two
stages separately, N times, under bench.py's exact session + warmup
protocol, so the varying stage is attributable:

  stage A  — the MinHash chain (tokenize -> signatures -> banded join ->
             Jaccard verify), forced standalone;
  stage B  — star-CC rounds + corpus back-join on the SAME pair frame
             (pairs localCheckpointed first so B never re-runs A);
  full     — the registered query end-to-end (what bench.py times).

Usage: python tools/profile_dup_clusters.py [repeats]
Emits one JSON line per repeat + a summary to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from graph_db_spark.session import get_spark  # noqa: E402


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile_dup_clusters")

    from graph_db_spark import operators  # noqa: F401
    from graph_db_spark.operators import dedup as D
    from graph_db_spark.pregel import connected_components_star
    from graph_db_spark.queries import REGISTRY, _parquet_rows

    def sentinel() -> float:
        t0 = time.time()
        spark.range(0, 640_000_000, numPartitions=32).selectExpr("sum(id)").collect()
        return round(time.time() - t0, 3)

    # bench.py protocol: sf0.001 plan warmup + MinHash family first-touch
    # at target sf, so repeat 1 isn't measuring session spin-up.
    try:
        force(REGISTRY["dedup_duplicate_clusters"].build(spark, "/root/testdata/sf0.001"))
    except Exception:  # noqa: BLE001
        pass
    force(REGISTRY["dedup_minhash_lsh"].build(spark, sf_dir))

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_rows = _parquet_rows(sf_dir, "documents")
    rows = []
    for i in range(repeats):
        s_pre = sentinel()
        t0 = time.time()
        pairs = D.minhash_near_dup_pairs(
            d, "doc_id", "text", n_hashes=8, bands=4, threshold=0.7, shingle=3,
            corpus_rows=corpus_rows,
        ).localCheckpoint()
        n_pairs = pairs.count()
        t_pairs = round(time.time() - t0, 3)

        t0 = time.time()
        verts = d.select(F.col("doc_id").alias("id"))
        edges = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        labels, cc_rounds = connected_components_star(verts, edges)
        force(
            labels.select(
                F.col("id").alias("doc_id"),
                F.col("component").cast("long").alias("cluster_id"),
                (F.col("id") == F.col("component")).alias("is_canonical"),
            )
        )
        t_cc = round(time.time() - t0, 3)

        t0 = time.time()
        force(REGISTRY["dedup_duplicate_clusters"].build(spark, sf_dir))
        t_full = round(time.time() - t0, 3)
        s_post = sentinel()
        row = {
            "repeat": i,
            "minhash_pairs_sec": t_pairs,
            "starcc_sec": t_cc,
            "full_query_sec": t_full,
            "n_pairs": n_pairs,
            "cc_rounds": cc_rounds,
            "sentinel_wide": [s_pre, s_post],
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    def spread(key):
        vals = sorted(r[key] for r in rows)
        return {"min": vals[0], "max": vals[-1], "ratio": round(vals[-1] / vals[0], 2)}

    print(json.dumps({
        "summary": {k: spread(k) for k in ("minhash_pairs_sec", "starcc_sec", "full_query_sec")},
        "sf_dir": sf_dir,
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
