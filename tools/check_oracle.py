"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row-count, schema (column names), and order-insensitive values.

Usage: python tools/check_oracle.py [--sf DIR] [--json OUT.json] [query ...]

--json writes the sweep as a machine-checkable artifact (round-15 verdict
item 5: the full-sweep claim used to live only as COVERAGE.md prose):
per-query rows/schema/hash booleans + row counts + error, plus sf, git
SHA, and engine versions — diffable against the driver's
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df):
    """Sort columns by name, canonicalize values, sort rows."""
    cols = sorted(df.columns)
    df = df[cols]

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "\x00NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.6f}"
            return f"{v:.6f}"
        if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "ndarray":
            # The driver's pandas-based canonicalizer cannot hash container
            # cells (round-12 `agg_collect_sorted_lists` err). Fail loudly
            # here instead of masking with str(): queries must emit scalar
            # top-level columns (array_join / to_json before returning).
            raise TypeError(
                f"container cell {type(v).__name__} in output — driver "
                "canonicalizer cannot hash it; flatten to a scalar column"
            )
        return str(v)

    rows = sorted(tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_TEST_CPUS", "8"))
    ap.add_argument("--json", dest="json_out", default=None,
                    help="write the sweep as a JSON artifact to this path")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from graph_db_spark.queries import REGISTRY
    from graph_db_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", cpus=args.cpus, shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")

    names = args.names or list(REGISTRY)
    failures = []
    report: dict[str, dict] = {}

    def record(name, *, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None, sec=None):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err, "sec": sec,
        }

    for name in names:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            sdf = spec.build(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            record(name, err=f"spark: {e}"[:300])
            continue
        t_spark = round(time.time() - t0, 1)
        if spec.oracle is None:
            print(f"OK?   {name}: rows={len(sdf)} (no oracle — rows-only check) [{t_spark:.1f}s]")
            # rows_match=None (not a vacuous True): a downstream diff must
            # never read an unverified rows-only entry as a confirmed
            # match (round-15 ADVICE; currently moot — all queries carry
            # oracles).
            record(name, rows_match=None, checked=False, spark_rows=len(sdf),
                   err="no oracle — rows-only check", sec=t_spark)
            continue
        try:
            odf = con.sql(spec.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            record(name, spark_rows=len(sdf), err=f"duckdb: {e}"[:300], sec=t_spark)
            continue
        sc, sr = normalize(sdf)
        oc, orows = normalize(odf)
        record(name, rows_match=len(sr) == len(orows), schema_match=sc == oc,
               hash_match=sr == orows, spark_rows=len(sr),
               oracle_rows=len(orows), sec=t_spark)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} vs {oc}")
            failures.append(name)
        elif len(sr) != len(orows):
            print(f"FAIL  {name}: rows {len(sr)} vs {len(orows)}")
            failures.append(name)
        elif sr != orows:
            diff = [i for i, (a, b) in enumerate(zip(sr, orows)) if a != b][:3]
            print(f"FAIL  {name}: values differ; first diffs at sorted idx {diff}")
            for i in diff[:2]:
                print(f"      spark: {sr[i]}")
                print(f"      duck : {orows[i]}")
            failures.append(name)
        else:
            print(f"PASS  {name}: rows={len(sr)} [{t_spark:.1f}s]")
    print()
    if args.json_out:
        import json
        import subprocess

        import pyspark

        try:
            sha = subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True, text=True,
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ).stdout.strip()
        except Exception:  # noqa: BLE001
            sha = None
        artifact = {
            "sf_dir": args.sf,
            "git_sha": sha,
            "n_queries": len(names),
            "n_failed": len(failures),
            "failed": failures,
            "pyspark": pyspark.__version__,
            "duckdb": duckdb.__version__,
            "queries": report,
        }
        with open(args.json_out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {args.json_out} ({len(report)} queries)")
    if failures:
        print(f"{len(failures)}/{len(names)} FAILED: {failures}")
        sys.exit(1)
    import pyspark

    print(
        f"all {len(names)} queries match "
        f"[pyspark {pyspark.__version__}, duckdb {duckdb.__version__}]"
    )


if __name__ == "__main__":
    main()
