"""Scaling-curve probe: run headline queries at 1x / Kx inflated data.

The driver ships sf0.1 at largest; the 100 TB claim needs evidence that
the plans stay linear when the data doesn't fit the first partition
layout. This tool inflates the fact tables K-fold (cross join with a
range — new keys per replica so group/join cardinalities actually grow),
writes them to a scratch dir once, and times the bench set at both
scales. Superlinear blowup (t_K / t_1 >> K) flags a plan that won't
survive the real cluster (e.g. an LSH bucket going quadratic).

Usage: python tools/scale_stress.py [--k 8] [--sf /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wireduck_spark.registry import load_all_queries
from wireduck_spark.session import get_spark

# Tables that grow with the fact data; dims (region/nation/part/...) are
# copied as-is so join fan-outs stay realistic.
FACT_KEYED = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
}
COPY_ONLY = ("region", "nation", "part")


def inflate(spark, sf_dir: str, out_dir: str, k: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for t in COPY_ONLY:
        shutil.copy(f"{sf_dir}/{t}.parquet", f"{out_dir}/{t}.parquet")
    replicas = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    shift = 10 ** 9  # disjoint key ranges per replica (keys cast to bigint)
    for t, key in FACT_KEYED.items():
        src = spark.read.parquet(f"{sf_dir}/{t}.parquet")
        cols = src.columns
        df = (
            src.select("*", replicas)
            .withColumn(
                key,
                F.col(key).cast("bigint") + F.col("rep").cast("bigint") * shift,
            )
            .select(*cols)
        )
        df.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")


def run_set(spark, names, queries, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in names:
        t0 = time.perf_counter()
        n = len(queries[name].fn(spark, sf_dir).collect())
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"#   {name}: {out[name]:.3f}s ({n} rows)", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/wireduck_scale_stress")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: bench set)")
    args = ap.parse_args()

    queries = load_all_queries()
    if args.only:
        names = sorted(args.only.split(","))
    else:
        # pcap entries scan fixed capture files — excluded, don't inflate
        names = sorted(
            n for n, s in queries.items()
            if s.bench and not (s.tags and "pcap" in s.tags)
        )

    spark = get_spark("scale-stress")
    spark.read.parquet(f"{args.sf}/lineitem.parquet").count()  # warmup

    big_dir = os.path.join(args.out, f"x{args.k}")
    if not os.path.exists(os.path.join(big_dir, "lineitem.parquet")):
        print(f"# inflating {args.k}x into {big_dir}", file=sys.stderr)
        inflate(spark, args.sf, big_dir, args.k)

    print("# --- 1x ---", file=sys.stderr)
    base = run_set(spark, names, queries, args.sf)
    print(f"# --- {args.k}x ---", file=sys.stderr)
    big = run_set(spark, names, queries, big_dir)

    report = {
        "k": args.k,
        "base_total_sec": round(sum(base.values()), 3),
        "scaled_total_sec": round(sum(big.values()), 3),
        "queries": {
            n: {
                "t1": base[n],
                "tk": big[n],
                "ratio": round(big[n] / base[n], 2) if base[n] > 0 else None,
            }
            for n in names
        },
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
