"""Full-registry RUNTIME scan probe (optimization evidence tool).

Collects each registered query at sf0.01 and counts big-table FileScan
nodes in the FINAL adaptive plan only (the static explain double-counts
subtrees that AQE's ReusedExchange collapses at runtime — r14 lesson).
A query printed MULTI re-reads a big table more than once per run;
whether that is waste needs a per-query read (disjoint pushed-down
slices, candidate fetch-backs and bounded iterative loops are all
legitimate multi-scan shapes — see OPTIMIZATION_r14.md session 3).

Usage: python tools/scan_probe.py [--sf DIR] [--only a,b]
The r14 full-registry output is archived at plans/r14/scan_probe_runtime.txt.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_audit import _CheckpointSkipper
from wireduck_spark.registry import load_all_queries
from wireduck_spark.session import get_spark

BIG = ("events", "lineitem", "documents", "embeddings", "orders")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    queries = load_all_queries()
    names = ([n.strip() for n in args.only.split(",")] if args.only
             else sorted(queries))
    spark = get_spark("scan-probe")
    multi = []
    for name in names:
        spec = queries[name]
        try:
            spark.catalog.clearCache()
            with _CheckpointSkipper():
                df = spec.fn(spark, args.sf)
                df.collect()
            final = df._jdf.queryExecution().executedPlan().toString()
            if "+- == Initial Plan ==" in final:
                final = final.split("+- == Initial Plan ==")[0]
            per: dict[str, int] = {}
            for line in final.splitlines():
                if "FileScan parquet" in line or "Scan parquet" in line:
                    for t in BIG:
                        if f"{t}.parquet" in line:
                            per[t] = per.get(t, 0) + 1
            flagged = {t: c for t, c in per.items() if c > 1}
            if flagged:
                multi.append((name, flagged))
                print(f"MULTI {name}: {flagged}", flush=True)
            else:
                print(f"ok    {name}: {per}", flush=True)
        except Exception as exc:  # pragma: no cover - evidence tool
            print(f"ERR   {name}: {type(exc).__name__} {exc}", flush=True)
    print(f"\n{len(multi)} queries with >1 runtime scan of a big table:")
    for name, flagged in multi:
        print(f"  {name}: {flagged}")


if __name__ == "__main__":
    main()
