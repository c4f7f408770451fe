"""Capture .explain('formatted') for bench queries into plans/<tag>/.

Optimization-round evidence tool (guide §1): writes one
plans/<tag>/<query>_<suffix>.txt per bench query so plan claims
(Exchange counts, join strategies, PushedFilters) are reviewable
without running Spark.

Usage:
    python tools/capture_plans.py --tag r14 --suffix before [--only a,b]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.plan_audit import _CheckpointSkipper
from wireduck_spark.registry import load_all_queries
from wireduck_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: bench set)")
    args = ap.parse_args()

    queries = load_all_queries()
    if args.only:
        names = [n.strip() for n in args.only.split(",") if n.strip()]
    else:
        names = sorted(n for n, s in queries.items() if s.bench)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("wireduck-plan-capture")
    for name in names:
        spec = queries[name]
        try:
            # Checkpoints monkeypatched to no-ops (plan_audit precedent:
            # an eager checkpoint replaces the plan with an RDD scan and
            # hides exactly the plans we need to show).
            with _CheckpointSkipper():
                df = spec.fn(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution
                .ExplainMode.fromString("formatted"))
        except Exception as exc:  # pragma: no cover - evidence tool
            plan = f"PLAN CAPTURE FAILED: {exc}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
