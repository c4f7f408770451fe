"""Plan audit: sweep every registered query, extract physical-plan
metrics, and write PLANS.md — the per-query evidence that each plan has
the shape you'd want at 100 TB (broadcasts where a side is small, no
cartesian products, no global windows, partition-bounded shuffles).

tests/test_plans.py pins the load-bearing invariants in CI; this tool
is the full-inventory sweep: one row per query so a reviewer can scan
for smells (and diffs of PLANS.md show plan regressions in review).

Usage: python tools/plan_audit.py [--sf DIR] [--out PLANS.md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wireduck_spark.registry import load_all_queries
from wireduck_spark.session import get_spark

# Operator detail headers in formatted explain: "(12) Exchange ..." —
# counting these counts each operator exactly once.
_OP = re.compile(r"^\(\d+\) (\w+)", re.MULTILINE)
# A Window detail line with an empty partition spec renders "..., [], [..."
_GLOBAL_WIN = re.compile(r"windowspecdefinition.*")


def _count_global_windows(jplan) -> int:
    """Walk the JVM physical-plan tree and count Window/WindowGroupLimit
    nodes whose partitionSpec is EMPTY (a true global window: all rows
    to one task). Tree-walking replaces the round-5 text parse of the
    formatted explain, which could not distinguish an empty partition
    spec from an empty order spec (both render as two bracket groups) —
    that parse never matched anything, silently zeroing this metric."""
    n = 0
    stack = [jplan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            # AQE's wrapper is a LEAF node — the real tree hangs off
            # initialPlan (pre-execution, what this audit inspects).
            stack.append(node.initialPlan())
            continue
        if "Window" in name:
            try:
                if node.partitionSpec().isEmpty():
                    n += 1
            except Exception:
                pass  # node without a partitionSpec accessor
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        # scalar/EXISTS subqueries hang off the node, not children()
        try:
            subs = node.subqueries()
            for i in range(subs.size()):
                stack.append(subs.apply(i))
        except Exception:
            pass
    return n


def audit_one(spark, spec, sf_dir: str) -> dict:
    df = spec.fn(spark, sf_dir)
    qe = df._jdf.queryExecution()
    plan = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    ops = _OP.findall(plan)
    counts = {}
    for op in ops:
        counts[op] = counts.get(op, 0) + 1
    global_windows = _count_global_windows(qe.executedPlan())
    return {
        "name": spec.name,
        "shuffles": counts.get("Exchange", 0),
        "bhj": counts.get("BroadcastHashJoin", 0),
        "smj": counts.get("SortMergeJoin", 0),
        "bnlj": counts.get("BroadcastNestedLoopJoin", 0),
        "cartesian": counts.get("CartesianProduct", 0),
        "windows": counts.get("Window", 0) + counts.get("WindowGroupLimit", 0),
        "global_windows": global_windows,
        "generates": counts.get("Generate", 0),
        "python": (
            counts.get("MapInPandas", 0)
            + counts.get("ArrowEvalPython", 0)
            + counts.get("BatchEvalPython", 0)
            + counts.get("FlatMapGroupsInPandas", 0)
            + counts.get("PythonDataSource", 0)
            + counts.get("PythonMapInArrow", 0)
        ),
        "takeordered": counts.get("TakeOrderedAndProject", 0),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PLANS.md"))
    args = ap.parse_args()

    queries = load_all_queries()
    spark = get_spark("plan-audit")
    rows, errors = [], []
    for name in sorted(queries):
        spec = queries[name]
        try:
            rows.append(audit_one(spark, spec, args.sf))
        except Exception as exc:  # pcap synth deps etc — report, don't die
            errors.append((name, str(exc).splitlines()[0][:120]))

    # Queries whose nested-loop joins are bounded-by-construction and
    # therefore expected (documented here so a NEW bnlj still flags):
    allowed_bnlj = {
        # K-row centroid broadcasts cross-joined against the vectors —
        # the k-means assignment pattern; bounded by K, never row x row.
        "dedup_semantic_kmeans",
        # Same pattern at sqrt(n) centroids, plus the LSH-routed
        # assignment's residual fallback (anti-join survivors x broadcast
        # centroid table) — every nested-loop side is the broadcast
        # centroid set, bounded by k, never row x row.
        "dedup_semantic_kmeans_scaled",
    }
    flagged = [
        r for r in rows
        if r["global_windows"]
        or r["cartesian"]
        # >1 nested-loop join means something beyond the 1-row scalar
        # broadcast pattern slipped in
        or (r["bnlj"] > 1 and r["name"] not in allowed_bnlj)
    ]

    with open(args.out, "w") as f:
        f.write(
            "# Plan audit (auto-generated by tools/plan_audit.py)\n\n"
            f"Physical-plan operator counts per registered query at "
            f"`{args.sf}` (AQE on, so counts reflect the initial plan; "
            "AQE only improves them at runtime — e.g. converting "
            "sort-merge to broadcast joins). `bnlj=1` rows are the "
            "1-row scalar-subquery broadcast pattern (tpch_q11/q22 "
            "style), asserted single-row by tests/test_plans.py; "
            "dedup_semantic_kmeans' nested-loop joins are its K-row "
            "centroid-broadcast assignment stages (bounded by K).\n\n"
        )
        f.write(
            f"**{len(rows)} queries audited; "
            f"{len(flagged)} flagged** (cartesian products, global "
            "windows, or multi-row nested-loop joins).\n\n"
        )
        if flagged:
            f.write("## FLAGGED\n\n")
            for r in flagged:
                f.write(f"- `{r['name']}`: {r}\n")
            f.write("\n")
        f.write(
            "| query | shuffles | broadcast joins | sort-merge joins |"
            " nested-loop | windows (global) | explodes | python stages |"
            " top-k |\n|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            f.write(
                f"| {r['name']} | {r['shuffles']} | {r['bhj']} |"
                f" {r['smj']} | {r['bnlj'] + r['cartesian']} |"
                f" {r['windows']} ({r['global_windows']}) |"
                f" {r['generates']} | {r['python']} |"
                f" {r['takeordered']} |\n"
            )
        if errors:
            f.write("\n## Not audited (builder raised at plan time)\n\n")
            for name, msg in errors:
                f.write(f"- `{name}`: {msg}\n")
    print(f"wrote {args.out}: {len(rows)} audited, "
          f"{len(flagged)} flagged, {len(errors)} errors")
    for name, msg in errors:
        print(f"  ERR {name}: {msg}")


if __name__ == "__main__":
    main()
