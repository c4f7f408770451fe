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
# A partition expression that is value-constant without being foldable:
# pmod(x, 1) is always 0 (or NULL), so the window is physically global
# even though its partition spec is syntactically non-empty. Greedy .*
# so nested expressions (pmod(coalesce(c, 0), 1)) match too; a false
# positive (", 1)" inside a deeper nest) merely flags a query for
# review/allowlisting — the audit errs toward visibility.
_CONST_PARTITION = re.compile(r"pmod\(.*, 1\)")

# Queries allowed to run a single-task window because its input is
# bounded-domain BY CONSTRUCTION (an already-aggregated table whose row
# count is a category/vocabulary cardinality, never corpus size). Each
# uses pmod(col, 1) deliberately — a new constant-partition window in
# any OTHER query still flags.
BOUNDED_CONSTANT_WINDOWS = {
    "pipeline_hybrid_rrf",            # fused per-doc score table (<= docs
    #                                   in top-k union, bounded by 2k)
    "sampling_neyman_allocation",     # per-stratum moment table
    "text_zipf_fit",                  # top-50 vocabulary ranks
    "stats_bootstrap_ci",             # 200 bootstrap replicate sums
    "event_survival_kaplan_meier",    # per-day life table (<= 120 rows)
    "tpch_q15",                       # per-supplier revenue table (r15
    #                                   max-revenue window; supplier-
    #                                   cardinality-bounded input)
    "stats_chi_square_independence",  # r x c contingency cells (<= 20)
    "stats_ks_two_sample",            # unit-value bins (<= value range)
    "text_js_divergence_sources",     # per-source count table (<= sources)
    "stats_benjamini_hochberg",       # per-source p-value table (<= m tests)
    "curation_importance_weights",    # per-source weight table (<= sources)
    "stats_runs_test",                # daily series (<= 366 rows/yr)
    "event_ab_srm_drift_daily",       # daily ramp series (<= 366 rows/yr)
    "stats_acf_daily_lags",           # daily series (<= 366 rows/yr)
    "window_bollinger_bands",         # daily series (<= 366 rows/yr)
    "window_rsi_sma",                 # daily series (<= 366 rows/yr)
    "window_macd_ema",                # daily series (<= 366 rows/yr)
    "stats_schnabel_recapture",       # daily occasions (<= 366 rows/yr)
    "stats_granger_lagged_daily",     # daily series (<= 366 rows/yr)
    "stats_cramers_v_source_lang",    # r x k contingency cells (<= 100)
    "market_basket_pairs",            # item-pair table (<= C(200,2) —
    #                                   items hash into 200 buckets; the
    #                                   r11 top-25 rewrite ranks this
    #                                   vocabulary-bounded table, never
    #                                   the corpus)
}


def _collect_aliases(jplan) -> dict:
    """Map exprId -> defining child expression for every Alias in the
    logical plan (Project/Aggregate/Window output lists). Needed because
    the analyzer's ExtractWindowExpressions rewrites partitionBy(expr)
    into a `_w0` pre-projection, so Window partition specs reference a
    bare attribute whose real expression lives one Project below."""
    from py4j.protocol import Py4JError

    amap = {}
    stack = [jplan]
    while stack:
        node = stack.pop()
        for accessor in ("projectList", "aggregateExpressions",
                         "windowExpressions"):
            try:
                seq = getattr(node, accessor)()
            except Py4JError:
                continue
            for i in range(seq.size()):
                ne = seq.apply(i)
                if ne.nodeName() == "Alias":
                    amap[ne.exprId().id()] = ne.child()
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        try:
            subs = node.subqueries()
            for i in range(subs.size()):
                stack.append(subs.apply(i))
        except Py4JError:
            pass
    return amap


def _resolve_expr(e, amap, max_hops: int = 10):
    """Chase an AttributeReference through alias definitions (bounded)."""
    from py4j.protocol import Py4JError

    for _ in range(max_hops):
        if e.nodeName() != "AttributeReference":
            return e
        try:
            nxt = amap.get(e.exprId().id())
        except Py4JError:
            return e
        if nxt is None:
            return e
        e = nxt
    return e


def _walk_windows(jplan, amap=None) -> tuple[int, int, int]:
    """Walk ONE JVM plan tree (physical or logical — both expose
    nodeName/children/subqueries/partitionSpec through the same QueryPlan
    API) and count Window/WindowGroupLimit nodes that send all rows to
    one task. Returns (n_global, n_constant, n_skipped):

    - n_global: partitionSpec is EMPTY (a true global window).
      Tree-walking replaces the round-5 text parse of the formatted
      explain, which could not distinguish an empty partition spec from
      an empty order spec (both render as two bracket groups) — that
      parse never matched anything, silently zeroing this metric.
    - n_constant: partitionSpec is non-empty but every expression is
      value-constant (Catalyst-foldable, or the pmod(x, 1) idiom) — a
      disguised global window that satisfies the invariant only
      syntactically. Only meaningful on the OPTIMIZED LOGICAL plan:
      physical planning extracts partition expressions into a `_w0`
      pre-projection, so the physical spec shows bare attributes.
    - n_skipped: Window-ish nodes whose partitionSpec could not be read
      (accessor missing on this Spark version). Surfaced, not swallowed:
      a rename would otherwise zero the metric again — the exact
      vacuous-check failure mode the tree walk was built to fix.
    """
    from py4j.protocol import Py4JError

    n_global = n_constant = n_skipped = 0
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
                spec = node.partitionSpec()
                if spec.isEmpty():
                    n_global += 1
                else:
                    exprs = [spec.apply(i) for i in range(spec.size())]
                    if amap is not None:
                        exprs = [_resolve_expr(e, amap) for e in exprs]
                    if all(
                        e.foldable() or _CONST_PARTITION.search(e.toString())
                        for e in exprs
                    ):
                        n_constant += 1
            except Py4JError:
                n_skipped += 1  # accessor missing: count, don't hide
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        # scalar/EXISTS subqueries hang off the node, not children()
        try:
            subs = node.subqueries()
            for i in range(subs.size()):
                stack.append(subs.apply(i))
        except Py4JError:
            n_skipped += 1
    return n_global, n_constant, n_skipped


# Unary physical wrappers that never INCREASE the row count of their
# child, so a scalar (<=1-row) frame stays scalar through them. Matched
# by prefix because several render with ids ("WholeStageCodegen (3)").
_ROW_NONINCREASING_WRAPPERS = (
    "Project", "Filter", "BroadcastExchange", "Exchange", "ShuffleExchange",
    "WholeStageCodegen", "InputAdapter", "Sort", "ColumnarToRow",
    "AQEShuffleRead", "CollectLimit", "GlobalLimit", "LocalLimit",
    "Coalesce",
)


def _is_scalar_frame(node) -> bool:
    """True only if the frame is PROVABLY at most one row: descending
    through row-non-increasing unary wrappers, the top real operator is an
    empty-grouping aggregate — or a (nested-loop/cartesian) join of two
    such scalar frames, which is itself <=1 row.

    This replaces the old any-descendant scan (ADVICE r9): a multi-row
    build side that merely CONTAINS a broadcast scalar somewhere below
    (e.g. a ~366-row day-index table that embeds a crossJoin'd scalar
    total) used to pass as "provably 1-row" — a false negative on exactly
    the range-join shape the audit exists to catch."""
    from py4j.protocol import Py4JError

    n = node
    while True:
        name = n.nodeName()
        if name == "AdaptiveSparkPlan":
            n = n.initialPlan()
            continue
        if "QueryStage" in name:  # AQE stage wrapper — inspect its plan
            try:
                n = n.plan()
                continue
            except Py4JError:
                return False
        if "Aggregate" in name:
            try:
                return bool(n.groupingExpressions().isEmpty())
            except Py4JError:
                return False
        if name in ("BroadcastNestedLoopJoin", "CartesianProduct"):
            kids = n.children()
            return (kids.size() == 2
                    and _is_scalar_frame(kids.apply(0))
                    and _is_scalar_frame(kids.apply(1)))
        if name.startswith(_ROW_NONINCREASING_WRAPPERS):
            kids = n.children()
            if kids.size() != 1:
                return False
            n = kids.apply(0)
            continue
        return False


def count_multirow_bnlj(jplan) -> int:
    """BroadcastNestedLoopJoins whose BROADCAST side is NOT a provably
    1-row scalar frame. The blunt `bnlj > 1` rule mis-flagged queries
    that legitimately broadcast several 1-row aggregates (median + total
    + parent-impurity scalars each cost one bnlj); the scale risk is a
    MULTI-ROW nested loop, which this counts structurally: a build side
    that is not _is_scalar_frame (empty-grouping aggregate at the TOP of
    the build, through row-non-increasing wrappers only)."""
    from py4j.protocol import Py4JError

    multirow = 0
    stack = [jplan]
    while stack:
        node = stack.pop()
        name = node.nodeName()
        if name == "AdaptiveSparkPlan":
            stack.append(node.initialPlan())
            continue
        if name == "BroadcastNestedLoopJoin":
            try:
                build_left = "BuildLeft" in node.buildSide().toString()
            except Py4JError:
                build_left = False  # Spark default is BuildRight
            kids = node.children()
            build = kids.apply(0 if build_left else 1)
            if not _is_scalar_frame(build):
                multirow += 1
        kids = node.children()
        for i in range(kids.size()):
            stack.append(kids.apply(i))
        try:
            subs = node.subqueries()
            for i in range(subs.size()):
                stack.append(subs.apply(i))
        except Py4JError:
            pass
    return multirow


def audit_windows(qe) -> tuple[int, int, int]:
    """(n_global, n_constant, n_skipped) for one query execution.

    Empty partition specs are counted on the EXECUTED (physical) plan —
    what actually runs; constant-partition disguises on the OPTIMIZED
    LOGICAL plan, where the raw pmod(x, 1) expressions are still visible
    (physical plans hide them behind `_w0` projections). Skip counts
    from both walks are summed so an accessor rename on either tree
    surfaces instead of zeroing the metric."""
    g_phys, _, skip_phys = _walk_windows(qe.executedPlan())
    logical = qe.optimizedPlan()
    _, const_log, skip_log = _walk_windows(logical, _collect_aliases(logical))
    return g_phys, const_log, skip_phys + skip_log


class _CheckpointSkipper:
    """Monkeypatch DataFrame.localCheckpoint / .checkpoint into counting
    no-ops for the duration of the audit sweep (round-8 VERDICT #2): an
    eager checkpoint replaces the returned plan with a checkpointed-RDD
    scan, so the audit previously saw all-zero operator rows for exactly
    the most complex queries in the corpus (pagerank, label spreading,
    cluster components, minhash calibration, gini, schema drift). With
    checkpoints skipped, the audit sees the full PRE-CHECKPOINT plan —
    the plan that actually computes the result — and `count` tells the
    report how many truncations the real query would have applied.
    """

    def __init__(self):
        self.count = 0
        self._saved: list[tuple] = []

    def _classes(self):
        # PySpark 4 instances are pyspark.sql.classic.dataframe.DataFrame,
        # which OVERRIDES localCheckpoint/checkpoint — patching only the
        # abstract base in pyspark.sql.dataframe never fires. Patch every
        # class in the hierarchy that defines the methods.
        import pyspark.sql.dataframe as base

        classes = [base.DataFrame]
        try:
            import pyspark.sql.classic.dataframe as classic
            classes.append(classic.DataFrame)
        except ImportError:  # older PySpark: base class only
            pass
        return classes

    def __enter__(self):
        def _skip(df, eager=True):
            self.count += 1
            return df

        for cls in self._classes():
            for meth in ("localCheckpoint", "checkpoint"):
                if meth in cls.__dict__:
                    self._saved.append((cls, meth, cls.__dict__[meth]))
                    setattr(cls, meth, _skip)
        return self

    def __exit__(self, *exc):
        for cls, meth, orig in self._saved:
            setattr(cls, meth, orig)
        self._saved.clear()
        return False


def audit_one(spark, spec, sf_dir: str, skipper: _CheckpointSkipper) -> dict:
    before = skipper.count
    df = spec.fn(spark, sf_dir)
    ckpts_skipped = skipper.count - before
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
    global_windows, const_windows, skipped = audit_windows(qe)
    bnlj_multirow = count_multirow_bnlj(qe.executedPlan())
    return {
        "name": spec.name,
        "ckpts_skipped": ckpts_skipped,
        "bnlj_multirow": bnlj_multirow,
        "const_windows": const_windows,
        "win_nodes_skipped": skipped,
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
    with _CheckpointSkipper() as skipper:
        for name in sorted(queries):
            spec = queries[name]
            try:
                rows.append(audit_one(spark, spec, args.sf, skipper))
            except Exception as exc:  # pcap synth deps — report, don't die
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
        # Bounded-broadcast nested loops the structural multi-row
        # classifier correctly surfaces (the old bnlj<=1 rule passed
        # them without proving anything); each broadcast side is a
        # CONSTANT-size frame by construction:
        "join_cross",          # the CROSS JOIN operator demo: 25x5 dims
        "cte_reuse",           # 1-row filtered segment baseline (seg =
        #                        'BUILDING' over a 5-group aggregate)
        "dedup_simhash",       # broadcast spark.range(0,16) bit table
        "dedup_keep_best",     # same 16-row bit table (shared builder)
        "sim_topk_bruteforce",  # broadcast of the N_QUERY_VECS probe set
        #                         (constant; docstring documents it)
    }
    flagged = [
        r for r in rows
        if r["global_windows"]
        or r["cartesian"]
        # any Window node whose partitionSpec could not be inspected means
        # the no-global-window metric is blind for this query — flag it
        or r["win_nodes_skipped"]
        # constant-partition windows (pmod(x,1) idiom) are physically
        # global; only bounded-domain allowlisted queries may use them
        or (r["const_windows"] and r["name"] not in BOUNDED_CONSTANT_WINDOWS)
        # a nested-loop join whose broadcast side is NOT a provably-1-row
        # scalar frame (empty-grouping aggregate) — the genuine O(n*m)
        # risk. Any NUMBER of scalar broadcasts is fine (each costs one
        # bnlj against exactly one row); the kmeans queries' K-row
        # centroid broadcasts are the documented bounded exception.
        or (r["bnlj_multirow"] > 0 and r["name"] not in allowed_bnlj)
    ]

    with open(args.out, "w") as f:
        f.write(
            "# Plan audit (auto-generated by tools/plan_audit.py)\n\n"
            f"Physical-plan operator counts per registered query at "
            f"`{args.sf}` (AQE on, so counts reflect the initial plan; "
            "AQE only improves them at runtime — e.g. converting "
            "sort-merge to broadcast joins). The nested-loop column "
            "shows total bnlj+cartesian with the MULTI-ROW count in "
            "parens: a bnlj whose broadcast side is a provably-1-row "
            "scalar frame (empty-grouping aggregate, the tpch_q11/q22 "
            "decorrelation pattern) is fine in any number — the flag "
            "fires only on multi-row build sides; "
            "dedup_semantic_kmeans' nested-loop joins are its K-row "
            "centroid-broadcast assignment stages (bounded by K, "
            "allowlisted).\n\n"
        )
        f.write(
            f"**{len(rows)} queries audited; "
            f"{len(flagged)} flagged** (cartesian products, global "
            "windows, non-allowlisted constant-partition windows, "
            "uninspectable Window nodes, or non-allowlisted MULTI-ROW "
            "nested-loop joins). Constant-partition windows (the "
            "pmod(x,1) idiom) are physically single-task; the "
            "allowlisted queries run them over bounded-domain "
            "aggregate tables only.\n\n"
        )
        if flagged:
            f.write("## FLAGGED\n\n")
            for r in flagged:
                f.write(f"- `{r['name']}`: {r}\n")
            f.write("\n")
        f.write(
            "Rows with `pre-ckpt N` were audited with lineage truncation "
            "DISABLED (checkpoints monkeypatched to no-ops): the counts "
            "are the real pre-checkpoint plan the query computes — the "
            "production query additionally applies N checkpoint "
            "truncations (round-8 VERDICT #2: previously these rows "
            "showed the all-zero checkpointed-RDD scan instead). "
            "`dq_schema_drift_audit` is all-zero BY DESIGN, not opacity: "
            "it diffs parquet FOOTER schemas driver-side (O(files) "
            "metadata reads, no data scan) and returns a LocalTableScan "
            "— there is no distributed plan to audit.\n\n"
            "| query | shuffles | broadcast joins | sort-merge joins |"
            " nested-loop (multi-row) | windows (global/const) | explodes |"
            " python stages | top-k | ckpt |\n"
            "|---|---|---|---|---|---|---|---|---|---|\n"
        )
        for r in rows:
            ck = (f"pre-ckpt {r['ckpts_skipped']}"
                  if r["ckpts_skipped"] else "-")
            f.write(
                f"| {r['name']} | {r['shuffles']} | {r['bhj']} |"
                f" {r['smj']} | {r['bnlj'] + r['cartesian']}"
                f" ({r['bnlj_multirow']}) |"
                f" {r['windows']} ({r['global_windows']}/"
                f"{r['const_windows']}) |"
                f" {r['generates']} | {r['python']} |"
                f" {r['takeordered']} | {ck} |\n"
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
