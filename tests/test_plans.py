"""Physical-plan invariants: the shapes that make queries scale.

Correctness is the oracle gate's job; these tests pin the PLAN — pushed
filters, pruned read schemas, broadcast joins where a side is small, and
the absence of cartesian products — so a regression that silently turns a
broadcast join into a cross product (still correct, 1000x slower at
100 TB) fails CI instead of a future cluster run.
"""

from __future__ import annotations

import pytest

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()


def plan_of(spark, name, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q6_filters_reach_parquet_scan(spark, sf_dir):
    plan = plan_of(spark, "tpch_q6", sf_dir)
    assert "PushedFilters:" in plan
    pushed = next(
        ln for ln in plan.splitlines() if "PushedFilters:" in ln
    )
    assert "l_shipdate" in pushed and "l_discount" in pushed \
        and "l_quantity" in pushed
    # projection pruning: the scan reads only the 4 referenced columns
    read = next(ln for ln in plan.splitlines() if "ReadSchema:" in ln)
    assert read.count(":") >= 4
    assert "l_orderkey" not in read and "l_returnflag" not in read


def test_small_dims_broadcast_not_shuffle(spark, sf_dir):
    """nation (25 rows) must broadcast in the star joins — a sort-merge
    join against a 25-row table would shuffle the fact side for nothing."""
    for name in ("tpch_q5", "tpch_q10", "join_star_q9_profit"):
        plan = plan_of(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name


def test_no_cartesian_in_dedup_or_similarity(spark, sf_dir):
    """LSH dedup and ANN search are bucketed by construction: any
    cartesian/nested-loop product over the corpus means the blocking
    broke and the query is O(n^2) at scale."""
    for name in ("dedup_minhash_lsh", "dedup_embedding_cosine",
                 "sim_ann_ivf_bucketed"):
        plan = plan_of(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name


def test_latest_per_key_uses_window_group_limit(spark, sf_dir):
    """rn=1 dedup must push a running limit into the window operator
    (WindowGroupLimit) instead of materializing every row's rank."""
    plan = plan_of(spark, "latest_per_key", sf_dir)
    assert "WindowGroupLimit" in plan


def test_topk_avoids_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must plan as TakeOrderedAndProject (per-partition
    top-k then merge), not a full global sort."""
    plan = plan_of(spark, "tpch_q3", sf_dir)
    assert "TakeOrderedAndProject" in plan
    plan = plan_of(spark, "sort_limit_topk", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    """The scan-heavy aggregate must combine map-side: two HashAggregate
    levels around one exchange, so the shuffle carries ~6 rows per
    partition, not 60k."""
    plan = plan_of(spark, "tpch_q1", sf_dir)
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_percent_cume_has_no_global_window(spark, sf_dir):
    """window_percent_cume must not funnel the table through one task: its
    two-pass rewrite leaves exactly the range-partitioned local Window
    (partitioned by pid), never an un-partitioned Window over the scan."""
    plan = plan_of(spark, "window_percent_cume", sf_dir)
    # every Window operator in the plan must carry a partition spec: the
    # formatted-plan detail line reads "Arguments: [...], [part cols], [...]"
    # for partitioned windows; an un-partitioned global window renders an
    # empty partition list "Arguments: [...], [], [sort...]".
    win_args = [
        ln for ln in plan.splitlines()
        if "Arguments:" in ln and "windowspecdefinition" in ln
    ]
    assert win_args, "expected at least one Window operator"
    for ln in win_args:
        assert "], [], [" not in ln.replace(" ", ""), f"global window: {ln}"
    # and no single-partition exchange feeding a sort of the full table
    assert "Exchange SinglePartition" not in plan


@pytest.mark.parametrize("name", ["join_range_interval", "join_theta_nonequi"])
def test_nonequi_joins_carry_equi_conjunct(spark, sf_dir, name):
    """Range/theta joins must ride an equi-key shuffle (SortMergeJoin /
    BroadcastHashJoin with post-filter), never a pure nested loop over
    two big sides."""
    plan = plan_of(spark, name, sf_dir)
    assert "CartesianProduct" not in plan
