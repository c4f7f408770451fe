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


def global_windows_of(spark, name, sf_dir) -> int:
    """Count physically-single-task Window operators by walking the JVM
    plan trees (tools/plan_audit.audit_windows). The old text check on
    the formatted explain could not work: an empty partition spec renders
    as TWO bracket groups, not an empty "[]", so the needle never matched
    and the assert was vacuous. Counts empty partition specs AND
    constant-partition disguises (pmod(x,1)) outside the bounded-domain
    allowlist AND Window nodes whose spec could not be inspected — any of
    the three means the no-global-window invariant is unproven."""
    import tools.plan_audit as pa

    df = QUERIES[name].fn(spark, sf_dir)
    g, const, skipped = pa.audit_windows(df._jdf.queryExecution())
    if name in pa.BOUNDED_CONSTANT_WINDOWS:
        const = 0
    return g + const + skipped


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
                 "sim_ann_ivf_bucketed", "pipeline_incremental_dedup"):
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
    assert "windowspecdefinition" in plan, "expected Window operators"
    assert global_windows_of(spark, "window_percent_cume", sf_dir) == 0
    # and no single-partition exchange feeding a sort of the full table
    assert "Exchange SinglePartition" not in plan


@pytest.mark.parametrize("name", ["join_range_interval", "join_theta_nonequi"])
def test_nonequi_joins_carry_equi_conjunct(spark, sf_dir, name):
    """Range/theta joins must ride an equi-key shuffle (SortMergeJoin /
    BroadcastHashJoin with post-filter), never a pure nested loop over
    two big sides."""
    plan = plan_of(spark, name, sf_dir)
    assert "CartesianProduct" not in plan


def test_tpch2_suite_plan_shapes(spark, sf_dir):
    """Round-3 TPC-H additions: no unintended cartesian products and
    broadcast joins on every dimension side. Q11/Q22 legitimately carry a
    BroadcastNestedLoopJoin for their 1-row scalar-subquery broadcast, so
    they are asserted separately."""
    for name in ("tpch_q2", "tpch_q4", "tpch_q8", "tpch_q12", "tpch_q13",
                 "tpch_q15", "tpch_q16", "tpch_q17", "tpch_q19",
                 "tpch_q20", "tpch_q21"):
        plan = plan_of(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoop" not in plan, name
        assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan, name


def test_q19_keeps_equi_join_under_disjunction(spark, sf_dir):
    """Q19's OR-of-conjuncts spans both join sides; the optimizer must
    keep the p_partkey equi-join and apply the disjunction as a filter,
    never degrade to a nested loop over lineitem x part."""
    plan = plan_of(spark, "tpch_q19", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_q21_avoids_count_distinct_expand(spark, sf_dir):
    """Q21's per-order supplier counts are a two-level aggregate; a
    countDistinct plan would insert an Expand (row duplication per
    distinct column) ahead of the shuffle."""
    plan = plan_of(spark, "tpch_q21", sf_dir)
    assert "Expand" not in plan


def test_scalar_subquery_broadcast_is_single_row(spark, sf_dir):
    """Q11/Q15/Q22 decorrelate their scalar subquery into a 1-row
    broadcast join - the nested-loop side must be the aggregate, never
    the fact table (a fact-side nested loop is the O(n^2) failure)."""
    for name in ("tpch_q11", "tpch_q22"):
        plan = plan_of(spark, name, sf_dir)
        # the only nested-loop join allowed is against a HashAggregate
        # (the scalar), which AQE marks as a tiny broadcast; formatted
        # mode prints each operator twice (tree line + detail section)
        assert plan.count("BroadcastNestedLoopJoin (") <= 1, name


def test_contamination_join_on_hashed_grams(spark, sf_dir):
    """The 8-gram contamination join must broadcast the deduped train
    side and never cross-join gram rows; gram keys are 60-bit ints by
    construction (functions/curation.py)."""
    plan = plan_of(spark, "text_contamination_ngram", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    assert "BroadcastHashJoin" in plan


def test_semantic_kmeans_windows_are_partitioned(spark, sf_dir):
    """dedup_semantic_kmeans' argmin windows partition by vec_id; no
    global (un-partitioned) Window may appear anywhere in the plan."""
    plan = plan_of(spark, "dedup_semantic_kmeans", sf_dir)
    assert "windowspecdefinition" in plan, "expected argmin Window operators"
    assert global_windows_of(spark, "dedup_semantic_kmeans", sf_dir) == 0


def test_partitioned_write_prunes_directories(spark, sf_dir):
    """io_partitioned_pruning's re-read must carry the partition filter
    at the scan (PartitionFilters), so only the matching directory is
    listed - the difference between a directory lookup and a full scan
    at 100 TB."""
    plan = plan_of(spark, "io_partitioned_pruning", sf_dir)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf, "expected a partitioned scan"
    assert any("o_orderstatus" in ln for ln in pf), pf


def test_packing_windows_are_partitioned(spark, sf_dir):
    """The packing family's running-sum / row_number windows must all be
    partitioned (by source / shard) — a global window would funnel the
    corpus through one task (the window_percent_cume lesson)."""
    for name in ("seq_pack_greedy", "shuffle_deterministic_shards",
                 "pipeline_training_mix"):
        plan = plan_of(spark, name, sf_dir)
        assert "windowspecdefinition" in plan, \
            f"{name}: expected at least one Window operator"
        assert global_windows_of(spark, name, sf_dir) == 0, name


def test_quantize_has_no_shuffle_or_python(spark, sf_dir):
    """embed_quantize_int8 is a pure narrow map: no Exchange (beyond the
    small-scan spread), no Python workers in the plan."""
    plan = plan_of(spark, "embed_quantize_int8", sf_dir)
    assert "Python" not in plan
    # the only exchanges allowed are the spread_small_scan round-robin
    # and the output orderBy's range partitioning (display-determinism)
    import re
    kinds = set(re.findall(r"Exchange (\w+)", plan))
    assert kinds <= {"RoundRobinPartitioning", "rangepartitioning"}, kinds


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """rk<=3 must push into the window as a running group limit, the
    k>1 generalization of the latest_per_key assertion."""
    plan = plan_of(spark, "window_topk_per_group", sf_dir)
    assert "WindowGroupLimit" in plan


def test_sorted_write_produces_disjoint_files(spark, sf_dir):
    """io_sorted_clustered_write's repartitionByRange + sortWithinPartitions
    must yield parquet files whose o_orderdate min/max ranges do not
    overlap — the physical property row-group skipping depends on.
    Verified from the parquet footers themselves (duckdb parquet_metadata),
    not from the Spark plan."""
    import glob as _glob

    import duckdb

    QUERIES["io_sorted_clustered_write"].fn(spark, sf_dir).collect()
    from wireduck_spark.operators.io import _scratch
    files = sorted(_glob.glob(f"{_scratch(sf_dir, 'orders_clustered')}/*.parquet"))
    assert len(files) > 1, "expected a multi-file clustered layout"
    con = duckdb.connect()
    ranges = []
    for f in files:
        lo, hi = con.execute(
            "SELECT MIN(o_orderdate), MAX(o_orderdate) "
            f"FROM read_parquet('{f}')"
        ).fetchone()
        ranges.append((lo, hi))
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping file ranges: {hi1} > {lo2}"


def test_round4_keyed_windows_single_shuffle(spark, sf_dir):
    """The round-4 window operators pay exactly ONE data shuffle: the
    sessionization lag+cumsum windows, the peak-concurrency sweep's
    running-sum/partition-max pair, and the tolerance as-of's dual
    last_value all share a single user_id partitioning. More than one
    Exchange of the events table means a window spec drifted apart
    (e.g. a second orderBy forcing a re-sort-shuffle); no window may be
    global."""
    for name in ("event_sessionization_gap", "event_peak_concurrency",
                 "join_asof_tolerance"):
        plan = plan_of(spark, name, sf_dir)
        # AQE renders Exchange once per reuse point; count distinct
        # hashpartitioning exprs on the data path instead
        n_exchanges = plan.count("Exchange hashpartitioning")
        assert n_exchanges <= 2, f"{name}: {n_exchanges} keyed exchanges"
        assert "CartesianProduct" not in plan, name


def test_novelty_and_containment_shuffle_hashed_keys(spark, sf_dir):
    """The gram-keyed curation queries must never shuffle raw gram text:
    novelty shuffles 60-bit gram ints; containment's pair join carries
    the shingle string only inside the source-blocked equi-join (the
    jaccard verifier's documented shape), with no cartesian anywhere."""
    plan = plan_of(spark, "text_source_novelty", sf_dir)
    assert "CartesianProduct" not in plan
    assert "conv(substring(md5" in plan  # hashed key feeds the exchange
    plan2 = plan_of(spark, "dedup_ngram_containment", sf_dir)
    assert "CartesianProduct" not in plan2
    assert "BroadcastNestedLoopJoin" not in plan2


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime filtering — the 100-TB shuffle-join saver: when a selective
    dimension filter feeds a shuffle join, Spark can build a bloom filter
    from the build side and push might_contain onto the fact-side scan,
    skipping most of the probe shuffle. Local thresholds are tuned for
    TB-scale, so this pins the *capability* with them lowered: the same
    query at warehouse scale injects the filter with stock settings.
    """
    from pyspark.sql import functions as F

    from wireduck_spark.registry import table

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force shuffle join
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold":
            "100MB",
        "spark.sql.optimizer.runtime.bloomFilter."
        "applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, sf_dir, "lineitem")
        orders = table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        agg = joined.agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint").alias("price_cents"),
        )
        plan = agg._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan
        with_bloom = agg.collect()[0]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    # the filter is a pure optimization: results identical without it
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    plain = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint"))
            .cast("bigint").alias("price_cents"),
        )
        .collect()[0]
    )
    assert with_bloom == plain


def test_zorder_write_localizes_both_dims(spark, sf_dir):
    """io_zorder_clustered_write must yield files that each cover a
    bounded range of BOTH clustering dimensions — the property that lets
    a 2-D box predicate skip files on either column's min/max stats.
    (A single-column range sort localizes one dim and leaves the other
    spanning ~100% of its range per file.) Verified from the parquet
    footers, not the plan."""
    import glob as _glob

    import duckdb

    QUERIES["io_zorder_clustered_write"].fn(spark, sf_dir).collect()
    from wireduck_spark.operators.io import _scratch
    files = sorted(
        _glob.glob(f"{_scratch(sf_dir, 'lineitem_zorder')}/*.parquet")
    )
    assert len(files) >= 8, "expected a multi-file z-ordered layout"
    con = duckdb.connect()
    glo_pk, ghi_pk, glo_sk, ghi_sk = con.execute(
        "SELECT MIN(l_partkey), MAX(l_partkey), MIN(l_suppkey), "
        f"MAX(l_suppkey) FROM read_parquet('{_scratch(sf_dir, 'lineitem_zorder')}/*.parquet')"
    ).fetchone()
    pk_span = ghi_pk - glo_pk or 1
    sk_span = ghi_sk - glo_sk or 1
    frac_pk, frac_sk = [], []
    for f in files:
        lo_pk, hi_pk, lo_sk, hi_sk = con.execute(
            "SELECT MIN(l_partkey), MAX(l_partkey), MIN(l_suppkey), "
            f"MAX(l_suppkey) FROM read_parquet('{f}')"
        ).fetchone()
        frac_pk.append((hi_pk - lo_pk) / pk_span)
        frac_sk.append((hi_sk - lo_sk) / sk_span)
    # Morton locality: with 16 z-range files (4 prefix bits) each file
    # covers ~1/4 of each dimension; allow generous slack for boundary
    # files. The essential claim is BOTH dims are bounded away from the
    # full span on average — impossible for a 1-D sort.
    avg_pk = sum(frac_pk) / len(frac_pk)
    avg_sk = sum(frac_sk) / len(frac_sk)
    assert avg_pk < 0.6, f"partkey not localized: avg span {avg_pk:.2f}"
    assert avg_sk < 0.6, f"suppkey not localized: avg span {avg_sk:.2f}"


def test_ewma_and_m4_single_keyed_exchange(spark, sf_dir):
    """window_ewma's 8 LAGs and M4's two row_number directions must each
    share ONE keyed partitioning of the events table — a second
    hashpartitioning exchange means the window specs drifted apart; no
    window may be global."""
    for name, key in (("window_ewma", "user_id"),
                      ("resample_m4_downsample", "event_type")):
        plan = plan_of(spark, name, sf_dir)
        # formatted mode details exchanges as 'Arguments: hashpartitioning'
        n = plan.count("Arguments: hashpartitioning")
        assert n == 1, f"{name}: {n} keyed exchanges"
        assert key in plan
        assert "CartesianProduct" not in plan, name


def test_audio_energy_is_pure_narrow_map(spark, sf_dir):
    """mm_audio_frame_energy must be shuffle-free: binary synthesis and
    the framing mapInPandas are narrow; any Exchange means the asset
    payloads started moving."""
    plan = plan_of(spark, "mm_audio_frame_energy", sf_dir)
    assert "Arguments: hashpartitioning" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_quantile_bucketize_broadcasts_bounds(spark, sf_dir):
    """The decile-boundary table is ONE row: assignment must ride a
    broadcast (nested-loop on a 1-row build side), never shuffle the
    events for it; the only keyed exchange is the final bucket rollup."""
    plan = plan_of(spark, "feature_quantile_bucketize", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Arguments: hashpartitioning") <= 1


def test_dau_stickiness_no_cartesian_or_global_window(spark, sf_dir):
    """The sliding-distinct rewrite is explode + keyed aggregates only —
    no per-day self-join of the corpus, no global window."""
    plan = plan_of(spark, "event_dau_stickiness", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" not in plan


def test_referential_orphans_collapses_before_join(spark, sf_dir):
    """Every FK validation join must consume the PRE-AGGREGATED child
    key table (HashAggregate below the join), so fact rows never reach
    a join exchange."""
    plan = plan_of(spark, "dq_referential_orphans", sf_dir)
    assert "CartesianProduct" not in plan
    # 7 edges -> 7 child-side aggregates feeding joins
    assert plan.count("HashAggregate") >= 14  # partial+final per edge


def test_compaction_reduces_file_count(spark, sf_dir):
    """io_small_files_compaction must actually collapse the fragmented
    64-file write into the coalesce target (2 files) with identical row
    counts — the whole point of OPTIMIZE."""
    import os

    from wireduck_spark.operators.io import _scratch

    QUERIES["io_small_files_compaction"].fn(spark, sf_dir).collect()
    base = _scratch(sf_dir, "compaction")
    count = lambda d: len([f for f in os.listdir(d)  # noqa: E731
                           if f.endswith(".parquet")])
    assert count(f"{base}/frag") == 64
    assert count(f"{base}/compact") == 2
    frag_n = spark.read.parquet(f"{base}/frag").count()
    compact_n = spark.read.parquet(f"{base}/compact").count()
    assert frag_n == compact_n


def test_snapshot_manifests_are_immutable(spark, sf_dir):
    """Time travel contract: after the v2 commit, re-reading v1 through
    its manifest returns the ORIGINAL row set (no file listed by v1 was
    rewritten in place)."""
    import json

    from wireduck_spark.operators.io import _scratch

    QUERIES["io_snapshot_time_travel"].fn(spark, sf_dir).collect()
    base = _scratch(sf_dir, "snapshots")
    with open(f"{base}/_manifest_v1.json") as fh:
        v1 = json.load(fh)
    with open(f"{base}/_manifest_v2.json") as fh:
        v2 = json.load(fh)
    # copy-on-write: v2 dropped g0 and added g2; shared g1 files intact
    assert any("/g0/" in f for f in v1["files"])
    assert not any("/g0/" in f for f in v2["files"])
    assert any("/g2/" in f for f in v2["files"])
    shared = set(v1["files"]) & set(v2["files"])
    assert shared and all("/g1/" in f for f in shared)
    v1_rows = spark.read.parquet(*v1["files"]).count()
    evens = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        "o_orderkey % 2 = 0").count()
    assert v1_rows == evens


def test_aqe_splits_skewed_join(spark, sf_dir):
    """AQE skew-join handling, demonstrated: a join where one key owns
    ~90% of the fact side must be split at runtime (OptimizeSkewedJoin
    marks the SMJ 'skew=true' and inserts AQEShuffleRead) once the skew
    thresholds are lowered to this data scale. This is the mechanism
    that saves a 100 TB join from one straggler task.

    Two non-obvious requirements this test pins (each silently disables
    the optimization when violated):
    - the join children must be bare Sort(ShuffleStage) — a final
      HashAggregate (e.g. from .distinct()) between them breaks the
      rule's pattern match;
    - the skewed partition is subdivided by MAPPER ranges, so the stage
      producing the shuffle needs MULTIPLE map tasks (a one-file scan
      is one mapper, and a one-mapper partition cannot be split) —
      hence the explicit repartition below.
    """
    from pyspark.sql import functions as F

    from wireduck_spark.registry import table

    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = table(spark, sf_dir, "lineitem")
        part = table(spark, sf_dir, "part")
        skewed = li.select(
            F.when(F.col("l_orderkey") % 10 != 0, F.lit(1))
            .otherwise(F.col("l_partkey")).alias("k"),
            "l_extendedprice",
        ).repartition(16)  # multi-mapper shuffle input (see docstring)
        joined = skewed.join(
            part.repartition(8), skewed.k == part.p_partkey)
        joined.collect()  # materialize so AQE finalizes the plan
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
        assert "AQEShuffleRead" in final
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bloom_write_adds_filter_bytes(spark, sf_dir):
    """The bloom-enabled rewrite must physically contain the filter:
    identical data, bloom-on files strictly larger than bloom-off."""
    import os

    from wireduck_spark.operators.io import _scratch

    QUERIES["io_bloom_filter_pointlookup"].fn(spark, sf_dir).collect()
    base = _scratch(sf_dir, "bloom_lookup")
    size = lambda d: sum(  # noqa: E731
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d) if f.endswith(".parquet"))
    on, off = size(f"{base}/on"), size(f"{base}/off")
    assert on > off, (on, off)
    n_on = spark.read.parquet(f"{base}/on").count()
    n_off = spark.read.parquet(f"{base}/off").count()
    assert n_on == n_off


def test_dynamic_partition_pruning_plan(spark, sf_dir):
    """io_dynamic_partition_pruning must inject a dynamicpruning subquery
    into the fact scan's PartitionFilters — the filter comes off the
    broadcast calendar dim at runtime, so a plan without it is a full
    fact scan at 100 TB."""
    plan = plan_of(spark, "io_dynamic_partition_pruning", sf_dir)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf, "expected a partitioned fact scan"
    assert any("dynamicpruning" in ln for ln in pf), pf


def test_partition_overwrite_dynamic_preserves_siblings(spark, sf_dir):
    """The dynamic-mode second write must replace ONLY the
    event_type=click directory: sibling partitions keep their original
    files, clicks get restated values (total row count unchanged).

    "Untouched" is asserted physically, not just logically: sibling
    partitions' exact file inventory (name, size, mtime) is snapshotted
    between the base write and the dynamic overwrite — a mode that
    regenerated siblings with identical rows would fail here."""
    import os

    from pyspark.sql import functions as F

    from wireduck_spark.operators.io import _scratch
    from wireduck_spark.registry import table

    base = _scratch(sf_dir, "events_by_type_sibling_proof")
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    e.write.mode("overwrite").partitionBy("event_type").parquet(base)

    def inventory():
        snap = {}
        for d in os.listdir(base):
            if not d.startswith("event_type=") or d == "event_type=click":
                continue
            p = os.path.join(base, d)
            snap[d] = sorted(
                (f, os.stat(os.path.join(p, f)).st_size,
                 os.stat(os.path.join(p, f)).st_mtime_ns)
                for f in os.listdir(p) if f.endswith(".parquet")
            )
        return snap

    before = inventory()
    assert before, "expected sibling partitions besides click"

    (
        e.filter(F.col("event_type") == "click")
        .withColumn("value", F.col("value") * 2)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(base)
    )

    assert inventory() == before  # byte-identical sibling files
    dirs = sorted(d for d in os.listdir(base)
                  if d.startswith("event_type="))
    assert "event_type=click" in dirs and len(dirs) > 1, dirs
    n_src = table(spark, sf_dir, "events").count()
    n_out = spark.read.parquet(base).count()
    assert n_out == n_src


def test_bloom_prefilter_join_shape(spark, sf_dir):
    """join_semi_bloom_prefilter must (a) broadcast the <=1024-row bloom
    bitmap to the fact side (BroadcastHashJoin), (b) keep the exact
    LEFT SEMI join for correctness, and (c) push the bitmask test into
    the fact side BEFORE the semi join's exchange — the whole point is
    that at 100 TB the discarded rows never reach the shuffle."""
    plan = plan_of(spark, "join_semi_bloom_prefilter", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "LeftSemi" in plan
    # the bitmask filter appears as a post-broadcast-join Filter on the
    # probe side, i.e. before the SortMergeJoin/shuffle of the semi join
    assert "bitmask" in plan and "& mask" in plan.replace("  ", " ")


def test_plan_audit_sees_pre_checkpoint_plans(spark, sf_dir):
    """Round-8 VERDICT #2: queries whose returned DataFrame is an eager
    checkpoint showed ALL-ZERO operator rows in PLANS.md (the audit saw
    a checkpointed-RDD scan, not the iterative plan that ran) — so the
    six most complex queries in the corpus were exactly the ones the
    audit could not see. The auditor now monkeypatches checkpoints into
    counting no-ops; this pins that the pre-checkpoint plan is visible
    (non-zero shuffles/joins) and that the skip count is recorded."""
    import tools.plan_audit as pa

    with pa._CheckpointSkipper() as skipper:
        row = pa.audit_one(
            spark, QUERIES["graph_pagerank_suppliers"], sf_dir, skipper)
    # the 8-hop loop truncates every 2 hops + the final result: 5 skips
    assert row["ckpts_skipped"] >= 3
    # the real plan: per-hop rank-table shuffles + the edge decoration
    assert row["shuffles"] >= 8
    assert row["smj"] + row["bhj"] >= 8
    assert row["cartesian"] == 0 and row["global_windows"] == 0

    with pa._CheckpointSkipper() as skipper:
        row = pa.audit_one(
            spark, QUERIES["dedup_minhash_calibration"], sf_dir, skipper)
    assert row["ckpts_skipped"] >= 1
    assert row["shuffles"] > 0, "pre-checkpoint plan must be visible"

    # and OUTSIDE the skipper, checkpoints still truncate (production
    # behavior unchanged): the returned plan is the checkpoint scan
    df = QUERIES["dedup_minhash_calibration"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan


def test_bnlj_classifier_rejects_multirow_build_embedding_a_scalar(spark):
    """ADVICE r9 (plan_audit false negative): the old classifier scanned
    the WHOLE build subtree for an empty-grouping aggregate, so a
    multi-row build that merely EMBEDS a broadcast scalar (the
    stats_acf_daily_lags day-index shape) passed as "provably 1-row".
    The classifier now requires the scalar aggregate at the TOP of the
    build side (through row-non-increasing wrappers only). Pin both
    directions on constructed plans."""
    from pyspark.sql import functions as F

    import tools.plan_audit as pa

    big = spark.range(100).withColumnRenamed("id", "x")
    scalar = spark.range(50).agg(F.sum("id").alias("tot"))

    # A pure scalar broadcast: one BNLJ, zero multirow.
    clean = big.crossJoin(F.broadcast(scalar))
    jplan = clean._jdf.queryExecution().executedPlan()
    assert pa.count_multirow_bnlj(jplan) == 0

    # The r9 false-negative shape: a 20-row frame that EMBEDS the scalar
    # via its own crossJoin, then broadcast into an outer nested loop.
    idx = spark.range(20).withColumnRenamed("id", "day").crossJoin(
        F.broadcast(scalar))
    dirty = big.crossJoin(F.broadcast(idx))
    jplan = dirty._jdf.queryExecution().executedPlan()
    assert pa.count_multirow_bnlj(jplan) == 1, (
        "multi-row build embedding a scalar must flag as multirow")


def _final_adaptive_plan(spark, name, sf_dir) -> str:
    """Collect the query and return ONLY the final AQE plan string (the
    full executedPlan toString appends the initial plan, whose subtrees
    ReusedExchange has collapsed at runtime — counting scans there
    double-reports)."""
    df = QUERIES[name].fn(spark, sf_dir)
    df.collect()
    final = df._jdf.queryExecution().executedPlan().toString()
    if "+- == Initial Plan ==" in final:
        final = final.split("+- == Initial Plan ==")[0]
    return final


def test_survival_single_events_scan_via_reused_exchange(spark, sf_dir):
    """r14 optimization pin (OPTIMIZATION_r14.md session 3): the
    Kaplan-Meier horizon scalars ride the per-user lifetime aggregate —
    the runtime plan must read the event log ONCE, with the horizon
    branch reusing the user_id exchange. The greatest(last_ts, first_ts)
    reference in the horizon aggregate exists to pin subtree identity
    against column pruning; if a future edit re-forks the subtrees this
    degrades silently to a second full scan, which is exactly what this
    test fails on."""
    final = _final_adaptive_plan(
        spark, "event_survival_kaplan_meier", sf_dir)
    scans = sum(1 for ln in final.splitlines()
                if "FileScan parquet" in ln and "events.parquet" in ln)
    assert scans == 1, f"expected 1 events scan, saw {scans}:\n{final[:2000]}"
    assert "ReusedExchange" in final


def test_psi_single_pass_grouping_sets(spark, sf_dir):
    """r14 optimization pin: dq_distribution_drift_psi computes both
    per-dim count tables in ONE grouping-sets pass (one scan, one md5
    evaluation per event, Expand) and derives the per-dim totals as
    window sums — no second consumer, no join. Before the rewrite the
    runtime plan held 2 full scan+md5 passes and a broadcast join."""
    final = _final_adaptive_plan(spark, "dq_distribution_drift_psi", sf_dir)
    scans = sum(1 for ln in final.splitlines()
                if "FileScan parquet" in ln and "events.parquet" in ln)
    assert scans == 1, f"expected 1 events scan, saw {scans}:\n{final[:2000]}"
    assert "Expand" in final
    assert "Join" not in final


def test_centroid_spread_single_explode(spark, sf_dir):
    """r14 optimization pin: embed_centroid_spread's per-vector distance
    is an in-row zip_with fold against the broadcast centroid arrays —
    only the centroid branch explodes (1 Generate), and no per-vector
    aggregation exchange exists (the only HashAggregates above the fold
    are label-keyed). Before the rewrite the corpus posexploded TWICE
    and re-aggregated by vec_id."""
    plan = plan_of(spark, "embed_centroid_spread", sf_dir)
    generates = sum(1 for ln in plan.splitlines()
                    if ln.strip().startswith("(") and ") Generate" in ln)
    assert generates == 1, plan[:2000]
    assert "zip_with" in plan
    assert "hashpartitioning(vec_id" not in plan


def _big_scans(final: str, table_file: str) -> int:
    return sum(1 for ln in final.splitlines()
               if "FileScan parquet" in ln and table_file in ln)


@pytest.mark.parametrize("name,table_file", [
    ("dq_freshness_sla", "events.parquet"),
    ("stats_capture_recapture", "events.parquet"),
    ("stats_two_proportion_ztest", "events.parquet"),
    ("stats_power_sample_size", "events.parquet"),
    ("stats_cramers_v", "documents.parquet"),
    ("tpch_q15", "lineitem.parquet"),
    ("tpch_q17", "lineitem.parquet"),
    ("anomaly_mad_robust", "events.parquet"),
    ("forecast_backtest_seasonal_naive", "events.parquet"),
    ("event_peak_concurrency", "events.parquet"),
    ("event_dau_stickiness", "events.parquet"),
    ("dedup_ngram_jaccard", "documents.parquet"),
])
def test_r15_single_big_table_scan(spark, sf_dir, name, table_file):
    """r15 optimization pins (OPTIMIZATION_r15.md, the second-consumer-
    anchor burn-down): each of these queries previously re-read its big
    table 2-4x per run because a second consumer (a 1-row anchor, a
    margin join, a shifted self-join, or a union of differently-pruned
    projections) forked the shared subtree. The rewrites carry the
    anchor on the keyed aggregate / unpivot in-row / window the margins,
    and the FINAL adaptive plan must now read the big table ONCE. A
    regression here degrades silently to extra full scans — exactly
    what this pin fails on."""
    final = _final_adaptive_plan(spark, name, sf_dir)
    scans = _big_scans(final, table_file)
    assert scans == 1, (
        f"{name}: expected 1 {table_file} scan, saw {scans}:\n{final[:2000]}")


def test_r15_expectations_audit_single_scan_each(spark, sf_dir):
    """r15 pin: dq_expectations_audit unpivots each table's 1-row
    conditional aggregate with one in-row inline (every violation column
    referenced, so no union branch prunes the aggregate differently):
    lineitem and orders each scan ONCE."""
    final = _final_adaptive_plan(spark, "dq_expectations_audit", sf_dir)
    assert _big_scans(final, "lineitem.parquet") == 1, final[:2000]
    assert _big_scans(final, "orders.parquet") == 1, final[:2000]


def test_r15_gini_two_scan_floor(spark, sf_dir):
    """r15 pin: feature_gini_split_gain reads orders exactly TWICE (the
    global percentile label anchor is a separate pass by necessity —
    labels cannot exist before the median does) and customer once; the
    3-way feature stack is one in-row inline and the parent moments fold
    from the per-value aggregate."""
    final = _final_adaptive_plan(spark, "feature_gini_split_gain", sf_dir)
    assert _big_scans(final, "orders.parquet") == 2, final[:2000]
    assert _big_scans(final, "customer.parquet") == 1, final[:2000]


def test_r15_roc_auc_single_scan_under_checkpoint_skip(spark, sf_dir):
    """r15 pin for the rank-helper family: with the helper's
    localCheckpoint no-op'd (the scan_probe view — the checkpointed
    final plan hides the lineage), stats_roc_auc's full lineage reads
    events ONCE: the median anchor's CASE-pinned percentile keeps the
    per-user subtree byte-identical to the label branch, so the user_id
    exchange is reused instead of re-scanning the corpus."""
    import tools.plan_audit as pa

    with pa._CheckpointSkipper():
        final = _final_adaptive_plan(spark, "stats_roc_auc", sf_dir)
    scans = _big_scans(final, "events.parquet")
    assert scans == 1, f"expected 1 events scan, saw {scans}:\n{final[:2000]}"
