"""Engine-config invariance pins (SURVEY §13 item 1a, pulled forward
into r14): results must be BIT-IDENTICAL with AQE disabled, degenerate
(1) and oversized-prime (97) shuffle partition counts, and whole-stage
codegen off.

Why this matters at 100 TB: AQE re-plans joins and coalesces partitions
at runtime, and a production cluster never runs the fixture's partition
count — so any result that depends on partitioning, partial-aggregation
order, or codegen evaluation order is a silent wrong answer waiting for
a config change. The repo's determinism conventions (integer-cents
sums, shared IEEE trees, unique window tiebreaks, hash-based sampling)
exist precisely to make the answer a pure function of the DATA; this
suite is the direct check of that claim.

r14 probe result: a 20-query representative battery (one or two per
family) was invariant across all six configurations on first contact —
pinned here with the most partition-sensitive subset:
window_percent_cume's two-pass global rank literally recomputes its
range partitioning under each config; pagerank iterates through 20
keyed shuffles; the stats folds combine partials in whatever order the
partition count dictates; sampling must be hash-seeded, not
partition-seeded (Spark's F.rand IS partition-dependent — these
queries avoid it by construction).
"""

from __future__ import annotations

import pytest

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()

BATTERY = [
    "agg_pricing_summary",        # float-derived aggregates
    "window_percent_cume",        # two-pass global rank over ranges
    "window_running_distinct",    # two stacked keyed windows
    "sampling_bernoulli",         # hash-seeded sampling
    "dedup_minhash_lsh",          # banding + pair join
    "sim_topk_bruteforce",        # cosine + global top-k
    "stats_cusum_drift",          # sequential fold from partials
    "graph_pagerank_bipartite",   # 20-iteration keyed shuffle loop
    "tw_session",                 # session windows
    "tpch_q18",                   # large multi-join + having
    "stats_ols_two_feature",      # double moments + Cramer solve
    "text_fingerprint",           # polynomial rolling hash
]

CONFIGS = [
    ("aqe_off", {"spark.sql.adaptive.enabled": "false"}),
    ("shuffle_1", {"spark.sql.shuffle.partitions": "1"}),
    ("shuffle_97", {"spark.sql.shuffle.partitions": "97"}),
    ("codegen_off", {"spark.sql.codegen.wholeStage": "false"}),
]


def _canon(df):
    rows = [tuple(round(v, 10) if isinstance(v, float) else v
                  for v in r) for r in df.collect()]
    return sorted(rows, key=repr)


@pytest.mark.parametrize("name", BATTERY)
def test_result_is_config_invariant(spark, sf_dir, name):
    spec = QUERIES[name]
    base = _canon(spec.fn(spark, sf_dir))
    assert base, f"{name}: empty baseline result"
    for label, cfg in CONFIGS:
        saved = {k: spark.conf.get(k, None) for k in cfg}
        for k, v in cfg.items():
            spark.conf.set(k, v)
        try:
            got = _canon(spec.fn(spark, sf_dir))
        finally:
            for k, old in saved.items():
                if old is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, old)
        assert got == base, (
            f"{name} diverges under {label}: the result depends on the "
            "physical config, not just the data")
