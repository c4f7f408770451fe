"""Degenerate-lineitem/orders robustness pins: the TPC-H + join-graph
battery over a corpus with NULL dates/quantities/prices/flags, negative
and zero quantities/prices, exact-half-cent values, 1e10 magnitudes,
DUPLICATE primary keys (two lineitem rows sharing (orderkey,
linenumber); two orders sharing o_orderkey, fanning out through every
join), an order with no lineitems, orphaned lineitems with no order,
and month-end boundary dates including a leap day
(tools/make_degenerate_lineitem.py — the fourth table swept by the
adversarial-corpus device after documents/embeddings/events).

r14 probe result: the FULL 98-query lineitem/orders oracle battery
passed this corpus 98/98 with ZERO divergence on the first run — the
integer-cents rule (registry rule 1), the NULL-skipping aggregate
twins, and the unique-key tiebreak ordering (rule 5) established in
earlier rounds already cover this input class. This suite pins that
property against regression with the most join/agg/date-sensitive
subset: all 21 oracle-bearing TPC-H queries (q1-q22; q-less numbering
per the registry) plus the 12 queries whose oracles join lineitem AND
orders (graph projections, referential audits, star joins, bloom
semi-join, recursive CTE).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()

BATTERY = sorted(
    [n for n in QUERIES
     if n.startswith("tpch_") and QUERIES[n].oracle is not None]
) + [
    "cte_recursive_bfs", "dq_expectations_audit",
    "dq_referential_orphans", "graph_assortativity",
    "graph_degree_stats", "graph_jaccard_coshopper",
    "graph_label_spread_nation", "graph_pagerank_bipartite",
    "graph_triangle_count", "join_range_interval",
    "join_semi_bloom_prefilter", "join_star_q9_profit",
]

# Zero rows at sf0.001 is a pre-existing fixture-selectivity property of
# these three (non-zero at the driver's sf0.01 — the zero-row audit runs
# there), NOT a degenerate-corpus effect; hash-equality still asserts.
SPARSE_AT_SF0001 = {"tpch_q7", "tpch_q20", "tpch_q21"}


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from make_degenerate_lineitem import build

    d = str(tmp_path_factory.mktemp("degenerate_lineitem") / "sf")
    return build(d)


def _canon(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", BATTERY)
def test_lineitem_battery_on_degenerate_corpus(spark, adv_dir, name):
    spec = QUERIES[name]
    got = _canon(tuple(r) for r in spec.fn(spark, adv_dir).collect())
    con = duckdb.connect()
    try:
        for t in ("events", "orders", "lineitem", "customer", "nation",
                  "region", "supplier", "part", "documents",
                  "embeddings"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{adv_dir}/{t}.parquet')")
        want = _canon(tuple(r)
                      for r in con.execute(spec.oracle).fetchall())
    finally:
        con.close()
    assert got == want, f"{name} diverges on the degenerate corpus"
    if name not in SPARSE_AT_SF0001:
        assert got, f"{name} lost its healthy rows on the corpus"
