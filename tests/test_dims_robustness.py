"""Degenerate-dimension robustness pins: the customer/supplier/part
battery over a corpus with NULL names/balances/segments/types/foreign
keys, negative balances, zero and half-cent prices, DUPLICATE primary
keys on all three dimensions, and orphaned nationkeys
(tools/make_degenerate_dims.py — the last fixture tables swept by the
adversarial-corpus device).

r14 probe result: 52/54 of the oracle-bearing customer/supplier/part
queries passed on first contact; the two finds, both repaired and
pinned here:

- scalar_string_funcs: DuckDB's `concat()` SKIPS NULL arguments while
  Spark's `F.concat` propagates them — a NULL c_mktsegment produced ''
  on the oracle and NULL on Spark. The oracle now pads with `||`
  (NULL-propagating in both engines).
- window_percent_cume: the engines place a NULL ORDER BY key at
  OPPOSITE ends (Spark NULLS FIRST, DuckDB NULLS LAST), so ONE NULL
  balance shifted EVERY customer's percent_rank/cume_dist/decile.
  NULL balances are now excluded on both engines (a percentile needs
  a value — the window-order mirror of the events NULL-ts rule 10).

The battery below re-runs the dimension-reading queries most exposed
to the degenerate classes: every scalar/window/subquery/setop/agg
query over customer, the supplier/part joins, and the TPC-H queries
that join all three dims.
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

BATTERY = [
    # the two repaired finds
    "scalar_string_funcs", "window_percent_cume",
    # customer scalars / windows / aggregates
    "agg_mode_deterministic", "agg_arg_extrema",
    "window_topk_per_group", "window_ranking",
    "subquery_exists_in", "subquery_lateral", "cte_reuse",
    "setop_union_all", "setop_intersect_except",
    "scd2_point_in_time_lookup", "merge_upsert_scd",
    "join_null_safe", "pivot_segments", "scalar_cast_try",
    # supplier / part joins
    "join_inner", "join_left_outer", "join_right_outer",
    "join_full_outer", "join_semi", "join_anti",
    "join_theta_nonequi", "join_star_q9_profit",
    "tpch_q2", "tpch_q8", "tpch_q10", "tpch_q11", "tpch_q14",
    "tpch_q16", "tpch_q20",
]

# Zero rows at sf0.001 is a pre-existing selectivity property of these
# (re-confirmed on the pristine fixture, non-zero at the driver's
# sf0.01); hash-equality still asserts.
SPARSE_AT_SF0001 = {"cte_reuse", "tpch_q20"}


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    from make_degenerate_dims import build

    d = str(tmp_path_factory.mktemp("degenerate_dims") / "sf")
    return build(d)


def _canon(rows):
    out = []
    for r in rows:
        out.append(tuple(
            round(v, 6) if isinstance(v, float) else v for v in r))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", BATTERY)
def test_dims_battery_on_degenerate_corpus(spark, adv_dir, name):
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
