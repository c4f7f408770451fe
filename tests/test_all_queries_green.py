"""All-registry correctness: every registered query (gate + rotated-out)
hash-matches its DuckDB oracle at sf0.001 on every test run.

This is the safety net behind the curated driver gate: ROTATED_OUT queries
gave up their driver slot (wireduck_spark/registry.py), so this test is now
their contracted verification. Stricter than the driver's hash — values must
match exactly after canonicalization (tools/check_oracle.py:compare).
"""

import duckdb
import pytest

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

from tools.check_oracle import compare
from wireduck_spark.registry import QUERIES, TABLES, load_all_queries

load_all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    spec = QUERIES[name]
    df = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        # rows-only by design (pcap: no DuckDB oracle possible; golden
        # values for these live in test_native.py / test_pcap_source.py)
        assert df.count() >= 0
        return
    rel = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()
    problems = compare(name, df, duck_rows, duck_cols, verbose=True)
    assert not problems, "\n".join(problems)


# Queries whose oracle legitimately returns ZERO rows on the tiny
# sf0.001 fixture (too small for their spec-faithful selectivity: Q7's
# two-nation shipping lanes, Q20/Q21's multi-way existence chains, the
# decontamination overlap, the theta band, the CTE's double-window
# cut). At sf0.001 test_query_matches_oracle certifies only that both
# engines agree on empty — so pin here that each is NON-degenerate at
# the driver's gate scale (sf0.01), where the real correctness evidence
# lives. If a rewrite ever empties one of these at sf0.01 too, this
# fails before the driver sees it (the tpch_q11 lesson, r11: a fixed
# threshold emptied at sf0.1 while every sf0.01 check stayed green).
SMALL_SCALE_EMPTY = (
    "cte_reuse",
    "dedup_minhash_decontaminate",
    "join_theta_nonequi",
    "tpch_q20",
    "tpch_q21",
    "tpch_q7",
)


@pytest.mark.parametrize("name", SMALL_SCALE_EMPTY)
def test_small_scale_empty_queries_nonempty_at_gate_scale(name, spark):
    assert QUERIES[name].fn(spark, "/root/testdata/sf0.01").count() > 0, (
        f"{name} is empty at the gate scale too — its green rows are "
        "degenerate everywhere; rewrite it (see tpch_q11, round 11)")
