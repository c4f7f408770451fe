"""All-registry correctness: every registered query (gate + rotated-out)
hash-matches its DuckDB oracle at sf0.001 on every test run.

This is the safety net behind the curated driver gate: ROTATED_OUT queries
gave up their driver slot (wireduck_spark/registry.py), so this test is now
their contracted verification. Stricter than the driver's hash — values must
match exactly after canonicalization (tools/check_oracle.py:compare).
"""

import duckdb
import pytest

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
