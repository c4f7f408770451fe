"""Driver-contract smoke: entry(), queries()/oracle_sql() registry shape."""

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "count_order" in df.columns


def test_registry_shape():
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) >= 50
    assert set(oracles) <= set(qs)
    # the rows-only set is the documented one (approx/sampling/pcap)
    rows_only = set(qs) - set(oracles)
    assert all(
        n.startswith("pcap_") or n in {"agg_approx_distinct", "sampling_bernoulli"}
        for n in rows_only
    )


def test_each_query_runs_at_sf0001(spark, sf_dir):
    """Every registered query executes (collect is the checker's job; here
    we only verify the plans resolve and run at tiny scale)."""
    for name, fn in contract.queries().items():
        df = fn(spark, sf_dir)
        df.limit(5).collect()
