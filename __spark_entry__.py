"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real definitions live in the ``wireduck_spark`` package
(registry pattern: every operator from SURVEY.md §2 registers a
(Spark builder, DuckDB oracle) pair — see wireduck_spark/registry.py
for the cross-engine determinism rules).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wireduck_spark.registry import (  # noqa: E402
    QUERIES,
    gate_queries,
    load_all_queries,
)

load_all_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The Spark analogue of the reference's flagship aggregate
    (/root/reference/README.md:160-167): scan -> filter -> groupBy ->
    count/sum, on the lineitem table.
    """
    return QUERIES["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Curated <=50-slot driver gate (the driver evaluates at most the
    alphabetically-first 50 entries, so the slots are a budget — see
    wireduck_spark/registry.py GATE/ROTATED_OUT). The FULL registry
    (len(QUERIES) queries) remains verified by tools/check_oracle.py and
    tests/test_all_queries_green.py every run."""
    return {name: spec.fn for name, spec in gate_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each oracle-checkable gate query (entries without an
    oracle get the driver's weaker rows-only check — pcap per SURVEY.md §2)."""
    return {
        name: spec.oracle
        for name, spec in gate_queries().items()
        if spec.oracle is not None
    }
