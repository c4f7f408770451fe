"""df.observe(): pipeline QC metrics collected DURING the main action —
the production pattern for row-count / null-rate / checksum monitoring
without a second scan of the input (at 100 TB, a separate metrics query
doubles the IO bill; observe() rides the job that already ran).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Observation
from pyspark.sql import functions as F

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

from wireduck_spark.registry import cents, table


def test_observe_metrics_match_direct_aggregate(spark, sf_dir):
    """Metrics observed mid-pipeline (before the filter) must equal a
    direct aggregate over the same input, and the observed row count
    must exceed the filtered output's — proving the observation point
    sees pre-filter traffic the result DataFrame no longer carries."""
    li = table(spark, sf_dir, "lineitem")
    obs = Observation("qc")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_in"),
        F.sum(cents(F.col("l_extendedprice"))).alias("price_cents_in"),
        F.sum(F.when(F.col("l_returnflag").isNull(), 1).otherwise(0))
        .alias("null_flags"),
    )
    out = (
        observed.filter(F.col("l_quantity") > 25)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )
    result = out.collect()  # triggers the job; metrics materialize with it
    direct = li.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(cents(F.col("l_extendedprice"))).alias("price_cents_in"),
    ).collect()[0]
    m = obs.get
    assert m["n_in"] == direct["n_in"]
    assert m["price_cents_in"] == direct["price_cents_in"]
    assert m["null_flags"] == 0
    assert sum(r["n"] for r in result) < m["n_in"]
