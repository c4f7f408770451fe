"""Bucketed co-located joins: the pre-shuffle lever for repeated joins.

At 100 TB, a fact table joined on the same key by every nightly job
should be written bucketed once (`bucketBy(orderkey)`); every subsequent
join then reads co-located buckets and skips its shuffle entirely. This
test proves the engine plans exactly that: same join, bucketed inputs,
zero Exchange operators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

from wireduck_spark.registry import table


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    spark.conf.set(
        "spark.sql.sources.bucketing.enabled", "true"
    )
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_bkt")
    )
    (
        li.write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_bkt")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_bkt")
    spark.sql("DROP TABLE IF EXISTS lineitem_bkt")


def test_bucketed_join_has_no_exchange(spark, warehouse):
    """Join on the bucket key: both sides read co-located buckets, the
    plan contains NO shuffle (Exchange) — the join that costs a full
    repartition of both tables on unbucketed inputs costs zero here."""
    # disable AQE broadcast conversion so the test asserts the bucketed
    # sort-merge path (broadcast would also avoid the shuffle, but only
    # because sf0.01 is tiny — bucketing is what survives at 100 TB)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
    )
    try:
        o = spark.table("orders_bkt")
        li = spark.table("lineitem_bkt")
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_section, join_section
        # and the result is still right (vs the unbucketed join)
        got = {r["o_orderstatus"]: r["n"] for r in j.collect()}
        base = (
            spark.table("lineitem_bkt")
            .join(
                spark.table("orders_bkt").hint("shuffle_hash"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderstatus")
            .count()
        )
        want = {r["o_orderstatus"]: r["count"] for r in base.collect()}
        assert got == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
