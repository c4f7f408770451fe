"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32); the
settings below are the ones that matter at cluster scale too:

- AQE on (runtime re-plan: partition coalescing, skew-join splitting,
  broadcast-join conversion from runtime stats),
- shuffle partitions sized to the core count locally (on a real cluster
  this would be ~2-3x total cores; AQE coalesces down),
- Arrow enabled for every Python<->JVM batch boundary (Pandas UDFs,
  toPandas, Python Data Source),
- UTC session timezone so timestamp semantics are engine-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "wireduck-spark", cpus: int | str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle = str(shuffle_partitions or max(int(cpus), 8))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Let AQE re-plan the output partitioning of cached/persisted plans
        # (off by default). Every iterative query here persists a
        # pre-partitioned edge/signature table and then joins the small
        # per-iteration state against it; with this off, the cached side is
        # frozen at the static `spark.sql.shuffle.partitions` count, so at
        # any scale the per-iteration join inherits a partition count chosen
        # blind to the data (32 tiny cached partitions at sf0.1 — measured
        # graph_pagerank_suppliers 4.5 s -> 3.5 s warm with AQE allowed to
        # coalesce them; at cluster scale the same flag right-sizes the
        # cached layout to advisoryPartitionSizeInBytes instead of a static
        # constant — guide §2.2's "fewer, larger partitions" applied to the
        # persisted seam). Results are partitioning-invariant.
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate synthesizes `size(arr)>0 AND isnotnull(arr)`
        # from every explode() and PushDownPredicates then sinks that filter
        # below Repartition/Project — re-evaluating the entire generator
        # expression (tokenizer + shingle lambdas) a second time, on the
        # *pre-repartition* single-split scan. Measured 3x on the 8-gram
        # contamination pipeline at sf0.1 (6.2 s -> 2.3 s warm). Our corpus
        # generators are never-empty arrays, so the inferred filter can only
        # cost, not prune; results are identical with the rule off.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
