"""Lineage truncation shared by iterative and cache-hygiene queries.

Queries that truncate lineage (iterative graph loops, the
persist -> materialize -> unpersist cache-hygiene pattern) route
through :func:`checkpoint` so callers can choose durability:

- ``checkpoint_dir=None`` -> ``df.localCheckpoint(eager)``: fast, but
  blocks live on executors — a lost executor kills the query. Right
  for single-node gate/bench runs.
- ``checkpoint_dir=path`` -> reliable ``df.checkpoint(eager)`` into
  fault-tolerant storage (HDFS/S3 on a real cluster). An 8-hop
  iterative query over 100 TB must use this path (round-8 VERDICT #3).

Plan-audit note (round-8 VERDICT #2): an eager checkpoint REPLACES the
returned DataFrame's plan with a checkpointed-RDD scan, which blinded
tools/plan_audit.py for exactly the most complex queries (pagerank,
label spreading, cluster components, ...). The auditor therefore
monkeypatches ``DataFrame.localCheckpoint`` / ``DataFrame.checkpoint``
into counting no-ops for the duration of its sweep — covering this
helper and every inline call site — and tags affected rows
"audited pre-checkpoint". Production code never does that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint(df: DataFrame, checkpoint_dir: str | None = None,
               eager: bool = True) -> DataFrame:
    """Truncate `df`'s lineage (see module docstring)."""
    if checkpoint_dir is not None:
        df.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
