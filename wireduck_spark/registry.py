"""Central query registry.

Every operator from SURVEY.md §2 (Tier B relational surface + the
training-data extras) registers here as a named pair:

- a Spark builder ``fn(spark, sf_dir) -> DataFrame`` (declarative
  DataFrame/SQL — Catalyst picks the physical plan), and
- an optional DuckDB oracle SQL string the driver runs side-by-side
  (tables region/nation/customer/supplier/part/orders/lineitem/events/
  documents/embeddings are pre-registered views).

Cross-engine determinism rules (used throughout the corpus so that the
driver's order-insensitive value-hash matches bit-for-bit):

1. Money/double SUMs go through integer cents: ``ROUND(x*100) -> BIGINT``
   summed exactly; both engines agree regardless of addition order.
2. Derived doubles (avg, ratios, cosine) are computed with the *same IEEE
   expression tree* in both engines (same casts, same operator order) and
   rounded (4-6 dp) on output as a belt-and-braces guard.
3. Timestamps are emitted as formatted strings
   (``date_format`` / ``strftime``) to remove timezone/precision ambiguity.
4. DuckDB ``SUM(BIGINT)`` returns HUGEINT -> always ``CAST(... AS BIGINT)``
   in oracles; computed integers are BIGINT on both sides.
5. Window/rank queries always order by a unique tiebreak column.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Module paths that register queries on import.
_QUERY_MODULES = (
    "wireduck_spark.operators.relational",
    "wireduck_spark.operators.advanced",
    "wireduck_spark.operators.tpch",
    "wireduck_spark.operators.sketches",
    "wireduck_spark.operators.scalars",
    "wireduck_spark.operators.timeseries",
    "wireduck_spark.operators.io",
    "wireduck_spark.functions.text",
    "wireduck_spark.functions.dedup",
    "wireduck_spark.functions.similarity",
    "wireduck_spark.functions.multimodal",
    "wireduck_spark.functions.grouped",
    "wireduck_spark.sources.pcap_queries",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py's headline set


QUERIES: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
          bench: bool = False):
    """Decorator registering a Spark query builder with its DuckDB oracle."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = QuerySpec(name=name, fn=fn, oracle=oracle,
                                  tags=tuple(tags), bench=bench)
        return fn

    return deco


def load_all_queries() -> dict[str, QuerySpec]:
    """Import every query module (idempotent) and return the registry."""
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    return QUERIES


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver-provided parquet table.

    Pins the session timezone to UTC so timestamp rendering matches the
    DuckDB oracle (naive timestamps interpreted as UTC).

    events.parquet stores TIMESTAMP(NANOS), which Spark refuses by default
    (PARQUET_TYPE_ILLEGAL): read it via the nanosAsLong legacy conf and
    rebuild a microsecond TimestampType column (integer `div` — no double
    round-trip, nanos exceed double's 53-bit mantissa).
    """
    from pyspark.sql import functions as F

    # conf.set is a driver RPC; do it once per session, not twice per table()
    # (the gate calls table() ~2x per query across ~60 queries).
    if not getattr(spark, "_wireduck_confs_set", False):
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark._wireduck_confs_set = True
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def cents(col):
    """Exact integer cents from a 2-decimal double column (rule 1)."""
    from pyspark.sql import functions as F
    return F.round(col * 100, 0).cast("bigint")


def ts_str(col):
    """Timestamp -> 'YYYY-MM-DD HH:MM:SS' string (rule 3)."""
    from pyspark.sql import functions as F
    return F.date_format(col, "yyyy-MM-dd HH:mm:ss")


# DuckDB-side twins of the helpers above, for use in oracle strings.
SQL_CENTS = "CAST(ROUND({x} * 100, 0) AS BIGINT)"
SQL_TS = "strftime({x}, '%Y-%m-%d %H:%M:%S')"
