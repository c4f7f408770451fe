"""Structured Streaming twins of the batch time-series operators
(SURVEY.md §2 "Streaming" row — absent in the reference, which is
file-only; this is the Spark-native extension the reference's roadmap
gestures at).

The same F.window / F.session_window expressions used by the
oracle-checked batch queries (operators/timeseries.py) run here under
readStream with a watermark — the batch results ARE the streaming
results' ground truth, which is how tests/test_streaming.py checks them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wireduck_spark.registry import cents

def read_events_stream(spark: SparkSession, directory: str) -> DataFrame:
    """File-based event stream: each parquet file dropped into `directory`
    becomes (at most) one micro-batch. At scale this is the standard
    landing-zone pattern (object-store prefix + file notification); the
    query code is identical for Kafka — only this reader changes.

    `ts` handling mirrors registry.table(): a batch peek at the directory
    decides whether the files store TIMESTAMP (read as-is) or legacy
    TIMESTAMP(NANOS) int64 (read as BIGINT via nanosAsLong, rebuilt to
    microsecond timestamps). readStream needs an explicit schema, so the
    peek also supplies it — one driver-side footer read, no data scan.

    An EMPTY landing directory (the normal start state for this pattern)
    has no parquet footers to peek at; fall back to the known events
    schema with bigint nanos `ts` — the driver-generated layout — so the
    stream starts and waits for files instead of raising
    'Unable to infer schema' (round-3 ADVICE)."""
    from pyspark.errors import AnalysisException
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        batch_schema = spark.read.parquet(directory).schema
    except AnalysisException:
        # no footers yet: the driver's events layout — ts is
        # TIMESTAMP(NANOS) on disk, which the nanosAsLong conf surfaces
        # as bigint (the branch below rebuilds microsecond timestamps).
        batch_schema = T.StructType([
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ])
    stream = (
        spark.readStream.schema(batch_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(directory)
    )
    ts_type = dict(
        (f.name, f.dataType.simpleString()) for f in batch_schema).get("ts")
    if ts_type == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # Watermarks require TIMESTAMP (ltz); session tz is pinned UTC, so
        # the cast is instant-preserving.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked tumbling 1h windows per event_type (streaming twin of
    the oracle-checked `tw_tumbling`). The watermark bounds state: windows
    older than max(event time) - watermark are finalized and evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


def session_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Watermarked session windows (10-minute gap) per user — streaming
    twin of `tw_session`. Spark merges overlapping partial sessions across
    micro-batches in the state store."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


def run_to_completion(stream_df: DataFrame, table_name: str) -> DataFrame:
    """Drain all available input into an in-memory sink and return the
    result table (test/debug harness; production uses a real sink +
    trigger)."""
    spark = stream_df.sparkSession
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(f"SELECT * FROM {table_name}")


def burn_rate_alerts(events: DataFrame, budget_ppm: int = 50000,
                     watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of the batch event_error_budget_burn query: hourly
    error fractions in integer ppm against the SLO budget, emitting only
    windows burning >2x budget, with the >10x page flag. The ppm
    arithmetic is the same integer `div`, so a finalized streaming
    window carries exactly the batch row — pinned by
    tests/test_streaming.py::test_burn_rate_stream_matches_batch.

    Scale: a watermarked tumbling aggregate (bounded state: open
    windows only); the alert filter runs post-aggregation, so state
    size is unaffected by the alert rate.
    """
    hourly = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint").alias("n_errors"),
        )
    )
    ppm = F.expr("1000000 * n_errors div n_total").cast("bigint")
    return (
        hourly.select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
            .alias("window_start"),
            "n_total",
            "n_errors",
            ppm.alias("error_ppm"),
            (ppm > 10 * budget_ppm).alias("burn_10x"),
        )
        .filter(F.col("error_ppm") > 2 * budget_ppm)
    )


def ohlc_bars(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of the batch window_candlestick_ohlc query: hourly
    open/high/low/close candlesticks of purchase value in exact integer
    cents, computed incrementally under a watermark.

    The batch query finds open/close as rank-1 rows of two (ts, event_id)
    windows; a streaming aggregate can't rank, but min_by/max_by over the
    unique (ts, event_id) struct key is the same selection expressed as a
    declarative aggregate — it merges associatively across micro-batches,
    so a finalized streaming bar carries exactly the batch row (pinned by
    tests/test_streaming.py::test_ohlc_stream_matches_batch).

    Scale: one watermarked tumbling aggregate — state is open bars only
    (5 ints + the two extreme keys per bar), merge is O(1) per event, and
    the filter on event_type prunes before any state is touched.
    """
    pts = events.filter(F.col("event_type") == "purchase").select(
        "ts", "event_id", cents(F.col("value")).alias("cents"))
    key = F.struct("ts", "event_id")
    return (
        pts.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_trades"),
            F.min_by("cents", key).cast("bigint").alias("open_cents"),
            F.max("cents").cast("bigint").alias("high_cents"),
            F.min("cents").cast("bigint").alias("low_cents"),
            F.max_by("cents", key).cast("bigint").alias("close_cents"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss")
            .alias("bar_start"),
            "n_trades", "open_cents", "high_cents", "low_cents",
            "close_cents",
        )
    )
