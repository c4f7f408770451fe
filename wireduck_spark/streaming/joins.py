"""Structured Streaming joins + deduplication (SURVEY.md §2 streaming row;
absent in the file-only reference — this is the Spark-native surface a
continuous capture pipeline needs).

Three staples, each bounded-state by watermark so they run indefinitely:

- `dedup_stream`: drop replayed events (at-least-once sources) within the
  watermark horizon — state is one key per event inside the horizon.
- `enrich_stream`: stream-static join against a dimension DataFrame — the
  static side broadcasts per micro-batch, no stream state at all.
- `purchase_attribution`: stream-stream interval join (purchase within 1h
  after a click by the same user) — both sides watermarked, and the time
  bound lets Spark evict matched/expired rows from the join state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wireduck_spark.registry import cents


def dedup_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exactly-once projection of an at-least-once stream: duplicates of
    `event_id` arriving within the watermark horizon are dropped.

    Scale: state is a hash per event_id inside the horizon, partitioned by
    key across executors; the watermark evicts — without it streaming
    dedup state grows forever (dropDuplicates vs WithinWatermark).
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: attach dimension attributes to each
    event. The static side is re-planned each micro-batch (picks up
    dimension updates) and broadcast when small — zero streaming state.
    """
    dim_small = F.broadcast(
        dim.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )
    return events.join(dim_small, "user_id", "left").select(
        "event_id", "user_id", "event_type", "ts", "value", "segment",
        "nationkey",
    )


def purchase_attribution(
    clicks: DataFrame,
    purchases: DataFrame,
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream interval join: each purchase attributed to the same
    user's click(s) in the preceding `horizon`.

    Scale: both sides watermark `ts`; the join condition carries an
    equi-key (user_id — the shuffle key) plus the time interval, which
    bounds how long an unmatched click is retained in join state
    (watermark + horizon), so state size is O(rate x horizon), not O(history).
    """
    c = (
        clicks.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return c.join(
        p,
        F.expr(
            f"""
            c_user = p_user AND
            purchase_ts > click_ts AND
            purchase_ts <= click_ts + INTERVAL {horizon}
            """
        ),
    ).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "purchase_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        cents(F.col("purchase_value")).alias("purchase_cents"),
    )
