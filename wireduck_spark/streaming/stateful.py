"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2: "stateful agg" / the reference-roadmap flow-reassembly
case, re-expressed Spark-native).

`running_user_totals` keeps one state row per user (event count, value
cents, last-seen timestamp) across micro-batches — the skeleton of packet
flow reassembly (state key = flow 4-tuple instead of user_id) and of any
large-scale streaming feature extractor. State is bounded by the
processing-time timeout: idle keys are evicted and emitted with
`expired=true`.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType, LongType, StructField, StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_cents", LongType()),
        StructField("expired", BooleanType()),
    ]
)


def make_update_fn(idle_timeout_ms: int | None):
    """Build the per-group update function, optionally arming an idle
    processing-time timeout that evicts + emits `expired=true`."""

    def update_user_totals(
        key: tuple,
        batches: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            n, cents = state.get if state.exists else (0, 0)
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "n_events": [n], "sum_cents": [cents],
                 "expired": [True]}
            )
            return
        n, cents = state.get if state.exists else (0, 0)
        for pdf in batches:
            n += len(pdf)
            cents += int(round(pdf["value"].sum() * 100))
        state.update((n, cents))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_cents": [cents],
             "expired": [False]}
        )

    return update_user_totals


def running_user_totals(
    events: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """events (streaming) -> one running-total row per user per batch.

    idle_timeout_ms arms per-key processing-time eviction — pass it ONLY
    under a continuous trigger (processingTime): with availableNow, Spark
    stops scheduling micro-batches once the source drains, so registered
    timeouts can never fire and the query NEVER terminates (diagnosed
    round 2: availableNow + ProcessingTimeTimeout = live-lock; NoTimeout
    completes in seconds). State stays bounded either way for finite
    inputs; long-running deployments should set a timeout and use a
    processing-time trigger.
    """
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_update_fn(idle_timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout,
        )
    )
