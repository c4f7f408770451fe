"""Time-series operators over the `events` table (the batch analogues of the
streaming surface in SURVEY.md §2: tumbling/sliding/session windows, as-of
join). `events.ts` plays the role of `frame.time_epoch` from the packet
domain (FIXTURES.md §D).

These are the batch twins of the Structured Streaming versions in
wireduck_spark.streaming — the same F.window / F.session_window expressions
run under readStream with a watermark.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wireduck_spark.registry import (
    cents, cents_clamped, query, table, time_surface, ts_str,
)


@query(
    "tw_tumbling",
    oracle="""
    SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY time_bucket(INTERVAL '1 hour', ts), event_type
    """,
    tags=("timeseries", "window"),
    bench=True,
)
def tw_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour windows (F.window == DuckDB time_bucket).

    NULL-ts events are excluded on both engines (registry.time_surface,
    rule 10 — F.window and time_bucket disagree on NULL placement).

    Scale: window-start is a pure function of ts, so this is an ordinary
    hash aggregation — partial aggregation map-side, one shuffle on
    (bucket, type). Streaming twin: readStream + withWatermark + same agg.
    """
    e = time_surface(table(spark, sf, "events"))
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            ts_str(F.col("w.start")).alias("window_start"),
            "event_type",
            "n",
            "sum_cents",
        )
    )


@query(
    "tw_sliding",
    oracle="""
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM (
        SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts)
                           - INTERVAL 30 MINUTE]) AS ws,
               value
        FROM events
        WHERE ts IS NOT NULL
    )
    GROUP BY ws
    """,
    tags=("timeseries", "window"),
)
def tw_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding windows: 1 hour long, 30-minute slide (each event lands in
    exactly 2 windows; the oracle materializes both via unnest).
    NULL-ts events excluded on both engines (time_surface, rule 10)."""
    e = time_surface(table(spark, sf, "events"))
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(ts_str(F.col("w.start")).alias("window_start"), "n", "sum_cents")
    )


@query(
    "tw_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_no
        FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 10 MINUTE, '%Y-%m-%d %H:%M:%S')
               AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM sessions
    GROUP BY user_id, session_no
    """,
    tags=("timeseries", "window", "session"),
    bench=True,
)
def tw_session(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows with a 10-minute inactivity gap per user.

    Spark's F.session_window merges events whose windows [ts, ts+gap)
    overlap OR TOUCH — probed directly (r13): an event exactly `gap`
    after its predecessor lands in the SAME session, so a new session
    starts only when the gap is STRICTLY greater than 10 minutes. The
    oracle reproduces that with the classic gaps-and-islands rewrite
    (lag + running sum, split on `> INTERVAL 10 MINUTE`; the original
    `>=` split diverged from the native operator exactly at the
    boundary — invisible on the fixture's microsecond timestamps,
    pinned by tests/test_boundary_semantics.py). Session end = last
    event + gap in both. NULL-ts events are excluded on both engines
    (time_surface, rule 10 — a NULL ts has no session placement).

    Scale: one shuffle on user_id; Spark's native session-window operator
    merges partial sessions map-side. Streaming twin uses the same
    expression with a watermark for state eviction.
    """
    e = time_surface(table(spark, sf, "events"))
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            "user_id",
            ts_str(F.col("w.start")).alias("session_start"),
            ts_str(F.col("w.end")).alias("session_end"),
            "n_events",
            "sum_cents",
        )
    )


@query(
    "join_asof",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events
        WHERE event_type = 'click' AND ts IS NOT NULL
    ), purchases AS (
        SELECT user_id, ts, max(value) AS pvalue
        FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           ROUND(p.pvalue, 2) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("timeseries", "join", "asof"),
    bench=True,
)
def join_asof(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for every click, the latest purchase value at ts <= click
    ts by the same user (DuckDB ASOF JOIN semantics, inclusive).

    NULL-ts rows are excluded on both engines (time_surface, rule 10):
    DuckDB's ASOF matches a NULL-ts probe to the LAST purchase while the
    union-merge rewrite orders it first and yields NULL — a NULL probe
    has no as-of position, so neither answer is meaningful.

    Spark has no native as-of operator (SURVEY.md §2 Tier B); the scalable
    rewrite is union-merge + running last_value, which costs ONE shuffle on
    user_id (same as a sort-merge join would) and never builds the
    candidate cross product that a range-join rewrite implies:

      union(purchases as kind=0, clicks as kind=1)
        -> window last(pvalue, ignorenulls) over
           (partition user order by ts, kind rows unbounded preceding)
        -> keep kind=1

    Purchases sort before clicks at equal ts (kind 0 < 1) to get the
    inclusive `>=` bound. The purchase side is pre-aggregated to unique
    (user, ts) so ties are deterministic.
    """
    e = time_surface(table(spark, sf, "events"))
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind"),
        F.lit(None).cast("double").alias("pvalue"),
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
        .select(
            F.lit(None).cast("bigint").alias("event_id"),
            "user_id", "ts", F.lit(0).alias("kind"), "pvalue",
        )
    )
    merged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("last_pvalue", F.last("pvalue", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts")).alias("click_ts"),
            F.round("last_pvalue", 2).alias("last_purchase_value"),
        )
    )


@query(
    "event_funnel_ordered",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
                 AS t_view,
             MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
                 AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                 AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS users_view,
           CAST(SUM(CASE WHEN t_click > t_view THEN 1 ELSE 0 END)
                AS BIGINT) AS users_view_click,
           CAST(SUM(CASE WHEN t_purchase > t_click AND t_click > t_view
                         THEN 1 ELSE 0 END) AS BIGINT) AS users_full_funnel
    FROM firsts
    """,
    tags=("timeseries", "analytics"),
)
def event_funnel_ordered(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered view→click→purchase funnel: a user advances a stage only
    if their first later-stage event happens AFTER their first
    earlier-stage event (NULL comparisons fall out as false in both
    engines).

    The funnel is ONE map-combinable aggregate per user then one global
    3-counter sum — no self-joins, no per-stage passes (the classic
    anti-pattern is one join per funnel stage, O(stages) shuffles of the
    event log). Timestamps compare as exact epoch micros. At 100 TB:
    shuffle keyed on user_id, partial aggs collapse each user's events
    map-side first.
    """
    ev = table(spark, sf, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))

    def first_of(kind):
        return F.min(F.when(F.col("event_type") == kind, us))

    firsts = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return firsts.agg(
        F.sum(F.col("t_view").isNotNull().cast("int")).cast("bigint")
        .alias("users_view"),
        F.sum((F.col("t_click") > F.col("t_view")).cast("int")).cast("bigint")
        .alias("users_view_click"),
        F.sum(
            (
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view"))
            ).cast("int")
        ).cast("bigint")
        .alias("users_full_funnel"),
    )


@query(
    "event_retention_cohorts",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
      FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
    )
    SELECT c.cohort_week,
           a.week - c.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY c.cohort_week, a.week - c.cohort_week
    ORDER BY cohort_week, week_offset
    """,
    tags=("timeseries", "analytics"),
)
def event_retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly retention triangle: users cohorted by first-active week,
    counted in each later week they return.

    Weeks are integer epoch-week ordinals (epoch_us // 604800000000) —
    pure integer arithmetic, no calendar/timezone semantics to diverge
    cross-engine. Plan: one distinct (user,week) — the only shuffle that
    touches the event log — then a per-user min and a join both keyed on
    user_id, so they reuse the same hash partitioning; the final agg is
    tiny (cohorts × offsets). The (user,week) distinct is the right
    scale move: it collapses the log to at most users × weeks rows
    before anything else runs.
    """
    ev = table(spark, sf, "events")
    activity = ev.select(
        "user_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) div 604800000000")
        .alias("week"),
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("week").alias("cohort_week")
    )
    return (
        activity.join(cohorts, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


@query(
    "agg_incremental_merge",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "incremental"),
)
def agg_incremental_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental view maintenance: merge a pre-aggregated BASE state
    with a DELTA batch and prove the merged state equals the from-scratch
    aggregate (the oracle IS the full aggregate — any merge bug
    hash-mismatches).

    The pattern behind every streaming/nightly rollup at scale: never
    re-aggregate history, combine partial states instead. Works because
    count/sum/max are commutative monoids over integer cents/micros;
    the merge is a full outer join on the (tiny) group key space plus
    coalesce-combine — the event log is only ever scanned once per
    increment. The split point here is an arbitrary mid-corpus timestamp
    so both sides are non-trivial. NULL-ts events are excluded on both
    engines (time_surface, rule 10): an event with no timestamp belongs to
    neither the BASE nor the DELTA side of a time-cut increment.
    """
    ev = time_surface(table(spark, sf, "events")).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    cut = "2024-01-16 00:00:00"

    def partial(df):
        return df.groupBy("event_type").agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(cents(F.col("value"))).cast("bigint").alias("sum_cents"),
            F.max("us").cast("bigint").alias("last_us"),
        )

    base = partial(ev.filter(F.col("ts") < F.lit(cut).cast("timestamp_ntz")))
    delta = partial(ev.filter(F.col("ts") >= F.lit(cut).cast("timestamp_ntz")))
    b, d = base.alias("b"), delta.alias("d")
    merged = b.join(
        d, F.col("b.event_type") == F.col("d.event_type"), "full_outer"
    ).select(
        F.coalesce(F.col("b.event_type"), F.col("d.event_type"))
        .alias("event_type"),
        (
            F.coalesce(F.col("b.n"), F.lit(0))
            + F.coalesce(F.col("d.n"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("b.sum_cents"), F.lit(0))
            + F.coalesce(F.col("d.sum_cents"), F.lit(0))
        ).alias("sum_cents"),
        F.greatest(
            F.coalesce(F.col("b.last_us"), F.lit(-1)),
            F.coalesce(F.col("d.last_us"), F.lit(-1)),
        ).alias("last_us"),
    )
    return merged.orderBy("event_type")


@query(
    "join_asof_forward",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, max(value) AS pvalue
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           ROUND(p.pvalue, 2) AS next_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
    tags=("timeseries", "join", "asof"),
)
def join_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of join: for every click, the EARLIEST purchase at
    ts >= click ts by the same user (DuckDB `ASOF ... ON c.ts <= p.ts`).

    Mirror of join_asof's union-merge rewrite with the scan direction
    reversed: order by (ts DESC, kind) so walking "forward in time"
    becomes a running last() over the descending stream — still ONE
    shuffle on user_id, still no candidate cross product. Purchases sort
    before clicks at equal ts (kind 0 < 1 on the DESC stream) to keep
    the bound inclusive.
    """
    e = table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind"),
        F.lit(None).cast("double").alias("pvalue"),
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
        .select(
            F.lit(None).cast("bigint").alias("event_id"),
            "user_id", "ts", F.lit(0).alias("kind"), "pvalue",
        )
    )
    merged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        merged.withColumn(
            "next_pvalue", F.last("pvalue", ignorenulls=True).over(w)
        )
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts")).alias("click_ts"),
            F.round("next_pvalue", 2).alias("next_purchase_value"),
        )
    )


@query(
    "anomaly_zscore_trailing",
    oracle="""
    WITH pts AS (
      SELECT event_id, user_id, ts,
             CASE WHEN value IS NOT NULL THEN
                 LEAST(GREATEST(CAST(ROUND(value * 100, 0) AS BIGINT),
                                -10000000), 10000000) END AS x
      FROM events
      WHERE ts IS NOT NULL
    ), framed AS (
      SELECT event_id, user_id,
             strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
             x,
             COUNT(*) OVER w AS n,
             COALESCE(SUM(x) OVER w, 0) AS s,
             COALESCE(SUM(x * x) OVER w, 0) AS q
      FROM pts
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts_s, x,
           CAST(n AS BIGINT) AS n_history
    FROM framed
    WHERE n >= 5
      AND (n * x - s) * (n * x - s) > 9 * (n * q - s * s)
    ORDER BY event_id
    """,
    tags=("timeseries", "window", "anomaly"),
)
def anomaly_zscore_trailing(spark: SparkSession, sf: str) -> DataFrame:
    """Trailing z-score anomaly detection, INTEGER-EXACT: flag events
    whose value deviates >3 sigma from the user's previous <=20 events.

    The float-free trick: with x, S=sum, Q=sum-of-squares all in exact
    integer cents over the trailing frame, mu = S/n and population
    sigma^2 = (n*Q - S^2)/n^2, so (x-mu)^2 > 9*sigma^2 multiplied through
    by n^2 becomes (n*x - S)^2 > 9*(n*Q - S^2) in pure int64 arithmetic.
    (Round 3 shipped an extra factor of n on the right-hand side — an
    effective 3*sqrt(n)-sigma threshold; fixed per ADVICE r3 in all three
    twins: this filter, the oracle SQL above, and the streaming state
    update in streaming/stateful.py.) No float mean/stddev, so Spark's
    partial aggregation order cannot perturb the flag decision and the
    oracle is hash-exact (a stddev_samp-based version would be
    float-order-dependent and only tolerance-checkable).

    Scale: one shuffle on user_id; the frame is a bounded 20-row running
    state per key — the same plan shape as window_frames, linear in
    events. Magnitude contract (r14, rule 11): x is WINSORIZED to
    +/-1e7 cents via cents_clamped on both engines, so with n <= 21
    every intermediate — (n*x)^2 <= 4.4e16, 9*(n*q - s^2) <= ~4e17 —
    fits int64; an un-clamped 1e10-magnitude value overflowed DuckDB's
    BIGINT multiply and would abort a 100-TB Spark job under ANSI.
    NULL-ts events are excluded on both engines (time_surface, rule 10 —
    the trailing frame is ts-ordered).
    """
    e = time_surface(table(spark, sf, "events"))
    x = cents_clamped(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    framed = e.select(
        "event_id",
        "user_id",
        ts_str(F.col("ts")).alias("ts_s"),
        x.alias("x"),
        F.count("*").over(w).cast("bigint").alias("n"),
        F.coalesce(F.sum(x).over(w), F.lit(0)).alias("s"),
        F.coalesce(F.sum(x * x).over(w), F.lit(0)).alias("q"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    return (
        framed.filter((F.col("n") >= 5) & (dev * dev > 9 * var_n2))
        .select(
            "event_id", "user_id", "ts_s", "x",
            F.col("n").alias("n_history"),
        )
        .orderBy("event_id")
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, max(value) AS pvalue
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    b AS (
      SELECT c.event_id, c.user_id, c.ts, p.ts AS b_ts, p.pvalue AS b_val
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND c.ts >= p.ts
    ),
    f AS (
      SELECT c.event_id, p.ts AS f_ts, p.pvalue AS f_val
      FROM clicks c ASOF LEFT JOIN purchases p
        ON c.user_id = p.user_id AND c.ts <= p.ts
    )
    SELECT b.event_id, b.user_id,
           strftime(b.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           CASE WHEN f.f_ts IS NULL THEN 'backward'
                WHEN b.b_ts IS NULL THEN 'forward'
                WHEN (b.ts - b.b_ts) <= (f.f_ts - b.ts) THEN 'backward'
                ELSE 'forward' END AS direction,
           ROUND(CASE WHEN f.f_ts IS NULL THEN b.b_val
                      WHEN b.b_ts IS NULL THEN f.f_val
                      WHEN (b.ts - b.b_ts) <= (f.f_ts - b.ts) THEN b.b_val
                      ELSE f.f_val END, 2) AS nearest_purchase_value
    FROM b JOIN f ON b.event_id = f.event_id
    ORDER BY b.event_id
    """,
    tags=("timeseries", "join", "asof"),
)
def join_asof_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest-in-time as-of join (pandas merge_asof direction='nearest'
    semantics, backward wins ties): for every click, the purchase with
    the smallest |Δt| by the same user.

    Completes the as-of family (backward / forward / nearest). ONE plan:
    the union-merge stream gets BOTH running windows — ascending for the
    latest-at-or-before purchase, descending for the earliest-at-or-
    after — sharing the single user_id shuffle (two sorts inside one
    exchange, still no candidate cross product); the pick is a pure
    integer-micros comparison. DuckDB oracle composes its two native
    ASOF directions and the same tie-break.
    """
    e = table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind"),
        F.lit(None).cast("double").alias("pvalue"),
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
        .select(
            F.lit(None).cast("bigint").alias("event_id"),
            "user_id", "ts", F.lit(0).alias("kind"), "pvalue",
        )
    )
    merged = purchases.unionByName(clicks).withColumn(
        "us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    p_us = F.when(F.col("kind") == 0, F.col("us"))
    p_val = F.when(F.col("kind") == 0, F.col("pvalue"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    both = (
        merged.withColumn("b_us", F.last(p_us, ignorenulls=True).over(wb))
        .withColumn("b_val", F.last(p_val, ignorenulls=True).over(wb))
        .withColumn("f_us", F.last(p_us, ignorenulls=True).over(wf))
        .withColumn("f_val", F.last(p_val, ignorenulls=True).over(wf))
        .filter(F.col("kind") == 1)
    )
    back_wins = F.when(F.col("f_us").isNull(), True).otherwise(
        F.when(F.col("b_us").isNull(), False).otherwise(
            (F.col("us") - F.col("b_us")) <= (F.col("f_us") - F.col("us"))
        )
    )
    return both.select(
        "event_id",
        "user_id",
        ts_str(F.col("ts")).alias("click_ts"),
        F.when(back_wins, "backward").otherwise("forward").alias("direction"),
        F.round(
            F.when(back_wins, F.col("b_val")).otherwise(F.col("f_val")), 2
        ).alias("nearest_purchase_value"),
    ).orderBy("event_id")


@query(
    "event_sessionization_gap",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_id, ts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS prev_ts
      FROM events
      WHERE ts IS NOT NULL
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ),
    sess AS (
      SELECT *, CAST(SUM(new_sess) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM flagged
    )
    SELECT user_id, session_no,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST((MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 1000000
                AS BIGINT) AS duration_secs,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM sess GROUP BY user_id, session_no
    """,
    tags=("timeseries", "window", "session"),
    bench=True,
)
def event_sessionization_gap(spark: SparkSession, sf: str) -> DataFrame:
    """Gap-based sessionization with EXPLICIT session ids: a new session
    starts after >30 min of per-user inactivity; each session reports
    start, event count, duration, and value total.

    Complements tw_session (F.session_window): the built-in gives
    windowed AGGREGATES but no session id on the events themselves —
    funnels, attribution, and per-session feature extraction all need
    the id column. The classic lag-flag-cumsum rewrite delivers it:
    LAG(ts) flags session starts, a running SUM of flags numbers the
    sessions — both windows share ONE (user_id) partitioning, so the
    whole operator costs a single shuffle regardless of corpus size, and
    the frames are running (bounded state per key, no global window).

    Engine-exactness: the gap compare and the duration are integer
    MICROSECONDS (unix_micros/epoch_us) — no float epoch, no
    second-truncation ambiguity between engines; value totals ride
    integer cents (registry rule 1); (ts, event_id) ordering ties are
    broken by the unique event_id (rule 5). NULL-ts events are excluded
    on both engines (time_surface, rule 10 — no session placement).
    """
    e = time_surface(table(spark, sf, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # session tz is pinned UTC (registry.table), so NTZ->LTZ is
    # instant-preserving and unix_micros stays integer-exact
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    gap_us = us(F.col("ts")) - us(F.lag("ts").over(w))
    flagged = e.select(
        "user_id", "event_id", "ts", cents(F.col("value")).alias("cents"),
        F.when(
            gap_us.isNull() | (gap_us > 1800 * 1_000_000), 1
        ).otherwise(0).alias("new_sess"),
    )
    sess = flagged.withColumn(
        "session_no",
        F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return sess.groupBy("user_id", "session_no").agg(
        ts_str(F.min("ts")).alias("session_start"),
        F.count("*").alias("n_events"),
        F.floor(
            (F.max(us(F.col("ts"))) - F.min(us(F.col("ts"))))
            / F.lit(1_000_000)
        ).cast("long").alias("duration_secs"),
        F.sum("cents").alias("sum_cents"),
    )


@query(
    "event_peak_concurrency",
    oracle="""
    WITH points AS (
      SELECT user_id, event_id, ts AS t, 1 AS delta FROM events
      UNION ALL
      SELECT user_id, event_id, ts + INTERVAL 30 MINUTE, -1 FROM events
    ),
    swept AS (
      SELECT user_id, t,
             CAST(SUM(delta) OVER (PARTITION BY user_id
                                   ORDER BY t, delta, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS running
      FROM points
    ),
    peaked AS (
      SELECT user_id, t, running,
             MAX(running) OVER (PARTITION BY user_id) AS peak
      FROM swept
    )
    SELECT user_id,
           CAST(MAX(peak) AS BIGINT) AS peak_concurrency,
           strftime(MIN(CASE WHEN running = peak THEN t END),
                    '%Y-%m-%d %H:%M:%S') AS first_peak_ts
    FROM peaked GROUP BY user_id
    """,
    tags=("timeseries", "window", "interval"),
)
def event_peak_concurrency(spark: SparkSession, sf: str) -> DataFrame:
    """Peak interval concurrency per user via the classic +1/-1 sweep:
    every event opens a 30-minute activity interval; the answer is the
    maximum number of simultaneously open intervals and when it is first
    reached — the load-profile question (peak parallel sessions, max
    concurrent viewers, connection-pool sizing) that windowed COUNTs
    cannot answer because overlap is not alignment.

    Rewrite: explode each interval into a +1 start and a -1 end point,
    running-sum the deltas in (t, delta, event_id) order — ends sort
    before starts at the same instant (half-open intervals), and the
    unique event_id pins full determinism — then take the partition max
    and the earliest time it is attained.

    Scale: ONE shuffle on user_id serves the running sum, the
    full-partition max, and the final rollup (Exchange reuse); 2 rows
    per event, bounded running state per key, no global window. The
    sweep is the linear-time alternative to the quadratic
    self-join-on-overlap a naive formulation implies.

    r15 OPTIMIZATION (guide §2.4): the +1/-1 point doubling was a
    2-branch union of the same scan (2 runtime scans — the branches'
    differing projections fork the subtrees). Each event row now
    emits its start and end points with one in-row ``inline``: same
    point multiset, 1 scan.
    """
    e = table(spark, sf, "events")
    points = e.select(
        "user_id", "event_id",
        F.inline(F.array(
            F.struct(F.col("ts").alias("t"), F.lit(1).alias("delta")),
            F.struct(
                (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("t"),
                F.lit(-1).alias("delta"),
            ),
        )),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = points.select(
        "user_id", "t",
        F.sum("delta").over(w_run).cast("long").alias("running"),
    )
    peaked = swept.withColumn(
        "peak", F.max("running").over(Window.partitionBy("user_id"))
    )
    return peaked.groupBy("user_id").agg(
        F.max("peak").cast("long").alias("peak_concurrency"),
        ts_str(
            F.min(F.when(F.col("running") == F.col("peak"), F.col("t")))
        ).alias("first_peak_ts"),
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), purchases AS (
        SELECT user_id, ts, max(value) AS pvalue
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           CASE WHEN p.ts IS NOT NULL
                     AND epoch_us(c.ts) - epoch_us(p.ts) <= 3600000000
                THEN ROUND(p.pvalue, 2) END AS recent_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
    tags=("timeseries", "join", "asof"),
)
def join_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join with a staleness TOLERANCE (pandas merge_asof
    tolerance= semantics): the latest purchase at-or-before each click
    counts only if it is at most 1 hour old — older matches null out.
    The attribution-window variant every last-touch pipeline needs (a
    purchase from last month must not get credit for today's click).

    Same ONE-shuffle union-merge rewrite as join_asof, carrying the
    matched purchase's timestamp through the running window alongside
    its value so the staleness test is a post-window narrow filter —
    not a second join, not a range join. Staleness compares integer
    microseconds (engine-exact; registry rule 3 keeps rendered
    timestamps string-stable).
    """
    e = table(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.lit(1).alias("kind"),
        F.lit(None).cast("double").alias("pvalue"),
        F.lit(None).cast("long").alias("p_us"),
    )
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
        .select(
            F.lit(None).cast("bigint").alias("event_id"),
            "user_id", "ts", F.lit(0).alias("kind"), "pvalue",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("p_us"),
        )
    )
    merged = purchases.unionByName(clicks)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fresh = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.col("last_p_us")
    ) <= 3600 * 1_000_000
    return (
        merged
        .withColumn("last_pvalue", F.last("pvalue", ignorenulls=True).over(w))
        .withColumn("last_p_us", F.last("p_us", ignorenulls=True).over(w))
        .filter(F.col("kind") == 1)
        .select(
            "event_id",
            "user_id",
            ts_str(F.col("ts")).alias("click_ts"),
            F.when(
                F.col("last_p_us").isNotNull() & fresh,
                F.round("last_pvalue", 2),
            ).alias("recent_purchase_value"),
        )
    )


@query(
    "event_time_to_convert",
    oracle="""
    WITH first_view AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    first_purchase AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN first_view v
        ON e.user_id = v.user_id AND e.ts > v.v_ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    )
    SELECT v.user_id,
           strftime(v.v_ts, '%Y-%m-%d %H:%M:%S') AS first_view_ts,
           strftime(p.p_ts, '%Y-%m-%d %H:%M:%S') AS first_purchase_ts,
           CAST((epoch_us(p.p_ts) - epoch_us(v.v_ts)) // 1000000
                AS BIGINT) AS latency_secs
    FROM first_view v JOIN first_purchase p ON v.user_id = p.user_id
    """,
    tags=("timeseries", "funnel"),
)
def event_time_to_convert(spark: SparkSession, sf: str) -> DataFrame:
    """Funnel latency: for every converting user, the time from their
    FIRST view to their first purchase strictly after it — the question
    every funnel owner asks right after event_funnel_ordered says who
    converted. Latency lands in integer seconds from integer-microsecond
    subtraction (engine-exact; no float epoch).

    Plan: two aggregates on the SAME user_id key — first-view min, then
    a purchase-after-view min whose join rides the identical
    partitioning (Exchange reuse; no second corpus shuffle) — and a
    final keyed join of two already-small per-user tables. Downstream
    percentile reporting belongs to sketch_quantiles over this output;
    kept separate so each stays oracle-exact.
    """
    e = table(spark, sf, "events")
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    first_view = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    first_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_view, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        first_view.join(first_purchase, "user_id")
        .select(
            "user_id",
            ts_str(F.col("v_ts")).alias("first_view_ts"),
            ts_str(F.col("p_ts")).alias("first_purchase_ts"),
            F.floor(
                (us(F.col("p_ts")) - us(F.col("v_ts"))) / F.lit(1_000_000)
            ).cast("long").alias("latency_secs"),
        )
    )


@query(
    "event_interarrival_regularity",
    oracle="""
    WITH gaps AS (
      SELECT user_id, event_type,
             (epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                 PARTITION BY user_id, event_type
                 ORDER BY ts, event_id)) // 1000000 AS gap_s
      FROM events
    ),
    stats AS (
      SELECT user_id, event_type,
             CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
             CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s,
             CAST(SUM(gap_s * gap_s) AS BIGINT) AS sum_gap2
      FROM gaps GROUP BY user_id, event_type
    )
    SELECT user_id, event_type, n_gaps, sum_gap_s,
           CAST(n_gaps * sum_gap2 - sum_gap_s * sum_gap_s AS BIGINT)
               AS var_num,
           (100 * (n_gaps * sum_gap2 - sum_gap_s * sum_gap_s)
              < 9 * sum_gap_s * sum_gap_s) AS is_regular
    FROM stats WHERE n_gaps >= 3
    """,
    tags=("timeseries", "window", "security"),
)
def event_interarrival_regularity(spark: SparkSession, sf: str) -> DataFrame:
    """Beaconing detection: keys whose inter-arrival gaps are suspiciously
    regular (low coefficient of variation) — the standard C2/heartbeat
    hunting signal, same shape as Wireshark-era beacon analysis but keyed
    on (user_id, event_type) here; over pcap it keys on (src, dst).

    Scale: LAG and the aggregate share ONE (user_id, event_type)
    partitioning — a single keyed shuffle end-to-end; state per key is a
    constant (3 running sums).

    Engine-exactness: gaps are integer SECONDS (micros div 1e6); the
    CV < 0.3 test is algebraized to avoid sqrt/division entirely:
    CV^2 = (n*Q - S^2)/S^2 < 0.09  <=>  100*(n*Q - S^2) < 9*S^2 — all
    BIGINT on both engines (the same population-variance algebra as
    anomaly_zscore_trailing). Magnitudes: second-granularity gaps keep
    n*Q < ~1e18 for gaps up to weeks across millions of events per key.
    """
    e = table(spark, sf, "events")
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # integer floor-div: micros are non-negative deltas so / + floor == div
    gap_s = F.floor(
        (us(F.col("ts")) - us(F.lag("ts").over(w))) / F.lit(1_000_000)
    ).cast("bigint")
    stats = (
        e.select("user_id", "event_type", gap_s.alias("gap_s"))
        .groupBy("user_id", "event_type")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.sum("gap_s").alias("sum_gap_s"),
            F.sum(F.col("gap_s") * F.col("gap_s")).alias("sum_gap2"),
        )
        .filter(F.col("n_gaps") >= 3)
    )
    var_num = (F.col("n_gaps") * F.col("sum_gap2")
               - F.col("sum_gap_s") * F.col("sum_gap_s"))
    return stats.select(
        "user_id", "event_type",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        F.col("sum_gap_s").cast("bigint").alias("sum_gap_s"),
        var_num.cast("bigint").alias("var_num"),
        (F.lit(100) * var_num
         < F.lit(9) * F.col("sum_gap_s") * F.col("sum_gap_s"))
        .alias("is_regular"),
    )


@query(
    "event_transition_bigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
      WHERE ts IS NOT NULL
    ),
    bigrams AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    )
    SELECT prev_type, next_type, n,
           CAST(SUM(n) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE), 6)
               AS p_transition
    FROM bigrams
    """,
    tags=("timeseries", "window", "markov"),
)
def event_transition_bigrams(spark: SparkSession, sf: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    (previous event_type -> next event_type) pair, the transition count
    and conditional probability. The funnel/anomaly primitives' model
    twin — rare transitions (low p) are the behavioral outliers.

    Scale: LAG shuffles once on user_id; the bigram aggregate reduces to
    |event_types|^2 rows (tiny), so the per-prev_type normalizing window
    runs on an already-collapsed table — the global window is over ~25
    rows, not the corpus (no window_percent_cume-style two-pass needed).

    Engine-exactness: counts are BIGINT; the probability is one
    double division of two exact integers + ROUND(.., 6) — identical
    IEEE expression tree both sides (registry rule 2). NULL-ts events
    are excluded on both engines (time_surface, rule 10 — adjacency is
    ts-ordered, and the engines disagree on NULL placement).
    """
    e = time_surface(table(spark, sf, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNotNull())
    bigrams = (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    n_from = F.sum("n").over(wp)
    return bigrams.select(
        "prev_type", "next_type",
        F.col("n").cast("bigint").alias("n"),
        n_from.cast("bigint").alias("n_from"),
        F.round(
            F.col("n").cast("double") / n_from.cast("double"), 6
        ).alias("p_transition"),
    )


@query(
    "event_ab_test_lift",
    oracle="""
    WITH assigned AS (
        SELECT user_id,
               CASE WHEN (('0x' || substr(md5('exp7:' ||
                        CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS revenue_cents
        FROM events
        GROUP BY user_id
    )
    SELECT arm,
           COUNT(*) AS n_users,
           CAST(SUM(converted) AS BIGINT) AS n_converted,
           CAST(10000 * SUM(converted) // COUNT(*) AS BIGINT)
               AS conv_bps,
           CAST(SUM(revenue_cents) AS BIGINT) AS revenue_cents
    FROM assigned
    GROUP BY arm
    """,
    tags=("events", "experiment"),
)
def event_ab_test_lift(spark: SparkSession, sf: str) -> DataFrame:
    """A/B experiment readout: users are deterministically hash-assigned
    to control/treatment (salted md5 — the industry-standard stable
    bucketing, same mechanism as sampling_stable_split), then per-arm
    conversion (any 'purchase') and revenue aggregate up. Conversion
    rate is exact integer basis points — no float division crosses the
    engine boundary.

    Scale: two keyed aggregations (user_id, then the 2-row arm rollup);
    the per-user aggregate partial-aggregates map-side. Assignment is a
    pure function of user_id, so re-running on late data moves no user
    between arms.
    """
    e = table(spark, sf, "events")
    arm = F.when(
        F.expr("CAST(conv(substring(md5(concat('exp7:', "
               "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
        % 2 == 0,
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    per_user = (
        e.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "purchase", 1)
                  .otherwise(0)).alias("converted"),
            F.sum(F.when(F.col("event_type") == "purchase",
                         cents(F.col("value"))).otherwise(0))
            .cast("bigint").alias("revenue_cents"),
        )
        .select(arm.alias("arm"), "converted", "revenue_cents")
    )
    return (
        per_user.groupBy("arm")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.expr("10000 * sum(converted) div count(*)").cast("bigint")
            .alias("conv_bps"),
            F.sum("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
    )


@query(
    "event_rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(ts) AS t_max FROM events),
    per_user AS (
        SELECT user_id,
               date_diff('day', MAX(ts), (SELECT t_max FROM anchor))
                   AS recency_days,
               COUNT(*) AS frequency,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS monetary_cents
        FROM events
        WHERE event_type = 'purchase'
        GROUP BY user_id
    )
    SELECT user_id,
           CAST(recency_days AS BIGINT) AS recency_days,
           CAST(frequency AS BIGINT) AS frequency,
           monetary_cents,
           CAST(CASE WHEN recency_days <= 2 THEN 5
                     WHEN recency_days <= 7 THEN 4
                     WHEN recency_days <= 14 THEN 3
                     WHEN recency_days <= 30 THEN 2 ELSE 1 END
                AS BIGINT) AS r_score,
           CAST(CASE WHEN frequency >= 8 THEN 5
                     WHEN frequency >= 5 THEN 4
                     WHEN frequency >= 3 THEN 3
                     WHEN frequency >= 2 THEN 2 ELSE 1 END
                AS BIGINT) AS f_score,
           CAST(CASE WHEN monetary_cents >= 40000 THEN 5
                     WHEN monetary_cents >= 20000 THEN 4
                     WHEN monetary_cents >= 10000 THEN 3
                     WHEN monetary_cents >= 5000 THEN 2 ELSE 1 END
                AS BIGINT) AS m_score
    FROM per_user
    """,
    tags=("events", "segmentation"),
)
def event_rfm_segmentation(spark: SparkSession, sf: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary — the
    classic CRM scoring): per-user purchase aggregates scored 1-5 with
    fixed business-rule bins.

    Scale note (deliberate design): bins are FIXED thresholds, making
    this a single keyed aggregate + narrow map — no global ordering
    anywhere. The data-adaptive variant (exact quintiles) needs a global
    rank; that pattern lives in window_percent_cume's two-pass
    range-partitioned rewrite and composes with this query unchanged.
    Recency anchors to MAX(ts) over the table (broadcast 1-row join), so
    the query is deterministic over immutable snapshots rather than
    wall-clock-dependent.
    """
    e = table(spark, sf, "events")
    purchases = e.filter(F.col("event_type") == "purchase")
    anchor = purchases.agg(F.max("ts").alias("t_max"))
    per_user = (
        purchases.groupBy("user_id")
        .agg(
            F.max("ts").alias("last_ts"),
            F.count("*").cast("bigint").alias("frequency"),
            F.sum(cents(F.col("value"))).cast("bigint")
            .alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff(F.col("t_max"), F.col("last_ts")).cast("bigint")
            .alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    r = F.col("recency_days")
    f = F.col("frequency")
    m = F.col("monetary_cents")
    return per_user.select(
        "user_id", "recency_days", "frequency", "monetary_cents",
        F.when(r <= 2, 5).when(r <= 7, 4).when(r <= 14, 3)
        .when(r <= 30, 2).otherwise(1).cast("bigint").alias("r_score"),
        F.when(f >= 8, 5).when(f >= 5, 4).when(f >= 3, 3)
        .when(f >= 2, 2).otherwise(1).cast("bigint").alias("f_score"),
        F.when(m >= 40000, 5).when(m >= 20000, 4).when(m >= 10000, 3)
        .when(m >= 5000, 2).otherwise(1).cast("bigint").alias("m_score"),
    )


@query(
    "event_dau_stickiness",
    bench=True,
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        FROM events
    ), dau AS (
        SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY day
    ), cover AS (
        SELECT user_id, UNNEST(generate_series(day, day + 6)) AS cover_day
        FROM ud
    ), wau AS (
        SELECT cover_day AS day,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
        FROM cover GROUP BY cover_day
    )
    SELECT strftime(DATE '1970-01-01' + CAST(dau.day AS INTEGER), '%Y-%m-%d')
               AS day,
           dau.dau,
           wau.wau,
           CAST((10000 * dau.dau) // wau.wau AS BIGINT) AS stickiness_bp
    FROM dau JOIN wau ON dau.day = wau.day
    """,
    tags=("timeseries", "distinct"),
)
def event_dau_stickiness(spark: SparkSession, sf: str) -> DataFrame:
    """DAU / trailing-7-day WAU stickiness per active day — the product
    health metric that needs a DISTINCT count over a sliding window,
    which no window frame can express directly.

    Scale: the corpus collapses to DISTINCT (user, day) FIRST (one keyed
    aggregate with map-side partials — output is bounded by users x
    days, orders of magnitude below the event count). The sliding
    distinct is then an explode of each user-day onto the <=7 future
    grid days it covers, followed by an ordinary distinct count per
    covered day: shuffle volume is 7x user-days, never 7x events, and
    there is no per-day self-join or quadratic window. This is the
    standard scale-safe rewrite for "distinct over sliding window".

    r15 OPTIMIZATION (guide §2.4): DAU previously ran as a second
    consumer of the distinct user-day frame (its own groupBy + a join
    back to WAU — 2 runtime scans). Each exploded cover row now
    carries its ORIGIN day, so DAU(d) = the count of offset-0 rows in
    cover group d (user-days are distinct, so exactly one such row per
    active user) and the dau>0 filter reproduces the inner join's
    "day had activity" row set (a NULL origin day explodes to nothing,
    as before): 2 scans -> 1, join -> conditional count in the same
    aggregate.
    """
    e = table(spark, sf, "events")
    ud = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("day"),
    ).distinct()
    cover = ud.select(
        "user_id",
        "day",
        F.explode(F.sequence(F.col("day"), F.col("day") + F.lit(6)))
        .alias("cover_day"),
    )
    both = cover.groupBy(F.col("cover_day").alias("day")).agg(
        F.count(F.when(F.col("day") == F.col("cover_day"), 1))
        .cast("bigint").alias("dau"),
        F.count_distinct("user_id").cast("bigint").alias("wau"),
    ).filter(F.col("dau") > 0)
    return (
        both
        .select(
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("day")),
                "yyyy-MM-dd",
            ).alias("day"),
            "dau",
            "wau",
            F.expr("(10000 * dau) div wau").cast("bigint")
            .alias("stickiness_bp"),
        )
    )


@query(
    "window_ewma",
    oracle="""
    WITH lagged AS (
        SELECT event_id, user_id,
            CAST(ROUND(value * 100, 0) AS BIGINT) AS c0,
            lag(CAST(ROUND(value * 100, 0) AS BIGINT), 1) OVER w AS c1,
            lag(CAST(ROUND(value * 100, 0) AS BIGINT), 2) OVER w AS c2,
            lag(CAST(ROUND(value * 100, 0) AS BIGINT), 3) OVER w AS c3,
            lag(CAST(ROUND(value * 100, 0) AS BIGINT), 4) OVER w AS c4,
            lag(CAST(ROUND(value * 100, 0) AS BIGINT), 5) OVER w AS c5,
            lag(CAST(ROUND(value * 100, 0) AS BIGINT), 6) OVER w AS c6,
            lag(CAST(ROUND(value * 100, 0) AS BIGINT), 7) OVER w AS c7
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), terms AS (
        SELECT event_id, user_id,
            CAST(COALESCE(c0 * 128, 0) + COALESCE(c1 * 64, 0)
               + COALESCE(c2 * 32, 0) + COALESCE(c3 * 16, 0)
               + COALESCE(c4 * 8, 0) + COALESCE(c5 * 4, 0)
               + COALESCE(c6 * 2, 0) + COALESCE(c7, 0) AS BIGINT)
                AS ewma_num,
            CAST(CASE WHEN c0 IS NULL THEN 0 ELSE 128 END
               + CASE WHEN c1 IS NULL THEN 0 ELSE 64 END
               + CASE WHEN c2 IS NULL THEN 0 ELSE 32 END
               + CASE WHEN c3 IS NULL THEN 0 ELSE 16 END
               + CASE WHEN c4 IS NULL THEN 0 ELSE 8 END
               + CASE WHEN c5 IS NULL THEN 0 ELSE 4 END
               + CASE WHEN c6 IS NULL THEN 0 ELSE 2 END
               + CASE WHEN c7 IS NULL THEN 0 ELSE 1 END AS BIGINT)
                AS ewma_den
        FROM lagged
    )
    SELECT event_id, user_id, ewma_num, ewma_den,
           CASE WHEN ewma_den > 0
                THEN ROUND(CAST(ewma_num AS DOUBLE) / ewma_den / 100.0, 4)
           END AS ewma
    FROM terms
    """,
    tags=("timeseries", "window"),
)
def window_ewma(spark: SparkSession, sf: str) -> DataFrame:
    """Exponentially-weighted moving average per user (alpha = 1/2 over
    the trailing <=8 events) — the smoothing pass behind rate limiting,
    trend lines, and anomaly baselines.

    Integer-exact core: with alpha = 1/2 the EWMA weights are powers of
    two, so numerator and denominator are BIGINT sums of cents x
    2^(7-lag) — aggregation-order-invariant and hash-identical across
    engines; only the final display ratio touches doubles (same IEEE
    expression tree both sides, rule 2). Missing leading lags renormalize
    the denominator exactly (pandas ewm(adjust=True) semantics).

    Scale: all 8 LAG expressions share ONE user-keyed window — a single
    Exchange + sort, no self-joins; the frame is O(1) per row.
    NULL-ts events are excluded on both engines (time_surface, rule 10).
    """
    e = time_surface(table(spark, sf, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    c = cents(F.col("value"))
    lags = [c] + [F.lag(c, k).over(w) for k in range(1, 8)]
    weights = [128, 64, 32, 16, 8, 4, 2, 1]
    num = reduce(
        lambda a, b: a + b,
        [F.coalesce(lg * F.lit(wt), F.lit(0)) for lg, wt in zip(lags, weights)],
    ).cast("bigint")
    den = reduce(
        lambda a, b: a + b,
        [F.when(lg.isNull(), 0).otherwise(wt) for lg, wt in zip(lags, weights)],
    ).cast("bigint")
    return e.select(
        "event_id", "user_id",
        num.alias("ewma_num"), den.alias("ewma_den"),
    ).select(
        "event_id", "user_id", "ewma_num", "ewma_den",
        F.when(
            F.col("ewma_den") > 0,
            F.round(
                F.col("ewma_num").cast("double") / F.col("ewma_den") / 100.0, 4
            ),
        ).alias("ewma"),
    )


@query(
    "resample_m4_downsample",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               time_bucket(INTERVAL '1 hour', ts) AS b,
               ts, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS c,
               row_number() OVER (PARTITION BY event_type,
                                      time_bucket(INTERVAL '1 hour', ts)
                                  ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (PARTITION BY event_type,
                                      time_bucket(INTERVAL '1 hour', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
        WHERE ts IS NOT NULL
    )
    SELECT event_type,
           strftime(b, '%Y-%m-%d %H:%M:%S') AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(c) AS BIGINT) AS v_min_cents,
           CAST(MAX(c) AS BIGINT) AS v_max_cents,
           CAST(MAX(CASE WHEN rn_a = 1 THEN c END) AS BIGINT)
               AS v_first_cents,
           CAST(MAX(CASE WHEN rn_d = 1 THEN c END) AS BIGINT)
               AS v_last_cents,
           MAX(CASE WHEN rn_a = 1
                    THEN strftime(ts, '%Y-%m-%d %H:%M:%S') END) AS ts_first,
           MAX(CASE WHEN rn_d = 1
                    THEN strftime(ts, '%Y-%m-%d %H:%M:%S') END) AS ts_last
    FROM pts
    GROUP BY event_type, b
    """,
    tags=("timeseries", "window"),
)
def resample_m4_downsample(spark: SparkSession, sf: str) -> DataFrame:
    """M4 downsampling (first/last/min/max per series per time bucket) —
    the error-free line-chart reduction from Jugel et al. (VLDB'14):
    any pixel column renders identically from these 4 points as from
    the raw series, so dashboards pull O(buckets) rows off a 100 TB
    history instead of the raw points.

    Scale: both row_number directions share ONE (series, bucket)-keyed
    Exchange (two sorts, no self-join); the aggregate collapses each
    bucket to a single row with map-side partials on the min/max part.
    Determinism: first/last are keyed on (ts, event_id) — a UNIQUE
    ordering — so ties in ts cannot flip values across engines.
    NULL-ts events are excluded on both engines (time_surface, rule 10 —
    a point with no timestamp has no bucket and no first/last position).
    """
    e = time_surface(table(spark, sf, "events"))
    pts = e.select(
        "event_type",
        F.window("ts", "1 hour").getField("start").alias("b"),
        "ts", "event_id",
        cents(F.col("value")).alias("c"),
    )
    w_asc = Window.partitionBy("event_type", "b").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "b").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    marked = pts.select(
        "*",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    first_ = F.when(F.col("rn_a") == 1, F.col("c"))
    last_ = F.when(F.col("rn_d") == 1, F.col("c"))
    return (
        marked.groupBy("event_type", "b")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("c").cast("bigint").alias("v_min_cents"),
            F.max("c").cast("bigint").alias("v_max_cents"),
            F.max(first_).cast("bigint").alias("v_first_cents"),
            F.max(last_).cast("bigint").alias("v_last_cents"),
            F.max(F.when(F.col("rn_a") == 1, ts_str(F.col("ts"))))
            .alias("ts_first"),
            F.max(F.when(F.col("rn_d") == 1, ts_str(F.col("ts"))))
            .alias("ts_last"),
        )
        .select(
            "event_type", ts_str(F.col("b")).alias("bucket_start"),
            "n", "v_min_cents", "v_max_cents", "v_first_cents",
            "v_last_cents", "ts_first", "ts_last",
        )
    )


@query(
    "window_rolling_regression",
    oracle="""
    WITH idx AS (
        SELECT event_id, user_id, ts,
               CASE WHEN value IS NOT NULL THEN
                   LEAST(GREATEST(CAST(ROUND(value * 100, 0) AS BIGINT),
                                  -10000000), 10000000) END AS y,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
        WHERE ts IS NOT NULL
    ), sums AS (
        SELECT event_id, user_id, rn,
               CAST(COUNT(*) OVER w AS BIGINT) AS n,
               CAST(SUM(rn) OVER w AS BIGINT) AS sx,
               CAST(SUM(y) OVER w AS BIGINT) AS sy,
               CAST(SUM(rn * y) OVER w AS BIGINT) AS sxy,
               CAST(SUM(rn * rn) OVER w AS BIGINT) AS sxx
        FROM idx
        WINDOW w AS (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CASE WHEN n * sxx - sx * sx > 0
                THEN CAST((1000000 * (n * sxy - sx * sy))
                          // (n * sxx - sx * sx) AS BIGINT)
           END AS slope_ppm
    FROM sums
    """,
    tags=("timeseries", "window"),
)
def window_rolling_regression(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling OLS trend per user: the least-squares slope of value
    against event index over the trailing <=8 events — the trend
    detector behind 'spend is accelerating' alerts, computed without
    floats: slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) carried as exact
    BIGINT numerator/denominator plus a ppm-scaled integer quotient.

    Scale: row_number and all five frame sums share ONE user-keyed
    window partitioning (a single Exchange; the second Window reuses
    the sort). The frame is O(1) rows; nothing is quadratic.

    r14 contract: NULL-ts events are excluded (time_surface, rule 10)
    and y is winsorized to +/-1e7 cents (cents_clamped, rule 11) — the
    ppm scaling multiplies the slope numerator by 1e6, so an un-clamped
    1e10-magnitude value overflows int64 in both engines.
    """
    e = time_surface(table(spark, sf, "events"))
    w1 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    idx = e.select(
        "event_id", "user_id", "ts",
        cents_clamped(F.col("value")).alias("y"),
    ).withColumn("rn", F.row_number().over(w1))
    wf = (
        Window.partitionBy("user_id").orderBy("rn").rowsBetween(-7, 0)
    )
    sums = idx.select(
        "event_id", "user_id", "rn",
        F.count("*").over(wf).cast("bigint").alias("n"),
        F.sum("rn").over(wf).cast("bigint").alias("sx"),
        F.sum("y").over(wf).cast("bigint").alias("sy"),
        F.sum(F.col("rn") * F.col("y")).over(wf).cast("bigint").alias("sxy"),
        F.sum(F.col("rn") * F.col("rn")).over(wf).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return sums.select(
        "event_id", "user_id", "n",
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.when(den > 0, F.expr(
            "(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)"
        )).cast("bigint").alias("slope_ppm"),
    )


@query(
    "anomaly_mad_robust",
    oracle="""
    WITH c AS (
        SELECT event_id, user_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ), med AS (
        SELECT user_id,
               CAST(quantile_cont(cents, 0.5) * 2 AS BIGINT) AS med2
        FROM c GROUP BY user_id
    ), dev AS (
        SELECT c.event_id, c.user_id, c.cents, med.med2,
               abs(2 * c.cents - med.med2) AS dev2
        FROM c JOIN med USING (user_id)
    ), mad AS (
        SELECT user_id,
               CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
        FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id, d.cents, d.med2, m.mad4
    FROM dev d JOIN mad m USING (user_id)
    WHERE 20000 * d.dev2 > 44478 * m.mad4 AND m.mad4 > 0
    """,
    tags=("timeseries", "anomaly"),
)
def anomaly_mad_robust(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    z-score twin (anomaly_zscore_trailing) that a single extreme value
    cannot poison: flag |x − median| > 3·1.4826·MAD.

    Integer-exact despite the half-integer medians: 2·median and
    4·MAD are integers (a median of ints is k or k+0.5), so the flag
    is the pure BIGINT inequality 20000·(2|dev|) > 44478·(4·MAD) —
    no float comparison anywhere near the decision boundary.

    Scale: both exact medians ride per-user WINDOWS over one shuffle.
    At 100 TB swap exact medians for percentile_approx with a
    documented tolerance — the inequality is unchanged.

    r15 OPTIMIZATION (guide §2.4): the two grouped medians + two
    user-keyed joins re-scanned events 3x at runtime (each join
    consumer pruned / filtered its aggregate branch differently). Both
    medians are now whole-partition windows chained on the SAME
    user_id partitioning — one Exchange, one scan, zero joins. The
    median values are Spark's same median over the identical per-user
    row multisets; the original INNER joins on user_id dropped
    NULL-user rows, reproduced by the explicit isNotNull filter.
    """
    e = table(spark, sf, "events")
    w_u = Window.partitionBy("user_id")
    c = e.filter(F.col("user_id").isNotNull()).select(
        "event_id", "user_id", cents(F.col("value")).alias("cents"))
    dev = c.withColumn(
        "med2", (F.median("cents").over(w_u) * 2).cast("bigint")
    ).withColumn("dev2", F.abs(2 * F.col("cents") - F.col("med2")))
    scored = dev.withColumn(
        "mad4", (F.median("dev2").over(w_u) * 2).cast("bigint"))
    return (
        scored
        .filter((20000 * F.col("dev2") > 44478 * F.col("mad4"))
                & (F.col("mad4") > 0))
        .select("event_id", "user_id", "cents", "med2", "mad4")
    )


@query(
    "event_trigram_paths",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type, 1) OVER w AS prev1,
               lag(event_type, 2) OVER w AS prev2
        FROM events
        WHERE ts IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), tri AS (
        SELECT prev2, prev1, event_type AS curr,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev2 IS NOT NULL
        GROUP BY prev2, prev1, event_type
    ), tot AS (
        SELECT prev2, prev1, CAST(SUM(n) AS BIGINT) AS n_ctx
        FROM tri GROUP BY prev2, prev1
    )
    SELECT t.prev2, t.prev1, t.curr, t.n,
           CAST((1000000 * t.n) // c.n_ctx AS BIGINT) AS p_ppm
    FROM tri t JOIN tot c ON t.prev2 = c.prev2 AND t.prev1 = c.prev1
    """,
    tags=("timeseries", "sequence"),
)
def event_trigram_paths(spark: SparkSession, sf: str) -> DataFrame:
    """Second-order behavior model: (prev2, prev1) -> next transition
    counts with integer-ppm conditional probabilities — the step up
    from the first-order `event_transition_bigrams` that captures
    context-dependent paths (view->click->purchase vs
    click->view->click), the input to next-action prediction baselines.

    Scale: both LAGs share ONE user-keyed window; the trigram and
    context tables are type-vocabulary-sized (|types|^3 at most), so
    the normalizing join touches ~hundreds of rows, never the corpus.
    NULL-ts events are excluded on both engines (time_surface, rule 10).
    """
    e = time_surface(table(spark, sf, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("curr"),
        F.lag("event_type", 1).over(w).alias("prev1"),
        F.lag("event_type", 2).over(w).alias("prev2"),
    ).filter(F.col("prev2").isNotNull())
    tri = seq.groupBy("prev2", "prev1", "curr").agg(
        F.count("*").cast("bigint").alias("n"))
    tot = tri.groupBy(
        F.col("prev2").alias("c2"), F.col("prev1").alias("c1")
    ).agg(F.sum("n").cast("bigint").alias("n_ctx"))
    return (
        tri.join(tot, (tri.prev2 == tot.c2) & (tri.prev1 == tot.c1))
        .select(
            "prev2", "prev1", "curr", "n",
            F.expr("(1000000 * n) div n_ctx").cast("bigint").alias("p_ppm"),
        )
    )


@query(
    "window_median_sliding",
    oracle="""
    SELECT event_id, user_id,
           CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
           CAST(median(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w * 2
                AS BIGINT) AS median2
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
    """,
    tags=("timeseries", "window"),
)
def window_median_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding exact median over the trailing <=8 events per user — the
    robust running baseline (median filters shrug off the spikes that
    wreck a moving average). Spark has NO median-over-window; the
    rewrite collects the O(1) frame into an array, sorts it, and picks
    the middle pair — exactly DuckDB's windowed median, carried as
    2x-median so the half-integer midpoint stays a BIGINT.

    Scale: one user-keyed window exchange; the per-row array is bounded
    by the frame (8), so memory is O(frame), not O(partition).
    NULL-ts events are excluded on both engines (time_surface, rule 10).
    """
    e = time_surface(table(spark, sf, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    c = cents(F.col("value"))
    frame = F.array_sort(F.collect_list(c).over(w))
    n = F.size(frame)
    lo = F.element_at(frame, ((n + 1) / 2).cast("int"))
    hi = F.element_at(frame, (n / 2 + 1).cast("int"))
    return e.select(
        "event_id", "user_id",
        c.alias("cents"),
        (lo + hi).cast("bigint").alias("median2"),
    )


@query(
    "event_longest_streak",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day
        FROM events
    ), islands AS (
        SELECT user_id, day,
               day - row_number() OVER (PARTITION BY user_id ORDER BY day)
                   AS grp
        FROM ud
    ), streaks AS (
        SELECT user_id, grp,
               CAST(COUNT(*) AS BIGINT) AS len,
               MIN(day) AS start_day
        FROM islands GROUP BY user_id, grp
    ), best AS (
        SELECT user_id, len, start_day,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY len DESC, start_day) AS rk
        FROM streaks
    )
    SELECT user_id, len AS longest_streak_days,
           strftime(DATE '1970-01-01' + CAST(start_day AS INTEGER),
                    '%Y-%m-%d') AS streak_start
    FROM best WHERE rk = 1
    """,
    tags=("timeseries", "streak"),
)
def event_longest_streak(spark: SparkSession, sf: str) -> DataFrame:
    """Longest consecutive-day activity streak per user (the habit
    metric consumer products headline) — gaps-and-islands on DISTINCT
    activity days: day − row_number is constant within a consecutive
    run, so one keyed window + one aggregate finds every streak; ties
    resolve to the earliest streak.

    Scale: the corpus collapses to distinct user-days first; all three
    steps (island id, streak agg, best-of rank) share the user_id
    partitioning — one shuffle after the distinct.
    """
    e = table(spark, sf, "events")
    ud = e.select(
        "user_id",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .alias("day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = ud.withColumn(
        "grp", F.col("day") - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count("*").cast("bigint").alias("len"),
        F.min("day").alias("start_day"),
    )
    wb = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("start_day"))
    return (
        streaks.withColumn("rk", F.row_number().over(wb))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("len").alias("longest_streak_days"),
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"),
                           F.col("start_day").cast("int")),
                "yyyy-MM-dd",
            ).alias("streak_start"),
        )
    )


def simulated_arrival(e: DataFrame) -> DataFrame:
    """Add a deterministic `arrival_ord` column: the per-user event
    sequence reordered by a hash jitter of up to 4 positions.

    The driver's synthetic events carry NO ingest timestamp, and their
    event_ids are perfectly event-time-ordered (verified: 0 inversions
    at every sf) — a lateness audit over the raw sequence is vacuous.
    Production tables have a real arrival column (ingest ts, Kafka
    offset); this helper stands in for it with a reproducible arrival
    log: arrival_ord = row_number (per user, by event_id) + md5-jitter
    in [0, 4], so ~30% of events arrive behind a later-timestamped
    sibling. Shared by the batch audit and the streaming-twin test so
    both see the SAME arrival log.
    """
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy("event_id")
    )
    jit = (
        F.expr(
            "CAST(conv(substring(md5(concat('arr:', "
            "CAST(event_id AS STRING))), 1, 15), 16, 10) AS BIGINT)"
            " % 1000000007"
        )
        % 5
    )
    return e.withColumn("arrival_ord", (rn + jit).cast("bigint"))


@query(
    "event_watermark_lateness_audit",
    oracle="""
    WITH j AS (
      SELECT event_type, event_id, epoch_us(ts) AS ts_us, user_id,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id)
               + ((('0x' || substr(md5('arr:' ||
                    CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                   % 1000000007) % 5) AS arrival_ord
      FROM events
    ),
    arrival AS (
      SELECT event_type, ts_us,
             MAX(ts_us) OVER (
               PARTITION BY user_id ORDER BY arrival_ord, event_id
               ROWS UNBOUNDED PRECEDING) AS hw_us
      FROM j
    ),
    late AS (
      SELECT event_type, hw_us - ts_us AS late_us FROM arrival
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_order,
           CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_late_secs,
           CAST(SUM(CASE WHEN late_us > 600000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS dropped_at_10min,
           CAST(SUM(CASE WHEN late_us > 86400000000 THEN 1 ELSE 0 END)
               AS BIGINT) AS dropped_at_1day,
           ROUND(quantile_cont(late_us, 0.95) / 1000000.0, 4)
               AS p95_late_secs
    FROM late
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "streaming", "quality"),
)
def event_watermark_lateness_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Out-of-orderness audit — the batch query that picks a streaming
    watermark: each event's lateness is how far the per-user event-time
    high-water mark had already advanced past it when it arrived
    (arrival order from :func:`simulated_arrival` — the synthetic table
    has no ingest column; see its docstring). Reports, per event type,
    how many events arrive out of order, the worst and p95 lateness,
    and exactly how many a 10-minute / 1-day watermark would drop — the
    completeness-vs-latency trade made measurable before committing a
    `withWatermark` threshold (the streaming twins in
    streaming/windows.py take that threshold as input; this query is
    where its value comes from; streaming/stateful.lateness_tracker is
    its live twin).

    Scale: row_number and the running max are BOTH windows over the
    same user_id partition key — one shuffle, bounded running state
    (the event_sessionization_gap shape); the rollup to event types is
    a map-side-combinable aggregate over integers; the one sort-based
    piece (p95) runs over per-group microsecond BIGINTs, never raw
    rows.
    """
    e = table(spark, sf, "events")
    j = simulated_arrival(e)
    w = (
        Window.partitionBy("user_id")
        .orderBy("arrival_ord", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    arrival = j.select(
        "event_type",
        ts_us.alias("ts_us"),
        F.max(ts_us).over(w).alias("hw_us"),
    )
    late = arrival.select(
        "event_type", (F.col("hw_us") - F.col("ts_us")).alias("late_us")
    )
    return (
        late.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
            .cast("bigint").alias("n_out_of_order"),
            (F.max("late_us") / F.lit(1000000)).cast("bigint")
            .alias("max_late_secs"),
            F.sum(F.when(F.col("late_us") > 600000000, 1).otherwise(0))
            .cast("bigint").alias("dropped_at_10min"),
            F.sum(F.when(F.col("late_us") > 86400000000, 1).otherwise(0))
            .cast("bigint").alias("dropped_at_1day"),
            F.round(
                F.expr("percentile(late_us, 0.95)") / F.lit(1000000.0), 4
            ).alias("p95_late_secs"),
        )
        .orderBy("event_type")
    )


@query(
    "event_cuped_adjustment",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CASE WHEN (('0x' || substr(md5('exp7:' ||
                      CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                           AND value IS NOT NULL
                      THEN LEAST(GREATEST(
                               CAST(ROUND(value * 100, 0) AS BIGINT),
                               -10000000), 10000000)
                      ELSE 0 END) AS BIGINT) AS x_cents,
             CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                           AND value IS NOT NULL
                      THEN LEAST(GREATEST(
                               CAST(ROUND(value * 100, 0) AS BIGINT),
                               -10000000), 10000000)
                      ELSE 0 END) AS BIGINT) AS y_cents
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x_cents) AS BIGINT) AS sx,
             CAST(SUM(y_cents) AS BIGINT) AS sy,
             CAST(SUM(x_cents * y_cents) AS BIGINT) AS sxy,
             CAST(SUM(x_cents * x_cents) AS BIGINT) AS sxx
      FROM per_user
    ),
    arms AS (
      SELECT arm,
             CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(x_cents) AS BIGINT) AS sx_a,
             CAST(SUM(y_cents) AS BIGINT) AS sy_a
      FROM per_user GROUP BY arm
    )
    SELECT a.arm, a.n_users,
           ROUND(CAST(a.sy_a AS DOUBLE) / a.n_users, 4) AS raw_mean_cents,
           ROUND(CAST(a.sy_a AS DOUBLE) / a.n_users
                 - ((CAST(p.n AS DOUBLE) * p.sxy
                     - CAST(p.sx AS DOUBLE) * p.sy)
                    / (CAST(p.n AS DOUBLE) * p.sxx
                       - CAST(p.sx AS DOUBLE) * p.sx))
                   * (CAST(a.sx_a AS DOUBLE) / a.n_users
                      - CAST(p.sx AS DOUBLE) / p.n), 4)
               AS cuped_mean_cents,
           ROUND((CAST(p.n AS DOUBLE) * p.sxy
                  - CAST(p.sx AS DOUBLE) * p.sy)
                 / (CAST(p.n AS DOUBLE) * p.sxx
                    - CAST(p.sx AS DOUBLE) * p.sx), 6) AS theta
    FROM arms a, pooled p
    ORDER BY a.arm
    """,
    tags=("timeseries", "experiment", "stats"),
)
def event_cuped_adjustment(spark: SparkSession, sf: str) -> DataFrame:
    """CUPED variance reduction (Deng et al., WSDM 2013): the A/B
    readout's treatment means adjusted by each user's PRE-experiment
    spend — adjusted_y = mean(y) - theta * (mean(x) - pooled mean(x)),
    theta = cov(x, y)/var(x) — the standard trick that cuts experiment
    runtimes ~50% by removing between-user variance the experiment
    didn't cause.

    Cross-engine determinism: all moments (n, Sx, Sy, Sxy, Sxx) are
    EXACT int64 sums of per-user cents; theta and the adjusted means
    are a handful of scalar IEEE ops on those exact integers with the
    same expression tree in both engines — no float aggregation order
    anywhere. r14 contract hardening: per-event cents are WINSORIZED to
    +/-1e7 (cents_clamped, rule 11 — an un-clamped 1e10-magnitude value
    overflowed the oracle's int64 x*y product and would abort the Spark
    job under ANSI) and NULL-ts events are excluded on both engines
    (time_surface, rule 10 — a pre/post time-cut query). Per-user sums
    then peak ~1e12, pooled products ~1e17: inside int64 with headroom.

    Scale: one user-keyed aggregate (map-side combinable), a 1-row
    pooled-moment aggregate broadcast to the 2-row arm rollup — the
    covariate adjustment costs ONE extra pass of integer products over
    what event_ab_test_lift already pays. Assignment is the same salted
    md5 bucket, so both queries describe the same experiment.
    """
    e = time_surface(table(spark, sf, "events"))
    arm = F.when(
        F.expr("CAST(conv(substring(md5(concat('exp7:', "
               "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
        % 2 == 0,
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    boundary = F.lit("2024-01-16").cast("timestamp_ntz").cast("timestamp")
    # NULL-value events contribute 0 EXPLICITLY (not NULL) so an
    # all-NULL user folds to 0 on both engines, mirroring the oracle's
    # `AND value IS NOT NULL ... ELSE 0` CASE.
    nn = F.col("value").isNotNull()
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when((F.col("ts") < boundary) & nn,
                     cents_clamped(F.col("value")))
              .otherwise(0)).cast("bigint").alias("x_cents"),
        F.sum(F.when((F.col("ts") >= boundary) & nn,
                     cents_clamped(F.col("value")))
              .otherwise(0)).cast("bigint").alias("y_cents"),
    ).select(arm.alias("arm"), "x_cents", "y_cents")
    pooled = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x_cents").cast("bigint").alias("sx"),
        F.sum("y_cents").cast("bigint").alias("sy"),
        F.sum(F.col("x_cents") * F.col("y_cents")).cast("bigint")
        .alias("sxy"),
        F.sum(F.col("x_cents") * F.col("x_cents")).cast("bigint")
        .alias("sxx"),
    )
    arms = per_user.groupBy("arm").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("x_cents").cast("bigint").alias("sx_a"),
        F.sum("y_cents").cast("bigint").alias("sy_a"),
    )
    j = arms.crossJoin(F.broadcast(pooled))
    nd = F.col("n").cast("double")
    theta = (nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    )
    raw_mean = F.col("sy_a").cast("double") / F.col("n_users")
    mean_x_arm = F.col("sx_a").cast("double") / F.col("n_users")
    mean_x_pool = F.col("sx").cast("double") / F.col("n")
    return j.select(
        "arm",
        "n_users",
        F.round(raw_mean, 4).alias("raw_mean_cents"),
        F.round(raw_mean - theta * (mean_x_arm - mean_x_pool), 4)
        .alias("cuped_mean_cents"),
        F.round(theta, 6).alias("theta"),
    ).orderBy("arm")


@query(
    "event_attribution_linear",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS rev_cents
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS t_type
      FROM events WHERE event_type IN ('view', 'click')
    ),
    joined AS (
      SELECT p.p_id, p.rev_cents, t.t_id, t.t_type
      FROM purchases p JOIN touches t
        ON p.user_id = t.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 1 DAY
    ),
    weighted AS (
      SELECT p_id, t_type, rev_cents,
             COUNT(*) OVER (PARTITION BY p_id) AS n_touches
      FROM joined
    )
    SELECT t_type AS touch_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_purchases_touched,
           CAST(SUM(1000000 // n_touches) AS BIGINT) AS share_ppm_sum,
           CAST(SUM(rev_cents // n_touches) AS BIGINT)
               AS attributed_cents
    FROM weighted
    GROUP BY t_type
    ORDER BY t_type
    """,
    tags=("timeseries", "events", "join", "analysis"),
)
def event_attribution_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Linear multi-touch attribution: every purchase's revenue is split
    equally across the user's view/click touches in the preceding 24 h
    (the marketing-analytics sibling of the as-of join family, which
    models LAST-touch). Shares are exact integers — 1e6 ppm and cents
    divided by touch count with truncating division, identical in both
    engines — so the cross-engine hash needs no float tolerance.

    Scale: the purchase x touch join carries the user_id equi-conjunct,
    so it plans as a hash join keyed on users with the 24 h bound as a
    post-join filter — pair fan-out is bounded by touches-per-user-day,
    never corpus^2 (the join_range_interval lesson). The per-purchase
    touch count is a purchase-keyed window over already-joined rows;
    final rollup is 2 groups.
    """
    e = table(spark, sf, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        cents(F.col("value")).alias("rev_cents"),
    )
    t = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("t_type"),
    )
    joined = p.join(
        t,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 DAY")),
    )
    w = Window.partitionBy("p_id")
    weighted = joined.select(
        "p_id", "t_type", "rev_cents", F.count("*").over(w).alias("n_touches")
    )
    return (
        weighted.groupBy(F.col("t_type").alias("touch_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            F.countDistinct("p_id").cast("bigint")
            .alias("n_purchases_touched"),
            F.sum(F.expr("1000000 div n_touches")).cast("bigint")
            .alias("share_ppm_sum"),
            F.sum(F.expr("rev_cents div n_touches")).cast("bigint")
            .alias("attributed_cents"),
        )
        .orderBy("touch_type")
    )


@query(
    "event_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + 1800000000 AS e
      FROM events
      WHERE ts IS NOT NULL
    ),
    flagged AS (
      SELECT user_id, s, e,
             CASE WHEN s > COALESCE(MAX(e) OVER (
                    PARTITION BY user_id ORDER BY s, e
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                  THEN 1 ELSE 0 END AS new_block
      FROM iv
    ),
    blocks AS (
      SELECT user_id, s, e,
             CAST(SUM(new_block) OVER (
               PARTITION BY user_id ORDER BY s, e
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS block_id
      FROM flagged
    ),
    merged AS (
      SELECT user_id, block_id,
             MIN(s) AS block_start_us, MAX(e) AS block_end_us
      FROM blocks GROUP BY user_id, block_id
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_merged_intervals,
           CAST(SUM(block_end_us - block_start_us) // 1000000 AS BIGINT)
               AS covered_secs
    FROM merged
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("timeseries", "window", "interval"),
)
def event_interval_merge(spark: SparkSession, sf: str) -> DataFrame:
    """Overlapping-interval merge (the scheduling/uptime primitive:
    coalesce [start, end) spans into maximal disjoint blocks): each
    event opens a 30-minute activity interval; per user, overlapping
    intervals merge and the query reports merged-block counts and the
    EXACT covered seconds — union time, which naive SUM(duration)
    overstates wherever intervals overlap.

    The rewrite is gaps-and-islands on the running max of interval
    ends: an interval starts a new block iff its start exceeds every
    previous end (keyed running MAX window), block ids are the running
    sum of those flags, and each block reduces to (min start, max end).
    Same plan family as event_sessionization_gap but over INTERVALS —
    sessionization merges points by gap; this merges spans by overlap.

    Scale: two windows + one aggregate, all partitioned by user_id —
    ONE shuffle; integer microseconds end to end. NULL-ts events are
    excluded on both engines (time_surface, rule 10 — a NULL ts opens
    no interval).
    """
    e = time_surface(table(spark, sf, "events"))
    iv = e.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("s"),
        (F.unix_micros(F.col("ts").cast("timestamp")) + 1800000000)
        .alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id", "s", "e",
        F.when(
            F.col("s") > F.coalesce(F.max("e").over(w_prev), F.lit(-1)), 1
        ).otherwise(0).alias("new_block"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    blocks = flagged.select(
        "user_id", "s", "e",
        F.sum("new_block").over(w_run).cast("bigint").alias("block_id"),
    )
    merged = blocks.groupBy("user_id", "block_id").agg(
        F.min("s").alias("block_start_us"),
        F.max("e").alias("block_end_us"),
    )
    return (
        merged.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_merged_intervals"),
            F.expr("sum(block_end_us - block_start_us) div 1000000")
            .cast("bigint").alias("covered_secs"),
        )
        .orderBy("user_id")
    )


@query(
    "event_cohort_ltv_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '2024-01-01',
                  CAST(MIN(ts) AS DATE)) // 7 AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', DATE '2024-01-01',
                  CAST(e.ts AS DATE)) // 7 AS BIGINT)
               - f.cohort_week AS age_weeks,
             CAST(ROUND(e.value * 100, 0) AS BIGINT) AS cents
      FROM events e JOIN firsts f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
    ),
    weekly AS (
      SELECT cohort_week, age_weeks,
             CAST(SUM(cents) AS BIGINT) AS week_cents
      FROM rev GROUP BY cohort_week, age_weeks
    )
    SELECT cohort_week, age_weeks, week_cents,
           CAST(SUM(week_cents) OVER (
             PARTITION BY cohort_week ORDER BY age_weeks
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_ltv_cents
    FROM weekly
    ORDER BY cohort_week, age_weeks
    """,
    tags=("timeseries", "analysis", "events"),
)
def event_cohort_ltv_curve(spark: SparkSession, sf: str) -> DataFrame:
    """Cohort LTV curves — the growth-analytics companion of
    event_retention_cohorts: users cohorted by first-seen week,
    purchase revenue accumulated by cohort age, the running total being
    the lifetime-value curve whose plateau finance teams read payback
    periods from. All integer cents; week arithmetic is integer day
    division against a fixed epoch so both engines bucket identically.

    Scale: first-seen is one user-keyed aggregate; revenue rows join to
    it user-keyed (broadcast-able once cohorts are materialized); the
    curve itself is a running sum over (cohort, age) AGGREGATES —
    cohorts x ages rows, thousands at most, regardless of corpus size.
    """
    e = table(spark, sf, "events")
    week = lambda c: F.expr(  # noqa: E731
        f"CAST(datediff({c}, DATE '2024-01-01') div 7 AS BIGINT)"
    )
    firsts = e.groupBy("user_id").agg(
        week("CAST(MIN(ts) AS DATE)").alias("cohort_week")
    )
    rev = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "cohort_week",
            (week("CAST(ts AS DATE)") - F.col("cohort_week"))
            .alias("age_weeks"),
            cents(F.col("value")).alias("cents"),
        )
    )
    weekly = rev.groupBy("cohort_week", "age_weeks").agg(
        F.sum("cents").cast("bigint").alias("week_cents")
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return weekly.select(
        "cohort_week", "age_weeks", "week_cents",
        F.sum("week_cents").over(w).cast("bigint").alias("cum_ltv_cents"),
    ).orderBy("cohort_week", "age_weeks")


@query(
    "event_power_user_curve",
    oracle="""
    WITH active AS (
      SELECT user_id,
             CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                 AS active_days
      FROM events
      WHERE ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-29'
      GROUP BY user_id
    )
    SELECT active_days,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM active
    GROUP BY active_days
    ORDER BY active_days
    """,
    tags=("timeseries", "events", "analysis"),
)
def event_power_user_curve(spark: SparkSession, sf: str) -> DataFrame:
    """The L28 power-user curve (Facebook's engagement-depth fingerprint):
    how many users were active exactly k of the 28 days of January —
    the histogram whose right-hand mass distinguishes habit products
    from drive-by traffic, and the distribution DAU/MAU collapses to a
    single ratio.

    Scale: active-days is one user-keyed distinct-date aggregate
    (map-side combinable after the (user, date) dedup); the curve is a
    28-bucket rollup of user-level rows. Linear in events, constant
    output.
    """
    e = table(spark, sf, "events")
    active = (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-01").cast("timestamp_ntz")
             .cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-29").cast("timestamp_ntz")
               .cast("timestamp"))
        )
        .groupBy("user_id")
        .agg(
            F.countDistinct(F.col("ts").cast("date")).cast("bigint")
            .alias("active_days")
        )
    )
    return (
        active.groupBy("active_days")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("active_days")
    )


@query(
    "window_max_drawdown",
    oracle="""
    WITH cum AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      FROM events
    ),
    peaks AS (
      SELECT user_id, event_id, cum_cents,
             CAST(MAX(cum_cents) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS peak_cents
      FROM cum
    )
    SELECT user_id,
           CAST(MAX(peak_cents - cum_cents) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak_cents) AS BIGINT) AS peak_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM peaks
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("timeseries", "window", "analysis"),
)
def window_max_drawdown(spark: SparkSession, sf: str) -> DataFrame:
    """Maximum drawdown per user — the finance risk analytic (largest
    peak-to-trough fall of the cumulative value series), computed as
    nested running windows: cumulative sum, then its running maximum,
    then MAX(peak − current). The three-layer composition is the test:
    engines disagree on window-over-window semantics far more often
    than on single windows.

    Exactness: everything is int64 cents; BOTH running windows order by
    (ts, event_id) — the same total order, no tie ambiguity, and the
    peak provably walks the sequence the cumulative sum produced even
    if event ids are not time-ordered.

    Scale: both windows and the final aggregate share the user_id
    partition key — ONE shuffle, bounded running state, the
    event_sessionization_gap plan family.
    """
    e = table(spark, sf, "events")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = e.select(
        "user_id", "ts", "event_id",
        F.sum(cents(F.col("value"))).over(w_cum).cast("bigint")
        .alias("cum_cents"),
    )
    # The peak window MUST walk the same (ts, event_id) sequence as the
    # cumulative sum: ordering by event_id alone is only equivalent
    # while event ids happen to be time-ordered, and the oracle mirrors
    # whatever we write, so the hash check could not catch the drift.
    w_peak = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peaks = cum.select(
        "user_id", "event_id", "cum_cents",
        F.max("cum_cents").over(w_peak).cast("bigint").alias("peak_cents"),
    )
    return (
        peaks.groupBy("user_id")
        .agg(
            F.max(F.col("peak_cents") - F.col("cum_cents")).cast("bigint")
            .alias("max_drawdown_cents"),
            F.max("peak_cents").cast("bigint").alias("peak_cents"),
            F.count("*").cast("bigint").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "event_error_budget_burn",
    oracle="""
    WITH hourly AS (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS window_start,
             CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_errors
      FROM events
      GROUP BY date_trunc('hour', ts)
    )
    SELECT window_start, n_total, n_errors,
           CAST(1000000 * n_errors // n_total AS BIGINT) AS error_ppm,
           CAST(1000000 * n_errors // n_total AS BIGINT)
               > 10 * 50000 AS burn_10x
    FROM hourly
    WHERE CAST(1000000 * n_errors // n_total AS BIGINT) > 2 * 50000
    ORDER BY window_start
    """,
    tags=("timeseries", "quality", "analysis"),
)
def event_error_budget_burn(spark: SparkSession, sf: str) -> DataFrame:
    """SLO error-budget burn-rate alerting (the Google SRE multiwindow
    recipe): hourly error fractions in integer ppm against a 5% SLO
    budget (50000 ppm); hours burning >2x budget surface as alerts,
    with the >10x fast-burn flag that pages instead of tickets.

    Exactness: burn thresholds compare integer ppm (1e6·errors div
    total) — no float ratio crosses the engine boundary or the alert
    threshold. Scale: one tumbling-window aggregate, map-side
    combinable; alerting at 100 TB of events is the same plan with a
    streaming twin (tw_tumbling's shape + this WHERE)."""
    e = table(spark, sf, "events")
    hourly = (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("w"))
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint").alias("n_errors"),
        )
    )
    ppm = F.expr("1000000 * n_errors div n_total").cast("bigint")
    return (
        hourly.select(
            ts_str(F.col("w")).alias("window_start"),
            "n_total",
            "n_errors",
            ppm.alias("error_ppm"),
            (ppm > 10 * 50000).alias("burn_10x"),
        )
        .filter(F.col("error_ppm") > 2 * 50000)
        .orderBy("window_start")
    )


@query(
    "event_survival_kaplan_meier",
    oracle="""
    WITH surface AS (
      SELECT * FROM events
      WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    horizon AS (
      SELECT MAX(ts) AS h FROM surface
    ),
    per_user AS (
      SELECT user_id,
             CAST(date_diff('day', MIN(ts), MAX(ts)) AS BIGINT)
                 AS dur_days,
             CASE WHEN MAX(ts) < (SELECT h FROM horizon)
                                  - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS churned
      FROM surface GROUP BY user_id
    ),
    days AS (
      SELECT dur_days,
             CAST(SUM(churned) AS BIGINT) AS deaths,
             CAST(COUNT(*) AS BIGINT) AS leavers
      FROM per_user GROUP BY dur_days
    ),
    risk AS (
      SELECT dur_days, deaths, leavers,
             CAST((SELECT COUNT(*) FROM per_user) AS BIGINT)
             - CAST(COALESCE(SUM(leavers) OVER (
                   ORDER BY dur_days
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                 0) AS BIGINT) AS at_risk
      FROM days
    ),
    q AS (
      SELECT dur_days, deaths, leavers, at_risk,
             CASE WHEN deaths = 0 THEN 0
                  WHEN deaths < at_risk
                  THEN CAST(ROUND(1000000 * ln(
                       CAST(at_risk - deaths AS DOUBLE) / at_risk), 0)
                       AS BIGINT)
                  ELSE 0 END AS q_micro,
             CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END AS hit_zero
      FROM risk
    ),
    cum AS (
      SELECT dur_days, deaths, leavers, at_risk,
             CAST(SUM(q_micro) OVER (
                 ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cq,
             CAST(SUM(hit_zero) OVER (
                 ORDER BY dur_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS zeros
      FROM q
    )
    SELECT dur_days, at_risk, deaths,
           CAST(leavers - deaths AS BIGINT) AS censored,
           CASE WHEN zeros > 0 THEN 0.0
                ELSE ROUND(exp(CAST(cq AS DOUBLE) / 1000000), 4)
           END AS survival
    FROM cum
    ORDER BY dur_days
    """,
    tags=("timeseries", "stats", "analysis"),
)
def event_survival_kaplan_meier(spark: SparkSession, sf: str) -> DataFrame:
    """Kaplan-Meier survival curve of user lifetime (days between first
    and last activity), right-censoring users still active in the final
    7 days before the capture horizon — the churn-analysis staple that
    naive retention ratios get wrong because they count the
    still-active as churned. Emits the full life table: at-risk set,
    deaths (churn events), censored exits, and S(t).

    Determinism: the product estimator is computed as
    exp(sum of per-day ln factors), with each factor ln((r-d)/r)
    quantized to int64 MICRO-nats at its (exact-integer) day row — the
    running accumulation is an integer sum, so no float aggregation
    order exists; if any day's deaths exhaust the at-risk set the
    survival is pinned to exact 0 from that day on (cumulative
    hit-zero flag) rather than exp(-inf).

    Scale: one user-keyed aggregate builds lifetimes; the life table
    is day-keyed (bounded domain: distinct lifetime days, <= the
    capture span), so its running windows are bounded-input by
    construction — partitioned on a column-derived constant
    (pmod(dur_days,1)) to keep the no-global-window plan invariant
    checkable. The 1-row horizon and user-count scalars broadcast.

    r14 contract: NULL-ts events are excluded (time_surface, rule 10 —
    a lifetime is a ts interval) and so are NULL user_ids (a survival
    subject needs an identity; with NULLs in, Spark's countDistinct
    skips the NULL-user group the oracle's COUNT(*) counts, silently
    shifting every at_risk value).

    r14 optimization (guide §2.4): the horizon scalars ride the per-user
    aggregate instead of a second full events scan — MAX(last_ts) over
    users IS the global MAX(ts) (every surviving event belongs to some
    user once NULL user_ids are excluded), and COUNT(*) of user groups
    IS COUNT(DISTINCT user_id). Both branches now hang off the one
    user_id exchange, which AQE reuses at runtime: 2 events scans -> 1.
    """
    e = time_surface(table(spark, sf, "events")).filter(
        F.col("user_id").isNotNull())
    lifetimes = e.groupBy("user_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    # greatest(last, first) == last (min <= max within a group, ts
    # non-null on the surface) — the first_ts reference exists ONLY to
    # keep this branch's lifetimes subtree identical to per_user's
    # (column pruning would otherwise drop first_ts here, and a pruned
    # subtree cannot reuse the user_id exchange — that re-ran the scan).
    horizon = lifetimes.agg(
        F.max(F.greatest("last_ts", "first_ts")).alias("h"),
        F.count("*").cast("bigint").alias("n_users"),
    )
    per_user = (
        lifetimes
        .crossJoin(F.broadcast(horizon))
        .select(
            F.datediff(F.col("last_ts"), F.col("first_ts"))
            .cast("bigint").alias("dur_days"),
            F.when(
                F.col("last_ts") < F.col("h") - F.expr("INTERVAL 7 DAYS"),
                F.lit(1),
            ).otherwise(F.lit(0)).alias("churned"),
            "n_users",
        )
    )
    days = per_user.groupBy("dur_days", "n_users").agg(
        F.sum("churned").cast("bigint").alias("deaths"),
        F.count("*").cast("bigint").alias("leavers"),
    )
    w_prev = (
        Window.partitionBy(F.pmod(F.col("dur_days"), F.lit(1)))
        .orderBy("dur_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(F.pmod(F.col("dur_days"), F.lit(1)))
        .orderBy("dur_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = days.withColumn(
        "at_risk",
        (F.col("n_users")
         - F.coalesce(F.sum("leavers").over(w_prev), F.lit(0)))
        .cast("bigint"),
    )
    q = risk.select(
        "dur_days", "deaths", "leavers", "at_risk",
        F.when(F.col("deaths") == 0, F.lit(0).cast("bigint"))
        .when(
            F.col("deaths") < F.col("at_risk"),
            F.round(
                F.lit(1000000)
                * F.log(
                    (F.col("at_risk") - F.col("deaths")).cast("double")
                    / F.col("at_risk")
                ),
                0,
            ).cast("bigint"),
        )
        .otherwise(F.lit(0).cast("bigint")).alias("q_micro"),
        F.when(F.col("deaths") >= F.col("at_risk"), F.lit(1))
        .otherwise(F.lit(0)).alias("hit_zero"),
    )
    cum = q.select(
        "dur_days", "deaths", "leavers", "at_risk",
        F.sum("q_micro").over(w_cum).cast("bigint").alias("cq"),
        F.sum("hit_zero").over(w_cum).cast("bigint").alias("zeros"),
    )
    return cum.select(
        "dur_days", "at_risk", "deaths",
        (F.col("leavers") - F.col("deaths")).cast("bigint")
        .alias("censored"),
        F.when(F.col("zeros") > 0, F.lit(0.0))
        .otherwise(F.round(F.exp(F.col("cq").cast("double") / 1000000), 4))
        .alias("survival"),
    ).orderBy("dur_days")


@query(
    "window_trailing_interval",
    oracle="""
    SELECT user_id, event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_1h,
           CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w
               AS BIGINT) AS cents_1h
    FROM events
    WHERE user_id % 97 = 0
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts
      RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    """,
    tags=("timeseries", "window", "frames"),
)
def window_trailing_interval(spark: SparkSession, sf: str) -> DataFrame:
    """Event-TIME range frame: each event's trailing 1-hour activity
    (count + spend) per user — RANGE BETWEEN INTERVAL, the frame type
    ROWS BETWEEN cannot express when events are irregularly spaced
    (row counts measure events, not elapsed time). The rate-limiting /
    velocity-check primitive for fraud and abuse scoring.

    Spark has no INTERVAL range frames on timestamps directly; the
    rewrite orders the window by unix_micros(ts) with a numeric
    rangeBetween of [-3.6e9, 0] microseconds — semantically identical,
    including the RANGE peer rule (equal-ts rows share one frame, which
    is why the oracle's INTERVAL frame matches exactly).

    Scale: one user_id-keyed shuffle; frame state per task is the
    running deque of the trailing hour. The user_id % 97 filter keeps
    the verified output focused; at 100 TB the same plan serves all
    users (the filter is pushed to the scan either way).
    """
    e = table(spark, sf, "events").filter(F.col("user_id") % 97 == 0)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "user_id", "event_id", "ts",
            ts_str(F.col("ts")).alias("ts_s"),
            cents(F.col("value")).alias("v"),
        )
        .select(
            "user_id", "event_id", "ts", "ts_s",
            F.count("*").over(w).cast("bigint").alias("n_1h"),
            F.sum("v").over(w).cast("bigint").alias("cents_1h"),
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


@query(
    "forecast_holt_linear",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL
      GROUP BY event_type, CAST(ts AS DATE)
    ),
    idx AS (
      SELECT event_type, cents,
             CAST(row_number() OVER (
                 PARTITION BY event_type ORDER BY d) AS BIGINT) AS i
      FROM daily
    ),
    -- the Holt recurrence as a recursive CTE, one row per (type, step).
    -- NOT list_reduce: DuckDB 1.0 mis-evaluates struct accumulators
    -- whose lambda repeats a subexpression (the l-halving appears in
    -- both fields), silently producing a wrong fold.
    hw AS (
      SELECT event_type, i, cents AS l, CAST(0 AS BIGINT) AS t
      FROM idx WHERE i = 1
      UNION ALL
      SELECT d.event_type, d.i,
             (d.cents + h.l + h.t) // 2 AS l,
             (h.t + ((d.cents + h.l + h.t) // 2) - h.l) // 2 AS t
      FROM hw h JOIN idx d
        ON d.event_type = h.event_type AND d.i = h.i + 1
    ),
    final AS (
      SELECT event_type, i AS n_days, l, t,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY i DESC) AS rl
      FROM hw
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(l AS BIGINT) AS level_cents,
           CAST(t AS BIGINT) AS trend_cents,
           CAST(l + t AS BIGINT) AS forecast_1d,
           CAST(l + 2 * t AS BIGINT) AS forecast_2d,
           CAST(l + 3 * t AS BIGINT) AS forecast_3d
    FROM final WHERE rl = 1
    ORDER BY event_type
    """,
    tags=("timeseries", "forecast", "stats"),
)
def forecast_holt_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Holt's linear-trend forecast (double exponential smoothing,
    alpha=beta=1/2) of daily revenue per event type, with 1/2/3-day-ahead
    projections — the capacity-planning staple one step past EWMA
    (window_ewma smooths level only; Holt also tracks trend, so a
    steadily growing series is not forecast flat).

    The recurrence folds ONCE over each type's day-ordered totals via
    the aggregate() HOF — no self-join per step, no window per lag.
    Integer-exactness: alpha=1/2 makes every smoothing step an integer
    halving; Spark's `div` and DuckDB's `//` BOTH truncate toward zero
    (measured: (-3)//2 = -1 in DuckDB 1.0 — it does NOT floor), so the
    engines walk identical int64 states even through negative trends.
    The oracle replays the fold as a recursive CTE because DuckDB 1.0's
    list_reduce mis-evaluates struct accumulators whose lambda repeats
    a subexpression.

    Scale: one (type, day)-keyed aggregate, then one type-keyed fold
    whose state is 2 ints; series length is bounded by the calendar,
    not the corpus. Day gaps count as consecutive steps (documented —
    resample_gapfill is the upstream fix when calendar spacing
    matters). NULL-ts events are excluded on both engines
    (time_surface, rule 10 — the fold is day-ordered and the engines
    disagree on where a NULL day sorts). NULL event_types are excluded
    too: a per-type fold needs a type key — the oracle's recursive CTE
    cannot follow a NULL join key while the aggregate() HOF folds it.
    """
    e = time_surface(table(spark, sf, "events")).filter(
        F.col("event_type").isNotNull())
    daily = (
        e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("cents"))
    )
    series = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sort_array(F.collect_list(F.struct("d", "cents"))).alias("pts"),
    )
    fitted = series.withColumn(
        "st",
        F.expr(
            """
            aggregate(
              pts,
              named_struct('l', CAST(0 AS BIGINT), 't', CAST(0 AS BIGINT),
                           'n', CAST(0 AS BIGINT)),
              (acc, x) -> CASE WHEN acc.n = 0
                THEN named_struct('l', x.cents, 't', CAST(0 AS BIGINT),
                                  'n', CAST(1 AS BIGINT))
                ELSE named_struct(
                  'l', (x.cents + acc.l + acc.t) div 2,
                  't', (acc.t
                         + ((x.cents + acc.l + acc.t) div 2)
                         - acc.l) div 2,
                  'n', acc.n + 1) END
            )
            """
        ),
    )
    return fitted.select(
        "event_type", "n_days",
        F.col("st.l").cast("bigint").alias("level_cents"),
        F.col("st.t").cast("bigint").alias("trend_cents"),
        (F.col("st.l") + F.col("st.t")).cast("bigint").alias("forecast_1d"),
        (F.col("st.l") + 2 * F.col("st.t")).cast("bigint")
        .alias("forecast_2d"),
        (F.col("st.l") + 3 * F.col("st.t")).cast("bigint")
        .alias("forecast_3d"),
    ).orderBy("event_type")


@query(
    "event_pattern_three_rises",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             LAG(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w AS prev
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev IS NOT NULL AND cents > prev
                  THEN 0 ELSE 1 END AS brk
      FROM seq
    ),
    runs AS (
      SELECT user_id,
             CAST(SUM(brk) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run_id
      FROM flagged
    ),
    run_lens AS (
      SELECT user_id, run_id, CAST(COUNT(*) AS BIGINT) AS run_rows
      FROM runs GROUP BY user_id, run_id
    )
    SELECT CAST(COUNT(*) FILTER (WHERE run_rows >= 4) AS BIGINT)
               AS n_patterns,
           CAST(COUNT(DISTINCT CASE WHEN run_rows >= 4 THEN user_id END)
               AS BIGINT) AS n_users,
           CAST(MAX(run_rows) AS BIGINT) AS longest_run_rows
    FROM run_lens
    """,
    tags=("timeseries", "pattern", "window"),
)
def event_pattern_three_rises(spark: SparkSession, sf: str) -> DataFrame:
    """Row-pattern detection (the MATCH_RECOGNIZE A B+ case Spark has
    no native operator for, re-expressed as windows): maximal runs of
    STRICTLY RISING spend per user in event-time order; a 'pattern' is
    3+ consecutive rises (4+ rows) — the escalation signature fraud and
    engagement teams both scan for.

    Rewrite: lag -> break flag -> running-sum run ids -> per-run length
    (the gaps-and-islands family, same plan as
    event_sessionization_gap); every window shares ONE user_id shuffle
    and the run rollup rides it too. Exact integer cents comparisons,
    unique (ts, event_id) tiebreak.
    """
    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seq = e.select(
        "user_id", "ts", "event_id",
        cents(F.col("value")).alias("cents"),
    ).withColumn("prev", F.lag("cents").over(w))
    flagged = seq.withColumn(
        "brk",
        F.when(
            F.col("prev").isNotNull() & (F.col("cents") > F.col("prev")),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    runs = flagged.withColumn(
        "run_id", F.sum("brk").over(w_run).cast("bigint")
    )
    run_lens = runs.groupBy("user_id", "run_id").agg(
        F.count("*").cast("bigint").alias("run_rows")
    )
    return run_lens.agg(
        F.sum(F.when(F.col("run_rows") >= 4, 1).otherwise(0))
        .cast("bigint").alias("n_patterns"),
        F.countDistinct(
            F.when(F.col("run_rows") >= 4, F.col("user_id"))
        ).cast("bigint").alias("n_users"),
        F.max("run_rows").cast("bigint").alias("longest_run_rows"),
    )


@query(
    "forecast_backtest_seasonal_naive",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    joined AS (
      SELECT a.event_type, a.d, a.cents,
             b.cents AS pred_weekly,
             c.cents AS pred_daily
      FROM daily a
      LEFT JOIN daily b ON b.event_type = a.event_type
                        AND b.d = a.d - INTERVAL 7 DAY
      LEFT JOIN daily c ON c.event_type = a.event_type
                        AND c.d = a.d - INTERVAL 1 DAY
      WHERE b.cents IS NOT NULL AND c.cents IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days_scored,
           CAST(SUM(ABS(cents - pred_weekly)) AS BIGINT)
               AS mae_weekly_cents_sum,
           CAST(SUM(ABS(cents - pred_daily)) AS BIGINT)
               AS mae_daily_cents_sum,
           SUM(ABS(cents - pred_weekly)) < SUM(ABS(cents - pred_daily))
               AS weekly_wins
    FROM joined
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("timeseries", "forecast", "stats"),
)
def forecast_backtest_seasonal_naive(spark: SparkSession, sf: str) -> DataFrame:
    """Forecast BACKTEST: score the two classic naive baselines against
    each other on held-out history — predict each day's revenue by the
    value 7 days earlier (seasonal naive) vs 1 day earlier (naive) and
    compare total absolute error per event type. Every forecasting
    effort starts here: a model that can't beat the seasonal-naive MAE
    doesn't ship, so the baseline table IS the evaluation harness
    (forecast_holt_linear's fold plugs into the same scoring join).

    Exactness: daily totals are integer cents; the predictions are
    prior rows joined by calendar arithmetic (no smoothing, no
    floats); MAE is kept as an exact integer SUM of absolute errors
    (days-scored count published so callers can divide).

    Scale: scoring is one in-row unpivot of the (type, day) rollup +
    one keyed regroup — a calendar-sized shuffle; the corpus-sized
    work is the single daily aggregate.

    r15 OPTIMIZATION (guide §2.4): the two scoring self-joins consumed
    the daily rollup three times with different shifted-day
    projections and inferred join filters, so events scanned 3x at
    runtime. Each daily row now EXPLODES into its three roles —
    (d, actual), (d+7, weekly prediction), (d+1, daily prediction) —
    and one (type, day) regroup recovers the triple with conditional
    MAX (each role appears at most once per key: daily is keyed by
    (type, d) and the calendar shifts are injective). Rows where all
    three roles are present reproduce the double INNER join exactly:
    3 scans -> 1, joins 2 -> 0.
    """
    e = table(spark, sf, "events")
    daily = (
        e.groupBy(
            "event_type", F.col("ts").cast("date").alias("d")
        )
        .agg(F.sum(cents(F.col("value"))).cast("bigint").alias("cents"))
    )
    roles = daily.select(
        "event_type", "cents",
        F.inline(F.array(
            F.struct(F.col("d").alias("sd"), F.lit(0).alias("role")),
            F.struct(F.date_add("d", 7).alias("sd"), F.lit(1).alias("role")),
            F.struct(F.date_add("d", 1).alias("sd"), F.lit(2).alias("role")),
        )),
    )
    # presence flags, NOT value non-nullness: a day whose SUM is NULL
    # (all-NULL values) still joined in the original; and the original
    # equi-joins never matched NULL keys, so NULL event_type / NULL day
    # groups are dropped explicitly.
    scored = (
        roles.filter(F.col("event_type").isNotNull()
                     & F.col("sd").isNotNull())
        .groupBy("event_type", "sd")
        .agg(
            F.max(F.when(F.col("role") == 0, F.col("cents")))
            .alias("cents"),
            F.max(F.when(F.col("role") == 1, F.col("cents")))
            .alias("pred_weekly"),
            F.max(F.when(F.col("role") == 2, F.col("cents")))
            .alias("pred_daily"),
            *[F.max(F.when(F.col("role") == r, 1)).alias(f"p{r}")
              for r in (0, 1, 2)],
        )
        .filter((F.col("p0") == 1) & (F.col("p1") == 1)
                & (F.col("p2") == 1))
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days_scored"),
            F.sum(F.abs(F.col("cents") - F.col("pred_weekly")))
            .cast("bigint").alias("mae_weekly_cents_sum"),
            F.sum(F.abs(F.col("cents") - F.col("pred_daily")))
            .cast("bigint").alias("mae_daily_cents_sum"),
            (
                F.sum(F.abs(F.col("cents") - F.col("pred_weekly")))
                < F.sum(F.abs(F.col("cents") - F.col("pred_daily")))
            ).alias("weekly_wins"),
        )
        .orderBy("event_type")
    )


@query(
    "window_candlestick_ohlc",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                 AS bar_start,
             ts, event_id,
             CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    ordered AS (
      SELECT event_type, bar_start, cents,
             row_number() OVER w AS rn_open,
             row_number() OVER (PARTITION BY event_type, bar_start
                                ORDER BY ts DESC, event_id DESC)
                 AS rn_close
      FROM pts
      WINDOW w AS (PARTITION BY event_type, bar_start
                   ORDER BY ts, event_id)
    )
    SELECT bar_start,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(MIN(CASE WHEN rn_open = 1 THEN cents END) AS BIGINT)
               AS open_cents,
           CAST(MAX(cents) AS BIGINT) AS high_cents,
           CAST(MIN(cents) AS BIGINT) AS low_cents,
           CAST(MIN(CASE WHEN rn_close = 1 THEN cents END) AS BIGINT)
               AS close_cents
    FROM ordered
    GROUP BY bar_start
    ORDER BY bar_start
    LIMIT 50
    """,
    tags=("timeseries", "window", "analysis"),
)
def window_candlestick_ohlc(spark: SparkSession, sf: str) -> DataFrame:
    """OHLC candlestick bars: hourly open/high/low/close of purchase
    value — the market-data downsampling shape (resample_m4_downsample
    keeps error-free extremes for PLOTTING; OHLC keeps the
    open/close semantics finance tooling expects).

    Open and close are first/last BY EVENT TIME with the unique
    (ts, event_id) tiebreak — computed as rank-1 rows of two
    per-bar windows sharing ONE (type, hour)-keyed shuffle with the
    high/low/count aggregate. All values exact integer cents.
    """
    e = table(spark, sf, "events").filter(
        F.col("event_type") == "purchase")
    pts = e.select(
        ts_str(F.date_trunc("hour", F.col("ts"))).alias("bar_start"),
        "ts", "event_id",
        cents(F.col("value")).alias("cents"),
    )
    w_open = Window.partitionBy("bar_start").orderBy("ts", "event_id")
    w_close = Window.partitionBy("bar_start").orderBy(
        F.desc("ts"), F.desc("event_id"))
    ordered = pts.select(
        "bar_start", "cents",
        F.row_number().over(w_open).alias("rn_open"),
        F.row_number().over(w_close).alias("rn_close"),
    )
    return (
        ordered.groupBy("bar_start")
        .agg(
            F.count("*").cast("bigint").alias("n_trades"),
            F.min(F.when(F.col("rn_open") == 1, F.col("cents")))
            .cast("bigint").alias("open_cents"),
            F.max("cents").cast("bigint").alias("high_cents"),
            F.min("cents").cast("bigint").alias("low_cents"),
            F.min(F.when(F.col("rn_close") == 1, F.col("cents")))
            .cast("bigint").alias("close_cents"),
        )
        .orderBy("bar_start")
        .limit(50)
    )


@query(
    "event_ab_did",
    oracle="""
    WITH bounds AS (
        SELECT (epoch_us(CAST(MIN(ts) AS TIMESTAMP))
                + epoch_us(CAST(MAX(ts) AS TIMESTAMP))) // 2 AS mid
        FROM events
    ),
    cells AS (
        SELECT CASE WHEN (('0x' || substr(md5('exp7:' ||
                        CAST(user_id AS VARCHAR)), 1, 15))::BIGINT) % 2 = 0
                    THEN 'control' ELSE 'treatment' END AS arm,
               CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                        >= (SELECT mid FROM bounds)
                    THEN 'post' ELSE 'pre' END AS period,
               user_id,
               CASE WHEN event_type = 'purchase'
                    THEN CAST(ROUND(value * 100, 0) AS BIGINT)
                    ELSE 0 END AS cents
        FROM events
    ),
    agg AS (
        SELECT arm, period,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(SUM(cents) AS BIGINT) AS cents
        FROM cells GROUP BY arm, period
    ),
    m AS (
        SELECT arm, period, n_users,
               CAST(10000 * cents // n_users AS BIGINT) AS mean_microcents
        FROM agg
    )
    SELECT
        CAST(SUM(CASE WHEN arm = 'control' AND period = 'pre'
                 THEN n_users END) AS BIGINT) AS n_ctrl_pre,
        CAST(SUM(CASE WHEN arm = 'control' AND period = 'post'
                 THEN n_users END) AS BIGINT) AS n_ctrl_post,
        CAST(SUM(CASE WHEN arm = 'treatment' AND period = 'pre'
                 THEN n_users END) AS BIGINT) AS n_treat_pre,
        CAST(SUM(CASE WHEN arm = 'treatment' AND period = 'post'
                 THEN n_users END) AS BIGINT) AS n_treat_post,
        CAST(SUM(CASE WHEN arm = 'control' AND period = 'pre'
                 THEN mean_microcents END) AS BIGINT) AS mean_ctrl_pre,
        CAST(SUM(CASE WHEN arm = 'control' AND period = 'post'
                 THEN mean_microcents END) AS BIGINT) AS mean_ctrl_post,
        CAST(SUM(CASE WHEN arm = 'treatment' AND period = 'pre'
                 THEN mean_microcents END) AS BIGINT) AS mean_treat_pre,
        CAST(SUM(CASE WHEN arm = 'treatment' AND period = 'post'
                 THEN mean_microcents END) AS BIGINT) AS mean_treat_post,
        CAST(SUM(CASE WHEN arm = 'treatment' AND period = 'post'
                 THEN mean_microcents END)
           - SUM(CASE WHEN arm = 'treatment' AND period = 'pre'
                 THEN mean_microcents END)
           - (SUM(CASE WHEN arm = 'control' AND period = 'post'
                  THEN mean_microcents END)
              - SUM(CASE WHEN arm = 'control' AND period = 'pre'
                    THEN mean_microcents END)) AS BIGINT) AS did_microcents
    FROM m
    """,
    tags=("events", "experiment", "stats"),
)
def event_ab_did(spark: SparkSession, sf: str) -> DataFrame:
    """Difference-in-differences experiment readout — the causal
    completion of the A/B family (event_ab_test_lift's raw lift,
    event_cuped_adjustment's variance reduction, event_ab_srm_check's
    validity gate): per-user revenue means in a 2x2 (arm x pre/post)
    grid, with the DiD estimator (treat_post - treat_pre) -
    (ctrl_post - ctrl_pre) netting out the shared time trend a naive
    post-only comparison absorbs into the effect.

    Arms are the family's shared salted-md5 user buckets; the pre/post
    cut is the integer midpoint of the observed time range (epoch
    microseconds, truncating div — both engines), so late-arriving
    data moves no user between cells. Cell means are exact integer
    microcents (10000 * cents div active users — rule 4/6 truncating
    div), so the DiD is a pure int64 expression with no float crossing
    the engine boundary.

    Scale: one narrow map derives (arm, period, cents) per event, one
    (arm, period, user)-keyed distinct-ish aggregate, then a 4-row
    rollup folded to one row by conditional aggregation — the global
    aggregate is over FOUR rows, not the event stream (no global
    window). The time bounds are one combinable min/max pass.
    """
    e = table(spark, sf, "events")
    # ts may be TIMESTAMP_NTZ (driver-round dependent); the UTC-pinned
    # session makes the ltz cast the same wall-clock instant the oracle's
    # naive-as-UTC epoch_us sees.
    ets = F.col("ts").cast("timestamp")
    bounds = e.agg(
        (F.unix_micros(F.min(ets)) + F.unix_micros(F.max(ets)))
        .alias("span_us")
    ).select(F.expr("span_us div 2").cast("bigint").alias("mid"))
    arm = F.when(
        F.expr("CAST(conv(substring(md5(concat('exp7:', "
               "CAST(user_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
        % 2 == 0,
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    cells = e.join(F.broadcast(bounds)).select(
        arm.alias("arm"),
        F.when(F.unix_micros(ets) >= F.col("mid"), F.lit("post"))
        .otherwise(F.lit("pre")).alias("period"),
        "user_id",
        F.when(F.col("event_type") == "purchase", cents(F.col("value")))
        .otherwise(F.lit(0)).cast("bigint").alias("cents"),
    )
    m = (
        cells.groupBy("arm", "period")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .select(
            "arm", "period", "n_users",
            F.expr("10000 * cents div n_users").cast("bigint")
            .alias("mean_microcents"),
        )
    )

    def cell(col, a, p):
        return F.sum(
            F.when((F.col("arm") == a) & (F.col("period") == p),
                   F.col(col))
        ).cast("bigint")

    return m.agg(
        cell("n_users", "control", "pre").alias("n_ctrl_pre"),
        cell("n_users", "control", "post").alias("n_ctrl_post"),
        cell("n_users", "treatment", "pre").alias("n_treat_pre"),
        cell("n_users", "treatment", "post").alias("n_treat_post"),
        cell("mean_microcents", "control", "pre").alias("mean_ctrl_pre"),
        cell("mean_microcents", "control", "post").alias("mean_ctrl_post"),
        cell("mean_microcents", "treatment", "pre").alias("mean_treat_pre"),
        cell("mean_microcents", "treatment", "post")
        .alias("mean_treat_post"),
        (
            cell("mean_microcents", "treatment", "post")
            - cell("mean_microcents", "treatment", "pre")
            - (cell("mean_microcents", "control", "post")
               - cell("mean_microcents", "control", "pre"))
        ).cast("bigint").alias("did_microcents"),
    )
