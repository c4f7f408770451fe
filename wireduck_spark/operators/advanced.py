"""Advanced relational surface (SURVEY.md §2 Tier B completions): correlated
subqueries (EXISTS / IN / scalar), CTEs, PIVOT / UNPIVOT, ordered string/
array aggregation, latest-row-per-key (QUALIFY pattern), percent_rank /
cume_dist, and gap-filled resampling.

All host-delegated operators in the reference (DuckDB executes them over
read_pcap output); here each is stock Spark SQL / DataFrame API with a
DuckDB oracle twin. SQL-text queries use spark.sql's DataFrame template
args ({li} etc.) so no temp-view registration leaks across sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wireduck_spark.registry import (
    cents, query, table, time_surface, ts_str,
)

SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


@query(
    "subquery_exists_in",
    oracle="""
    SELECT c.c_custkey, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
      AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                            WHERE n_regionkey <= 2)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderstatus = 'P')
    """,
    tags=("subquery",),
)
def subquery_exists_in(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated EXISTS + uncorrelated IN + NOT EXISTS.

    Scale: Catalyst rewrites EXISTS/IN into left-semi joins and NOT EXISTS
    into a left-anti join — same physical shape as the explicit semi/anti
    queries, so the subquery surface costs nothing extra at 100 TB.
    """
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    n = table(spark, sf, "nation")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_mktsegment
        FROM {c} c
        WHERE EXISTS (SELECT 1 FROM {o} o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 200000)
          AND c.c_nationkey IN (SELECT n_nationkey FROM {n}
                                WHERE n_regionkey <= 2)
          AND NOT EXISTS (SELECT 1 FROM {o} o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderstatus = 'P')
        """,
        c=c, o=o, n=n,
    )


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate (orders 1.9x pricier
    than the mean). Catalyst plans the subquery once and broadcasts the
    scalar.

    Fixture degeneracy (r11 zero-row-green audit): o_totalprice here is
    ~uniform on [1e3, 5e5] with mean ~2.5e5, so the original `> 2*avg`
    threshold sat exactly at the distribution's max — 0 rows at
    sf0.01/sf0.1 (2 knife-edge rows at sf0.001). 1.9x selects a stable
    ~1% tail at every scale (74/713/7,351 rows, probed). The predicate
    compares the same double product in both engines (one multiply of
    the broadcast scalar — identical IEEE tree).
    """
    o = table(spark, sf, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM {o}
        WHERE o_totalprice > 1.9 * (SELECT AVG(o_totalprice) FROM {o})
        """,
        o=o,
    )


@query(
    "cte_reuse",
    oracle="""
    WITH seg_stats AS (
        SELECT c_mktsegment AS seg, COUNT(*) AS n_cust,
               CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
                   AS bal_cents
        FROM customer GROUP BY c_mktsegment
    ),
    big AS (SELECT * FROM seg_stats WHERE n_cust > 100)
    SELECT a.seg, a.n_cust, a.bal_cents,
           CAST(a.n_cust - b.n_cust AS BIGINT) AS vs_building
    FROM big a CROSS JOIN (SELECT n_cust FROM seg_stats
                           WHERE seg = 'BUILDING') b
    """,
    tags=("cte",),
)
def cte_reuse(spark: SparkSession, sf: str) -> DataFrame:
    """WITH clause referenced twice (per-segment stats vs one segment's
    baseline). Spark resolves CTEs by inlining + optional reuse exchange."""
    c = table(spark, sf, "customer")
    return spark.sql(
        """
        WITH seg_stats AS (
            SELECT c_mktsegment AS seg, COUNT(*) AS n_cust,
                   CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT))
                        AS BIGINT) AS bal_cents
            FROM {c} GROUP BY c_mktsegment
        ),
        big AS (SELECT * FROM seg_stats WHERE n_cust > 100)
        SELECT a.seg, a.n_cust, a.bal_cents,
               CAST(a.n_cust - b.n_cust AS BIGINT) AS vs_building
        FROM big a CROSS JOIN (SELECT n_cust FROM seg_stats
                               WHERE seg = 'BUILDING') b
        """,
        c=c,
    )


@query(
    "pivot_segments",
    oracle=f"""
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           {", ".join(
               "CAST(COALESCE(SUM(CASE WHEN c_mktsegment = '" + s
               + "' THEN CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) END), 0)"
               " AS BIGINT) AS " + s.lower()
               for s in SEGMENTS)}
    FROM customer
    GROUP BY c_nationkey
    """,
    tags=("pivot",),
)
def pivot_segments(spark: SparkSession, sf: str) -> DataFrame:
    """PIVOT: account balance cents per nation x market segment.

    Scale: the explicit value list keeps pivot a single pass (no distinct
    scan to discover columns) — groupBy(nation).pivot(seg, [..]) is one
    shuffle, same as a plain aggregation.
    """
    c = table(spark, sf, "customer")
    out = (
        c.groupBy(F.col("c_nationkey").cast("bigint").alias("nationkey"))
        .pivot("c_mktsegment", list(SEGMENTS))
        .agg(F.sum(cents(F.col("c_acctbal"))))
    )
    return out.select(
        "nationkey",
        *[
            F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(s.lower())
            for s in SEGMENTS
        ],
    )


@query(
    "unpivot_melt",
    oracle="""
    WITH base AS (
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS price_cents,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs
        FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'n_orders' AS metric, CAST(n_orders AS BIGINT) AS v
        FROM base
    UNION ALL
    SELECT o_orderstatus, 'price_cents', price_cents FROM base
    UNION ALL
    SELECT o_orderstatus, 'n_custs', n_custs FROM base
    """,
    tags=("pivot",),
)
def unpivot_melt(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT/melt: wide per-status metrics -> (status, metric, value)
    long form — df.unpivot maps to Spark's Expand node (no shuffle)."""
    o = table(spark, sf, "orders")
    base = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.sum(cents(F.col("o_totalprice"))).alias("price_cents"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )
    return base.unpivot(
        ["o_orderstatus"], ["n_orders", "price_cents", "n_custs"],
        "metric", "v",
    )


@query(
    "agg_string_array",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           array_to_string(list_sort(list(n_name)), '|') AS nations_arr,
           CAST(len(list(n_name)) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("agg", "string"),
)
def agg_string_array(spark: SparkSession, sf: str) -> DataFrame:
    """Ordered string_agg / array_agg (sorted then joined so both engines
    agree regardless of aggregation order; arrays stringified for the
    driver's hasher)."""
    n = table(spark, sf, "nation")
    collected = F.sort_array(F.collect_list("n_name"))
    return n.groupBy("n_regionkey").agg(
        F.array_join(collected, ",").alias("nations_csv"),
        F.array_join(collected, "|").alias("nations_arr"),
        F.size(F.collect_list("n_name")).cast("bigint").alias("n"),
    )


@query(
    "latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
    tags=("window", "dedup"),
)
def latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """Latest event per user (QUALIFY row_number()=1 — THE workhorse dedup
    of CDC / snapshot pipelines).

    Scale: one shuffle on the key; Spark pushes the rn=1 filter into
    WindowExec as a running-limit (WindowGroupLimit) so each group stops
    after the first row instead of materializing all rows.
    """
    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type",
                ts_str(F.col("ts")).alias("ts_s"))
    )


@query(
    "window_percent_cume",
    oracle="""
    SELECT c_custkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(10) OVER w AS BIGINT) AS decile
    FROM customer
    WHERE c_acctbal IS NOT NULL
    WINDOW w AS (ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window",),
)
def window_percent_cume(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank / cume_dist / decile over the global balance ordering,
    computed SCALE-SAFE as a two-pass global rank instead of a single
    un-partitioned Window (which funnels the whole table through one task
    — correct at sf0.01, a straggler at 100 TB; round-2 VERDICT item #2).

    Pass 1: ``repartitionByRange`` on the sort key (contiguous, ordered
    ranges; RangePartitioner boundaries are deterministically sampled),
    count rows per range partition, prefix-sum those counts on the driver
    (#partitions values, not #rows). Pass 2: ``row_number`` within each
    range partition plus the partition's offset = the exact global rank,
    with every partition ranking in parallel. The ordering has a unique
    tiebreak (c_custkey), so rank == row_number, cume_dist == rn/n, and
    ntile(10) is reconstructed from rn with the standard first-(n%10)-
    buckets-get-one-extra rule — identical to both engines' built-ins.
    The driver-side action touches one tiny count per partition; the
    persist pins the range layout between the count pass and rank pass.

    r14 contract: NULL balances are excluded on both engines — a
    percentile needs a value, and the engines place a NULL sort key at
    OPPOSITE ends (Spark ORDER BY ASC is NULLS FIRST, DuckDB NULLS
    LAST), so one NULL balance shifted EVERY customer's rank by one.
    Found by the degenerate-dims probe; the window-order mirror of the
    events NULL-ts rule (registry rule 10)."""
    c = (table(spark, sf, "customer")
         .filter(F.col("c_acctbal").isNotNull())
         .select("c_custkey", "c_acctbal"))
    nparts = max(2, spark.sparkContext.defaultParallelism)
    ranged = (
        c.repartitionByRange(nparts, F.col("c_acctbal"), F.col("c_custkey"))
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["pid"]: r["cnt"]
        for r in ranged.groupBy("pid").agg(F.count("*").alias("cnt")).collect()
    }
    n = sum(counts.values())
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv]),
        F.col("pid"),
    )
    w_local = Window.partitionBy("pid").orderBy("c_acctbal", "c_custkey")
    rn = (F.row_number().over(w_local) + off_expr).cast("bigint")
    q, r = divmod(n, 10)
    if q == 0:  # fewer rows than buckets: bucket == rank
        decile = rn
    else:
        decile = F.when(
            rn <= r * (q + 1), ((rn - 1) / F.lit(q + 1)).cast("bigint") + 1
        ).otherwise(r + ((rn - 1 - r * (q + 1)) / F.lit(q)).cast("bigint") + 1)
    pct = (
        F.lit(0.0) if n <= 1
        else F.round((rn - 1).cast("double") / F.lit(float(n - 1)), 6)
    )
    return ranged.select(
        "c_custkey",
        pct.alias("pct_rank"),
        F.round(rn.cast("double") / F.lit(float(n)), 6).alias("cume"),
        decile.cast("bigint").alias("decile"),
    )


@query(
    "resample_gapfill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               date_trunc('hour', MIN(ts)) AS t0,
               date_trunc('hour', MAX(ts)) AS t1
        FROM events WHERE user_id <= 20 GROUP BY user_id
    ),
    grid AS (
        SELECT b.user_id, g.h
        FROM bounds b,
             LATERAL (SELECT unnest(generate_series(b.t0, b.t1,
                                                    INTERVAL 1 HOUR)) AS h) g
    ),
    actual AS (
        SELECT user_id, date_trunc('hour', ts) AS h, COUNT(*) AS n
        FROM events WHERE user_id <= 20 GROUP BY user_id, date_trunc('hour', ts)
    )
    SELECT g.user_id, strftime(g.h, '%Y-%m-%d %H:%M:%S') AS hour_s,
           CAST(COALESCE(a.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN actual a ON g.user_id = a.user_id AND g.h = a.h
    """,
    tags=("timeseries",),
)
def resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Hourly resample with gap filling: a per-user dense hour grid
    (sequence + explode) left-joined to actual counts, zeros for silent
    hours — the time-series densification operator.

    Scale: the grid is generated from each user's (min,max) — two aggs and
    one explode, no driver-side loop; the join is per-user co-partitioned.
    """
    e = table(spark, sf, "events").filter(F.col("user_id") <= 20)
    bounds = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    actual = e.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n"))
    return (
        grid.join(actual, ["user_id", "h"], "left")
        .select(
            "user_id",
            ts_str(F.col("h")).alias("hour_s"),
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        )
    )


@query(
    "agg_skew_salted_distinct",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("agg", "skew"),
)
def agg_skew_salted_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Two-phase salted COUNT(DISTINCT) for skewed group keys.

    A plain count-distinct on a heavy-hitter group shuffles every
    (group, user) pair to ONE reducer per group — the task that OOMs at
    100 TB. Salting by hash(user_id) % 16 splits each group into 16
    sub-aggregations (phase 1), whose partial distinct counts ADD exactly
    because each user lands in exactly one salt bucket (phase 2). Same
    result, 16x the parallelism on the hot key, bounded per-task state.
    """
    e = table(spark, sf, "events")
    salted = e.withColumn("salt", F.pmod(F.hash("user_id"), F.lit(16)))
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.countDistinct("user_id").alias("part_users"),
        F.count("*").alias("part_events"),
    )
    return phase1.groupBy("event_type").agg(
        F.sum("part_users").cast("bigint").alias("n_users"),
        F.sum("part_events").cast("bigint").alias("n_events"),
    )


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    SELECT a.c_custkey AS key_a, b.c_custkey AS key_b,
           CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS edit_dist
    FROM customer a
    JOIN customer b
      ON a.c_nationkey = b.c_nationkey
     AND a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
    tags=("join", "fuzzy"),
)
def join_fuzzy_levenshtein(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy self-join (entity resolution): customer-name pairs within
    edit distance 1, blocked by nation.

    Scale: the unblocked fuzzy join is O(n^2) edit-distance evals — the
    blocking key (here nationkey; in production a q-gram or
    length+prefix band) turns it into an equi-join whose shuffle carries
    the block key, with the levenshtein filter running only inside
    blocks. Same structure as the n-gram dedup verifier.
    """
    c = table(spark, sf, "customer")
    a = c.select(
        F.col("c_custkey").alias("key_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
    )
    b = c.select(
        F.col("c_custkey").alias("key_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk_b"),
    )
    return (
        a.join(
            b,
            (F.col("nk") == F.col("nk_b"))
            & (F.col("key_a") < F.col("key_b"))
            & (F.levenshtein("name_a", "name_b") <= 1),
        )
        .select(
            "key_a",
            "key_b",
            F.levenshtein("name_a", "name_b").cast("bigint").alias("edit_dist"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (SELECT NULLIF(o_orderpriority, '5-LOW') AS k,
                      COUNT(*) AS n_a
               FROM orders GROUP BY 1),
         b AS (SELECT NULLIF(o_orderpriority, '1-URGENT') AS k,
                      COUNT(*) AS n_b
               FROM orders GROUP BY 1)
    SELECT a.k AS key, a.n_a, b.n_b
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    tags=("join", "nulls"),
)
def join_null_safe(spark: SparkSession, sf: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics ETL needs when
    joining on nullable dimension keys. Each side NULLs out a different
    priority class, so exactly one NULL<=>NULL row must survive.

    Scale: Spark plans eqNullSafe as a regular hash join on the
    null-wrapped key (NULL hashes to a single bucket) — same shuffle as
    an equi-join; beware only of NULL-skew, the salting pattern from
    agg_skew_salted_distinct applies unchanged.
    """
    o = table(spark, sf, "orders")
    a = (
        o.select(F.expr("nullif(o_orderpriority, '5-LOW')").alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_a"))
    )
    b = (
        o.select(F.expr("nullif(o_orderpriority, '1-URGENT')").alias("kb"))
        .groupBy("kb")
        .agg(F.count("*").alias("n_b"))
    )
    return (
        a.join(b, a.k.eqNullSafe(b.kb))
        .select(F.col("k").alias("key"), "n_a", "n_b")
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    SELECT c_mktsegment, o_orderpriority AS mode_priority, n
    FROM (
      SELECT c.c_mktsegment, o.o_orderpriority, COUNT(*) AS n,
             row_number() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY COUNT(*) DESC, o.o_orderpriority)
               AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_orderpriority
    ) WHERE rn = 1
    """,
    tags=("agg", "window"),
)
def agg_mode_deterministic(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic MODE: the most frequent order priority per market
    segment, ties broken lexicographically — engines disagree on bare
    mode()'s tie-break (and Spark's is non-deterministic), so the
    portable form is count + rank with an explicit total order.

    Scale: the count aggregate shrinks the data to (segment, priority)
    cardinality BEFORE the window; the rn=1 filter then plans as
    WindowGroupLimit over ~25 rows. Never window the raw fact table for
    a mode.
    """
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    cnt = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("mode_priority"),
            "n",
        )
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice_cents, rk
    FROM (
      SELECT o_custkey, o_orderkey,
             CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                 AS o_totalprice_cents,
             CAST(row_number() OVER (
                 PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rk
      FROM orders)
    WHERE rk <= 3
    ORDER BY o_custkey, rk
    """,
    tags=("window",),
)
def window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 orders by value per customer — the general k>1 sibling of
    latest_per_key's rn=1.

    Spark pushes rk<=3 into the Window operator as a running group limit
    (WindowGroupLimit, asserted in test_plans), so each group's sort
    stops after 3 rows instead of ranking every order: the post-shuffle
    work is O(groups·k), not O(rows). Deterministic tie-break via
    orderkey; prices compared as doubles but EMITTED as integer cents
    (registry rule 1).
    """
    o = table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            cents(F.col("o_totalprice")).alias("o_totalprice_cents"),
            "rk",
        )
        .orderBy("o_custkey", "rk")
    )


@query(
    "merge_upsert_scd",
    oracle="""
    WITH changes AS (
      -- updates: every 17th customer moves segment and gains 100.00
      SELECT c_custkey, c_name, c_nationkey,
             ROUND(c_acctbal + 100.00, 2) AS c_acctbal,
             'UPDATED-SEG' AS c_mktsegment
      FROM customer WHERE c_custkey % 17 = 0
      UNION ALL
      -- inserts: brand-new keys derived from every 53rd customer
      SELECT c_custkey + 1000000, 'Customer#new' || c_custkey,
             c_nationkey, 0.00, 'NEWSEG'
      FROM customer WHERE c_custkey % 53 = 0
    ),
    merged AS (
      SELECT COALESCE(c.c_custkey, b.c_custkey) AS c_custkey,
             COALESCE(c.c_name, b.c_name) AS c_name,
             COALESCE(c.c_nationkey, b.c_nationkey) AS c_nationkey,
             COALESCE(c.c_acctbal, b.c_acctbal) AS c_acctbal,
             COALESCE(c.c_mktsegment, b.c_mktsegment) AS c_mktsegment,
             CASE WHEN b.c_custkey IS NULL THEN 'insert'
                  WHEN c.c_custkey IS NULL THEN 'keep'
                  ELSE 'update' END AS action
      FROM customer b FULL OUTER JOIN changes c
        ON b.c_custkey = c.c_custkey
    )
    SELECT action,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS bal_cents,
           CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
    FROM merged GROUP BY action
    """,
    tags=("merge", "join", "upsert"),
)
def merge_upsert_scd(spark: SparkSession, sf: str) -> DataFrame:
    """MERGE/upsert semantics without a table format: apply a change
    batch (updates + inserts) to a dimension snapshot via ONE full outer
    join on the key, labeling every output row keep/update/insert — the
    WHEN MATCHED / WHEN NOT MATCHED branches of SQL MERGE INTO (and of
    Delta's MERGE, blocked in this container — SURVEY §6) expressed as
    plain coalesce arithmetic. The summary row per action (count,
    balance cents, segment spread) is the post-merge audit a pipeline
    logs after every snapshot advance.

    Scale: one keyed shuffle of each side (AQE broadcasts the change
    batch when it is small, the common case); the merged snapshot never
    routes through the driver. The same plan maintains an SCD-style
    dimension at any size — writing the merged result with
    io.partitioned/clustered writers completes the loop.
    """
    c = table(spark, sf, "customer")
    updates = c.filter(F.col("c_custkey") % 17 == 0).select(
        "c_custkey", "c_name", "c_nationkey",
        F.round(F.col("c_acctbal") + 100.00, 2).alias("c_acctbal"),
        F.lit("UPDATED-SEG").alias("c_mktsegment"),
    )
    inserts = c.filter(F.col("c_custkey") % 53 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.concat(F.lit("Customer#new"), F.col("c_custkey").cast("string"))
            .alias("c_name"),
        "c_nationkey",
        F.lit(0.00).alias("c_acctbal"),
        F.lit("NEWSEG").alias("c_mktsegment"),
    )
    ch = updates.unionByName(inserts).alias("ch")
    b = c.alias("b")
    merged = b.join(
        ch, F.col("b.c_custkey") == F.col("ch.c_custkey"), "full_outer"
    ).select(
        F.coalesce("ch.c_custkey", "b.c_custkey").alias("c_custkey"),
        F.coalesce("ch.c_acctbal", "b.c_acctbal").alias("c_acctbal"),
        F.coalesce("ch.c_mktsegment", "b.c_mktsegment")
            .alias("c_mktsegment"),
        F.when(F.col("b.c_custkey").isNull(), "insert")
        .when(F.col("ch.c_custkey").isNull(), "keep")
        .otherwise("update").alias("action"),
    )
    return merged.groupBy("action").agg(
        F.count("*").alias("n_rows"),
        F.sum(cents(F.col("c_acctbal"))).alias("bal_cents"),
        F.countDistinct("c_mktsegment").cast("long").alias("n_segments"),
    )


@query(
    "scd2_history_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER w AS prev_state
      FROM events
      WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    changes AS (
      SELECT user_id, event_type AS state, ts, event_id
      FROM ordered
      WHERE prev_state IS NULL OR prev_state <> event_type
    ),
    versioned AS (
      SELECT user_id, state,
             ROW_NUMBER() OVER w AS version_no,
             ts AS valid_from,
             LEAD(ts) OVER w AS valid_to
      FROM changes
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(version_no AS BIGINT) AS version_no,
           state,
           strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
           strftime(valid_to, '%Y-%m-%d %H:%M:%S') AS valid_to,
           (valid_to IS NULL) AS is_current
    FROM versioned
    """,
    tags=("scd", "window", "cdc"),
)
def scd2_history_build(spark: SparkSession, sf: str) -> DataFrame:
    """Changelog -> slowly-changing-dimension type 2: turn an append-only
    event stream into versioned [valid_from, valid_to) history rows, one
    per state CHANGE (consecutive repeats of the same state collapse into
    one version; the open version has NULL valid_to / is_current=true).
    This is the warehouse-standard dimension build that MERGE-based
    pipelines (merge_upsert_scd) maintain incrementally — here built from
    scratch in one pass.

    Scale: all three windows (change-detection LAG, version ROW_NUMBER,
    interval-closing LEAD) share ONE (user_id) hash partitioning, so the
    whole build is a single keyed shuffle with running frames — no global
    window, no join, state per key bounded by one row. 100 TB of
    changelog -> the same plan, partitioned by the dimension key.

    Engine-exactness: version intervals are emitted as formatted-string
    timestamps (registry rule 3); (ts, event_id) ordering is made total
    by the unique event_id tiebreak (rule 5). NULL-ts events are
    excluded on both engines (time_surface, rule 10 — a version interval
    needs a valid_from).
    """
    e = time_surface(table(spark, sf, "events"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    )
    changes = ordered.filter(
        F.col("prev_state").isNull()
        | (F.col("prev_state") != F.col("event_type"))
    )
    # same partitioning/ordering as w: Exchange is reused, zero extra
    # shuffles for the second and third window functions
    versioned = changes.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("version_no"),
        F.col("event_type").alias("state"),
        ts_str(F.col("ts")).alias("valid_from"),
        ts_str(F.lead("ts").over(w)).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
    return versioned


@query(
    "window_running_distinct",
    oracle="""
    SELECT user_id,
           CAST(event_id AS BIGINT) AS event_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(COUNT(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM events
    WHERE ts IS NOT NULL
    """,
    tags=("window", "distinct"),
)
def window_running_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Running count-distinct per key: how many distinct event types has
    each user exhibited up to (and including) each event.

    Spark has no DISTINCT window aggregate (DuckDB does — the oracle uses
    it directly), and the naive `size(collect_set() over w)` rewrite keeps
    an O(types) set per row in window state. The scale-safe rewrite is
    exact and streaming-friendly: flag the FIRST occurrence of each
    (user, type) with a row_number over (user, type), then running-SUM the
    flags over the (user) window — both windows are plain keyed
    partitions with bounded state.

    Scale: two keyed shuffles, (user_id, event_type) then (user_id), with
    running frames — no global window, no per-row collections. 100 TB of
    events partitions by user exactly the same way.

    r14 contract: NULL-ts events are excluded on both engines
    (time_surface, rule 10 — the running order diverges on NULL
    placement), and a NULL event_type never raises the count (the flag
    mirrors COUNT(DISTINCT)'s NULL-skip; the row itself still appears
    with its running total).
    """
    e = time_surface(table(spark, sf, "events"))
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "user_id", "event_id", "ts",
        F.when(
            (F.row_number().over(w_first) == 1)
            & F.col("event_type").isNotNull(), 1)
        .otherwise(0).alias("is_first"),
    )
    return flagged.select(
        "user_id",
        F.col("event_id").cast("bigint").alias("event_id"),
        ts_str(F.col("ts")).alias("ts"),
        F.sum("is_first").over(w_run).cast("bigint")
        .alias("distinct_types_so_far"),
    )


@query(
    "subquery_lateral",
    oracle="""
    SELECT n.n_name,
           t.c_name,
           t.bal_cents,
           CAST(t.rk AS BIGINT) AS rk
    FROM nation n,
    LATERAL (
        SELECT c_name,
               CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
               ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rk
        FROM customer
        WHERE c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
    """,
    tags=("subquery", "lateral"),
)
def subquery_lateral(spark: SparkSession, sf: str) -> DataFrame:
    """Correlated LATERAL subquery (SQL:1999 lateral derived table —
    DuckDB and Spark SQL >= 3.2 both support it): for every nation, the
    top-2 customers by account balance, rank included.

    Spark-first note: Catalyst rewrites the correlated LATERAL into a
    DomainJoin and then a ranked window over the correlation key — the
    same physical plan as the idiomatic window_topk_per_group
    (WindowGroupLimit pushes the LIMIT into the shuffle), so the SQL
    sugar costs nothing vs the hand-written rewrite at any scale.
    """
    for t in ("nation", "customer"):
        table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql("""
        SELECT n.n_name,
               t.c_name,
               t.bal_cents,
               CAST(t.rk AS BIGINT) AS rk
        FROM nation n,
        LATERAL (
            SELECT c_name,
                   CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents,
                   ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey)
                       AS rk
            FROM customer
            WHERE c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
    """)


@query(
    "agg_filtered_clause",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n_all,
           COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                FILTER (WHERE l_discount > 0.05), 0) AS BIGINT)
               AS discounted_cents,
           CAST(COUNT(DISTINCT l_suppkey)
                FILTER (WHERE l_quantity > 25) AS BIGINT) AS bulk_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("agg", "filter"),
)
def agg_filtered_clause(spark: SparkSession, sf: str) -> DataFrame:
    """FILTER-clause aggregates (SQL:2003 T612, supported by Spark SQL
    and DuckDB alike): several differently-filtered aggregates of one
    scan without self-joins or CASE pyramids.

    Scale: all four aggregates (incl. the filtered COUNT DISTINCT)
    evaluate in ONE pass / one shuffle on l_returnflag; the alternative
    per-filter subquery plan would scan lineitem three times.
    """
    table(spark, sf, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT l_returnflag,
               COUNT(*) AS n_all,
               COUNT(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
               CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100, 0)
                        AS BIGINT))
                    FILTER (WHERE l_discount > 0.05), 0) AS BIGINT)
                   AS discounted_cents,
               CAST(COUNT(DISTINCT l_suppkey)
                    FILTER (WHERE l_quantity > 25) AS BIGINT)
                   AS bulk_suppliers
        FROM lineitem
        GROUP BY l_returnflag
    """)


_BFS_SQL = """
    WITH RECURSIVE pairs AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    edges AS (
        SELECT src, dst FROM pairs
        UNION ALL
        SELECT dst AS src, src AS dst FROM pairs
    ),
    reach(node, dist) AS (
        SELECT CAST(3 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist
        UNION ALL
        SELECT DISTINCT e.dst AS node, r.dist + CAST(1 AS BIGINT) AS dist
        FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.dist < 3
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           CAST(node {IDIV} 2 AS BIGINT) AS node_key,
           CAST(MIN(dist) AS BIGINT) AS hops
    FROM reach
    GROUP BY 1, 2
"""


@query(
    "cte_recursive_bfs",
    oracle=_BFS_SQL.format(IDIV="//"),
    tags=("cte", "recursive", "graph"),
)
def cte_recursive_bfs(spark: SparkSession, sf: str) -> DataFrame:
    """Recursive CTE (SQL:1999 WITH RECURSIVE — new in Spark 4.x): BFS
    hop distance from supplier #1 over the customer—supplier fulfilment
    graph, capped at 3 hops, min-distance per node via the outer
    aggregate. The same edge table as graph_pagerank_bipartite, but the
    iteration is expressed declaratively and driven by the engine's
    recursion operator instead of a Python driver loop.

    Scale/termination: the recursive step takes SELECT DISTINCT over the
    previous level only, so each iteration materializes at most one row
    per (node, dist) — O(V) per level, 4 levels — never one row per
    path (the naive UNION ALL-without-DISTINCT variant explodes
    combinatorially on dense bipartite graphs). Each level is one keyed
    join + distinct shuffle, identical to the PageRank hop.
    """
    for t in ("orders", "lineitem"):
        table(spark, sf, t).createOrReplaceTempView(t)
    return spark.sql(_BFS_SQL.format(IDIV="div"))


@query(
    "window_gaps_islands",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_t
        FROM events WHERE user_id <= 50 AND ts IS NOT NULL
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS run_len,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS run_start,
           strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS run_end,
           CAST(MIN(event_id) AS BIGINT) AS first_event_id
    FROM ordered
    GROUP BY user_id, event_type, rn - rn_t
    """,
    tags=("window", "sessionization"),
)
def window_gaps_islands(spark: SparkSession, sf: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive identical event
    types per user (the tabibitosan rn-difference trick — two
    row_numbers whose difference is constant exactly within a run).
    The SQL-interview classic behind uptime stretches, consecutive-day
    streaks, and sensor-state episodes.

    Scale: both row_numbers and the final aggregate share the (user_id)
    hash partitioning — Catalyst plans ONE Exchange; the island grouping
    key (rn - rn_t) never leaves the partition. Same single-shuffle
    shape as scd2_history_build. NULL-ts events are excluded on both
    engines (time_surface, rule 10 — run adjacency is ts-ordered).
    """
    e = time_surface(table(spark, sf, "events")).filter(
        F.col("user_id") <= 50)
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_ut = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.row_number().over(w_u).alias("rn"),
        F.row_number().over(w_ut).alias("rn_t"),
    )
    return (
        ordered.groupBy(
            "user_id", "event_type",
            (F.col("rn") - F.col("rn_t")).alias("island"),
        )
        .agg(
            F.count("*").cast("bigint").alias("run_len"),
            ts_str(F.min("ts")).alias("run_start"),
            ts_str(F.max("ts")).alias("run_end"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
        )
        .drop("island")
    )


@query(
    "snapshot_diff_cdc",
    oracle="""
    WITH base AS (
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        FROM orders
    ), curr AS (
        -- simulated next snapshot: deletes (%97), updates (+1.00 on %13),
        -- inserts (shifted keys for %101)
        SELECT o_orderkey AS k,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                 + CASE WHEN o_orderkey % 13 = 0 THEN 100 ELSE 0 END
                   AS price_cents
        FROM orders WHERE o_orderkey % 97 <> 0
        UNION ALL
        SELECT o_orderkey + 1000000000 AS k,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents
        FROM orders WHERE o_orderkey % 101 = 0
    ), diff AS (
        SELECT CASE WHEN b.k IS NULL THEN 'insert'
                    WHEN c.k IS NULL THEN 'delete'
                    WHEN b.price_cents <> c.price_cents THEN 'update'
                    ELSE 'unchanged' END AS change_type,
               COALESCE(c.price_cents, 0) - COALESCE(b.price_cents, 0)
                   AS delta_cents
        FROM base b FULL OUTER JOIN curr c ON b.k = c.k
    )
    SELECT change_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(delta_cents) AS BIGINT) AS net_delta_cents
    FROM diff GROUP BY change_type
    """,
    tags=("advanced", "cdc"),
)
def snapshot_diff_cdc(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot diff / change-data-capture derivation: given two table
    snapshots, classify every key as insert / delete / update /
    unchanged and roll up the net value movement — what Delta's CDF or
    an audit job computes between daily loads, built from one full
    outer join on the key.

    The "current" snapshot is simulated deterministically from orders
    (key-pattern deletes, +1.00 updates, shifted-key inserts) so both
    engines diff identical inputs.

    Scale: ONE key-keyed full outer join (both sides shuffle once on
    the same key — co-partitioned exchange, no broadcast needed at any
    size) followed by a 4-row aggregate with map-side partials. Value
    comparison is integer cents; no row-hash false positives.
    """
    o = table(spark, sf, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        cents(F.col("o_totalprice")).alias("price_cents"),
    )
    curr = (
        o.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            F.col("o_orderkey").alias("k"),
            (cents(F.col("o_totalprice"))
             + F.when(F.col("o_orderkey") % 13 == 0, 100).otherwise(0))
            .alias("price_cents"),
        )
        .unionAll(
            o.filter(F.col("o_orderkey") % 101 == 0).select(
                (F.col("o_orderkey") + 1000000000).alias("k"),
                cents(F.col("o_totalprice")).alias("price_cents"),
            )
        )
    )
    b = base.select(F.col("k").alias("bk"), F.col("price_cents").alias("bp"))
    c = curr.select(F.col("k").alias("ck"), F.col("price_cents").alias("cp"))
    diff = b.join(c, b.bk == c.ck, "full_outer").select(
        F.when(F.col("bk").isNull(), "insert")
        .when(F.col("ck").isNull(), "delete")
        .when(F.col("bp") != F.col("cp"), "update")
        .otherwise("unchanged").alias("change_type"),
        (F.coalesce(F.col("cp"), F.lit(0)) - F.coalesce(F.col("bp"), F.lit(0)))
        .alias("delta_cents"),
    )
    return diff.groupBy("change_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("delta_cents").cast("bigint").alias("net_delta_cents"),
    )


@query(
    "scd2_point_in_time_lookup",
    oracle="""
    WITH w_ord AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER w AS prev_state
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), changes AS (
        SELECT user_id, event_type AS state, ts,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM w_ord
        WHERE prev_state IS NULL OR prev_state <> event_type
    ), purchases AS (
        SELECT event_id, user_id, ts,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    )
    SELECT d.state AS state_at_purchase,
           CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(SUM(p.cents) AS BIGINT) AS sum_cents
    FROM purchases p
    JOIN changes d
      ON d.user_id = p.user_id
     AND p.ts >= d.ts
     AND (d.valid_to IS NULL OR p.ts < d.valid_to)
    GROUP BY d.state
    """,
    tags=("advanced", "scd"),
)
def scd2_point_in_time_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Point-in-time dimension lookup: join each fact row to the SCD2
    version that was valid AT ITS TIMESTAMP (the correctness property
    type-2 history exists for — joining today's attribute onto last
    year's facts silently rewrites history). The dimension is the
    scd2_history_build versioning, rebuilt inline; facts are the
    purchase events; output attributes each purchase to the state in
    force when it happened.

    Scale: the version ranges and the facts join on the SAME user_id
    equi-key (one co-partitioned exchange pair); the validity range is
    a post-join filter over the handful of versions per user — never a
    time-range cross product. At 100 TB this is the standard
    fact-to-SCD2 join shape; versions per key stay bounded.
    """
    e = table(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id", "event_type", "ts", "event_id",
        F.lag("event_type").over(w).alias("prev_state"),
    )
    versions = (
        ordered.filter(
            F.col("prev_state").isNull()
            | (F.col("prev_state") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
        )
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
        cents(F.col("value")).alias("cents"),
    )
    joined = purchases.join(
        versions,
        (F.col("p_user") == F.col("user_id"))
        & (F.col("p_ts") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("p_ts") < F.col("valid_to"))),
    )
    return joined.groupBy(F.col("state").alias("state_at_purchase")).agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.sum("cents").cast("bigint").alias("sum_cents"),
    )


@query(
    "market_basket_pairs",
    oracle="""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey % 200 AS item
        FROM lineitem
    ), n_orders AS (
        SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM baskets
    ), item_counts AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item
        FROM baskets GROUP BY item
    ), pairs AS (
        SELECT a.item AS item_a, b.item AS item_b,
               CAST(COUNT(*) AS BIGINT) AS n_both
        FROM baskets a JOIN baskets b
          ON a.okey = b.okey AND a.item < b.item
        GROUP BY a.item, b.item
    ),
    topk AS (
        SELECT item_a, item_b, n_both,
               row_number() OVER (ORDER BY n_both DESC, item_a, item_b)
                   AS rk
        FROM pairs
    )
    SELECT p.item_a, p.item_b, p.n_both,
           ia.n_item AS n_a, ib.n_item AS n_b,
           CAST((1000000 * p.n_both * o.n) // (ia.n_item * ib.n_item)
                AS BIGINT) AS lift_ppm
    FROM topk p
    JOIN item_counts ia ON ia.item = p.item_a
    JOIN item_counts ib ON ib.item = p.item_b
    CROSS JOIN n_orders o
    WHERE p.rk <= 25
    """,
    tags=("advanced", "mining"),
)
def market_basket_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """Market-basket association mining: item pairs co-purchased in the
    same order with support count and integer-exact lift
    (P(ab)/(P(a)P(b)) as ppm division — the classic 'frequently bought
    together' signal, float-log-free so ranks hash cross-engine).

    Scale: the pair join keys on the ORDER (baskets are small — pair
    fan-out is bounded by per-order item count squared, ~7^2, never
    corpus^2); item counts are a vocabulary-sized table broadcast into
    the scoring joins; the top-k keeps the output to the MOST frequent
    pairs at any corpus size (TakeOrdered over the vocabulary-bounded
    pair table — <=C(200,2) rows — not over the corpus).

    Fixture degeneracy (r11 zero-row-green audit): the original
    `HAVING n_both >= 20` floor emitted 0 rows at sf0.001/sf0.01 (max
    pair support is 5/17 there) and 19,900 rows at sf0.1 (where EVERY
    pair clears 20) — degenerate at small scales AND unselective at
    large; no fixed absolute floor works across scales. Top-25 by
    (support DESC, item_a, item_b — unique tiebreak, rule 5) is
    non-degenerate and stable at every scale.
    """
    li = table(spark, sf, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("okey"),
        (F.col("l_partkey") % 200).alias("item"),
    ).distinct()
    n_orders = baskets.agg(
        F.count_distinct("okey").cast("bigint").alias("n"))
    item_counts = baskets.groupBy("item").agg(
        F.count("*").cast("bigint").alias("n_item"))
    a = baskets.select("okey", F.col("item").alias("item_a"))
    b = baskets.select(F.col("okey").alias("okey_b"),
                       F.col("item").alias("item_b"))
    pairs = (
        a.join(b, (a.okey == b.okey_b) & (F.col("item_a") < F.col("item_b")))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").cast("bigint").alias("n_both"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy(F.pmod(F.col("item_a"), F.lit(1)))
                .orderBy(F.col("n_both").desc(), "item_a", "item_b")),
        )
        .filter(F.col("rk") <= 25)
        .drop("rk")
    )
    ia = item_counts.select(F.col("item").alias("item_a"),
                            F.col("n_item").alias("n_a"))
    ib = item_counts.select(F.col("item").alias("item_b"),
                            F.col("n_item").alias("n_b"))
    return (
        pairs.join(ia, "item_a").join(ib, "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a", "item_b", "n_both", "n_a", "n_b",
            F.expr("(1000000 * n_both * n) div (n_a * n_b)").cast("bigint")
            .alias("lift_ppm"),
        )
    )


@query(
    "join_semi_bloom_prefilter",
    oracle="""
    SELECT CAST(strftime(l.l_shipdate, '%Y-%m') AS VARCHAR) AS ship_month,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
               AS BIGINT) AS price_cents
    FROM lineitem l
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_orderkey = l.l_orderkey
        AND o.o_orderpriority = '1-URGENT'
        AND o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '1995-04-01'
    )
    GROUP BY strftime(l.l_shipdate, '%Y-%m')
    ORDER BY ship_month
    """,
    tags=("join", "semi", "bloom", "optimization"),
    bench=True,
)
def join_semi_bloom_prefilter(spark: SparkSession, sf: str) -> DataFrame:
    """Semi join with a DECLARATIVE bloom pre-filter: the selective dim
    side (urgent Q1-1995 orders) is folded into a 65536-bit bloom
    bitmap — <=1024 (slot, mask) rows built by one bit_or aggregate —
    which broadcasts to the fact side and discards most non-matching
    lineitems BEFORE the exact semi join's shuffle. The final LEFT SEMI
    join keeps semantics exact (bloom false positives are re-checked),
    so the oracle is the plain EXISTS.

    This is the runtime-filter pattern (Spark's
    spark.sql.optimizer.runtime.bloomFilter injects the same shape)
    built from stock operators, so it works at any threshold and its
    plan is assertable: at 100 TB the semi join's fact-side Exchange is
    the dominant cost, and the broadcast bitmap cuts the shuffled
    volume to ~selectivity x fact (false-positive rate at 65536 bits
    for the few thousand urgent keys is <1%). The bitmap rows never
    exceed 1024 regardless of corpus size; precision scales by raising
    the bit width, not by shuffling more.

    Determinism: the bloom stage only REMOVES rows the exact join
    would remove; output values are integer cents and counts.

    Fixture degeneracy (r11 zero-row-green audit): the original Q1-1994
    window PREDATES this fixture's order range (1995-01-01..2001-08-01),
    so the query was hash-green on 0 rows at every scale — the bench was
    timing a bloom over an empty dim. Q1-1995 selects the same ~5%
    urgent slice the TPC-H-shaped window intended. Bench note: r11
    timings for this query are therefore NOT comparable to r10 and
    earlier (the old number measured a no-op semi join).
    """
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem")
    dim = o.filter(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    ).select("o_orderkey")

    bloom = (
        dim.select(
            F.expr("pmod(xxhash64(o_orderkey), 65536L) div 64")
            .alias("slot"),
            F.expr("shiftleft(CAST(1 AS BIGINT), "
                   "CAST(pmod(xxhash64(o_orderkey), 64) AS INT))")
            .alias("bitmask"),
        )
        .groupBy("slot")
        .agg(F.expr("bit_or(bitmask)").alias("mask"))
    )
    probe = li.select(
        "l_orderkey", "l_shipdate", "l_extendedprice",
        F.expr("pmod(xxhash64(l_orderkey), 65536L) div 64").alias("slot"),
        F.expr("shiftleft(CAST(1 AS BIGINT), "
               "CAST(pmod(xxhash64(l_orderkey), 64) AS INT))")
        .alias("bitmask"),
    )
    prefiltered = (
        probe.join(F.broadcast(bloom), "slot")
        .filter(F.expr("(bitmask & mask) != 0"))
        .select("l_orderkey", "l_shipdate", "l_extendedprice")
    )
    survivors = prefiltered.join(
        dim, prefiltered["l_orderkey"] == dim["o_orderkey"], "left_semi"
    )
    return (
        survivors.groupBy(
            F.date_format("l_shipdate", "yyyy-MM").alias("ship_month")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(cents(F.col("l_extendedprice"))).cast("bigint")
            .alias("price_cents"),
        )
        .orderBy("ship_month")
    )
