"""Sketch aggregates: HLL distinct-count, sketch union (re-aggregation),
approximate quantiles (SURVEY.md §2 approx row, widened).

At 100 TB these are not approximations of convenience — a mergeable
sketch is the only way to compute distincts/quantiles in one pass with
bounded memory, re-aggregate them across days/partitions, and serve
rollups without rescanning. Spark's Apache-DataSketches HLL functions
(hll_sketch_agg / hll_union_agg / hll_sketch_estimate) are map-side
combinable: each partition builds a fixed-size sketch, the shuffle moves
KB not rows.

Oracle strategy: estimates are engine-specific (DataSketches HLL vs
DuckDB's own HLL), so raw estimates can never hash-match. Instead each
engine asserts ITS OWN estimate against ITS OWN exact count and emits
the boolean — the oracle checks the accuracy CONTRACT (within tolerance)
plus the exact counts, which is the portable truth of a sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wireduck_spark.registry import query, table

# lgConfigK=14 -> ~0.8% relative standard error; 3% tolerance = >3 sigma.
_LG_K = 14
_TOL = 0.03


@query(
    "sketch_hll_distinct",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_distinct,
           (abs(approx_count_distinct(c_custkey) - COUNT(DISTINCT c_custkey))
            <= {_TOL} * COUNT(DISTINCT c_custkey)) AS within_tol
    FROM customer
    GROUP BY c_mktsegment
    """,
    tags=("sketch", "agg"),
)
def sketch_hll_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Per-segment HLL distinct customers: exact count (hash-checked) +
    the sketch-accuracy contract boolean.

    Scale: the sketch agg is a fixed 2^14-bucket state per group per
    partition — map-side combined, while COUNT(DISTINCT) re-shuffles every
    distinct value. At 100 TB only the sketch column survives; the exact
    column is the test harness.
    """
    c = table(spark, sf, "customer")
    est = F.hll_sketch_estimate(
        F.hll_sketch_agg("c_custkey", F.lit(_LG_K))
    )
    exact = F.count_distinct("c_custkey").cast("bigint")
    return c.groupBy("c_mktsegment").agg(
        exact.alias("exact_distinct"),
        (F.abs(est - exact) <= _TOL * exact).alias("within_tol"),
    )


@query(
    "sketch_hll_union_rollup",
    oracle=f"""
    WITH per_nation AS (
        SELECT c_nationkey, COUNT(DISTINCT c_custkey) AS nd
        FROM customer GROUP BY c_nationkey
    ),
    total AS (
        SELECT COUNT(DISTINCT c_custkey) AS exact_total FROM customer
    )
    SELECT CAST((SELECT COUNT(*) FROM per_nation) AS BIGINT) AS n_groups,
           CAST(t.exact_total AS BIGINT) AS exact_total,
           (abs((SELECT approx_count_distinct(c_custkey) FROM customer)
                - t.exact_total) <= {_TOL} * t.exact_total) AS within_tol
    FROM total t
    """,
    tags=("sketch", "agg"),
)
def sketch_hll_union_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """The rollup property that makes sketches worth it: build one HLL
    sketch PER NATION, then hll_union_agg the 25 sketches into a global
    distinct estimate — no rescan of the base table.

    Scale: this is the daily->monthly rollup pattern — persist per-day
    (per-partition) sketches, union them on demand. The union moves 25
    sketches of ~16 KB, not 150 M customer keys. The oracle can't union
    DuckDB HLL states across a GROUP BY, so it checks the same contract
    on a direct global approx pass — the exact_total and group count are
    the hash-checked truth.
    """
    c = table(spark, sf, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey", F.lit(_LG_K)).alias("sk")
    )
    unioned = per_nation.agg(
        F.count("*").cast("bigint").alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_total"),
    )
    exact = c.agg(
        F.count_distinct("c_custkey").cast("bigint").alias("exact_total")
    )
    return (
        unioned.crossJoin(F.broadcast(exact))  # both sides are 1 row
        .select(
            "n_groups",
            "exact_total",
            (
                F.abs(F.col("est_total") - F.col("exact_total"))
                <= _TOL * F.col("exact_total")
            ).alias("within_tol"),
        )
    )


@query(
    "sketch_quantiles",
    oracle="""
    SELECT o_orderstatus,
           (abs(approx_quantile(o_totalprice, 0.5)
                - median(o_totalprice)) <= 0.05 * median(o_totalprice))
               AS p50_within,
           (abs(approx_quantile(o_totalprice, 0.95)
                - quantile_cont(o_totalprice, 0.95))
            <= 0.05 * quantile_cont(o_totalprice, 0.95)) AS p95_within,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("sketch", "agg"),
)
def sketch_quantiles(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate p50/p95 per order status, asserted against the exact
    continuous quantiles within 5% — the one-pass bounded-memory quantile
    path (Spark: percentile_approx/KLL-style; DuckDB: approx_quantile).

    Scale: exact percentiles need a per-group sort (or full value
    collection); the approx sketch is map-combinable fixed state. 100-TB
    latency dashboards run on exactly this operator.
    """
    o = table(spark, sf, "orders")
    exact_p50 = F.expr("percentile(o_totalprice, 0.5)")
    exact_p95 = F.expr("percentile(o_totalprice, 0.95)")
    ap50 = F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000))
    ap95 = F.percentile_approx("o_totalprice", F.lit(0.95), F.lit(10000))
    return o.groupBy("o_orderstatus").agg(
        (F.abs(ap50 - exact_p50) <= 0.05 * exact_p50).alias("p50_within"),
        (F.abs(ap95 - exact_p95) <= 0.05 * exact_p95).alias("p95_within"),
        F.count("*").alias("n"),
    )


@query(
    "sketch_countmin_heavy_hitters",
    oracle="""
    WITH words AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
      FROM documents
    ),
    rows_ AS (SELECT unnest([0, 1, 2, 3]) AS i),
    counters AS (
      SELECT i,
             (('0x' || substr(md5('cm' || CAST(i AS VARCHAR) || ':' || w),
                              1, 15))::BIGINT) % 1024 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM words CROSS JOIN rows_
      GROUP BY 1, 2
    ),
    top_ AS (
      SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS true_n
      FROM words GROUP BY w ORDER BY true_n DESC, word LIMIT 20
    )
    SELECT t.word, t.true_n,
           CAST(MIN(c.c) AS BIGINT) AS cm_estimate,
           (CAST(MIN(c.c) AS BIGINT) >= t.true_n) AS overestimates
    FROM top_ t
    JOIN counters c
      ON c.bucket = (('0x' || substr(
             md5('cm' || CAST(c.i AS VARCHAR) || ':' || t.word),
             1, 15))::BIGINT) % 1024
    GROUP BY t.word, t.true_n
    ORDER BY t.true_n DESC, t.word
    """,
    tags=("sketch", "text"),
)
def sketch_countmin_heavy_hitters(spark: SparkSession, sf: str) -> DataFrame:
    """Count-min sketch (d=4 rows x w=1024 buckets) estimating the exact
    top-20 words' frequencies — estimate = min over rows of the hashed
    bucket counter, never an underestimate (asserted per word, and
    hash-checked exactly: the md5 bucket hashes are engine-portable, so
    both engines build bit-identical counter tables).

    Why it matters at 100 TB: the counter table is FIXED SIZE (4 x 1024
    ints) however large the corpus — partial aggregation collapses each
    task's tokens into <=4096 counters before the shuffle, and counter
    tables merge by addition across any partitioning (the mergeability
    HLL has for distinct counts, count-min has for frequencies). The
    4x token explode stays narrow; the only shuffle carries counters.
    """
    d = table(spark, sf, "documents", spread=True)
    words = d.select(
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[a-z0-9]+"), 0)
        ).alias("w")
    )
    def bucket_of(prefix_col, word_col):
        return F.expr(
            "CAST(conv(substring(md5(concat('cm', CAST({i} AS STRING), ':', {w})),"
            " 1, 15), 16, 10) AS BIGINT) % 1024".format(i=prefix_col, w=word_col)
        )

    rows_ = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i")
    counters = (
        words.select("w", rows_)
        .select("i", bucket_of("i", "w").alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    top = (
        words.groupBy(F.col("w").alias("word"))
        .agg(F.count("*").cast("bigint").alias("true_n"))
        .orderBy(F.desc("true_n"), "word")
        .limit(20)
    )
    # probe rows carry their own (i, bucket) so the lookup is a plain
    # equi-join on both columns (a bucket==f(i,word) condition would mix
    # sides and degrade to a nested loop)
    probes = top.select(
        "word", "true_n",
        F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
    ).withColumn("bucket", bucket_of("i", "word"))
    joined = probes.join(counters, ["i", "bucket"])
    return (
        joined.groupBy("word", "true_n")
        .agg(F.min("c").cast("bigint").alias("cm_estimate"))
        .withColumn("overestimates", F.col("cm_estimate") >= F.col("true_n"))
        .orderBy(F.desc("true_n"), "word")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type,
           strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    WHERE strftime(date_trunc('day', ts), '%Y-%m-%d') < '2024-01-08'
    GROUP BY event_type, strftime(date_trunc('day', ts), '%Y-%m-%d')
    ORDER BY event_type, day
    """,
    tags=("agg", "distinct", "sketch"),
)
def agg_bitmap_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """EXACT distinct counting via Spark 4 bitmap aggregates — the
    COUNT(DISTINCT) rewrite for integer keys at warehouse scale: bucket
    each user_id (32768 ids per bucket), build a per-bucket bitmap with
    bitmap_construct_agg (map-side combinable — each partition
    contributes a partial bitmap, merged by OR), then sum bitmap_count
    per group. The oracle is plain COUNT(DISTINCT user_id): bitmaps are
    exact, so the counts must match to the row.

    Why this beats countDistinct at 100 TB: COUNT(DISTINCT) shuffles
    every (group, user_id) pair (or Expands for multi-distinct), volume
    ~ the event count; the bitmap path shuffles at most
    #groups x #buckets fixed-size 4 KB bitmaps regardless of how many
    BILLIONS of events hit each bucket — and unlike
    approx_count_distinct / HLL (sketch_hll_distinct), it is exact.
    The trade: keys must be integers with bounded range per bucket
    count; ids are exactly that.
    """
    e = table(spark, sf, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    per_bucket = (
        e.select(
            "event_type",
            day.alias("day"),
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
            F.bitmap_bit_position(F.col("user_id")).alias("pos"),
        )
        .filter(F.col("day") < "2024-01-08")
        .groupBy("event_type", "day", "bucket")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    return (
        per_bucket.groupBy("event_type", "day")
        .agg(F.sum(F.bitmap_count(F.col("bm"))).cast("bigint")
             .alias("n_users"))
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Quantile-sketch accuracy contract (approx_percentile / t-digest family)
# ---------------------------------------------------------------------------

_Q_TOL = 0.01  # 1% relative — measured: Spark GK ~0.06%, DuckDB t-digest ~0.4%


@query(
    "sketch_quantile_contract",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                               0.5), 4) AS exact_p50,
           ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                               0.9), 4) AS exact_p90,
           (abs(approx_quantile(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                                0.5)
                - quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                                0.5))
            <= {_Q_TOL} * quantile_cont(
                   CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.5))
               AS p50_within_tol,
           (abs(approx_quantile(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                                0.9)
                - quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
                                0.9))
            <= {_Q_TOL} * quantile_cont(
                   CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.9))
               AS p90_within_tol
    FROM orders
    """,
    tags=("sketch", "agg"),
)
def sketch_quantile_contract(spark: SparkSession, sf: str) -> DataFrame:
    """Quantile-sketch accuracy contract, the percentile sibling of
    sketch_hll_distinct: the EXACT global p50/p90 of the
    order totals (hash-checked — percentile interpolation over exact
    int64 cents is engine-identical, pinned by differential property
    17) plus booleans asserting each engine's OWN quantile sketch
    (Spark's Greenwald-Khanna `approx_percentile` at accuracy 10,000;
    DuckDB's t-digest `approx_quantile`) lands within 1% of its own
    exact value. Measured headroom: Spark ~0.06% rank error, DuckDB
    ~0.4% — the contract is robust to either sketch drifting an order
    of magnitude.

    Scale: the sketch is the 100-TB path — a bounded GK/t-digest state
    per group per partition, map-side combined; the exact percentile
    (a full sort-based aggregate) is the test harness, exactly like
    the HLL rows' COUNT(DISTINCT) column.
    """
    o = table(spark, sf, "orders")
    cents_sql = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"
    exact50 = F.expr(f"percentile({cents_sql}, 0.5D)")
    exact90 = F.expr(f"percentile({cents_sql}, 0.9D)")
    ap50 = F.expr(f"approx_percentile({cents_sql}, 0.5D, 10000)")
    ap90 = F.expr(f"approx_percentile({cents_sql}, 0.9D, 10000)")
    return o.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(exact50, 4).alias("exact_p50"),
        F.round(exact90, 4).alias("exact_p90"),
        (F.abs(ap50 - exact50) <= _Q_TOL * exact50).alias("p50_within_tol"),
        (F.abs(ap90 - exact90) <= _Q_TOL * exact90).alias("p90_within_tol"),
    )
