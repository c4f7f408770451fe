"""TPC-H query suite, adapted to the driver's reduced-schema fixtures.

The reference's whole pitch is "scan packets, then do real analytics in
the host engine" (/root/reference/README.md:15,160-167) — its users run
arbitrary multi-join SQL over the scan. This module proves the rebuilt
relational surface composes into the canonical warehouse workload, not
just isolated operator probes: each query is the TPC-H shape re-expressed
on the DataFrame API with a DuckDB oracle twin.

Adaptations forced by the fixture schema (TESTDATA.md): no partsupp
table, no l_commitdate/l_receiptdate/l_shipmode/l_shipinstruct, no
o_shippriority/o_comment, nations are NATION_0..24, p_type is a single
token (PROMO/ECONOMY/...). Money arithmetic follows the registry's
cross-engine rules (integer cents for sums, shared IEEE expression +
round for ratios).

Scale notes are per-query; the common pattern: lineitem/orders are the
fact tables carrying the shuffles, every dimension is broadcast (nation/
region explicitly; part/supplier/customer are left to AQE which converts
post-filter small sides at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wireduck_spark.registry import cents, query, table, ts_str

_REVENUE = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"


def _rev_cents():
    return cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


@query(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS sum_base_cents,
           CAST(SUM({_REVENUE}) AS BIGINT) AS sum_disc_cents,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount)
                               * (1 + l_tax) * 100, 0) AS BIGINT))
                AS BIGINT) AS sum_charge_cents,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("tpch", "agg"),
    bench=True,
)
def tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    """Q1 pricing summary report: the canonical scan-heavy aggregate.

    Scale: single pass over lineitem, map-side partial agg onto ~6 groups;
    the shuffle moves a handful of rows per partition. The shipdate filter
    and 7-column projection both reach the parquet scan.
    """
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
        F.sum(_rev_cents()).alias("sum_disc_cents"),
        F.sum(
            cents(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            )
        ).alias("sum_charge_cents"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           CAST(SUM({_REVENUE.replace('l_', 'l.l_')}) AS BIGINT) AS rev_cents,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY rev_cents DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q3(spark: SparkSession, sf: str) -> DataFrame:
    """Q3 shipping priority: segment-filtered 3-way join, top-10 revenue
    (o_shippriority doesn't exist in the fixtures; orderdate kept).

    Scale: customer-after-filter broadcasts (AQE); the lineitem-orders
    join shuffles on orderkey only; final top-10 is a TakeOrdered (no
    global sort materialization).
    """
    c = table(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
        .select(
            "l_orderkey",
            "rev_cents",
            ts_str(F.col("o_orderdate")).alias("orderdate"),
        )
        .orderBy(F.col("rev_cents").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_REVENUE.replace('l_', 'l.l_')}) AS BIGINT) AS rev_cents
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY rev_cents DESC
    """,
    tags=("tpch", "join"),
    bench=True,
)
def tpch_q5(spark: SparkSession, sf: str) -> DataFrame:
    """Q5 local supplier volume: 6-table join where supplier and customer
    must share a nation, revenue per ASIA nation for one order-year.

    Scale: nation+region collapse to a 5-row broadcast filter; supplier
    broadcasts; the two big joins (lineitem-orders on orderkey, then
    +customer on custkey) each shuffle on a single key. The c_nationkey =
    s_nationkey equi-conjunct rides the supplier join — no extra shuffle.
    """
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .groupBy("n_name")
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
        .orderBy(F.col("rev_cents").desc())
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * l_discount * 100, 0)
                         AS BIGINT)) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("tpch", "filter"),
)
def tpch_q6(spark: SparkSession, sf: str) -> DataFrame:
    """Q6 forecasting revenue change: pure filter + global aggregate.

    Scale: every predicate is parquet-pushable (range on shipdate,
    between on discount, < on quantity); the scan reads 3 columns and the
    agg is a single scalar — the textbook predicate-pushdown probe.
    """
    li = table(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * F.col("l_discount")))
            .alias("revenue_cents"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q7",
    oracle=f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_REVENUE.replace('l_', 'l.l_')}) AS BIGINT) AS rev_cents
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    tags=("tpch", "join"),
)
def tpch_q7(spark: SparkSession, sf: str) -> DataFrame:
    """Q7 volume shipping between two trading nations, by ship year.

    Scale: both nation joins broadcast; the OR-of-pairs predicate is
    applied after the joins (2-nation selectivity makes supplier/customer
    AQE-broadcastable); shuffles stay on suppkey/orderkey/custkey.
    """
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    s = table(spark, sf, "supplier")
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").filter(
        F.col("l_shipdate").between("1996-01-01 00:00:00", "1997-12-31 00:00:00")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REVENUE.replace('l_', 'l.l_')}) AS BIGINT) AS rev_cents,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY rev_cents DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("tpch", "join", "topk"),
)
def tpch_q10(spark: SparkSession, sf: str) -> DataFrame:
    """Q10 returned-item reporting: top-20 customers by lost revenue in a
    quarter (c_acctbal/c_phone/c_comment not in fixtures).

    Scale: the returnflag + quarter filters reach the scans; one shuffle
    per big join; top-20 via TakeOrdered with a unique custkey tiebreak.
    """
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    li = table(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_cents()).alias("rev_cents"))
        .select("c_custkey", "c_name", "rev_cents", "n_name")
        .orderBy(F.col("rev_cents").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT ROUND(
        100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(ROUND(l.l_extendedprice * (1 - l.l_discount)
                                         * 100, 0) AS BIGINT)
                         ELSE 0 END)
        / SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                   AS BIGINT)), 6) AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    tags=("tpch", "join"),
)
def tpch_q14(spark: SparkSession, sf: str) -> DataFrame:
    """Q14 promotion effect: share of one month's revenue from PROMO parts
    (fixture p_type is a single token, so equality replaces LIKE 'PROMO%').

    Scale: part broadcasts against the month-filtered lineitem; the ratio
    is computed over exact integer cents so both engines divide the same
    two BIGINTs — cross-engine float drift can't enter before the final
    division.
    """
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    p = table(spark, sf, "part")
    rev = _rev_cents()
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
                / F.sum(rev),
                6,
            ).alias("promo_pct")
        )
    )


@query(
    "tpch_q18",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d %H:%M:%S') AS orderdate,
           CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS total_cents,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS BIGINT)) > 150
    ORDER BY total_cents DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("tpch", "join", "having"),
)
def tpch_q18(spark: SparkSession, sf: str) -> DataFrame:
    """Q18 large-volume customers: orders whose total quantity exceeds a
    threshold (the classic HAVING-over-join; TPC-H phrases it as an IN
    subquery over a grouped lineitem — same plan after decorrelation).

    Scale: aggregate lineitem by orderkey FIRST (map-combinable, shrinks
    the fact side ~4x before any join), then join orders+customer on the
    already-grouped rows.
    """
    li = table(spark, sf, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    o = table(spark, sf, "orders")
    c = table(spark, sf, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            ts_str(F.col("o_orderdate")).alias("orderdate"),
            cents(F.col("o_totalprice")).alias("total_cents"),
            "sum_qty",
        )
        .orderBy(F.col("total_cents").desc(), "o_orderkey")
        .limit(100)
    )
