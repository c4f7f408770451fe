"""TPC-H suite completion: the 13 queries tpch.py didn't cover.

Together with tpch.py (Q1/Q3/Q5/Q6/Q7/Q10/Q14/Q18) and the pre-existing
``join_star_q9_profit`` (Q9's profit-by-nation-and-year shape,
operators/advanced.py), this makes all 22 TPC-H query shapes available —
the reference's pitch is "scan packets, then run real analytics in the
host engine" (/root/reference/README.md:15,160-167), and TPC-H is the
canonical definition of "real analytics".

The fixtures (TESTDATA.md) have no partsupp table and drop several TPC-H
columns, so the textbook predicates are adapted while keeping each
query's *shape* — the plan structure Catalyst must get right — intact:

- partsupp is derived as ``SELECT DISTINCT l_partkey, l_suppkey FROM
  lineitem`` (Q2/Q16), keeping the part-supplier association semantics.
- Q4's "commitdate < receiptdate" lateness test becomes an EXISTS over
  returned lines (l_returnflag='R'); Q21's double-correlation likewise
  uses returnflag as the "kept waiting" marker.
- Q12's l_shipmode becomes l_returnflag; Q13's o_comment filter becomes
  an o_orderpriority filter; Q17/Q19/Q20's p_container filters become
  p_brand/p_size filters; Q22's phone-prefix country code becomes
  c_nationkey, and its "no orders at all" anti-join becomes "no orders
  in the final fixture year" (every fixture customer has orders).

Money math follows the registry's cross-engine rules: integer cents for
sums, shared IEEE expression trees + ROUND for every ratio, BIGINT casts
on DuckDB aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wireduck_spark.registry import cents, query, table

_REVENUE = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"
_REV_L = _REVENUE.replace("l_", "l.l_")


def _rev_cents():
    return cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@query(
    "tpch_q2",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_brand
    FROM part p
    JOIN ps ON p.p_partkey = ps.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE p.p_size = 15 AND r.r_name = 'EUROPE'
      AND s.s_acctbal = (
        SELECT MIN(s2.s_acctbal) FROM ps ps2
        JOIN supplier s2 ON ps2.l_suppkey = s2.s_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE ps2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
    """,
    tags=("tpch", "join", "subquery"),
)
def tpch_q2(spark: SparkSession, sf: str) -> DataFrame:
    """Q2 minimum-cost supplier: for each size-15 part, the European
    supplier(s) with the minimum account balance (ps_supplycost stand-in;
    partsupp derived from lineitem's distinct part-supplier pairs).

    Scale: the correlated MIN decorrelates into one window over
    p_partkey — the part-supplier association is built once (distinct =
    one shuffle on (partkey,suppkey)), dims broadcast onto it, and the
    min-filter adds no extra join or pass over lineitem. No double scan
    of the fact table the way the textbook correlated form implies.
    """
    ps = (
        table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    r = table(spark, sf, "region").filter(F.col("r_name") == "EUROPE")
    n = table(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = table(spark, sf, "part").filter(F.col("p_size") == 15)
    w = Window.partitionBy("p_partkey")
    return (
        ps.join(F.broadcast(s), ps.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q4(spark: SparkSession, sf: str) -> DataFrame:
    """Q4 order-priority checking: orders in a quarter with at least one
    "late" line, counted by priority (lateness = l_returnflag='R'; the
    fixtures have no commit/receipt dates).

    Scale: EXISTS becomes a left-semi join — the lineitem side is
    pre-filtered to returned lines and projected to the single join key
    before the shuffle; the quarter filter reaches the orders scan.
    """
    o = table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= _ts("1997-07-01 00:00:00"))
        & (F.col("o_orderdate") < _ts("1997-10-01 00:00:00"))
    )
    late = (
        table(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q8",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(SUM(CASE WHEN n1.n_name = 'NATION_3'
                          THEN {_REV_L} ELSE 0 END) * 1.0
                 / SUM({_REV_L}), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    JOIN region r   ON n2.n_regionkey = r.r_regionkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
      AND o.o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                            AND TIMESTAMP '1997-12-31 00:00:00'
    GROUP BY o_year
    """,
    tags=("tpch", "join"),
    bench=True,
)
def tpch_q8(spark: SparkSession, sf: str) -> DataFrame:
    """Q8 national market share: NATION_3's share of ECONOMY-part revenue
    sold into ASIA, by order year — the widest join in the suite
    (lineitem + orders + customer + supplier + part + nation x2 + region).

    Scale: part/supplier/nation/region broadcast; the only shuffled joins
    are lineitem-orders (orderkey) and +customer (custkey). The share is
    a conditional-sum over the same cents column, so numerator and
    denominator come out of one aggregate — no second pass, and the
    division sees identical BIGINT operands on both engines.
    """
    r = table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n2 = table(spark, sf, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cust_nkey"))
    n1 = table(spark, sf, "nation").select(
        F.col("n_nationkey").alias("supp_nkey"),
        F.col("n_name").alias("supp_nation"),
    )
    p = table(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
    s = table(spark, sf, "supplier")
    c = table(spark, sf, "customer")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderdate").between(
            "1996-01-01 00:00:00", "1997-12-31 00:00:00"
        )
    )
    li = table(spark, sf, "lineitem")
    rev = _rev_cents()
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), c.c_nationkey == F.col("cust_nkey"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("supp_nkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(0)
                )
                * 1.0
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q11",
    oracle=f"""
    WITH natline AS (
      SELECT l.l_partkey, {_REV_L} AS rev
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_12'),
    pp AS (
      SELECT l_partkey, CAST(SUM(rev) AS BIGINT) AS value_cents
      FROM natline GROUP BY l_partkey)
    SELECT l_partkey, value_cents
    FROM pp
    WHERE value_cents > (SELECT CAST(SUM(value_cents) AS DOUBLE) * 2.0
                                / COUNT(*) FROM pp)
    """,
    tags=("tpch", "subquery", "having"),
)
def tpch_q11(spark: SparkSession, sf: str) -> DataFrame:
    """Q11 important stock: parts whose NATION_12-supplied revenue
    exceeds twice the AVERAGE per-part value for that nation
    (ps_supplycost*availqty stand-in: lineitem revenue through
    NATION_12 suppliers).

    Scale-free threshold (r11 zero-row-green audit): the spec's Q11
    fraction is 0.0001/SF — a FIXED fraction of the nation total
    empties as the part count grows (the old 0.001 cut returned 0 rows
    at sf0.1, and the old NATION_5 literal had no supplied lineitems at
    sf0.001 at all, so both engines agreed on empty at two of three
    scales). Relative-to-average keeps a stable ~6-9% tail at every
    scale (12/31/1,213 rows at sf0.001/0.01/0.1), and NATION_12 is
    supplied at all three.

    Scale: the nation-filtered lineitem subset is computed once and
    aggregated twice — per-part and globally; the global scalar joins
    back as a 1-row broadcast (no driver collect, no second lineitem
    scan of the correlated form). Threshold compare is the identical
    SUM*2.0/COUNT double tree on both engines over exact int64 cents.
    """
    n = table(spark, sf, "nation").filter(F.col("n_name") == "NATION_12")
    s = table(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = table(spark, sf, "lineitem")
    natline = li.join(
        F.broadcast(s), li.l_suppkey == F.col("s_suppkey")
    ).select("l_partkey", _rev_cents().alias("rev"))
    per_part = natline.groupBy("l_partkey").agg(
        F.sum("rev").cast("bigint").alias("value_cents")
    )
    total = per_part.agg(
        (F.sum("value_cents").cast("double") * 2.0 / F.count("*"))
        .alias("threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("value_cents") > F.col("threshold"))
        .select("l_partkey", "value_cents")
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q12(spark: SparkSession, sf: str) -> DataFrame:
    """Q12 shipping-mode priority split (l_shipmode absent — grouped by
    l_returnflag): high- vs low-priority line counts per class for one
    ship year.

    Scale: one shuffled join on orderkey; the conditional counts are
    map-side partial aggregates onto 3 groups; the year filter reaches
    the lineitem scan.
    """
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = table(spark, sf, "orders")
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                            AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey)
    GROUP BY c_count
    """,
    tags=("tpch", "join", "agg"),
)
def tpch_q13(spark: SparkSession, sf: str) -> DataFrame:
    """Q13 customer order-count distribution: histogram of per-customer
    order counts, excluding one priority class (o_comment filter
    stand-in), keeping zero-order customers via the outer join.

    Scale: the classic double aggregation — first shuffle on custkey
    (orders pre-filtered), second on the tiny c_count domain; the outer
    join preserves customers with no qualifying orders, which COUNT(col)
    then counts as 0 (null-skipping count, same on both engines).
    """
    c = table(spark, sf, "customer").select("c_custkey")
    o = table(spark, sf, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey, CAST(SUM({_REVENUE}) AS BIGINT) AS total_rev_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, rev.total_rev_cents
    FROM supplier s JOIN revenue rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_rev_cents = (SELECT MAX(total_rev_cents) FROM revenue)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q15(spark: SparkSession, sf: str) -> DataFrame:
    """Q15 top supplier: supplier(s) with the maximum quarterly revenue
    (the CTE-as-view form of the spec; exact-cents max so ties and the
    max itself are engine-independent).

    Scale: revenue is one filtered pass over lineitem aggregated on
    suppkey; the global max rides a window over the supplier-bounded
    revenue table; supplier attaches by broadcast. Nothing rescans
    lineitem.

    r15 OPTIMIZATION (guide §2.4): the max previously ran as a second
    revenue consumer, and the supplier equi-join inferred an
    isnotnull(l_suppkey) filter that pushed through the probe branch's
    aggregate into its scan — the two subtrees canonicalized
    differently and lineitem scanned twice at runtime. The max is now
    a whole-partition window over revenue itself (bounded input by
    construction — supplier cardinality; partitioned on a
    column-derived constant per the survival/KS idiom so the
    no-global-window audit invariant stays checkable), leaving ONE
    consumer and ONE lineitem scan. The supplier join's inferred
    isnotnull sits above the window (a non-partition-column predicate
    cannot push through it), so the subtree stays whole. Max semantics
    unchanged: every revenue row (including a NULL-suppkey group's)
    lands in the single pmod partition.
    """
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1997-04-01 00:00:00"))
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.sum(_rev_cents()).alias("total_rev_cents")
    )
    w_all = Window.partitionBy(
        F.pmod(F.coalesce(F.col("total_rev_cents"), F.lit(0)), F.lit(1)))
    s = table(spark, sf, "supplier")
    return (
        revenue.withColumn("mx", F.max("total_rev_cents").over(w_all))
        .filter(F.col("total_rev_cents") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_cents")
    )


@query(
    "tpch_q16",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q16(spark: SparkSession, sf: str) -> DataFrame:
    """Q16 parts/supplier relationship: distinct supplier counts per
    (brand, type, size) group, excluding flagged suppliers (complaint
    filter stand-in: negative account balance).

    Scale: NOT IN over a provably non-null key list becomes a left-anti
    broadcast join (the flagged-supplier list is tiny); the distinct
    part-supplier association shuffles once; COUNT(DISTINCT) re-shuffles
    on the 3-column group key only.
    """
    ps = (
        table(spark, sf, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    flagged = (
        table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = table(spark, sf, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
    )
    return (
        ps.join(
            F.broadcast(flagged),
            ps.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q17",
    oracle="""
    SELECT ROUND(SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT))
                 / 7.0, 2) AS avg_yearly_cents
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3'
      AND l.l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                          FROM lineitem l2
                          WHERE l2.l_partkey = p.p_partkey)
    """,
    tags=("tpch", "subquery"),
)
def tpch_q17(spark: SparkSession, sf: str) -> DataFrame:
    """Q17 small-quantity-order revenue: Brand#3 lines whose quantity is
    below 20% of that part's average quantity (p_container filter
    dropped; not in fixtures).

    Scale: the correlated AVG decorrelates into a per-part WINDOW over
    the brand-pruned join output — ONE lineitem scan. Quantities are
    integer-valued doubles, so the AVG is order-independent and the
    0.2*avg threshold is the identical IEEE value on both engines.

    r15 OPTIMIZATION (guide §2.4): the per-part average was a second
    full lineitem scan (aggregate over ALL parts' lines, broadcast
    back). The subquery correlates on p_partkey, so for any surviving
    part the average runs over exactly that part's lines — all of
    which survive the brand join too (brand is a part attribute) — so
    avg(l_quantity) over a l_partkey window AFTER the broadcast brand
    join is the identical value on the identical rows, and the window
    shuffle carries only the Brand#3 slice (~1/|brands| of lineitem)
    instead of aggregating the full table: 2 scans -> 1, the avg
    broadcast join gone.
    """
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part").filter(F.col("p_brand") == "Brand#3")
    w_part = Window.partitionBy("l_partkey")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .withColumn("qty_thresh", 0.2 * F.avg("l_quantity").over(w_part))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(cents(F.col("l_extendedprice"))) / 7.0, 2
            ).alias("avg_yearly_cents")
        )
    )


@query(
    "tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_REV_L}) AS BIGINT) AS revenue_cents,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    tags=("tpch", "join", "filter"),
)
def tpch_q19(spark: SparkSession, sf: str) -> DataFrame:
    """Q19 discounted revenue: OR-of-conjuncts across both join sides
    (brand/size from part, quantity from lineitem) — the classic test
    that an optimizer keeps the equi-join and applies the disjunction as
    a post-join filter instead of degrading to a cross product.

    Scale: part broadcasts; the common p_partkey equi-conjunct drives
    the join; the disjunction stays a row-level filter. Catalyst also
    derives the single-side implied filters (size<=15, quantity<=30)
    and pushes them to the scans.
    """
    li = table(spark, sf, "lineitem")
    p = table(spark, sf, "part")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(
            arm("Brand#1", 5, 1, 11)
            | arm("Brand#2", 10, 10, 20)
            | arm("Brand#3", 15, 20, 30)
        )
        .agg(
            F.sum(_rev_cents()).alias("revenue_cents"),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q20",
    oracle="""
    SELECT s.s_name, n.n_name
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_7'
      AND s.s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#5'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
        HAVING SUM(l_quantity) > 30)
    """,
    tags=("tpch", "subquery", "having"),
)
def tpch_q20(spark: SparkSession, sf: str) -> DataFrame:
    """Q20 potential part promotion: NATION_7 suppliers who moved more
    than a threshold quantity of some Brand#5 part in 1997 (the
    availqty>half-year's-supply predicate, re-based on shipped quantity
    since partsupp doesn't exist).

    Scale: the IN-subquery is a left-semi join against an aggregate
    that grouped a brand+year-filtered lineitem slice on
    (suppkey, partkey); supplier/nation broadcast. One shuffle on the
    composite group key, one semi-join on suppkey.
    """
    n = table(spark, sf, "nation").filter(F.col("n_name") == "NATION_7")
    s = table(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    p = table(spark, sf, "part").filter(F.col("p_brand") == "Brand#5")
    li = table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1997-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ts("1998-01-01 00:00:00"))
    )
    movers = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    return s.join(
        movers, s.s_suppkey == movers.l_suppkey, "left_semi"
    ).select("s_name", "n_name")


@query(
    "tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_1'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 100
    """,
    tags=("tpch", "subquery", "topk"),
    bench=True,
)
def tpch_q21(spark: SparkSession, sf: str) -> DataFrame:
    """Q21 suppliers who kept orders waiting: NATION_1 suppliers that
    were the SOLE supplier with a returned line on a multi-supplier
    finished order ("late" = l_returnflag='R'; no receipt/commit dates
    in the fixtures).

    Scale: the EXISTS / NOT EXISTS pair is algebraized into ONE
    per-order aggregate — n_supp = distinct suppliers, n_rsupp =
    distinct suppliers with a returned line — so both correlations
    become integer filters on aggregate columns. EXISTS(other supplier)
    <=> n_supp >= 2; NOT EXISTS(other returned supplier) given l1
    returned <=> n_rsupp = 1. The distinct counts are computed as a
    two-level aggregate (orderkey,suppkey) -> orderkey rather than
    countDistinct, avoiding the Expand duplication countDistinct plans
    (one shuffle per level, both map-combinable).

    r14 OPTIMIZATION (guide §2.3/§2.4): lineitem is scanned ONCE. The
    old shape scanned it twice — the aggregate plus an R-filtered probe
    side that re-joined the aggregate on orderkey just to count the
    sole returned supplier's R lines. Those R-line counts now ride the
    per-(orderkey,suppkey) aggregate (n_r = COUNT of R rows in the
    group; n_rsupp = how many groups have n_r > 0), and the sole
    returned supplier is recovered per order with max-when — exact,
    because the n_rsupp = 1 filter guarantees exactly one group with
    n_r > 0. numwait = SUM of that supplier's n_r == the old probe
    side's COUNT(*) (orders/supplier are unique join keys, so the old
    joins never multiplied rows). Plan: 2 lineitem scans -> 1, and the
    corpus-wide R-row probe stream through three joins collapses to
    per-order aggregate rows joining slim dims.
    """
    li = table(spark, sf, "lineitem")
    per_order = (
        li.groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_r")
        )
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.sum((F.col("n_r") > 0).cast("int")).alias("n_rsupp"),
            F.max(F.when(F.col("n_r") > 0, F.col("l_suppkey")))
            .alias("r_suppkey"),
            F.max(F.when(F.col("n_r") > 0, F.col("n_r"))).alias("r_lines"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_rsupp") == 1))
    )
    n = table(spark, sf, "nation").filter(F.col("n_name") == "NATION_1")
    s = table(spark, sf, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = table(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), F.col("r_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("r_lines").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


@query(
    "tpch_q22",
    oracle="""
    SELECT n.n_name AS cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
             AS totacctbal_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_nationkey IN (0, 3, 6, 9, 12, 15, 18)
      AND CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) > (
        SELECT SUM(CAST(ROUND(c2.c_acctbal * 100, 0) AS BIGINT)) * 1.0
               / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY n.n_name
    """,
    tags=("tpch", "subquery", "agg"),
)
def tpch_q22(spark: SparkSession, sf: str) -> DataFrame:
    """Q22 global sales opportunity: above-average-balance customers in
    selected countries with no RECENT orders (country code = nationkey,
    no c_phone in fixtures; "no orders at all" adapted to "none since
    2000-01-01" because every fixture customer has historical orders).

    Scale: the scalar average broadcasts as one row (computed in exact
    cents so the threshold is order-independent); NOT EXISTS is a
    left-anti join against date-filtered orders projected to custkey;
    nation broadcasts. One shuffle each for the anti-join and the final
    7-group aggregate.
    """
    c = table(spark, sf, "customer").filter(
        F.col("c_nationkey").isin(0, 3, 6, 9, 12, 15, 18)
    )
    avg_bal = (
        table(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(cents(F.col("c_acctbal"))) * 1.0 / F.count("*")).alias(
                "avg_cents"
            )
        )
    )
    recent = (
        table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= _ts("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    n = table(spark, sf, "nation")
    return (
        c.join(F.broadcast(avg_bal))
        .filter(cents(F.col("c_acctbal")) > F.col("avg_cents"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(cents(F.col("c_acctbal"))).alias("totacctbal_cents"),
        )
    )
