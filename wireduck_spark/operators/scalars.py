"""Scalar function families (SURVEY.md §2 Tier B): string, date/time, math,
conditional, array, JSON, cast/try-cast.

All expressions stay JVM-side (built-in pyspark.sql.functions — no Python
UDFs), so every query here is a single WholeStageCodegen span over the
parquet scan: the shape that matters at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wireduck_spark.registry import cents, query, table, ts_str


@query(
    "scalar_string_funcs",
    oracle="""
    SELECT c_custkey,
           CAST(length(c_name) AS BIGINT) AS name_len,
           upper(c_mktsegment) AS seg_upper,
           lower(c_name) AS name_lower,
           substring(c_name, 1, 8) AS name_prefix,
           replace(c_name, 'Customer', 'Cust') AS name_short,
           string_split(c_name, '#')[2] AS name_num,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           trim('  ' || c_mktsegment || '  ') AS trimmed,
           concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           CASE WHEN c_name LIKE '%00001%' THEN 1 ELSE 0 END AS has_00001
    FROM customer
    """,
    tags=("scalar", "string"),
)
def scalar_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """substring/length/case/replace/split/regexp/trim/concat/LIKE.

    r14 contract: the oracle's padded concat uses `||` (NULL-propagating
    in both engines) rather than DuckDB's `concat()`, which SKIPS NULL
    arguments while Spark's `F.concat` propagates them — a NULL
    c_mktsegment silently diverged ('' vs NULL). Found by the
    degenerate-dims probe; pinned by tests/test_dims_robustness.py."""
    c = table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.length("c_name").cast("bigint").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
        F.element_at(F.split("c_name", "#"), 2).alias("name_num"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit("  "))).alias(
            "trimmed"
        ),
        F.concat_ws("-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string"))
        .alias("seg_nation"),
        F.when(F.col("c_name").like("%00001%"), 1).otherwise(0).alias("has_00001"),
    )


@query(
    "scalar_datetime_funcs",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS mo,
           CAST(day(ts) AS BIGINT) AS d,
           CAST(hour(ts) AS BIGINT) AS h,
           CAST(minute(ts) AS BIGINT) AS mi,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S') AS day_start,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
           strftime(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S') AS ts_plus_90m,
           CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS BIGINT)
               AS days_since_jan1
    FROM events
    """,
    tags=("scalar", "datetime"),
)
def scalar_datetime_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """extract parts / date_trunc / epoch / interval arithmetic / datediff."""
    e = table(spark, sf, "events")
    return e.select(
        "event_id",
        F.year("ts").cast("bigint").alias("y"),
        F.month("ts").cast("bigint").alias("mo"),
        F.dayofmonth("ts").cast("bigint").alias("d"),
        F.hour("ts").cast("bigint").alias("h"),
        F.minute("ts").cast("bigint").alias("mi"),
        ts_str(F.date_trunc("day", "ts")).alias("day_start"),
        F.unix_timestamp("ts").cast("bigint").alias("epoch_s"),
        ts_str(F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus_90m"),
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since_jan1"),
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(abs(l_discount - 0.05), 4) AS disc_dev,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           ROUND(ln(l_extendedprice), 4) AS log_price,
           ROUND(sqrt(l_quantity), 4) AS sqrt_qty,
           ROUND(exp(l_discount), 4) AS exp_disc,
           ROUND(pow(l_quantity, 2), 1) AS qty_sq
    FROM lineitem
    WHERE l_orderkey % 10 = 0
    """,
    tags=("scalar", "math"),
)
def scalar_math_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """abs/floor/ceil/mod/ln/sqrt/exp/pow (transcendentals rounded to 4dp
    to absorb libm-vs-JVM last-ulp differences). Key-mod filter bounds the
    gate's collect+hash size; the function surface is unchanged."""
    li = table(spark, sf, "lineitem").filter(F.col("l_orderkey") % 10 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.floor("l_extendedprice").cast("bigint").alias("price_floor"),
        F.ceil("l_extendedprice").cast("bigint").alias("price_ceil"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod7"),
        F.round(F.log("l_extendedprice"), 4).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 4).alias("sqrt_qty"),
        F.round(F.exp("l_discount"), 4).alias("exp_disc"),
        F.round(F.pow("l_quantity", F.lit(2)), 1).alias("qty_sq"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 1000 THEN 'low'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS balance_tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_nationkey % 2 = 0 THEN 'even' ELSE 'odd' END AS nation_parity
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def scalar_conditional(spark: SparkSession, sf: str) -> DataFrame:
    """CASE WHEN tiers / COALESCE / NULLIF / IF."""
    c = table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 1000, "low")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER"))
        .alias("seg_or_other"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias(
            "nation_parity"
        ),
    )


@query(
    "scalar_array_funcs",
    oracle="""
    SELECT o_orderkey,
           array_to_string(
               list_sort(string_split(o_orderpriority, '-')), '|') AS pri_sorted,
           CAST(len(string_split(o_orderpriority, '-')) AS BIGINT) AS n_parts,
           string_split(o_orderpriority, '-')[1] AS pri_code,
           string_split(o_orderpriority, '-')[2] AS pri_label,
           list_contains(string_split(o_orderpriority, '-'), 'HIGH') AS is_high
    FROM orders
    """,
    tags=("scalar", "array"),
)
def scalar_array_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """split -> array ops: size / element_at / array_contains / sort / join.

    (The packet-domain idiom is split(frame.protocols, ':') — SURVEY.md §2;
    same shape here on o_orderpriority.)

    The array itself is emitted through array_sort + array_join rather than
    raw: the driver's canonicalizer hashes via pandas, which cannot hash
    list cells (round-1 CORRECTNESS failure). Stringifying keeps the array
    functions exercised while staying hashable on both engines.
    """
    o = table(spark, sf, "orders")
    parts = F.split("o_orderpriority", "-")
    return o.select(
        "o_orderkey",
        F.array_join(F.array_sort(parts), "|").alias("pri_sorted"),
        F.size(parts).cast("bigint").alias("n_parts"),
        F.element_at(parts, 1).alias("pri_code"),
        F.element_at(parts, 2).alias("pri_label"),
        F.array_contains(parts, "HIGH").alias("is_high"),
    )


@query(
    "scalar_explode_unnest",
    oracle="""
    SELECT part AS pri_part, COUNT(*) AS n
    FROM orders, unnest(string_split(o_orderpriority, '-')) AS t(part)
    GROUP BY part
    """,
    tags=("scalar", "array"),
)
def scalar_explode_unnest(spark: SparkSession, sf: str) -> DataFrame:
    """explode/unnest an array column, then aggregate."""
    o = table(spark, sf, "orders")
    return (
        o.select(F.explode(F.split("o_orderpriority", "-")).alias("pri_part"))
        .groupBy("pri_part")
        .agg(F.count("*").alias("n"))
    )


@query(
    "scalar_json_funcs",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod10
    FROM events
    """,
    tags=("scalar", "json"),
)
def scalar_json_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """JSON path extraction from the events.props string column."""
    e = table(spark, sf, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.alias("k_str"),
        k.cast("bigint").alias("k_num"),
        (k.cast("bigint") % 10).alias("k_mod10"),
    )


@query(
    "scalar_cast_try",
    oracle="""
    SELECT c_custkey,
           TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           TRY_CAST(c_mktsegment AS BIGINT) AS seg_as_num,
           CAST(trunc(c_acctbal) AS BIGINT) AS bal_trunc
    FROM customer
    """,
    tags=("scalar", "cast"),
)
def scalar_cast_try(spark: SparkSession, sf: str) -> DataFrame:
    """Explicit casts + try_cast null-on-error semantics (the reference's
    per-cell null-on-parse-error behavior, cpp:224-237, as an expression).

    Note: Spark's double->bigint cast truncates toward zero while DuckDB's
    rounds, so the oracle spells it trunc() explicitly.
    """
    c = table(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.expr("TRY_CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT)").alias(
            "name_num"
        ),
        F.expr("TRY_CAST(c_mktsegment AS BIGINT)").alias("seg_as_num"),
        F.col("c_acctbal").cast("bigint").alias("bal_trunc"),
    )


@query(
    "scalar_map_struct",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS nationkey,
           struct_pack(name := n_name, rk := n_regionkey).name AS s_name,
           CAST(struct_pack(name := n_name, rk := n_regionkey).rk
                AS BIGINT) AS s_rk,
           map_extract(MAP {'nation': n_name,
                            'region': CAST(n_regionkey AS VARCHAR)},
                       'nation')[1] AS m_nation,
           array_to_string(list_sort(map_keys(
               MAP {'nation': n_name,
                    'region': CAST(n_regionkey AS VARCHAR)})), ',') AS m_keys
    FROM nation
    """,
    tags=("scalar", "map", "struct"),
)
def scalar_map_struct(spark: SparkSession, sf: str) -> DataFrame:
    """STRUCT construction + field access and MAP construction + key
    lookup / key enumeration (SURVEY.md §2 map/struct row), emitted as
    flat scalars so the driver's hasher sees portable values."""
    n = table(spark, sf, "nation")
    s = F.struct(
        F.col("n_name").alias("name"), F.col("n_regionkey").alias("rk")
    )
    m = F.create_map(
        F.lit("nation"), F.col("n_name"),
        F.lit("region"), F.col("n_regionkey").cast("string"),
    )
    return n.select(
        F.col("n_nationkey").cast("bigint").alias("nationkey"),
        s.getField("name").alias("s_name"),
        s.getField("rk").cast("bigint").alias("s_rk"),
        F.element_at(m, "nation").alias("m_nation"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("m_keys"),
    )


@query(
    "scalar_bitwise_funcs",
    oracle="""
    SELECT l_orderkey,
           CAST(l_orderkey & 255 AS BIGINT) AS b_and,
           CAST(l_orderkey | 4096 AS BIGINT) AS b_or,
           CAST(xor(l_orderkey, l_partkey) AS BIGINT) AS b_xor,
           CAST(l_orderkey << 3 AS BIGINT) AS b_shl,
           CAST(l_orderkey >> 2 AS BIGINT) AS b_shr,
           CAST(bit_count(l_orderkey) AS BIGINT) AS b_popcount,
           CAST(~l_orderkey AS BIGINT) AS b_not
    FROM lineitem
    WHERE l_linenumber = 1 AND l_orderkey < 1000
    """,
    tags=("scalar", "bitwise"),
)
def scalar_bitwise_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """Bitwise scalar surface: AND / OR / XOR / shifts / popcount /
    complement. One cross-engine trap is documented by construction:
    DuckDB's `^` is exponentiation, its XOR is `xor(a,b)`, while Spark
    SQL's `^` IS xor — the oracle and builder pin the semantics to the
    same bits. Narrow map over a pruned scan; predicate pushed to
    parquet.
    """
    l = table(spark, sf, "lineitem")
    k = F.col("l_orderkey")
    return (
        l.filter((F.col("l_linenumber") == 1) & (k < 1000))
        .select(
            "l_orderkey",
            k.bitwiseAND(F.lit(255)).cast("bigint").alias("b_and"),
            k.bitwiseOR(F.lit(4096)).cast("bigint").alias("b_or"),
            k.bitwiseXOR(F.col("l_partkey")).cast("bigint").alias("b_xor"),
            F.shiftleft(k, 3).cast("bigint").alias("b_shl"),
            F.shiftright(k, 2).cast("bigint").alias("b_shr"),
            F.bit_count(k).cast("bigint").alias("b_popcount"),
            F.expr("~l_orderkey").cast("bigint").alias("b_not"),
        )
    )


@query(
    "scalar_inet_funcs",
    oracle="""
    WITH ips AS (
        SELECT '10.' || CAST(user_id % 200 AS VARCHAR) || '.'
                 || CAST(user_id % 250 AS VARCHAR) || '.'
                 || CAST(event_id % 254 + 1 AS VARCHAR) AS ip
        FROM events
        WHERE user_id IS NOT NULL AND event_id IS NOT NULL
    ), parsed AS (
        SELECT ip,
               CAST(split_part(ip, '.', 1) AS BIGINT) * 16777216
             + CAST(split_part(ip, '.', 2) AS BIGINT) * 65536
             + CAST(split_part(ip, '.', 3) AS BIGINT) * 256
             + CAST(split_part(ip, '.', 4) AS BIGINT) AS ip_num,
               split_part(ip, '.', 1) || '.' || split_part(ip, '.', 2)
                   AS subnet_16
        FROM ips
    )
    SELECT subnet_16,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (
               WHERE ip_num >= 167772160 AND ip_num < 176160768) AS BIGINT)
               AS n_in_10_0_0_0_9,
           CAST(MIN(ip_num) AS BIGINT) AS min_ip_num,
           CAST(MAX(ip_num) AS BIGINT) AS max_ip_num
    FROM parsed GROUP BY subnet_16
    """,
    tags=("scalar", "inet"),
)
def scalar_inet_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """IPv4 address arithmetic with stock scalars — dotted-quad parse to
    a 32-bit integer, CIDR containment (10.0.0.0/9 as an integer range
    compare), and /16 prefix rollup. Neither engine needs an inet
    extension: the packet-domain operations wireduck users run on
    ip.src/ip.dst columns are integer math after one split.

    Scale: parse + containment are narrow string/int scalars; the only
    shuffle is the /16-keyed rollup (bounded key space).

    r14 contract: rows with a NULL identity are excluded on both
    engines — an ip synthesized from NULL is itself NULL, and the
    engines then diverge downstream (Spark split_part(NULL) -> NULL,
    DuckDB split_part(NULL) -> '' whose BIGINT cast aborts the oracle).
    """
    e = table(spark, sf, "events").filter(
        F.col("user_id").isNotNull() & F.col("event_id").isNotNull())
    ips = e.select(
        F.concat(
            F.lit("10."), (F.col("user_id") % 200).cast("string"),
            F.lit("."), (F.col("user_id") % 250).cast("string"),
            F.lit("."), (F.col("event_id") % 254 + 1).cast("string"),
        ).alias("ip")
    )
    part = lambda i: F.split_part(F.col("ip"), F.lit("."), F.lit(i))  # noqa: E731
    parsed = ips.select(
        "ip",
        (part(1).cast("bigint") * 16777216
         + part(2).cast("bigint") * 65536
         + part(3).cast("bigint") * 256
         + part(4).cast("bigint")).alias("ip_num"),
        F.concat(part(1), F.lit("."), part(2)).alias("subnet_16"),
    )
    in_cidr = (F.col("ip_num") >= 167772160) & (F.col("ip_num") < 176160768)
    return parsed.groupBy("subnet_16").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(in_cidr, 1).otherwise(0)).cast("bigint")
        .alias("n_in_10_0_0_0_9"),
        F.min("ip_num").cast("bigint").alias("min_ip_num"),
        F.max("ip_num").cast("bigint").alias("max_ip_num"),
    )


@query(
    "scalar_interval_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH, '%Y-%m-%d')
               AS plus_1m,
           strftime(CAST(o_orderdate AS DATE) - INTERVAL 3 MONTH, '%Y-%m-%d')
               AS minus_3m,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d')
               AS month_end,
           CAST(day(last_day(CAST(o_orderdate AS DATE))) AS BIGINT)
               AS days_in_month,
           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
               AS months_since_epoch,
           strftime(CAST(o_orderdate AS DATE)
                    + INTERVAL 90 DAY, '%Y-%m-%d') AS plus_90d
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    tags=("scalar", "datetime"),
)
def scalar_interval_arith(spark: SparkSession, sf: str) -> DataFrame:
    """Calendar interval arithmetic with the month-end clamping rules
    where engines classically diverge: Jan 31 + 1 month must clamp to
    Feb 28/29 identically (Spark add_months == DuckDB + INTERVAL n
    MONTH), last_day, days-in-month, and exact day offsets. Date-level
    outputs (Spark's add_months returns DATE; DuckDB's interval add
    keeps the timestamp) — the cross-engine contract is the calendar
    DAY, rendered as strings.

    Scale: pure narrow scalar map; the filter keeps output summary-sized.
    """
    o = table(spark, sf, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.date_format(F.add_months(d, 1), "yyyy-MM-dd").alias("plus_1m"),
        F.date_format(F.add_months(d, -3), "yyyy-MM-dd").alias("minus_3m"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.dayofmonth(F.last_day(d)).cast("bigint").alias("days_in_month"),
        (F.year(d) * 12 + F.month(d)).cast("bigint")
        .alias("months_since_epoch"),
        F.date_format(F.date_add(d, 90), "yyyy-MM-dd").alias("plus_90d"),
    )


@query(
    "scalar_variant_shred",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
               AS k_bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_sum,
           CAST(SUM(CASE WHEN json_valid(props) THEN 0 ELSE 1 END)
               AS BIGINT) AS n_invalid
    FROM events
    GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
    ORDER BY k_bucket
    """,
    tags=("scalar", "json", "variant"),
)
def scalar_variant_shred(spark: SparkSession, sf: str) -> DataFrame:
    """Semi-structured ingestion through Spark 4's VARIANT type: props
    parsed ONCE with try_parse_json (malformed rows become NULL variants
    instead of failing the scan — counted, not dropped), fields
    extracted with variant_get, then aggregated. The DuckDB oracle does
    the same shredding with its JSON functions — both engines must
    agree on every bucket.

    Scale: VARIANT is the current answer to schema-on-read event
    payloads at 100 TB — the binary-encoded variant parses the JSON
    text once at scan, and variant_get navigates the binary form per
    access, vs get_json_object re-parsing the string for EVERY path
    (scalar_json_funcs shows the string path; a query touching 5 fields
    pays 5 parses there, 1 here). The aggregate itself is an ordinary
    10-bucket map-side-combinable rollup.
    """
    e = table(spark, sf, "events")
    v = F.try_parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "bigint")
    return (
        e.select(
            (k % 10).alias("k_bucket"),
            k.alias("k"),
            F.when(v.isNull(), 1).otherwise(0).alias("invalid"),
        )
        .groupBy("k_bucket")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.sum("invalid").cast("bigint").alias("n_invalid"),
        )
        .orderBy("k_bucket")
    )


@query(
    "scalar_collation_caseless",
    oracle="""
    WITH mangled AS (
      SELECT c_mktsegment,
             CASE WHEN (('0x' || substr(md5(c_name), 1, 15))::BIGINT) % 2 = 0
                  THEN upper(c_name) ELSE lower(c_name) END AS name_mixed
      FROM customer
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT name_mixed) AS BIGINT) AS distinct_sensitive,
           CAST(COUNT(DISTINCT lower(name_mixed)) AS BIGINT)
               AS distinct_caseless
    FROM mangled
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("scalar", "string", "collation"),
)
def scalar_collation_caseless(spark: SparkSession, sf: str) -> DataFrame:
    """Collation-aware comparison via Spark 4 collations: customer names
    are deterministically case-mangled (md5-hash coin flip between
    upper/lower), then counted distinct under the default binary
    collation AND under UTF8_LCASE — the engine-level case-insensitive
    equality that makes dedup/joins on user-entered strings correct
    without wrapping every column in lower() (the collation rides the
    type, so every comparison, join, and GROUP BY downstream inherits
    it). The DuckDB oracle expresses the same semantics with
    lower()-normalized distinct; both engines must agree per segment.

    Scale: countDistinct under a collation shuffles collation keys just
    like binary strings — no plan-shape change; what changes at 100 TB
    is correctness of every string join against mixed-case sources
    without a normalize-and-copy pass over the corpus.
    """
    c = table(spark, sf, "customer")
    h = F.expr(
        "CAST(conv(substring(md5(c_name), 1, 15), 16, 10) AS BIGINT) % 2"
    )
    mangled = c.select(
        "c_mktsegment",
        F.when(h == 0, F.upper("c_name"))
        .otherwise(F.lower("c_name")).alias("name_mixed"),
    )
    return (
        mangled.groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("name_mixed").cast("bigint")
            .alias("distinct_sensitive"),
            F.countDistinct(F.collate(F.col("name_mixed"), "UTF8_LCASE"))
            .cast("bigint").alias("distinct_caseless"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "scalar_try_arith",
    oracle="""
    SELECT o_orderkey,
           ROUND(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                 / NULLIF(o_orderkey % 5, 0), 4) AS div_r4,
           CASE WHEN o_orderkey % 5 = 0 THEN NULL
                ELSE o_orderkey % (o_orderkey % 5) END AS mod_safe,
           CASE WHEN o_orderkey > 1 THEN NULL
                ELSE o_orderkey * 9223372036854775807 END AS mul_edge,
           CASE WHEN o_orderkey >= 1 THEN NULL
                ELSE CAST(9223372036854775807 + o_orderkey AS BIGINT)
           END AS add_overflow
    FROM orders
    WHERE o_orderkey % 10 = 0
    """,
    tags=("scalar", "math", "ansi"),
)
def scalar_try_arith(spark: SparkSession, sf: str) -> DataFrame:
    """ANSI-safe arithmetic: try_divide / try_mod return NULL on
    divide-by-zero, try_multiply / try_add return NULL on int64
    overflow — per row, instead of either failing the job (ANSI strict)
    or silently wrapping (legacy). The DuckDB twin expresses the same
    semantics with NULLIF / CASE guards (DuckDB promotes to HUGEINT
    rather than overflowing, so the guard IS the portable meaning).

    The 100-TB relevance: a single bad denominator in row
    3,000,000,000 must not kill a 6-hour job, and a silent wraparound
    is worse — try_* is the per-cell quarantine the engine-level
    null-on-error cast (§1.2, typemap.py) gives the pcap path, applied
    to arithmetic. All expressions are codegen'd JVM ops; the only
    float crossing the engine boundary is one ROUND(4dp) division per
    row, deterministic per input. Key-mod filter bounds the gate's
    collect+hash size (the scalar_math_funcs convention); the
    function surface is unchanged.
    """
    o = table(spark, sf, "orders").filter(F.col("o_orderkey") % 10 == 0)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(cents(F.col("o_totalprice")), k % 5), 4)
        .alias("div_r4"),
        F.try_mod(k, k % 5).cast("bigint").alias("mod_safe"),
        F.try_multiply(k, F.lit(9223372036854775807).cast("bigint"))
        .cast("bigint").alias("mul_edge"),
        F.try_add(F.lit(9223372036854775807).cast("bigint"), k)
        .cast("bigint").alias("add_overflow"),
    )


@query(
    "scalar_parse_url",
    oracle="""
    WITH urls AS (
      SELECT doc_id,
             'https://cdn' || CAST(doc_id % 7 AS VARCHAR)
               || '.example.com/assets/' || source || '/'
               || CAST(doc_id AS VARCHAR) || '.html?lang=' || lang
               || '&v=' || CAST(doc_id % 5 AS VARCHAR) AS url
      FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query_string,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param
    FROM urls
    """,
    tags=("scalar", "string", "url"),
)
def scalar_parse_url(spark: SparkSession, sf: str) -> DataFrame:
    """URL decomposition with Spark's NATIVE parse_url (protocol, host,
    path, query, and single-parameter extraction) against a regexp
    oracle — DuckDB has no parse_url, so the oracle states the
    expected fields independently, which is exactly what makes this a
    real parity check of the built-in rather than regexp-vs-regexp.
    Complements text_url_extract_normalize (regexp-based provenance
    rollup) by pinning the engine-native path a warehouse would use.

    Scale: pure narrow map; parse_url is a codegen'd JVM expression.
    """
    d = table(spark, sf, "documents")
    url = F.concat(
        F.lit("https://cdn"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/assets/"), F.col("source"), F.lit("/"),
        F.col("doc_id").cast("string"), F.lit(".html?lang="),
        F.col("lang"), F.lit("&v="), (F.col("doc_id") % 5).cast("string"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.lower(F.parse_url(F.col("url"), F.lit("PROTOCOL"))).alias("proto"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query_string"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang"))
        .alias("lang_param"),
    )


@query(
    "scalar_regexp_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Z][a-z]+')) AS BIGINT)
               AS n_capitalized,
           NULLIF(regexp_extract(text, '([A-Z][a-z]+)', 1), '')
               AS first_capitalized,
           CASE WHEN regexp_matches(text, '[0-9]{2,}') THEN 1 ELSE 0 END
               AS has_long_number,
           regexp_replace(text, '[0-9]+', '#', 'g') LIKE '%#%'
               AS digits_masked
    FROM documents
    """,
    tags=("scalar", "string", "regexp"),
)
def scalar_regexp_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """The regexp function family in one row: regexp_count /
    regexp_substr / rlike / regexp_replace — java.util.regex vs RE2 on
    the shared-subset patterns the corpus restricts itself to (classes,
    quantifiers, no lookaround).

    Scale: narrow map; all four compile once per task and stream.
    """
    d = table(spark, sf, "documents", spread=True)
    return d.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit("[A-Z][a-z]+"))
        .cast("bigint").alias("n_capitalized"),
        F.regexp_substr(F.col("text"), F.lit("[A-Z][a-z]+"))
        .alias("first_capitalized"),
        F.when(F.col("text").rlike("[0-9]{2,}"), 1).otherwise(0)
        .alias("has_long_number"),
        F.regexp_replace(F.col("text"), "[0-9]+", "#").like("%#%")
        .alias("digits_masked"),
    )


@query(
    "scalar_lambda_hofs",
    oracle="""
    WITH a AS (
      SELECT o_orderpriority AS pri,
             range(1, o_orderkey % 7 + 4) AS xs
      FROM orders
    ),
    per_row AS (
      SELECT pri,
             CAST(list_sum(list_transform(xs, x -> x * x)) AS BIGINT)
                 AS sq_sum,
             CAST(len(list_filter(xs, x -> x % 2 = 0)) AS BIGINT)
                 AS n_even,
             CASE WHEN len(list_filter(xs, x -> x > 5)) > 0
                  THEN 1 ELSE 0 END AS has_gt5,
             CASE WHEN len(list_filter(xs, x -> x <= 0)) = 0
                  THEN 1 ELSE 0 END AS all_pos,
             CAST(list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                              list_transform(xs, x -> CAST(2 * x AS BIGINT))),
                 (acc, x) -> acc + x) AS BIGINT) AS dbl_fold
      FROM a
    )
    SELECT pri,
           CAST(SUM(sq_sum) AS BIGINT) AS sq_sum,
           CAST(SUM(n_even) AS BIGINT) AS n_even,
           CAST(SUM(has_gt5) AS BIGINT) AS n_has_gt5,
           CAST(SUM(all_pos) AS BIGINT) AS n_all_pos,
           CAST(SUM(dbl_fold) AS BIGINT) AS dbl_fold
    FROM per_row
    GROUP BY pri
    ORDER BY pri
    """,
    tags=("scalar", "array", "hof"),
)
def scalar_lambda_hofs(spark: SparkSession, sf: str) -> DataFrame:
    """Lambda higher-order functions over arrays — transform / filter /
    exists / forall / aggregate — the Catalyst feature that keeps
    per-element logic OUT of Python UDFs (each lambda compiles into
    whole-stage codegen; the engine's own packing/minhash/forecast
    operators are built on exactly these).

    Parity mapping documented per function: Spark exists/forall have no
    direct DuckDB twin, so the oracle expresses them as
    len(list_filter(...)) predicates; Spark aggregate's explicit zero
    becomes DuckDB list_reduce over a prepended seed (int accumulators
    only — struct accumulators hit the DuckDB 1.0 fold bug documented
    on forecast_holt_linear). sequence(1, k % 7 + 3) gives every row a
    3-9 element array, all arithmetic exact int64.

    Scale: pure narrow map + one keyed aggregate; no explode, no
    shuffle beyond the group-by.
    """
    o = table(spark, sf, "orders")
    a = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.expr("sequence(1L, o_orderkey % 7 + 3)").alias("xs"),
    )
    per_row = a.select(
        "pri",
        F.expr("aggregate(transform(xs, x -> x * x), CAST(0 AS BIGINT), "
               "(acc, x) -> acc + x)").alias("sq_sum"),
        F.expr("CAST(size(filter(xs, x -> x % 2 = 0)) AS BIGINT)")
        .alias("n_even"),
        F.expr("CASE WHEN exists(xs, x -> x > 5) THEN 1 ELSE 0 END")
        .alias("has_gt5"),
        F.expr("CASE WHEN forall(xs, x -> x > 0) THEN 1 ELSE 0 END")
        .alias("all_pos"),
        F.expr("aggregate(transform(xs, x -> CAST(2 * x AS BIGINT)), "
               "CAST(0 AS BIGINT), (acc, x) -> acc + x)").alias("dbl_fold"),
    )
    return (
        per_row.groupBy("pri")
        .agg(
            F.sum("sq_sum").cast("bigint").alias("sq_sum"),
            F.sum("n_even").cast("bigint").alias("n_even"),
            F.sum("has_gt5").cast("bigint").alias("n_has_gt5"),
            F.sum("all_pos").cast("bigint").alias("n_all_pos"),
            F.sum("dbl_fold").cast("bigint").alias("dbl_fold"),
        )
        .orderBy("pri")
    )


@query(
    "scalar_array_set_ops",
    oracle="""
    WITH a AS (
      SELECT o_orderpriority AS pri,
             range(1, o_orderkey % 5 + 3) AS xs,
             range(CAST(o_orderkey % 3 AS BIGINT),
                   CAST(o_orderkey % 3 + 4 AS BIGINT)) AS ys
      FROM orders
    ),
    per_row AS (
      SELECT pri,
             CAST(len(list_intersect(xs, ys)) AS BIGINT) AS n_common,
             CAST(len(list_distinct(list_concat(xs, ys))) AS BIGINT)
                 AS n_union,
             CAST(len(list_filter(xs, x -> NOT list_contains(ys, x)))
                 AS BIGINT) AS n_only_xs,
             CAST(list_sum(list_distinct(list_concat(xs, ys)))
                 AS BIGINT) AS union_sum
      FROM a
    )
    SELECT pri,
           CAST(SUM(n_common) AS BIGINT) AS n_common,
           CAST(SUM(n_union) AS BIGINT) AS n_union,
           CAST(SUM(n_only_xs) AS BIGINT) AS n_only_xs,
           CAST(SUM(union_sum) AS BIGINT) AS union_sum
    FROM per_row
    GROUP BY pri
    ORDER BY pri
    """,
    tags=("scalar", "array"),
)
def scalar_array_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """Array SET operations — array_intersect / array_union /
    array_except — the per-row set algebra behind tag matching,
    permission diffs, and feature overlap, kept in codegen instead of
    exploding to row-level joins.

    Parity mapping: Spark's array_union dedups (DuckDB:
    list_distinct(list_concat)); array_except has no DuckDB twin, so
    the oracle spells it as a NOT-contains filter. Counts and an
    element sum per row make the check order-insensitive (both engines
    may order set results differently — only SIZES and SUMS are
    asserted, exact int64).

    Scale: pure narrow map + one keyed aggregate.
    """
    o = table(spark, sf, "orders")
    a = o.select(
        F.col("o_orderpriority").alias("pri"),
        F.expr("sequence(1L, o_orderkey % 5 + 2)").alias("xs"),
        F.expr("sequence(o_orderkey % 3, o_orderkey % 3 + 3)").alias("ys"),
    )
    per_row = a.select(
        "pri",
        F.size(F.array_intersect("xs", "ys")).cast("bigint")
        .alias("n_common"),
        F.size(F.array_union("xs", "ys")).cast("bigint").alias("n_union"),
        F.size(F.array_except("xs", "ys")).cast("bigint")
        .alias("n_only_xs"),
        F.expr("aggregate(array_union(xs, ys), CAST(0 AS BIGINT), "
               "(acc, x) -> acc + x)").alias("union_sum"),
    )
    return (
        per_row.groupBy("pri")
        .agg(
            F.sum("n_common").cast("bigint").alias("n_common"),
            F.sum("n_union").cast("bigint").alias("n_union"),
            F.sum("n_only_xs").cast("bigint").alias("n_only_xs"),
            F.sum("union_sum").cast("bigint").alias("union_sum"),
        )
        .orderBy("pri")
    )
