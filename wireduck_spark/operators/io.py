"""Source/sink surface (SURVEY.md §2 Tier B rows "parquet/csv/json scans"
and "query result -> table/file"): every query writes through a real
format round-trip — write to disk, re-read, return the re-read result —
so the driver's oracle checks the SINK path, not just the computation.

Scratch files live under the repo cache dir, partitioned by scale factor
so concurrent sf runs don't collide.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wireduck_spark.registry import cents, query, table
from wireduck_spark.sources.glossary import spark_scratch_dir


def _scratch(sf_dir: str, name: str) -> str:
    # Process-private root (glossary.spark_scratch_dir): Spark overwrite
    # writes race across concurrent sessions on a shared path. The sf tag
    # still partitions within the process so sf0.01/sf0.1 runs coexist.
    tag = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(spark_scratch_dir(), "io_scratch", tag, name)


@query(
    "io_parquet_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("io", "sink"),
)
def io_parquet_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate -> write parquet (overwrite) -> re-read -> return.

    Scale: parquet is the native sink (columnar, predicate-pushdown-able
    on re-read); overwrite mode is the idempotent batch-job pattern.
    """
    o = table(spark, sf, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col("o_totalprice"))).alias("revenue_cents"),
    )
    path = _scratch(sf, "orders_by_status.parquet")
    agg.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@query(
    "io_orc_roundtrip",
    oracle="""
    SELECT n_regionkey,
           COUNT(*) AS n_nations,
           CAST(SUM(CAST(n_nationkey AS BIGINT)) AS BIGINT) AS key_sum
    FROM nation
    GROUP BY n_regionkey
    """,
    tags=("io", "sink"),
)
def io_orc_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate -> write ORC -> re-read -> return (the other columnar
    format Spark ships natively; DuckDB can't read ORC, so the oracle
    recomputes from the source table — the round-trip preserving the
    values IS the assertion)."""
    n = table(spark, sf, "nation")
    agg = n.groupBy("n_regionkey").agg(
        F.count("*").alias("n_nations"),
        F.sum(F.col("n_nationkey").cast("bigint")).alias("key_sum"),
    )
    path = _scratch(sf, "nations_by_region.orc")
    agg.write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@query(
    "io_csv_roundtrip",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment,
           CAST(c_nationkey AS BIGINT) AS nationkey
    FROM customer WHERE c_acctbal > 5000
    """,
    tags=("io", "sink"),
)
def io_csv_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Projection -> CSV with header -> re-read with explicit schema.

    Integer/string columns only: CSV is not a faithful float transport,
    and the round-trip is what's under test.
    """
    c = table(spark, sf, "customer")
    out = c.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", "c_name", "c_mktsegment",
        F.col("c_nationkey").cast("bigint").alias("nationkey"),
    )
    path = _scratch(sf, "rich_customers.csv")
    out.write.mode("overwrite").option("header", True).csv(path)
    return spark.read.option("header", True).schema(
        "c_custkey BIGINT, c_name STRING, c_mktsegment STRING, nationkey BIGINT"
    ).csv(path)


@query(
    "io_json_roundtrip",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events WHERE event_type IN ('signup', 'error')
    """,
    tags=("io", "sink"),
)
def io_json_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Filter + JSON-extract -> write JSON lines -> re-read with schema."""
    e = table(spark, sf, "events")
    out = e.filter(F.col("event_type").isin("signup", "error")).select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    path = _scratch(sf, "signup_errors.json")
    out.write.mode("overwrite").json(path)
    return spark.read.schema("event_id BIGINT, event_type STRING, k BIGINT").json(
        path
    )


@query(
    "io_xml_roundtrip",
    oracle="""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_total
    FROM documents
    GROUP BY source, lang
    """,
    tags=("io", "sink"),
)
def io_xml_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """Aggregate -> write XML -> re-read with explicit schema -> return.

    Spark 4 ships the (formerly spark-xml) XML source built in; XML is
    the interchange format of the enterprise-feed world (SEC filings,
    sitemaps, RSS/ATOM crawl layers), so a corpus-ingest engine needs
    the round-trip proven. DuckDB cannot read XML, so — exactly like
    the ORC twin — the oracle recomputes the aggregate from the source
    parquet and the round-trip preserving every value IS the assertion.

    Integer/string columns only (XML is not a faithful float
    transport, same contract as io_csv_roundtrip). Scale: row-major
    verbose text format — the docstring's honest 100-TB advice is
    land XML at the edge, convert to parquet once (this query IS that
    conversion pattern, reversed to prove fidelity); rowTag reads
    split per file, so many medium files parallelize the scan.
    """
    d = table(spark, sf, "documents")
    agg = d.groupBy("source", "lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
    )
    path = _scratch(sf, "docs_by_source_lang.xml")
    (
        agg.write.mode("overwrite").format("xml")
        .option("rootTag", "sources").option("rowTag", "cell")
        .save(path)
    )
    return (
        spark.read.format("xml").option("rowTag", "cell")
        .schema("source STRING, lang STRING, n_docs BIGINT,"
                " chars_total BIGINT")
        .load(path)
    )


@query(
    "io_partitioned_pruning",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
    tags=("io", "sink", "partitioning"),
)
def io_partitioned_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """Hive-layout partitioned write + partition-pruned read: orders are
    written `partitionBy(o_orderstatus)`, then re-read with a filter on
    the partition column, so the scan touches only the o_orderstatus=F
    directory (PartitionFilters in the plan — pinned by
    tests/test_plans.py::test_partitioned_write_prunes_directories).

    Scale: THE layout primitive at 100 TB — a date/status-partitioned
    corpus turns full scans into directory lookups, and the partition
    column costs zero bytes in the files. The aggregate after the pruned
    read is map-side combinable onto 5 priority groups.
    """
    path = _scratch(sf, "orders_by_status")
    o = table(spark, sf, "orders")
    (
        o.write.mode("overwrite")
        .partitionBy("o_orderstatus")
        .parquet(path)
    )
    rr = spark.read.parquet(path).filter(F.col("o_orderstatus") == "F")
    return rr.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col("o_totalprice"))).alias("revenue_cents"),
    )


@query(
    "io_sorted_clustered_write",
    oracle="""
    SELECT COUNT(*) AS n_orders,
           CAST(MIN(epoch_us(o_orderdate)) AS BIGINT) AS min_us,
           CAST(MAX(epoch_us(o_orderdate)) AS BIGINT) AS max_us
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
    """,
    tags=("io", "sink", "clustering"),
)
def io_sorted_clustered_write(spark: SparkSession, sf: str) -> DataFrame:
    """Range-clustered rewrite + time-slice read: orders are
    repartitionByRange(o_orderdate) + sortWithinPartitions before the
    parquet write, so each output file owns a disjoint date range and a
    date-sliced read can skip every other file on row-group min/max
    stats.

    Scale: clustering is the data-skipping primitive when the filter
    column has too many values to partitionBy (a date-partitioned +
    date-range-clustered layout turns "scan 100 TB" into "read the three
    files covering Q1-1996"). The disjointness of per-file min/max is
    asserted from the parquet footers in
    tests/test_plans.py::test_sorted_write_produces_disjoint_files; this
    query's oracle checks the sliced read returns exactly the right
    rows after the rewrite.
    """
    path = _scratch(sf, "orders_clustered")
    o = table(spark, sf, "orders")
    (
        o.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    rr = spark.read.parquet(path).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    return rr.agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.min(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .cast("bigint").alias("min_us"),
        F.max(F.unix_micros(F.col("o_orderdate").cast("timestamp")))
        .cast("bigint").alias("max_us"),
    )


@query(
    "io_schema_evolution",
    oracle="""
    WITH unioned AS (
      SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT o_orderkey % 2 AS gen,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(o_orderpriority) AS BIGINT) AS n_with_priority,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM unioned
    GROUP BY o_orderkey % 2
    ORDER BY gen
    """,
    tags=("io", "schema-evolution"),
)
def io_schema_evolution(spark: SparkSession, sf: str) -> DataFrame:
    """Schema evolution across parquet generations: generation 0 written
    WITHOUT o_orderpriority, generation 1 with it; one mergeSchema read
    reconciles both, old files surface the new column as NULL.

    The lake reality at 100 TB: years of files, schemas that grew
    columns along the way, and no rewrite budget. mergeSchema resolves
    the superset schema from file footers only (no data read) and the
    scan stays partition-parallel; the NULL-backfill is free at read
    time. The aggregate proves the reconciliation: gen-0 rows count 0
    non-null priorities, gen-1 rows count all, sums match the source
    table exactly.
    """
    base = _scratch(sf, "orders_evolved")
    o = table(spark, sf, "orders")
    (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
        .write.mode("overwrite").parquet(f"{base}/gen=0")
    )
    (
        o.filter(F.col("o_orderkey") % 2 == 1)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.mode("overwrite").parquet(f"{base}/gen=1")
    )
    rr = spark.read.option("mergeSchema", "true").parquet(
        f"{base}/gen=0", f"{base}/gen=1"
    )
    return (
        rr.groupBy((F.col("o_orderkey") % 2).alias("gen"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.count("o_orderpriority").cast("bigint")
            .alias("n_with_priority"),
            F.sum(cents(F.col("o_totalprice"))).cast("bigint")
            .alias("sum_cents"),
        )
        .orderBy("gen")
    )


def zorder_value(xcol, ycol, bits: int = 10):
    """Morton/Z-value of two columns already normalized to [0, 2^bits):
    interleave bit i of x into position 2i and of y into 2i+1. Pure JVM
    bit arithmetic — whole-stage-codegen-friendly, no UDF.

    The normalization matters: interleaving RAW values lets whichever
    dimension has more high bits dominate the curve and the layout
    degenerates to a 1-D sort on that column (measured exactly that with
    l_partkey's 11 bits vs l_suppkey's 7 before normalizing)."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xcol.cast("bigint"), i)
                          .bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(ycol.cast("bigint"), i)
                          .bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def normalize_to_bits(col, min_col, max_col, bits: int = 10):
    """Min/max-scale a numeric column onto the integer grid [0, 2^bits-1]
    so both z-order dimensions carry equal bit weight. Production layouts
    use quantile ranks for skewed columns; min/max suffices for the
    near-uniform dense keys here."""
    span = F.greatest(max_col - min_col, F.lit(1)).cast("double")
    return F.floor(
        (col - min_col).cast("double") * ((1 << bits) - 1) / span
    ).cast("bigint")


@query(
    "io_zorder_clustered_write",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT))
                AS BIGINT) AS price_cents,
           CAST(MIN(l_partkey) AS BIGINT) AS min_pk,
           CAST(MAX(l_suppkey) AS BIGINT) AS max_sk
    FROM lineitem
    WHERE l_partkey BETWEEN 1 AND 150 AND l_suppkey BETWEEN 1 AND 8
    """,
    tags=("io", "sink", "clustering"),
)
def io_zorder_clustered_write(spark: SparkSession, sf: str) -> DataFrame:
    """Z-order (Morton-curve) clustered rewrite + 2-D box read: lineitem
    is laid out by the bit-interleaved (l_partkey, l_suppkey) Z-value —
    repartitionByRange + sortWithinPartitions on zval — so EVERY file
    covers a bounded range of BOTH dimensions, and a two-predicate box
    query skips files on row-group min/max stats for either column.
    Range-clustering (io_sorted_clustered_write) only localizes one
    column; Z-order is the standard multi-dimensional upgrade (Delta/
    Iceberg OPTIMIZE ZORDER BY) expressed with stock Spark operators.

    Scale: the rewrite is one range shuffle on a computed column; the
    Z-value is 32 codegen'd bit ops per row, no UDF. Per-file
    both-dimension locality is asserted from parquet footers in
    tests/test_plans.py::test_zorder_write_localizes_both_dims; this
    query's oracle checks the box read returns exactly the right rows
    after the rewrite.
    """
    path = _scratch(sf, "lineitem_zorder")
    li = table(spark, sf, "lineitem")
    # per-dim min/max: one tiny agg broadcast to every row (the same
    # 1-row crossJoin pattern as the scalar-subquery operators)
    bounds = li.agg(
        F.min("l_partkey").alias("pk_min"), F.max("l_partkey").alias("pk_max"),
        F.min("l_suppkey").alias("sk_min"), F.max("l_suppkey").alias("sk_max"),
    )
    zval = zorder_value(
        normalize_to_bits(F.col("l_partkey"), F.col("pk_min"),
                          F.col("pk_max")),
        normalize_to_bits(F.col("l_suppkey"), F.col("sk_min"),
                          F.col("sk_max")),
    )
    (
        li.crossJoin(F.broadcast(bounds))
        .withColumn("zval", zval)
        .repartitionByRange(16, "zval")
        .sortWithinPartitions("zval")
        .drop("zval", "pk_min", "pk_max", "sk_min", "sk_max")
        .write.mode("overwrite")
        .parquet(path)
    )
    rr = spark.read.parquet(path).filter(
        F.col("l_partkey").between(1, 150) & F.col("l_suppkey").between(1, 8)
    )
    return rr.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(cents(F.col("l_extendedprice"))).cast("bigint")
        .alias("price_cents"),
        F.min("l_partkey").cast("bigint").alias("min_pk"),
        F.max("l_suppkey").cast("bigint").alias("max_sk"),
    )


@query(
    "io_column_profile",
    oracle="""
    WITH src AS (
        SELECT l_orderkey,
               l_partkey,
               CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
               l_returnflag
        FROM lineitem
    )
    SELECT 'l_orderkey' AS col_name,
           COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(l_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_val,
           CAST(MAX(l_orderkey) AS VARCHAR) AS max_val
    FROM src
    UNION ALL
    SELECT 'l_partkey', COUNT(*),
           CAST(COUNT(*) - COUNT(l_partkey) AS BIGINT),
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT),
           CAST(MIN(l_partkey) AS VARCHAR), CAST(MAX(l_partkey) AS VARCHAR)
    FROM src
    UNION ALL
    SELECT 'price_cents', COUNT(*),
           CAST(COUNT(*) - COUNT(price_cents) AS BIGINT),
           CAST(COUNT(DISTINCT price_cents) AS BIGINT),
           CAST(MIN(price_cents) AS VARCHAR),
           CAST(MAX(price_cents) AS VARCHAR)
    FROM src
    UNION ALL
    SELECT 'l_returnflag', COUNT(*),
           CAST(COUNT(*) - COUNT(l_returnflag) AS BIGINT),
           CAST(COUNT(DISTINCT l_returnflag) AS BIGINT),
           MIN(l_returnflag), MAX(l_returnflag)
    FROM src
    """,
    tags=("io", "profiling"),
)
def io_column_profile(spark: SparkSession, sf: str) -> DataFrame:
    """ANALYZE-style column profile: one output row per profiled column
    with rowcount, null count, exact NDV, and min/max rendered as
    strings (so mixed column types stack into one relation — the shape
    every data catalog / quality dashboard ingests).

    All four profiles compute in ONE pass over lineitem: a single
    aggregate node produces every (count, nulls, NDV, min, max) pair,
    then a literal unpivot reshapes the 1-row aggregate into rows.
    Doubles are profiled through integer cents (registry rule 1) so
    min/max strings are canonical integers on both engines.

    Scale: count_distinct on multiple columns in one agg triggers
    Spark's Expand (one duplicated stream per distinct column) — the
    accepted cost for exact NDV; swap to approx_count_distinct (HLL,
    sketch_hll_distinct) when 2% error is acceptable at 100 TB.
    """
    l = table(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
        .alias("price_cents"),
        "l_returnflag",
    )
    agg = l.agg(
        F.count("*").alias("n_rows"),
        *[
            x
            for c in ("l_orderkey", "l_partkey", "price_cents",
                      "l_returnflag")
            for x in (
                (F.count("*") - F.count(c)).cast("bigint")
                .alias(f"{c}__nulls"),
                F.count_distinct(F.col(c)).cast("bigint")
                .alias(f"{c}__ndv"),
                F.min(c).cast("string").alias(f"{c}__min"),
                F.max(c).cast("string").alias(f"{c}__max"),
            )
        ],
    )
    profiles = F.array(*[
        F.struct(
            F.lit(c).alias("col_name"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__ndv").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_val"),
            F.col(f"{c}__max").alias("max_val"),
        )
        for c in ("l_orderkey", "l_partkey", "price_cents", "l_returnflag")
    ])
    return (
        agg.select(F.explode(profiles).alias("p"))
        .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct",
                "p.min_val", "p.max_val")
    )


@query(
    "io_snapshot_time_travel",
    oracle="""
    -- v1 = even orderkeys; v2 = v1 minus %10 rows plus all odd keys.
    -- Reading 'as of v1' after v2 was committed must reproduce v1.
    WITH v1 AS (
        SELECT * FROM orders WHERE o_orderkey % 2 = 0
    ), v2 AS (
        SELECT * FROM v1 WHERE o_orderkey % 10 <> 0
        UNION ALL
        SELECT * FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT 'v1' AS snapshot, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM v1
    UNION ALL
    SELECT 'v2', CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
    FROM v2
    """,
    tags=("io", "versioning"),
)
def io_snapshot_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    """Snapshot isolation + time travel over plain parquet, Delta-style
    but container-installable: each commit writes NEW data files plus a
    tiny JSON manifest listing every file visible in that snapshot;
    readers resolve a version by reading ONE manifest (never listing
    the directory), so an old snapshot stays readable after later
    commits add/remove files — the mechanism behind Delta/Iceberg time
    travel, reduced to its data-layout essentials.

    v1 commits the even orderkeys; v2 logically deletes every %10 row
    (by rewriting just the file that held them — copy-on-write) and
    appends the odd keys. The query reads BOTH snapshots after the v2
    commit and aggregates each; matching the oracle proves v1 is
    untouched by v2's delete+append.

    Scale: manifests are O(files) JSON on the driver — the same shape
    Delta's _delta_log holds; data reads stay partition-parallel
    because the manifest hands Spark an explicit file list.
    """
    import json

    base = _scratch(sf, "snapshots")
    o = table(spark, sf, "orders")
    even = o.filter(F.col("o_orderkey") % 2 == 0)

    def commit(version: int, files: list) -> None:
        manifest = {"version": version, "files": sorted(files)}
        tmp = f"{base}/_manifest_v{version}.json.tmp"
        os.makedirs(base, exist_ok=True)
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, f"{base}/_manifest_v{version}.json")

    def data_files(path: str) -> list:
        return [
            f"{path}/{f}" for f in os.listdir(path)
            if f.endswith(".parquet")
        ]

    marker = f"{base}/_manifest_v2.json"
    if not os.path.exists(marker):
        # v1: two file groups so the delete can rewrite just one
        even.filter(F.col("o_orderkey") % 10 == 0).write.mode(
            "overwrite").parquet(f"{base}/g0")
        even.filter(F.col("o_orderkey") % 10 != 0).write.mode(
            "overwrite").parquet(f"{base}/g1")
        v1_files = data_files(f"{base}/g0") + data_files(f"{base}/g1")
        commit(1, v1_files)
        # v2: copy-on-write delete of g0's %10 rows (g0 drops out
        # entirely here) + append of the odd keys as a new file group
        o.filter(F.col("o_orderkey") % 2 == 1).write.mode(
            "overwrite").parquet(f"{base}/g2")
        v2_files = data_files(f"{base}/g1") + data_files(f"{base}/g2")
        commit(2, v2_files)

    def read_snapshot(version: int):
        with open(f"{base}/_manifest_v{version}.json") as fh:
            manifest = json.load(fh)
        return spark.read.parquet(*manifest["files"])

    def summarize(tag: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(cents(F.col("o_totalprice"))).cast("bigint")
            .alias("sum_cents"),
        ).select(F.lit(tag).alias("snapshot"), "n", "sum_cents")

    return summarize("v1", read_snapshot(1)).unionByName(
        summarize("v2", read_snapshot(2)))


@query(
    "io_small_files_compaction",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
    tags=("io", "layout"),
)
def io_small_files_compaction(spark: SparkSession, sf: str) -> DataFrame:
    """Small-files compaction — the OPTIMIZE every lake table needs:
    a fragmented write (64 shuffle-partition files from a low-volume
    stream) is rewritten into size-targeted files via coalesce, and the
    query proves content identity by aggregating the COMPACTED copy
    against the source-table oracle. The file-count collapse itself is
    pinned by tests/test_plans.py::test_compaction_reduces_file_count.

    Scale: compaction is a read+write with NO shuffle (coalesce merges
    input splits without an exchange); at 100 TB you compact per
    partition-directory with per-partition target counts, never a
    global repartition of the table.
    """
    base = _scratch(sf, "compaction")
    frag_dir, compact_dir = f"{base}/frag", f"{base}/compact"
    o = table(spark, sf, "orders")
    if not os.path.exists(f"{compact_dir}/_SUCCESS"):
        o.repartition(64).write.mode("overwrite").parquet(frag_dir)
        (
            spark.read.parquet(frag_dir)
            .coalesce(2)
            .write.mode("overwrite").parquet(compact_dir)
        )
    return (
        spark.read.parquet(compact_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(cents(F.col("o_totalprice"))).cast("bigint")
            .alias("sum_cents"),
        )
    )


@query(
    "io_bloom_filter_pointlookup",
    oracle="""
    SELECT o_orderkey, CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
               AS price_cents
    FROM orders
    WHERE o_orderkey IN (7, 4998, 29767)
    """,
    tags=("io", "layout"),
)
def io_bloom_filter_pointlookup(spark: SparkSession, sf: str) -> DataFrame:
    """Parquet bloom-filter layout: orders rewritten with a bloom filter
    on the key column, then point-lookup re-read. Row-group min/max
    stats can't prune point lookups on an UNSORTED key (every group
    spans most of the key range); the bloom filter is the layout that
    answers "is key K possibly here" per group without reading data
    pages — the needle-in-100-TB primitive.

    Bloom presence is asserted physically by
    tests/test_plans.py::test_bloom_write_adds_filter_bytes (neither
    DuckDB's parquet_metadata nor this pyarrow expose the bloom offset,
    so the check compares bloom-on/off file sizes of identical data);
    this query's oracle pins the lookup results.
    """
    base = _scratch(sf, "bloom_lookup")
    o = table(spark, sf, "orders")
    if not os.path.exists(f"{base}/on/_SUCCESS"):
        w = o.select("o_orderkey", "o_totalprice").coalesce(1)
        (
            w.write.mode("overwrite")
            .option("parquet.bloom.filter.enabled#o_orderkey", "true")
            .option("parquet.bloom.filter.expected.ndv#o_orderkey", "200000")
            .parquet(f"{base}/on")
        )
        w.write.mode("overwrite").parquet(f"{base}/off")
    rr = spark.read.parquet(f"{base}/on")
    return rr.filter(F.col("o_orderkey").isin(7, 4998, 29767)).select(
        "o_orderkey", cents(F.col("o_totalprice")).alias("price_cents"))


@query(
    "io_multi_format_join",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS acctbal_cents
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY n.n_name
    """,
    tags=("io", "federation"),
)
def io_multi_format_join(spark: SparkSession, sf: str) -> DataFrame:
    """Federated-format join: the SAME logical query over a customer
    copy stored as CSV joined to a nation copy stored as JSON — the
    lake reality where history lives in whatever format the era's
    pipeline wrote, and Catalyst plans across them transparently
    (per-format scans feed one join; pushdown capability differs by
    format, correctness doesn't).

    Scale: format choice affects scan speed only; the join itself is
    the ordinary broadcast of the 25-row nation side.
    """
    base = _scratch(sf, "federation")
    if not os.path.exists(f"{base}/nation_json/_SUCCESS"):
        table(spark, sf, "customer").write.mode("overwrite").option(
            "header", True).csv(f"{base}/customer_csv")
        table(spark, sf, "nation").write.mode("overwrite").json(
            f"{base}/nation_json")
    c = spark.read.option("header", True).schema(
        "c_custkey BIGINT, c_name STRING, c_nationkey INT,"
        " c_acctbal DOUBLE, c_mktsegment STRING"
    ).csv(f"{base}/customer_csv")
    n = spark.read.schema(
        "n_nationkey INT, n_name STRING, n_regionkey INT"
    ).json(f"{base}/nation_json")
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.sum(cents(F.col("c_acctbal"))).cast("bigint")
            .alias("acctbal_cents"),
        )
    )


@query(
    "io_dynamic_partition_pruning",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS revenue_cents
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
    GROUP BY strftime(o_orderdate, '%Y-%m')
    ORDER BY o_month
    """,
    tags=("io", "partitioning", "join"),
)
def io_dynamic_partition_pruning(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic partition pruning: orders are laid out month-partitioned,
    then joined to a calendar dimension filtered on an attribute the fact
    table doesn't carry (fiscal quarter). The partition filter is only
    knowable at RUNTIME — it comes out of the dim-side filter, not a
    literal predicate on the fact — so Catalyst injects a dynamicpruning
    subquery that reuses the broadcast dim to prune the fact scan to the
    three 1995-Q1 month directories before any fact bytes are read
    (pinned by tests/test_plans.py::test_dynamic_partition_pruning_plan).

    This is THE star-join saver at 100 TB: static pruning
    (io_partitioned_pruning) only helps when the user filters the
    partition column directly; real dashboards filter dim attributes
    (quarter, region name, campaign) and without DPP every such join is
    a full fact scan. With a date-partitioned decade of facts, DPP turns
    "scan 120 month directories" into "scan 3".

    Scale: the calendar dim is O(#months) — always broadcastable — and
    DPP rides the broadcast it already pays for
    (reuseBroadcastOnly, the default), so the pruning itself is free.
    """
    path = _scratch(sf, "orders_by_month")
    o = table(spark, sf, "orders").withColumn(
        "o_month", F.date_format("o_orderdate", "yyyy-MM")
    )
    if not os.path.exists(f"{path}/_SUCCESS"):
        o.write.mode("overwrite").partitionBy("o_month").parquet(path)
    # calendar dim: every month 1992-01..1998-12 with its fiscal quarter
    cal = spark.sql(
        """
        SELECT date_format(m, 'yyyy-MM') AS cal_month,
               concat(year(m), '-Q', quarter(m)) AS cal_quarter
        FROM (SELECT explode(sequence(to_date('1992-01-01'),
                                      to_date('1998-12-01'),
                                      interval 1 month)) AS m)
        """
    ).filter(F.col("cal_quarter") == "1995-Q1")
    fact = spark.read.parquet(path)
    return (
        fact.join(F.broadcast(cal), fact.o_month == cal.cal_month)
        .groupBy("o_month")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(cents(F.col("o_totalprice"))).cast("bigint")
            .alias("revenue_cents"),
        )
        .orderBy("o_month")
    )


@query(
    "io_partition_overwrite_dynamic",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'click'
                         THEN CAST(ROUND(value * 2 * 100, 0) AS BIGINT)
                         ELSE CAST(ROUND(value * 100, 0) AS BIGINT)
                    END) AS BIGINT) AS value_cents
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("io", "sink", "partitioning", "upsert"),
)
def io_partition_overwrite_dynamic(spark: SparkSession, sf: str) -> DataFrame:
    """Dynamic partition overwrite — the partition-level correction
    workflow: events land type-partitioned; a backfill recomputes ONLY
    the 'click' partition (here: a value restatement to 2x cents) and
    writes it with partitionOverwriteMode=dynamic, which atomically
    replaces just the event_type=click directory and leaves every other
    partition's files untouched. A static overwrite would have dropped
    the sibling partitions; the oracle catches exactly that (all event
    types must survive with original values, clicks with restated ones).

    This is how a 100-TB date-partitioned lake takes late data and
    restatements without Delta/Iceberg: rewrite the affected partitions
    only — IO proportional to the correction, not the table — while
    readers keep listing the same directories. The mode is set as a
    per-write option, not session conf, so concurrent writers with
    different semantics don't interfere.

    Scale: write #2 shuffles only the corrected partition's rows; the
    re-read plans one split per surviving file across all partitions.
    """
    path = _scratch(sf, "events_by_type")
    e = table(spark, sf, "events").select(
        "event_id", "user_id", "value", "event_type"
    )
    e.write.mode("overwrite").partitionBy("event_type").parquet(path)
    corrected = e.filter(F.col("event_type") == "click").withColumn(
        "value", F.col("value") * 2
    )
    (
        corrected.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("event_type")
        .parquet(path)
    )
    rr = spark.read.parquet(path)
    return (
        rr.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(cents(F.col("value"))).cast("bigint").alias("value_cents"),
        )
        .orderBy("event_type")
    )


@query(
    "io_csv_corrupt_tolerant",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_corrupt,
           CAST(SUM(CASE WHEN o_orderkey % 97 = 0 THEN 0
                    ELSE CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) END)
               AS BIGINT) AS good_cents
    FROM orders
    """,
    tags=("io", "quality", "schema-enforcement"),
)
def io_csv_corrupt_tolerant(spark: SparkSession, sf: str) -> DataFrame:
    """Malformed-input tolerance on the CSV ingest path: a CSV copy of
    orders with every 97th order's price vandalized to 'N/A' is read
    back under an ENFORCED schema in PERMISSIVE mode with a
    _corrupt_record capture column — bad cells surface as NULLs + the
    raw line lands in the capture column (quarantine-able), instead of
    either failing the job (FAILFAST) or silently importing garbage.
    The oracle recomputes the intended semantics from the clean source:
    row count preserved, exactly the vandalized rows flagged, the good
    rows' sum untouched.

    The lake reality at 100 TB: CSV feeds ALWAYS contain garbage rows,
    and the three-way choice (fail / drop / quarantine-and-continue) is
    a per-pipeline decision — this query pins the quarantine path,
    Spark's production default.

    Scale: the scan is split-parallel like any CSV read; the corrupt
    capture adds one string column only on rows that fail the cast.
    """
    path = _scratch(sf, "orders_vandalized_csv")
    o = table(spark, sf, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("N/A"))
        .otherwise(F.col("o_totalprice").cast("string"))
        .alias("o_totalprice"),
    )
    o.write.mode("overwrite").option("header", True).csv(path)
    rr = (
        spark.read.option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .schema("o_orderkey BIGINT, o_totalprice DOUBLE, _bad STRING")
        .csv(path)
    )
    return rr.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("_bad").isNotNull(), 1).otherwise(0))
        .cast("bigint").alias("n_corrupt"),
        F.sum(
            F.when(F.col("_bad").isNotNull(), 0)
            .otherwise(cents(F.col("o_totalprice")))
        ).cast("bigint").alias("good_cents"),
    )


@query(
    "io_incremental_file_ledger",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows_total,
           CAST(2 AS BIGINT) AS n_batches,
           CAST(SUM(CASE WHEN o_orderkey % 10 = 7 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_late_rows,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS total_cents
    FROM orders
    """,
    tags=("io", "incremental", "ingest"),
)
def io_incremental_file_ledger(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental ingestion with a processed-file LEDGER (the batch
    version of Auto Loader / streaming file-source tracking): a landing
    directory receives an initial drop and then a late file; each
    ingest pass anti-joins the directory listing against the ledger,
    processes ONLY unseen files, and appends their names to the ledger.
    The result proves exactly-once-per-file: rows processed once across
    both passes reproduce the full source with no duplicates.

    The ledger is data (a parquet table keyed by file path), not
    driver memory — so a 100-TB lake's nightly increment is one
    metadata anti-join (paths, not rows) plus a scan of only the new
    files; re-running a crashed pass is idempotent because the ledger
    only advances after the batch's output commits.

    Scale: the listing-vs-ledger anti-join touches O(files) rows; row
    work is proportional to NEW data only. The oracle recomputes the
    invariant from the clean source (total rows/cents once each,
    late-file rows flagged by the split rule).
    """
    base = _scratch(sf, "incremental_landing")
    ledger_p = os.path.join(base, "_ledger")
    landing = os.path.join(base, "landing")
    out = os.path.join(base, "ingested")
    # reset scratch (idempotent re-runs of the QUERY itself)
    for p in (ledger_p, landing, out):
        if os.path.exists(p):
            import shutil

            shutil.rmtree(p)
    o = table(spark, sf, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    first = o.filter(F.col("o_orderkey") % 10 != 7)
    late = o.filter(F.col("o_orderkey") % 10 == 7)
    first.repartition(2).write.parquet(os.path.join(landing, "drop1"))
    spark.createDataFrame([], "path STRING").write.mode("overwrite") \
        .parquet(ledger_p)

    def ingest_pass():
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(landing)
            for f in fs if f.endswith(".parquet")
        ]
        listing = spark.createDataFrame(
            [(p,) for p in sorted(files)], "path STRING")
        seen = spark.read.parquet(ledger_p)
        new = [r["path"] for r in
               listing.join(seen, "path", "left_anti").collect()]
        if new:
            # batch tag = ledger size at pass start: a monotone sequence
            # number, distinct per file-processing pass. Tagging with
            # len(new) would collapse n_batches if two passes ever happen
            # to ingest the same number of files.
            batch_seq = seen.count()
            spark.read.parquet(*new).withColumn(
                "src", F.lit(batch_seq)
            ).write.mode("append").parquet(out)
            spark.createDataFrame([(p,) for p in new], "path STRING") \
                .write.mode("append").parquet(ledger_p)
        return len(new)

    ingest_pass()                       # processes drop1 only
    late.coalesce(1).write.parquet(os.path.join(landing, "drop2"))
    ingest_pass()                       # processes ONLY drop2
    ingest_pass()                       # no-op: everything ledgered
    got = spark.read.parquet(out)
    late_keys = F.col("o_orderkey") % 10 == 7
    return got.agg(
        F.count("*").cast("bigint").alias("n_rows_total"),
        F.countDistinct("src").cast("bigint").alias("n_batches"),
        F.sum(F.when(late_keys, 1).otherwise(0)).cast("bigint")
        .alias("n_late_rows"),
        F.sum(cents(F.col("o_totalprice"))).cast("bigint")
        .alias("total_cents"),
    )


@query(
    "io_text_log_parse",
    oracle="""
    SELECT o_orderstatus AS status,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
               AS BIGINT) AS total_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY status
    """,
    tags=("io", "text", "ingest"),
)
def io_text_log_parse(spark: SparkSession, sf: str) -> DataFrame:
    """Raw text-line ingestion (`spark.read.text`) + regexp parsing —
    the unstructured-log half of every lakehouse: app/web logs land as
    line files, and the first pipeline stage is a regexp shred into
    columns. The round-trip writes deterministic log lines rendered
    from orders, reads them back as ONE `value` column, parses key /
    status / cents with regexp_extract, and aggregates; the oracle
    recomputes the same rollup from the clean source (the
    io_csv_corrupt_tolerant pattern), proving parse-exactness without
    DuckDB needing to read line files.

    Scale: the text source splits by line ranges exactly like csv —
    thousands of log files become byte-range splits; the regexp shred
    is a narrow codegen map (no Python), and the rollup is one
    map-side-combinable aggregate. Lines that fail the pattern would
    surface as NULL status groups rather than vanishing.
    """
    path = _scratch(sf, "text_log_lines")
    if os.path.exists(path):
        import shutil

        shutil.rmtree(path)
    o = table(spark, sf, "orders")
    lines = o.select(
        F.concat(
            F.lit("evt order="), F.col("o_orderkey").cast("string"),
            F.lit(" status="), F.col("o_orderstatus"),
            F.lit(" cents="), cents(F.col("o_totalprice")).cast("string"),
        ).alias("value")
    )
    lines.write.text(path)
    raw = spark.read.text(path)
    parsed = raw.select(
        F.regexp_extract("value", r"order=(\d+)", 1).cast("bigint")
        .alias("key"),
        F.regexp_extract("value", r"status=(\S+)", 1).alias("status"),
        F.regexp_extract("value", r"cents=(-?\d+)", 1).cast("bigint")
        .alias("cents"),
    )
    return (
        parsed.groupBy("status")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.max("key").cast("bigint").alias("max_key"),
        )
        .orderBy("status")
    )


@query(
    "io_binaryfile_ingest",
    oracle="""
    WITH src AS (
        SELECT doc_id, text, md5(text) AS h,
               CAST(strlen(text) AS BIGINT) AS nb
        FROM documents WHERE doc_id < 20 AND text IS NOT NULL
          AND strlen(text) > 0
    )
    SELECT CAST(COUNT(*) * 2 AS BIGINT) AS n_files,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_assets,
           CAST(COUNT(*) * 2 - COUNT(DISTINCT h) AS BIGINT) AS dup_files,
           CAST(SUM(nb) * 2 AS BIGINT) AS total_bytes
    FROM src
    """,
    tags=("io", "binary", "multimodal", "ingest"),
)
def io_binaryfile_ingest(spark: SparkSession, sf: str) -> DataFrame:
    """Opaque-asset ingestion via the `binaryFile` source — the step
    that actually FEEDS the multimodal battery (mm_* queries operate on
    binary columns; this is where those columns come from at 100 TB: a
    bucket of image/audio files read as (path, length, content) rows).
    The scratch landing zone holds every asset TWICE (the crawler-
    duplicate regime); ingestion fingerprints content (md5) and reports
    the content-addressed dedup arithmetic. The oracle recomputes the
    same counts from the documents the assets were rendered from —
    byte-level parity because Spark's md5(binary) over utf8 bytes
    equals DuckDB's md5(text).

    Scale: binaryFile lists then reads whole files per task (assets
    are indivisible); content never shuffles — only (hash, length)
    pairs reach the aggregate, the same payloads-stay-put rule as
    mm_asset_dedup. Spark's 2 GiB column limit caps single assets, the
    documented seam where a real lake switches to pointer+range reads.
    """
    base = _scratch(sf, "binary_assets")
    if os.path.exists(base):
        import shutil

        shutil.rmtree(base)
    os.makedirs(base)
    docs = (
        table(spark, sf, "documents")
        # a NULL document renders no asset file (r13: .encode crashed
        # on NULL text), and neither does an EMPTY one — Spark's
        # binaryFile source silently omits zero-byte files from the
        # scan (probed r13: 22 files written, 20 rows read, byte totals
        # equal), so the generator and the oracle's src CTE both
        # exclude them to keep the dedup arithmetic exact
        .filter((F.col("doc_id") < 20) & F.col("text").isNotNull()
                & (F.length("text") > 0))
        .select("doc_id", "text")
        .collect()  # 20 rows — the asset GENERATOR is test scaffolding;
        #             the measured path is the binaryFile scan below
    )
    for r in docs:
        payload = r["text"].encode("utf-8")
        for tag in ("a", "b"):  # every asset lands twice
            with open(os.path.join(
                    base, f"asset_{r['doc_id']:04d}_{tag}.bin"), "wb") as fh:
                fh.write(payload)
    assets = spark.read.format("binaryFile").load(base)
    fp = assets.select(
        F.md5("content").alias("h"),
        F.col("length").cast("bigint").alias("nb"),
    )
    return fp.agg(
        F.count("*").cast("bigint").alias("n_files"),
        F.countDistinct("h").cast("bigint").alias("n_unique_assets"),
        (F.count("*") - F.countDistinct("h")).cast("bigint")
        .alias("dup_files"),
        F.sum("nb").cast("bigint").alias("total_bytes"),
    )
