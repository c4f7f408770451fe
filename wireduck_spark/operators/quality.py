"""Data-quality audit operators — the validation pass every production
pipeline runs before promoting a snapshot (Great-Expectations-style
checks and referential-integrity sweeps), expressed as ordinary
Catalyst plans over the star schema.

The reference delegates this whole class to host-engine SQL
(`/root/reference/README.md:15` — "analytics, aggregation, joining and
other data wrangling"); here each audit is a named oracle-checked query.

Scale notes (100 TB): every check is either a single-pass conditional
aggregate (map-side partial, one row out per table) or a keyed
anti-join that first collapses the child table to DISTINCT foreign keys
— the shuffle moves one row per distinct key, never the fact rows.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wireduck_spark.registry import cents, query, table, ts_str

# (child table, fk column, parent table, pk column) — the complete FK
# edge set of the TESTDATA.md star schema.
_FK_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _orphans_oracle() -> str:
    parts = []
    for child, fk, parent, pk in _FK_EDGES:
        parts.append(f"""
        SELECT '{child}.{fk}->{parent}.{pk}' AS relationship,
               CAST(SUM(ck.n_rows) AS BIGINT) AS n_child_rows,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_fk,
               CAST(COUNT(*) FILTER (WHERE p.pk IS NULL) AS BIGINT)
                   AS n_orphan_keys,
               CAST(COALESCE(SUM(ck.n_rows) FILTER (WHERE p.pk IS NULL), 0)
                    AS BIGINT) AS n_orphan_rows
        FROM (SELECT {fk} AS fk, COUNT(*) AS n_rows
              FROM {child} WHERE {fk} IS NOT NULL GROUP BY 1) ck
        LEFT JOIN (SELECT DISTINCT {pk} AS pk FROM {parent}) p
          ON ck.fk = p.pk""")
    return "\nUNION ALL\n".join(parts)


@query(
    "dq_referential_orphans",
    oracle=_orphans_oracle(),
    tags=("quality", "join"),
)
def dq_referential_orphans(spark: SparkSession, sf: str) -> DataFrame:
    """Referential-integrity sweep: for every FK edge of the star schema,
    how many child rows / distinct keys point at a missing parent.

    Scale: the child side collapses to (fk, n_rows) FIRST — one keyed
    aggregate with map-side partials — so the validation join moves one
    short row per DISTINCT key, not per fact row; parent sides are
    distinct key sets (dimension-sized, broadcastable — Catalyst/AQE
    picks broadcast under the threshold, keyed join above it). Each edge
    reduces to a single audit row, so the union is driver-trivial.
    """
    frames = []
    for child, fk, parent, pk in _FK_EDGES:
        ck = (
            table(spark, sf, child)
            .filter(F.col(fk).isNotNull())
            .groupBy(F.col(fk).alias("fk"))
            .agg(F.count("*").alias("n_rows"))
        )
        pkeys = table(spark, sf, parent).select(F.col(pk).alias("pk")).distinct()
        joined = ck.join(pkeys, ck.fk == pkeys.pk, "left")
        miss = F.col("pk").isNull()
        frames.append(
            joined.agg(
                F.sum("n_rows").cast("bigint").alias("n_child_rows"),
                F.count("*").cast("bigint").alias("n_distinct_fk"),
                F.sum(F.when(miss, 1).otherwise(0)).cast("bigint")
                .alias("n_orphan_keys"),
                F.coalesce(
                    F.sum(F.when(miss, F.col("n_rows"))), F.lit(0)
                ).cast("bigint").alias("n_orphan_rows"),
            ).select(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("relationship"),
                "n_child_rows", "n_distinct_fk",
                "n_orphan_keys", "n_orphan_rows",
            )
        )
    return reduce(DataFrame.unionAll, frames)


@query(
    "dq_expectations_audit",
    oracle="""
    WITH li AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE l_quantity IS NULL
                                        OR l_quantity <= 0) AS BIGINT)
                   AS v_qty,
               CAST(COUNT(*) FILTER (WHERE l_discount IS NULL
                                        OR l_discount < 0
                                        OR l_discount > 1) AS BIGINT)
                   AS v_disc,
               CAST(COUNT(*) FILTER (WHERE l_shipdate IS NULL) AS BIGINT)
                   AS v_ship,
               CAST(COUNT(*) FILTER (WHERE l_returnflag IS NULL
                            OR l_returnflag NOT IN ('R','A','N')) AS BIGINT)
                   AS v_flag
        FROM lineitem
    ), od AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(*) FILTER (WHERE o_totalprice IS NULL
                                        OR o_totalprice <= 0) AS BIGINT)
                   AS v_price,
               CAST(COUNT(*) FILTER (WHERE o_orderdate IS NULL) AS BIGINT)
                   AS v_date,
               CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS v_dup
        FROM orders
    )
    SELECT 'lineitem' AS table_name, 'l_quantity > 0' AS expectation,
           n AS n_checked, v_qty AS n_violations, v_qty = 0 AS passed
    FROM li
    UNION ALL
    SELECT 'lineitem', 'l_discount in [0, 1]', n, v_disc, v_disc = 0 FROM li
    UNION ALL
    SELECT 'lineitem', 'l_shipdate not null', n, v_ship, v_ship = 0 FROM li
    UNION ALL
    SELECT 'lineitem', 'l_returnflag in (R,A,N)', n, v_flag, v_flag = 0
    FROM li
    UNION ALL
    SELECT 'orders', 'o_totalprice > 0', n, v_price, v_price = 0 FROM od
    UNION ALL
    SELECT 'orders', 'o_orderdate not null', n, v_date, v_date = 0 FROM od
    UNION ALL
    SELECT 'orders', 'o_orderkey unique', n, v_dup, v_dup = 0 FROM od
    """,
    tags=("quality", "agg"),
)
def dq_expectations_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Expectation-suite audit: null/range/set/uniqueness checks, one
    output row per expectation with checked/violation counts.

    Scale: each table is scanned ONCE — all range/null/set checks ride a
    single conditional aggregate (map-side partials, one row out); the
    uniqueness check shares the orders pass as a distinct-count (the
    only Expand in the plan, on the narrow key column). Unpivoting the
    one-row aggregates into audit rows is free.

    r15 OPTIMIZATION (guide §2.4, the in-row-unpivot template): the
    per-expectation union previously re-selected the 1-row aggregate
    once per check, and because each branch referenced only ITS
    violation column, Catalyst pruned each branch's aggregate down to a
    different expression set — seven non-identical subtrees, so AQE
    could reuse nothing and the runtime plan re-scanned lineitem 4x and
    orders 3x. The unpivot is now an in-row ``inline`` of a
    struct-array literal that references every violation column, so
    each table keeps ONE aggregate subtree: runtime scans lineitem
    4 -> 1, orders 3 -> 1. Row multiset unchanged (inline preserves
    the per-check order the union emitted).
    """
    li = table(spark, sf, "lineitem").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_quantity").isNull()
                     | (F.col("l_quantity") <= 0), 1).otherwise(0))
        .cast("bigint").alias("v_qty"),
        F.sum(F.when(F.col("l_discount").isNull()
                     | (F.col("l_discount") < 0)
                     | (F.col("l_discount") > 1), 1).otherwise(0))
        .cast("bigint").alias("v_disc"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("bigint").alias("v_ship"),
        F.sum(F.when(F.col("l_returnflag").isNull()
                     | ~F.col("l_returnflag").isin("R", "A", "N"), 1)
              .otherwise(0)).cast("bigint").alias("v_flag"),
    )
    od = table(spark, sf, "orders").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("o_totalprice").isNull()
                     | (F.col("o_totalprice") <= 0), 1).otherwise(0))
        .cast("bigint").alias("v_price"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0))
        .cast("bigint").alias("v_date"),
        (F.count("*") - F.count_distinct("o_orderkey")).cast("bigint")
        .alias("v_dup"),
    )

    def rows(src: DataFrame, tname: str,
             checks: list[tuple[str, str]]) -> DataFrame:
        # one in-row unpivot per table: the struct array references
        # EVERY violation column, so no union branch prunes the shared
        # 1-row aggregate differently (that fork is what re-ran the
        # scan per expectation before r15)
        arr = F.array(*[
            F.struct(
                F.lit(expectation).alias("expectation"),
                F.col(vcol).alias("v"),
            )
            for expectation, vcol in checks
        ])
        return src.select(
            F.lit(tname).alias("table_name"), F.col("n"), F.inline(arr)
        ).select(
            "table_name", "expectation",
            F.col("n").alias("n_checked"),
            F.col("v").alias("n_violations"),
            (F.col("v") == 0).alias("passed"),
        )

    return rows(li, "lineitem", [
        ("l_quantity > 0", "v_qty"),
        ("l_discount in [0, 1]", "v_disc"),
        ("l_shipdate not null", "v_ship"),
        ("l_returnflag in (R,A,N)", "v_flag"),
    ]).unionAll(rows(od, "orders", [
        ("o_totalprice > 0", "v_price"),
        ("o_orderdate not null", "v_date"),
        ("o_orderkey unique", "v_dup"),
    ]))


_BENFORD_BP = {1: 3010, 2: 1761, 3: 1249, 4: 969, 5: 792,
               6: 669, 7: 580, 8: 512, 9: 458}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN {d} THEN {bp}" for d, bp in _BENFORD_BP.items()) + " END"


@query(
    "dq_benford_first_digit",
    oracle=f"""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM orders WHERE o_totalprice > 0
    ), cnt AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ), tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS total FROM cnt
    )
    SELECT digit, n,
           CAST((10000 * n) // tot.total AS BIGINT) AS share_bp,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_bp,
           CAST(abs((10000 * n) // tot.total - {_BENFORD_CASE}) AS BIGINT)
               AS deviation_bp
    FROM cnt, tot
    """,
    tags=("quality", "agg"),
)
def dq_benford_first_digit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law first-digit audit on order totals — the standard
    forensic screen for fabricated or truncated numeric columns
    (synthetic uniform data deviates loudly; organic financial data
    tracks log10(1+1/d)).

    Integer-exact: the leading digit comes from the BIGINT cents string
    (x100 never changes the leading digit), shares are basis-point
    integer divisions, and the Benford expectations are integer
    literals — no float log10 near a digit boundary.

    Scale: one conditional-project + 9-bucket aggregate with map-side
    partials; the total joins back via a broadcast of the 9-row table's
    sum, not a global window.
    """
    o = table(spark, sf, "orders")
    digits = o.filter(F.col("o_totalprice") > 0).select(
        F.substring(cents(F.col("o_totalprice")).cast("string"), 1, 1)
        .cast("bigint").alias("digit")
    )
    cnt = digits.groupBy("digit").agg(F.count("*").cast("bigint").alias("n"))
    tot = cnt.agg(F.sum("n").cast("bigint").alias("total"))
    benford = F.coalesce(
        *[F.when(F.col("digit") == d, F.lit(bp))
          for d, bp in _BENFORD_BP.items()]
    ).cast("bigint")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "digit", "n",
            F.expr("(10000 * n) div total").cast("bigint").alias("share_bp"),
            benford.alias("benford_bp"),
            F.abs(
                F.expr("(10000 * n) div total") - benford
            ).cast("bigint").alias("deviation_bp"),
        )
    )


@query(
    "dq_schema_drift_audit",
    oracle="""
    SELECT 'o_clerk' AS column_name, 'added' AS status,
           'string' AS new_type, CAST(NULL AS VARCHAR) AS old_type
    UNION ALL
    SELECT 'o_orderpriority', 'removed', NULL, 'string'
    UNION ALL
    SELECT 'o_totalprice', 'type_changed', 'bigint', 'double'
    """,
    tags=("quality", "schema"),
)
def dq_schema_drift_audit(spark: SparkSession, sf: str) -> DataFrame:
    """Schema-drift audit between two table generations: detect added /
    removed / type-changed columns from the parquet FOOTERS alone (no
    data read) — the pre-merge check a lake pipeline runs before
    mergeSchema silently papers over an incompatible write.

    Two generations are written with a deliberate drift (a column
    added, one dropped, one re-typed); the audit diffs the StructTypes
    and emits one row per drifted column. The oracle pins the exact
    expected drift set, so a detection that misses or invents a column
    hash-fails.

    Scale: footer-only — the audit cost is O(files) metadata reads on
    the driver regardless of table size; unchanged columns emit
    nothing.
    """
    from wireduck_spark.operators.io import _scratch

    base = _scratch(sf, "schema_drift")
    o = table(spark, sf, "orders")
    if not os.path.exists(f"{base}/gen1/_SUCCESS"):
        o.select("o_orderkey", "o_totalprice", "o_orderpriority").write.mode(
            "overwrite").parquet(f"{base}/gen0")
        o.select(
            "o_orderkey",
            cents(F.col("o_totalprice")).alias("o_totalprice"),
            F.lit("Clerk#0001").alias("o_clerk"),
        ).write.mode("overwrite").parquet(f"{base}/gen1")
    old = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(f"{base}/gen0").schema.fields}
    new = {f.name: f.dataType.simpleString()
           for f in spark.read.parquet(f"{base}/gen1").schema.fields}
    rows = []
    for name in sorted(set(old) | set(new)):
        if name not in old:
            rows.append((name, "added", new[name], None))
        elif name not in new:
            rows.append((name, "removed", None, old[name]))
        elif old[name] != new[name]:
            rows.append((name, "type_changed", new[name], old[name]))
    return spark.createDataFrame(
        rows, "column_name string, status string, new_type string,"
              " old_type string")


@query(
    "dq_freshness_sla",
    oracle="""
    WITH anchor AS (
        SELECT MAX(ts) AS t_max FROM events
    ), per_type AS (
        SELECT event_type,
               MAX(ts) AS last_ts,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    )
    SELECT p.event_type,
           strftime(p.last_ts, '%Y-%m-%d %H:%M:%S') AS last_event,
           p.n_events,
           CAST(datediff('minute', p.last_ts, a.t_max) AS BIGINT)
               AS staleness_min,
           datediff('minute', p.last_ts, a.t_max) <= 60 AS within_sla
    FROM per_type p CROSS JOIN anchor a
    """,
    tags=("quality", "freshness"),
)
def dq_freshness_sla(spark: SparkSession, sf: str) -> DataFrame:
    """Freshness SLA audit: per-source staleness (minutes since each
    source's last event, measured against the dataset high-water mark
    so both engines see the same 'now') with a 60-minute SLA verdict —
    the landing-zone monitor every ingestion pipeline pages on.

    Scale: one keyed max/count aggregate (map-side partials) + a 1-row
    broadcast anchor; output is source-cardinality-sized.

    r15 OPTIMIZATION (guide §2.4, the survival-KM carried-anchor
    template): the high-water anchor previously ran as a SECOND full
    events scan + global MAX next to the per-type aggregate. MAX of
    per-type MAX(ts) IS the global MAX(ts) (max skips the NULL last_ts
    of an all-NULL-ts group, exactly as the global max skips those
    rows), so the anchor now hangs off the per-type aggregate; the
    n_events reference inside the `when` pins the count expression
    against column pruning (a pruned subtree cannot reuse the
    event_type exchange). Runtime: 2 events scans -> 1 + ReusedExchange.
    """
    e = table(spark, sf, "events")
    per_type = e.groupBy("event_type").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").cast("bigint").alias("n_events"),
    )
    # n_events >= 1 is true for every group (COUNT(*) of a non-empty
    # group), so this is exactly MAX(last_ts) — the reference exists
    # ONLY to keep this branch's per_type subtree identical to the
    # probe branch's (the survival greatest() pin).
    anchor = per_type.agg(
        F.max(F.when(F.col("n_events") >= 1, F.col("last_ts")))
        .alias("t_max"))
    # minute-BOUNDARY semantics to match DuckDB's datediff('minute'):
    # truncate both ends to the minute, then diff (an elapsed-time floor
    # would disagree whenever sub-minute components straddle a boundary)
    staleness = (
        F.expr("unix_micros(cast(t_max AS TIMESTAMP)) div 60000000")
        - F.expr("unix_micros(cast(last_ts AS TIMESTAMP)) div 60000000")
    ).cast("bigint")  # events ts is NTZ; session tz UTC makes the cast exact
    return per_type.crossJoin(F.broadcast(anchor)).select(
        "event_type",
        ts_str(F.col("last_ts")).alias("last_event"),
        "n_events",
        staleness.alias("staleness_min"),
        (staleness <= 60).alias("within_sla"),
    )


@query(
    "dq_distribution_drift_psi",
    oracle="""
    WITH snap AS (
      SELECT CASE WHEN (('0x' || substr(md5('psi:' ||
                   CAST(event_id AS VARCHAR)), 1, 15))::BIGINT) % 2 = 0
                  THEN 'base' ELSE 'cand' END AS snap,
             event_type,
             CAST(hour(ts) AS BIGINT) // 6 AS hour_bucket
      FROM events
    ),
    counts AS (
      SELECT 'event_type' AS dim, event_type AS bucket,
             CAST(SUM(CASE WHEN snap = 'base' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_base,
             CAST(SUM(CASE WHEN snap = 'cand' THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_cand
      FROM snap GROUP BY event_type
      UNION ALL
      SELECT 'hour_q' AS dim, CAST(hour_bucket AS VARCHAR),
             CAST(SUM(CASE WHEN snap = 'base' THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN snap = 'cand' THEN 1 ELSE 0 END) AS BIGINT)
      FROM snap GROUP BY hour_bucket
    ),
    tot AS (
      SELECT dim, CAST(SUM(n_base) AS BIGINT) AS t_base,
             CAST(SUM(n_cand) AS BIGINT) AS t_cand,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM counts GROUP BY dim
    )
    SELECT c.dim,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           ROUND(SUM(
             ((CAST(c.n_base AS DOUBLE) + 1) / (t.t_base + t.nb)
              - (CAST(c.n_cand AS DOUBLE) + 1) / (t.t_cand + t.nb))
             * ln(((CAST(c.n_base AS DOUBLE) + 1) / (t.t_base + t.nb))
                  / ((CAST(c.n_cand AS DOUBLE) + 1) / (t.t_cand + t.nb)))
           ), 6) AS psi
    FROM counts c JOIN tot t ON c.dim = t.dim
    GROUP BY c.dim
    ORDER BY c.dim
    """,
    tags=("quality", "stats", "drift"),
)
def dq_distribution_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    """Population Stability Index between two snapshots (stable hash
    split standing in for last-week/this-week), per monitored
    dimension — THE model-monitoring drift metric (PSI < 0.1 stable,
    > 0.25 retrain): categorical event-type mix and 6-hour time-of-day
    buckets. Complements embed_drift_audit (feature-space drift) with
    input-distribution drift.

    Exactness note: bucket counts are exact int64; the per-bucket PSI
    term is a fixed IEEE tree over two exact ratios, and the SUM over
    buckets runs over <=5 values whose ADDITION ORDER could differ
    cross-engine — so buckets are few (the monitoring regime) and the
    result rounds to 6 dp, which absorbs the worst-case reassociation
    error (~1e-13 here) with nine digits to spare.

    r14 contract: the ratios are Laplace-smoothed (add-1 per bucket,
    denominator t + n_buckets) on BOTH engines — a bucket present in
    only one snapshot (a singleton event_type, or the NULL
    missing-data bucket a NULL ts/type creates) is otherwise ln(0):
    the oracle aborts and an unsmoothed 100-TB Spark job emits
    -Infinity. Smoothing is the standard production PSI guard and
    keeps the NULL bucket as a first-class missingness-drift signal.

    Scale: one scan -> ONE grouping-sets aggregate -> a per-dim rollup;
    nothing grows with the corpus but the first aggregate's input.

    r14 optimization (guide §2.4): the two per-dim groupBys each rescanned
    events and re-evaluated the md5 snapshot hash over every row (2 scans,
    2 md5 passes, 2 exchanges). GROUPING SETS ((event_type), (hour_q))
    computes both count tables in one pass — the union of the two groupBys
    by definition; grouping_id() disambiguates a genuinely-NULL bucket
    value from the other set's placeholder NULL, so the NULL missingness
    bucket stays first-class. Counts are bit-identical.
    """
    e = table(spark, sf, "events")
    snap = F.when(
        F.expr("CAST(conv(substring(md5(concat('psi:', "
               "CAST(event_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
        % 2 == 0,
        F.lit("base"),
    ).otherwise(F.lit("cand"))
    s = e.select(
        snap.alias("snap"),
        F.col("event_type").cast("string").alias("bt"),
        F.expr("CAST(hour(ts) AS BIGINT) div 6").cast("string").alias("hq"),
    )
    counts = (
        s.groupingSets([["bt"], ["hq"]], "bt", "hq")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(F.when(F.col("snap") == "base", 1).otherwise(0))
            .cast("bigint").alias("n_base"),
            F.sum(F.when(F.col("snap") == "cand", 1).otherwise(0))
            .cast("bigint").alias("n_cand"),
        )
        # gid bit order follows the grouping column list (bt, hq): the
        # (bt) set leaves hq ungrouped -> gid 0b01; the (hq) set -> 0b10.
        .select(
            F.when(F.col("gid") == 1, F.lit("event_type"))
            .otherwise(F.lit("hour_q")).alias("dim"),
            F.when(F.col("gid") == 1, F.col("bt"))
            .otherwise(F.col("hq")).alias("bucket"),
            "n_base", "n_cand",
        )
    )
    # Per-dim totals as window sums over the (bucket-cardinality-sized)
    # counts table rather than a second aggregate + broadcast join: a
    # second consumer of the counts subtree cannot share its exchange
    # (column pruning makes the subtrees differ), so the join shape
    # re-ran the whole scan+aggregate. One consumer -> one scan.
    wd = Window.partitionBy("dim")
    j = counts.select(
        "dim", "bucket", "n_base", "n_cand",
        F.sum("n_base").over(wd).cast("bigint").alias("t_base"),
        F.sum("n_cand").over(wd).cast("bigint").alias("t_cand"),
        F.count("*").over(wd).cast("bigint").alias("nb"),
    )
    p = ((F.col("n_base").cast("double") + 1)
         / (F.col("t_base") + F.col("nb")))
    q = ((F.col("n_cand").cast("double") + 1)
         / (F.col("t_cand") + F.col("nb")))
    return (
        j.groupBy("dim")
        .agg(
            F.count("*").cast("bigint").alias("n_buckets"),
            F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
        )
        .orderBy("dim")
    )


@query(
    "dq_k_anonymity",
    oracle="""
    WITH quasi AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS hr,
             CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS kb,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
      GROUP BY 1, 2, 3
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_cells_below_k,
           CAST(SUM(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END)
               AS BIGINT) AS n_rows_at_risk,
           CAST(MIN(n_users) AS BIGINT) AS min_cell_users,
           CAST((10000 * SUM(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END))
                // SUM(n_rows) AS BIGINT) AS risk_bp
    FROM quasi
    """,
    tags=("quality", "privacy", "agg"),
)
def dq_k_anonymity(spark: SparkSession, sf: str) -> DataFrame:
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (event_type, hour-of-day, payload bucket): cells whose DISTINCT
    user population is below k re-identify their members when the
    table is shared — the release-gate check privacy engineering runs
    before any external data handoff, here as one aggregate pass with
    the at-risk row count and basis-point exposure.

    Determinism: the cell table is exact integer counts; risk share is
    truncating integer basis points. Scale: one combinable group-by on
    the quasi-identifier (cells << rows); generalization loops (widen
    buckets until risk_bp hits the budget) re-run only this rollup.
    """
    e = table(spark, sf, "events")
    quasi = (
        e.select(
            "event_type",
            F.hour("ts").cast("bigint").alias("hr"),
            (F.get_json_object("props", "$.k").cast("bigint") % 10)
            .alias("kb"),
            "user_id",
        )
        .groupBy("event_type", "hr", "kb")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )
    below = F.when(F.col("n_users") < 5, F.col("n_rows")).otherwise(0)
    return quasi.agg(
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum(F.when(F.col("n_users") < 5, 1).otherwise(0)).cast("bigint")
        .alias("n_cells_below_k"),
        F.sum(below).cast("bigint").alias("n_rows_at_risk"),
        F.min("n_users").cast("bigint").alias("min_cell_users"),
        F.expr(
            "CAST((10000 * SUM(CASE WHEN n_users < 5 THEN n_rows ELSE 0 "
            "END)) div SUM(n_rows) AS BIGINT)"
        ).alias("risk_bp"),
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen over order totals
# ---------------------------------------------------------------------------

# log10(1 + 1/d) for d = 1..9, embedded as EXACT double literals in BOTH
# engines (computing log10 at query time risks a cross-engine ulp —
# java.lang.Math.log10 vs DuckDB's libm are not guaranteed identical;
# a shared literal is, by rule 2).
_BENFORD_P = (
    "0.3010299956639812", "0.17609125905568124", "0.12493873660829992",
    "0.09691001300805642", "0.07918124604762482", "0.06694678963061322",
    "0.05799194697768673", "0.05115252244738129", "0.04575749056067514",
)

_BENFORD_CASE = ("CASE d " + " ".join(
    f"WHEN '{i + 1}' THEN {p}" for i, p in enumerate(_BENFORD_P)
) + " END")


@query(
    "quality_benford_first_digit",
    oracle=f"""
    WITH digits AS (
        SELECT substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                           AS VARCHAR), 1, 1) AS d,
               CAST(COUNT(*) AS BIGINT) AS observed
        FROM orders GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n FROM digits)
    SELECT d AS digit, observed,
           ROUND(CAST(n AS DOUBLE) * {_BENFORD_CASE}, 4) AS expected,
           ROUND((CAST(observed AS DOUBLE)
                  - CAST(n AS DOUBLE) * {_BENFORD_CASE})
                 * (CAST(observed AS DOUBLE)
                    - CAST(n AS DOUBLE) * {_BENFORD_CASE})
                 / (CAST(n AS DOUBLE) * {_BENFORD_CASE}), 6) AS chi2_term
    FROM digits, tot
    """,
    tags=("quality", "stats"),
)
def quality_benford_first_digit(spark: SparkSession, sf: str) -> DataFrame:
    """Benford's-law first-digit screen over order totals — the
    classic fabricated-/truncated-data detector (auditing, fraud, and
    synthetic-data QA all read large deviations as "these amounts were
    not produced by a natural multiplicative process"). Emits per digit
    the observed count, the Benford-expected count, and the chi-square
    contribution; the TPC-H-ish uniform price fixture deviates loudly
    by construction (digits 5-9 starved — probed before implementing),
    which is exactly what the screen should say about uniform data.

    Determinism: the first digit is taken from the exact integer-cents
    STRING (no log10 on data — a float log near a power-of-10 boundary
    could flip a digit cross-engine); the nine Benford proportions are
    shared double literals, so expected/chi2 are identical IEEE trees
    over exact int64 (n, observed), rounded 4/6 dp.

    Scale: one map-combinable 9-group aggregate; the scalar total joins
    back by broadcast. Cost is the scan.
    """
    o = table(spark, sf, "orders")
    digits = (
        o.select(F.substring(cents(F.col("o_totalprice"))
                             .cast("string"), 1, 1).alias("d"))
        .groupBy("d")
        .agg(F.count("*").cast("bigint").alias("observed"))
    )
    tot = digits.agg(F.sum("observed").cast("bigint").alias("n"))
    p = F.expr(_BENFORD_CASE)
    expected = F.col("n").cast("double") * p
    dev = F.col("observed").cast("double") - expected
    return digits.crossJoin(F.broadcast(tot)).select(
        F.col("d").alias("digit"), "observed",
        F.round(expected, 4).alias("expected"),
        F.round(dev * dev / expected, 6).alias("chi2_term"),
    )
