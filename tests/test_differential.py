"""Differential SQL fuzzing: hypothesis-generated predicates executed as
the SAME SQL text on Spark and DuckDB over the same parquet, integer
aggregates compared exactly.

The oracle corpus (tools/check_oracle.py) verifies 200+ hand-written
queries; this fuzzer covers the space BETWEEN them — arbitrary
boolean-algebra combinations of comparisons, IN-lists, modular
arithmetic, string prefixes, and date bounds that no hand-written query
happens to exercise. Both engines parse one shared ANSI dialect, so any
count/sum divergence is a real semantics bug in our Spark surface (or a
cross-engine trap worth documenting), not a test-harness artifact.

Determinism rules are the registry's: integer-only outputs (COUNT +
SUM of an int key), no float expressions, no engine-specific functions.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

# r15 driver-window split (pytest.ini): heavyweight battery, opt-in
pytestmark = pytest.mark.slow

from wireduck_spark.registry import table

# -- predicate AST ----------------------------------------------------------

# Literal pools chosen to straddle the actual sf0.001 data ranges so
# predicates are neither vacuous nor empty most of the time.
_NUM_COLS = {
    "o_orderkey": st.integers(min_value=0, max_value=7000),
    "o_custkey": st.integers(min_value=0, max_value=1600),
    "o_totalprice": st.sampled_from(
        [0.0, 1000.0, 25000.5, 120000.25, 300000.0]),
}
_STATUS = st.sampled_from(["F", "O", "P"])
_PRIORITY = st.sampled_from(
    ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
_DATES = st.sampled_from(
    ["1993-01-01", "1995-06-15", "1996-12-31", "1998-08-02"])
_CMP = st.sampled_from(["<", "<=", "=", ">=", ">", "<>"])


def _leaf() -> st.SearchStrategy[str]:
    num = st.one_of(
        *[
            st.tuples(st.just(c), _CMP, lit).map(
                lambda t: f"({t[0]} {t[1]} {t[2]})")
            for c, lit in _NUM_COLS.items()
        ]
    )
    mod = st.tuples(
        st.sampled_from(["o_orderkey", "o_custkey"]),
        st.integers(min_value=2, max_value=13),
        st.integers(min_value=0, max_value=12),
    ).map(lambda t: f"(({t[0]} % {t[1]}) = {t[2] % t[1]})")
    status = st.tuples(_CMP, _STATUS).map(
        lambda t: f"(o_orderstatus {t[0]} '{t[1]}')")
    inlist = st.lists(_PRIORITY, min_size=1, max_size=3).map(
        lambda v: "(o_orderpriority IN ({}))".format(
            ", ".join(f"'{x}'" for x in sorted(set(v)))))
    date = st.tuples(_CMP, _DATES).map(
        lambda t: f"(o_orderdate {t[0]} TIMESTAMP '{t[1]} 00:00:00')")
    prefix = st.sampled_from(["1", "2", "3", "4", "5"]).map(
        lambda d: f"(o_orderpriority LIKE '{d}%')")
    return st.one_of(num, mod, status, inlist, date, prefix)


def _predicates() -> st.SearchStrategy[str]:
    return st.recursive(
        _leaf(),
        lambda sub: st.one_of(
            st.tuples(sub, sub).map(lambda t: f"({t[0]} AND {t[1]})"),
            st.tuples(sub, sub).map(lambda t: f"({t[0]} OR {t[1]})"),
            sub.map(lambda p: f"(NOT {p})"),
        ),
        max_leaves=5,
    )


# -- engines ----------------------------------------------------------------


@pytest.fixture(scope="module")
def engines(spark, sf_dir):
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{sf_dir}/orders.parquet')"
    )
    yield spark, con
    con.close()
    spark.catalog.dropTempView("orders")


def _both(engines, sql: str):
    spark, con = engines
    s_rows = [tuple(r) for r in spark.sql(sql).collect()]
    d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
    return sorted(s_rows), sorted(d_rows)


# -- properties -------------------------------------------------------------


@given(pred=_predicates())
@settings(max_examples=60, deadline=None)
def test_filter_agg_differential(engines, pred):
    """COUNT + exact integer SUM under an arbitrary predicate must match
    DuckDB bit-for-bit."""
    sql = (
        "SELECT COUNT(*) AS n, "
        "CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS s "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for predicate: {pred}"


@given(pred=_predicates())
@settings(max_examples=40, deadline=None)
def test_groupby_differential(engines, pred):
    """Grouped counts under an arbitrary predicate must match, including
    WHICH groups survive the filter."""
    sql = (
        "SELECT o_orderstatus, o_orderpriority, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders WHERE {pred} "
        "GROUP BY o_orderstatus, o_orderpriority"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for predicate: {pred}"


@given(pred=_predicates(), k=st.integers(min_value=1, max_value=20))
@settings(max_examples=30, deadline=None)
def test_topk_differential(engines, pred, k):
    """ORDER BY a unique key + LIMIT under an arbitrary predicate: the
    selected row SET must match (unique tiebreak makes top-k total)."""
    sql = (
        "SELECT o_orderkey "
        f"FROM orders WHERE {pred} ORDER BY o_orderkey LIMIT {k}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for predicate: {pred} (k={k})"


@pytest.fixture(scope="module")
def engines2(engines, spark, sf_dir):
    table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    _, con = engines
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{sf_dir}/customer.parquet')"
    )
    yield engines
    spark.catalog.dropTempView("customer")


@given(pred=_predicates())
@settings(max_examples=30, deadline=None)
def test_join_differential(engines2, pred):
    """orders x customer equi-join under an arbitrary orders-side
    predicate: per-segment counts and key sums must match."""
    sql = (
        "SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COALESCE(SUM(o.o_orderkey), 0) AS BIGINT) AS s "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        f"WHERE {pred} GROUP BY c.c_mktsegment"
    )
    s, d = _both(engines2, sql)
    assert s == d, f"divergence for predicate: {pred}"


@given(pred=_predicates(), rn=st.integers(min_value=1, max_value=3))
@settings(max_examples=30, deadline=None)
def test_window_differential(engines, pred, rn):
    """row_number over a unique-tiebreak window under an arbitrary
    predicate: the n-th row per status group must be the same row."""
    sql = (
        "SELECT o_orderstatus, o_orderkey FROM ("
        "  SELECT o_orderstatus, o_orderkey, "
        "         ROW_NUMBER() OVER (PARTITION BY o_orderstatus "
        "                            ORDER BY o_orderkey) AS rn "
        f"  FROM orders WHERE {pred}"
        f") t WHERE rn = {rn}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for predicate: {pred} (rn={rn})"


@given(pred=_predicates(), n=st.integers(min_value=1, max_value=400))
@settings(max_examples=30, deadline=None)
def test_having_differential(engines, pred, n):
    """GROUP BY + HAVING over an arbitrary predicate: the surviving
    group set AND their aggregates must match."""
    sql = (
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)"
        " AS cents "
        f"FROM orders WHERE {pred} "
        f"GROUP BY o_orderpriority HAVING COUNT(*) >= {n}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for predicate: {pred} (having n>={n})"


@given(pred=_predicates())
@settings(max_examples=30, deadline=None)
def test_case_aggregate_differential(engines, pred):
    """Conditional aggregation (CASE inside SUM) under an arbitrary
    predicate — the pivot-ish shape — must match exactly."""
    sql = (
        "SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)"
        " AS BIGINT) AS n_f, "
        "CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN o_orderkey ELSE 0 END)"
        " AS BIGINT) AS keys_o, "
        "CAST(MIN(CASE WHEN o_custkey % 3 = 0 THEN o_orderkey END)"
        " AS BIGINT) AS min_div3 "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for predicate: {pred}"


_STR_EXPRS = st.sampled_from([
    # shared-dialect string expressions over o_orderpriority/o_comment;
    # every output is an exact integer (length / position / count) so no
    # collation or encoding renderer can smuggle in a diff
    "length(o_orderpriority)",
    "length(upper(o_orderpriority))",
    "length(trim(o_orderpriority))",
    "length(replace(o_orderpriority, '-', '_'))",
    "position('URGENT' IN o_orderpriority)",
    "length(substr(o_orderpriority, 3, 4))",
    "length(concat(o_orderstatus, o_orderpriority))",
])


@given(pred=_predicates(), expr=_STR_EXPRS)
@settings(max_examples=40, deadline=None)
def test_string_function_differential(engines, pred, expr):
    """Shared-dialect string functions summed as exact integers must
    agree under arbitrary predicates — catches substr indexing-base,
    trim character-set, and position semantics drift between engines."""
    sql = (
        f"SELECT COUNT(*) AS n, "
        f"CAST(COALESCE(SUM({expr}), 0) AS BIGINT) AS s "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for {expr} under: {pred}"


_DATE_EXPRS = st.sampled_from([
    "CAST(year(o_orderdate) AS BIGINT)",
    "CAST(month(o_orderdate) AS BIGINT)",
    "CAST(day(o_orderdate) AS BIGINT)",
    "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)",
])


@given(pred=_predicates(), expr=_DATE_EXPRS)
@settings(max_examples=40, deadline=None)
def test_date_extraction_differential(engines, pred, expr):
    """Date-part extraction summed exactly must agree — catches epoch
    convention and month/day one-off drift between the engines."""
    sql = (
        f"SELECT COUNT(*) AS n, "
        f"CAST(COALESCE(SUM({expr}), 0) AS BIGINT) AS s "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for {expr} under: {pred}"


@given(pred=_predicates())
@settings(max_examples=30, deadline=None)
def test_setop_differential(engines, pred):
    """INTERSECT / EXCEPT between a predicate slice and a fixed slice
    must produce identical key sets — bag-vs-set and null-equality
    drift in set operators is a classic cross-engine trap."""
    sql = (
        f"SELECT o_orderkey FROM orders WHERE {pred} "
        "INTERSECT "
        "SELECT o_orderkey FROM orders WHERE o_orderkey % 3 = 0"
    )
    s, d = _both(engines, sql)
    assert s == d, f"INTERSECT divergence under: {pred}"
    sql2 = (
        f"SELECT o_orderkey FROM orders WHERE {pred} "
        "EXCEPT "
        "SELECT o_orderkey FROM orders WHERE o_custkey % 2 = 0"
    )
    s2, d2 = _both(engines, sql2)
    assert s2 == d2, f"EXCEPT divergence under: {pred}"


@given(pred=_predicates(),
       k=st.integers(min_value=0, max_value=7000),
       m=st.integers(min_value=2, max_value=97))
@settings(max_examples=40, deadline=None)
def test_signed_modulo_differential(engines, pred, k, m):
    """Modular arithmetic on SIGNED values — (o_orderkey - k) goes
    negative for most k — must agree exactly: both engines define % with
    the dividend's sign, and the corpus leans on that (hash sampling,
    bucketing, salting). A divergence here would silently skew every
    mod-keyed query on plausible data."""
    sql = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COALESCE(SUM((o_orderkey - {k}) % {m}), 0) AS BIGINT) AS s "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"signed %% divergence for k={k} m={m} pred: {pred}"


@given(pred=_predicates(), n=st.integers(min_value=0, max_value=5))
@settings(max_examples=30, deadline=None)
def test_rows_frame_window_differential(engines, pred, n):
    """ROWS BETWEEN n PRECEDING AND CURRENT ROW running sums over a
    unique ordering must match row-for-row — frame semantics (inclusive
    bounds, partition resets) are exactly what the corpus's trailing
    windows assume to be ANSI-identical across engines."""
    sql = (
        "SELECT o_orderkey, "
        "CAST(SUM(o_custkey) OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey "
        f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW) AS BIGINT) AS rs "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"ROWS frame divergence for n={n} pred: {pred}"


@given(pred=_predicates())
@settings(max_examples=40, deadline=None)
def test_struct_argmin_differential(engines, pred):
    """The portable MIN(STRUCT(-quality, id)) arg-max fold (the
    dedup_keep_best canonical-selection primitive) must pick identical
    winners per group in both engines — lexicographic struct comparison
    over (negated quality, tiebreak id), including negatives and ties.
    Engine-specific struct constructors (named_struct vs struct_pack),
    identical extracted BIGINT results."""
    spark, con = engines
    s_sql = (
        "SELECT o_orderstatus, "
        "CAST(MIN(named_struct('a', -o_custkey, 'b', o_orderkey)).b "
        "AS BIGINT) AS keep, "
        "CAST(-MIN(named_struct('a', -o_custkey, 'b', o_orderkey)).a "
        "AS BIGINT) AS best_q "
        f"FROM orders WHERE {pred} GROUP BY o_orderstatus"
    )
    d_sql = (
        "SELECT o_orderstatus, "
        "CAST(MIN(struct_pack(a := -o_custkey, b := o_orderkey)).b "
        "AS BIGINT) AS keep, "
        "CAST(-MIN(struct_pack(a := -o_custkey, b := o_orderkey)).a "
        "AS BIGINT) AS best_q "
        f"FROM orders WHERE {pred} GROUP BY o_orderstatus"
    )
    s_rows = sorted(tuple(r) for r in spark.sql(s_sql).collect())
    d_rows = sorted(tuple(r) for r in con.execute(d_sql).fetchall())
    assert s_rows == d_rows, f"struct arg-min divergence for: {pred}"


# -- round-8 additions: the two classes behind every historical red row ------
# (VERDICT r7 #3: window frames over NULL-dense data; decimal/HUGEINT edges)


@given(pred=_predicates(),
       m=st.integers(min_value=2, max_value=7),
       z=st.integers(min_value=0, max_value=6),
       n=st.integers(min_value=0, max_value=4))
@settings(max_examples=40, deadline=None)
def test_null_dense_rows_frame_differential(engines, pred, m, z, n):
    """ROWS frames aggregating a NULL-DENSE value (NULLIF makes up to
    1/m of values NULL): COUNT must skip NULLs, SUM must ignore them
    (not null-poison the frame), MIN must never pick one — per ANSI, in
    both engines, row-for-row. Frames + NULLs are the class behind
    historical red rows (chi-square NULL keys, KS NULL exclusion)."""
    sql = (
        "SELECT o_orderkey, "
        "CAST(COUNT(v) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey "
        f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW) AS BIGINT) AS c, "
        "CAST(COALESCE(SUM(v) OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey "
        f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW), -1) AS BIGINT) AS s, "
        "CAST(COALESCE(MIN(v) OVER (PARTITION BY o_orderstatus "
        "ORDER BY o_orderkey "
        f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW), -1) AS BIGINT) AS mn "
        f"FROM (SELECT o_orderkey, o_orderstatus, "
        f"             NULLIF(o_custkey % {m}, {z % m}) AS v "
        f"      FROM orders WHERE {pred}) t"
    )
    s, d = _both(engines, sql)
    assert s == d, f"NULL-dense ROWS frame divergence m={m} z={z} n={n}: {pred}"


@given(pred=_predicates(),
       r=st.integers(min_value=0, max_value=50),
       m=st.integers(min_value=2, max_value=5))
@settings(max_examples=40, deadline=None)
def test_range_frame_nulls_first_differential(engines, pred, r, m):
    """RANGE frames over a DUPLICATE-heavy integer order key whose values
    are NULL-dense, with EXPLICIT NULLS FIRST (the engines' implicit
    defaults differ: Spark ASC = NULLS FIRST, DuckDB ASC = NULLS LAST —
    the corpus always writes it out; this property pins that the
    explicit form plus value-range peers agree exactly)."""
    sql = (
        "SELECT o_orderkey, "
        "CAST(COALESCE(SUM(o_orderkey) OVER (PARTITION BY o_orderstatus "
        "ORDER BY ok ASC NULLS FIRST "
        f"RANGE BETWEEN {r} PRECEDING AND CURRENT ROW), -1) AS BIGINT) AS s "
        f"FROM (SELECT o_orderkey, o_orderstatus, "
        f"             NULLIF(o_custkey % 100, {r % 100}) * {m} AS ok "
        f"      FROM orders WHERE {pred}) t"
    )
    s, d = _both(engines, sql)
    assert s == d, f"RANGE frame divergence r={r} m={m}: {pred}"


@given(pred=_predicates(),
       mult=st.sampled_from([1, 100, 10000, 1000000007]))
@settings(max_examples=40, deadline=None)
def test_decimal_cents_differential(engines, pred, mult):
    """Decimal edges: o_totalprice (2-dp money as DOUBLE) cast through
    DECIMAL(18,2) and summed exactly, plus a near-int64-edge integer
    product ridden through each engine's wide-sum type (Spark
    DECIMAL(28,2)/BIGINT vs DuckDB DECIMAL(38,2)/HUGEINT) — both must
    land on identical BIGINTs after the rule-4 cast. This is the
    decimal/HUGEINT class behind the round-6 Arrow-fetch red row."""
    sql = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)"
        " AS cents, "
        f"CAST(COALESCE(SUM(CAST(o_orderkey AS BIGINT) * {mult}), 0) "
        "AS BIGINT) AS wide "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"decimal/wide-sum divergence mult={mult}: {pred}"


@given(pred=_predicates(),
       k=st.integers(min_value=0, max_value=7000),
       m=st.integers(min_value=2, max_value=97))
@settings(max_examples=40, deadline=None)
def test_trunc_div_differential(engines, pred, k, m):
    """Truncating integer division on SIGNED dividends: Spark `div` vs
    DuckDB `//` (registry rule 6 — both truncate toward zero, measured;
    this property keeps that contract pinned across the literal space,
    because pairing either with a flooring operator would silently skew
    every bucketing expression on negative inputs)."""
    spark, con = engines
    s_sql = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COALESCE(SUM((o_orderkey - {k}) div {m}), 0) AS BIGINT) AS s "
        f"FROM orders WHERE {pred}"
    )
    d_sql = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        f"CAST(COALESCE(SUM((o_orderkey - {k}) // {m}), 0) AS BIGINT) AS s "
        f"FROM orders WHERE {pred}"
    )
    s_rows = sorted(tuple(r) for r in spark.sql(s_sql).collect())
    d_rows = sorted(tuple(r) for r in con.execute(d_sql).fetchall())
    assert s_rows == d_rows, f"trunc-div divergence k={k} m={m}: {pred}"


@given(pred=_predicates(),
       m=st.integers(min_value=2, max_value=9),
       z=st.integers(min_value=0, max_value=8),
       n=st.integers(min_value=1, max_value=200))
@settings(max_examples=40, deadline=None)
def test_nullable_groupkey_having_differential(engines, pred, m, z, n):
    """GROUP BY a NULLABLE key: ANSI folds all NULL keys into ONE group
    that survives (or dies by) HAVING like any other — both engines must
    agree on the group set, the NULL group's aggregates, and SUM/COUNT
    NULL-skipping within groups."""
    sql = (
        # grouping happens on the NULLABLE g; the -1 sentinel only makes
        # the emitted key Python-sortable for the harness (g is never -1)
        "SELECT CAST(COALESCE(g, -1) AS BIGINT) AS gk, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COALESCE(SUM(o_orderkey), 0) AS BIGINT) AS s "
        f"FROM (SELECT NULLIF(o_custkey % {m}, {z % m}) AS g, o_orderkey "
        f"      FROM orders WHERE {pred}) t "
        f"GROUP BY g HAVING COUNT(*) >= {n}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"NULL-groupkey divergence m={m} z={z} n={n}: {pred}"


@given(pred=_predicates(), n=st.integers(min_value=1, max_value=400))
@settings(max_examples=40, deadline=None)
def test_interval_arith_differential(engines, pred, n):
    """Date + INTERVAL arithmetic crossing month/year boundaries, reduced
    to exact integer yyyymmdd sums — catches calendar-increment and
    end-of-month convention drift between the engines."""
    sql = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COALESCE(SUM(CAST("
        f"  year(o_orderdate + INTERVAL {n} DAY) * 10000"
        f"  + month(o_orderdate + INTERVAL {n} DAY) * 100"
        f"  + day(o_orderdate + INTERVAL {n} DAY) AS BIGINT)), 0) "
        "AS BIGINT) AS ymd_sum "
        f"FROM orders WHERE {pred}"
    )
    s, d = _both(engines, sql)
    assert s == d, f"interval-arith divergence n={n}: {pred}"


@given(pred=_predicates(), seg=st.sampled_from(
    ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]))
@settings(max_examples=40, deadline=None)
def test_left_join_null_extension_differential(engines2, pred, seg):
    """LEFT JOIN with a BUILD-SIDE condition in the ON clause: customers
    that fail it must still appear as NULL-extended rows (moving the
    condition to WHERE silently converts the join to inner — the classic
    outer-join rewrite bug). Counting matched vs NULL-extended rows and
    an exact key sum pins both engines to identical extension
    semantics under arbitrary probe-side predicates."""
    sql = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) "
        "AS BIGINT) AS n_unmatched, "
        "CAST(COALESCE(SUM(o.o_orderkey), 0) AS BIGINT) AS s "
        "FROM orders o LEFT JOIN customer c "
        f"ON o.o_custkey = c.c_custkey AND c.c_mktsegment = '{seg}' "
        f"WHERE {pred}"
    )
    s, d = _both(engines2, sql)
    assert s == d, f"LEFT JOIN extension divergence seg={seg}: {pred}"


@given(pred=_predicates(), m=st.integers(min_value=2, max_value=9))
@settings(max_examples=15, deadline=None)
def test_global_midrank_differential(engines, pred, m):
    """The two-pass range-partitioned `_global_midrank2` rewrite (shared
    by Mann-Whitney / ROC-AUC / Spearman) must reproduce the textbook
    single-window midrank definition exactly — arbitrary input subsets
    (pred) and heavy tie groups (values folded mod m) included. DuckDB
    evaluates the definitional global-window SQL; Spark runs the actual
    helper (per-partition row_number + collected offsets), and per-value
    midrank sums are compared as exact integers."""
    from pyspark.sql import functions as F

    from wireduck_spark.operators.relational import _global_midrank2

    spark, con = engines
    d_rows = con.execute(
        f"""
        WITH t AS (SELECT o_orderkey AS k, o_orderkey % {m} AS v
                   FROM orders WHERE {pred}),
        r AS (SELECT k, v,
                     row_number() OVER (ORDER BY v, k) AS rk FROM t),
        mid AS (SELECT v,
                       2 * MIN(rk) OVER (PARTITION BY v)
                       + COUNT(*) OVER (PARTITION BY v) - 1 AS m2
                FROM r)
        SELECT CAST(v AS BIGINT), CAST(SUM(m2) AS BIGINT),
               CAST(COUNT(*) AS BIGINT)
        FROM mid GROUP BY v
        """
    ).fetchall()
    sdf = (
        spark.table("orders")
        .filter(F.expr(pred))
        .select(F.col("o_orderkey").alias("k"),
                (F.col("o_orderkey") % m).alias("v"))
    )
    mid = _global_midrank2(sdf, "v", "k")
    s_rows = [
        tuple(r)
        for r in mid.groupBy("v").agg(
            F.sum("midrank2").cast("bigint").alias("s"),
            F.count("*").cast("bigint").alias("n"),
        ).collect()
    ]
    assert sorted(s_rows) == sorted(map(tuple, d_rows)), (
        f"midrank divergence m={m}: {pred}")


@given(pred=_predicates(), p=st.sampled_from([0.0, 0.25, 0.5, 0.75, 1.0]))
@settings(max_examples=25, deadline=None)
def test_percentile_interpolation_differential(engines, pred, p):
    """Spark `percentile` and DuckDB `quantile_cont` must agree EXACTLY
    on integer inputs at quarter fractions: the interpolation
    a + (b-a)*f is exact IEEE arithmetic when a, b are int64 cents and
    f in {0, .25, .5, .75, 1} — so any difference is a semantic drift
    (nearest-rank vs linear, 0- vs 1-based position), not float noise.
    Load-bearing: stats_roc_auc / stats_brier_calibration /
    event_ab_lift_by_decile all broadcast engine-side medians or decile
    boundaries computed this way."""
    spark, con = engines
    body = (f"SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS v "
            f"FROM orders WHERE {pred}")
    d = con.execute(
        f"SELECT COUNT(*), quantile_cont(v, {p}) FROM ({body})"
    ).fetchone()
    s_row = spark.sql(
        f"SELECT COUNT(*) AS n, percentile(v, CAST({p} AS DOUBLE)) AS q "
        f"FROM ({body})"
    ).collect()[0]
    assert s_row["n"] == d[0]
    if d[0] == 0:
        assert s_row["q"] is None and d[1] is None
    else:
        assert s_row["q"] == d[1], (
            f"percentile divergence p={p}: spark={s_row['q']} "
            f"duck={d[1]}: {pred}")


@given(pred=_predicates(), m=st.integers(min_value=2, max_value=9))
@settings(max_examples=15, deadline=None)
def test_pmod_constant_window_differential(engines, pred, m):
    """The pmod(col, 1) constant-partition idiom (the bounded-domain
    single-task window behind every daily-series query: runs test, ACF,
    Bollinger, RSI, MACD, Schnabel) must produce EXACTLY the global
    window's results: same row_number sequence, same running sums, no
    rows dropped into a second partition by a NULL or sign quirk. DuckDB
    evaluates the definitional un-partitioned window; Spark runs the
    actual pmod idiom over the same filtered/aggregated rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    spark, con = engines
    d_rows = con.execute(
        f"""
        WITH t AS (SELECT o_orderkey % {m} AS g,
                          CAST(COUNT(*) AS BIGINT) AS x
                   FROM orders WHERE {pred} GROUP BY o_orderkey % {m})
        SELECT CAST(g AS BIGINT),
               CAST(row_number() OVER (ORDER BY g) AS BIGINT),
               CAST(SUM(x) OVER (ORDER BY g
                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
        FROM t
        """
    ).fetchall()
    sdf = (
        spark.table("orders")
        .filter(F.expr(pred))
        .groupBy((F.col("o_orderkey") % m).alias("g"))
        .agg(F.count("*").cast("bigint").alias("x"))
    )
    w = Window.partitionBy(F.pmod(F.col("x"), F.lit(1))).orderBy("g")
    s_rows = [
        tuple(r)
        for r in sdf.select(
            F.col("g").cast("bigint"),
            F.row_number().over(w).cast("bigint"),
            F.sum("x").over(
                w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        ).collect()
    ]
    assert sorted(s_rows) == sorted(map(tuple, d_rows)), (
        f"pmod-window divergence m={m}: {pred}")


@given(pred=_predicates(), m=st.integers(min_value=2, max_value=11))
@settings(max_examples=40, deadline=None)
def test_square_divmod_decomposition_differential(engines, pred, m):
    """Property 24 (round-10, ADVICE r9): the overflow-safe square
    decomposition used by ANOVA / Levene / weekday-effect —

        x*x div n == x*(x div n) + (x*(x mod n)) div n
        x*x mod n == (x*(x mod n)) mod n

    — must hold as an exact int64 identity IN BOTH DIALECTS (Spark
    `div`/`%` vs DuckDB `//`/`%`) over data-derived group sums, and the
    two engines must agree row-for-row. A dialect where % or integer
    division rounded differently would silently skew every SSB term the
    decomposition protects."""
    spark, con = engines
    body = (
        "WITH g AS (SELECT o_orderkey % {m} AS k, "
        "CAST(SUM(o_orderkey) AS BIGINT) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        "FROM orders WHERE {pred} GROUP BY o_orderkey % {m}) "
        "SELECT CAST(k AS BIGINT), "
        "CAST(s * s {d} n AS BIGINT) AS naive_q, "
        "CAST(s * (s {d} n) + (s * (s % n)) {d} n AS BIGINT) AS decomp_q, "
        "CAST(s * s % n AS BIGINT) AS naive_r, "
        "CAST((s * (s % n)) % n AS BIGINT) AS decomp_r "
        "FROM g"
    )
    s_rows = sorted(
        tuple(r)
        for r in spark.sql(body.format(m=m, pred=pred, d="div")).collect()
    )
    d_rows = sorted(
        map(tuple,
            con.execute(body.format(m=m, pred=pred, d="//")).fetchall())
    )
    assert s_rows == d_rows, f"cross-engine divergence m={m}: {pred}"
    for k, nq, dq, nr, dr in s_rows:
        assert nq == dq and nr == dr, (
            f"decomposition identity broke at k={k}: {pred}")


@given(pred=_predicates(),
       anchor=st.sampled_from((
           "1994-06-15", "1995-01-01", "1997-07-04", "1999-12-31",
           "2000-02-29", "2002-03-01",
       )))
@settings(max_examples=40, deadline=None)
def test_week_block_date_arith_differential(engines, pred, anchor):
    """Property 25 (round-10): the calendar-week blocking key used by
    stats_kendall_tau_weekly / stats_theil_sen_weekly — Spark
    `datediff(d, DATE a) div 7` vs DuckDB `CAST(d - DATE a AS BIGINT)
    // 7` — must bucket identically across the WHOLE date range,
    including anchors after the data (negative day diffs, where a
    flooring engine would shift every pre-anchor week by one)."""
    spark, con = engines
    s_sql = (
        "SELECT CAST(datediff(CAST(o_orderdate AS DATE), "
        f"DATE '{anchor}') div 7 AS BIGINT) AS w, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(o_orderkey) AS BIGINT) AS s "
        f"FROM orders WHERE {pred} GROUP BY 1"
    )
    d_sql = (
        "SELECT CAST(CAST(CAST(o_orderdate AS DATE) - "
        f"DATE '{anchor}' AS BIGINT) // 7 AS BIGINT) AS w, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(o_orderkey) AS BIGINT) AS s "
        f"FROM orders WHERE {pred} GROUP BY 1"
    )
    s_rows = sorted(tuple(r) for r in spark.sql(s_sql).collect())
    d_rows = sorted(map(tuple, con.execute(d_sql).fetchall()))
    assert s_rows == d_rows, f"week-block divergence anchor={anchor}: {pred}"


@given(pred=_predicates())
@settings(max_examples=40, deadline=None)
def test_ratio_difference_vmr_differential(engines, pred):
    """Property 26 (round-11, ADVICE r10): the overflow-free VMR tree
    used by text_burstiness_vmr —

        (n*ss - s*s) / (n*s)  ==  ss/s - s/n   (algebraically)

    — where every operand of the RIGHT side is a plain int64 sum cast
    to double (no int64 product anywhere, so nothing to wrap in Spark
    or raise in DuckDB). Both engines must render the identical IEEE
    value for the ss/s - s/n tree over arbitrary predicate-selected
    groups, 4-dp rounded like the query output."""
    sql = (
        "SELECT o_orderstatus, "
        "ROUND(CAST(SUM(o_orderkey * o_orderkey) AS DOUBLE)"
        " / CAST(SUM(o_orderkey) AS DOUBLE)"
        " - CAST(SUM(o_orderkey) AS DOUBLE)"
        " / CAST(COUNT(*) AS DOUBLE), 4) AS vmrish "
        f"FROM orders WHERE {pred} "
        "GROUP BY o_orderstatus HAVING SUM(o_orderkey) > 0"
    )
    s, d = _both(engines, sql)
    assert s == d, f"divergence for predicate: {pred}"


_REC_SMOOTH_SQL = """
WITH RECURSIVE src AS (
  SELECT CAST(o_orderkey AS BIGINT) AS x,
         CAST(row_number() OVER (ORDER BY o_orderkey) AS BIGINT) AS i
  FROM (SELECT o_orderkey FROM orders WHERE {pred}
        ORDER BY o_orderkey LIMIT 30) t
),
rec AS (
  SELECT CAST(0 AS BIGINT) AS i, CAST(0 AS BIGINT) AS z,
         CAST(0 AS BIGINT) AS mx
  UNION ALL
  SELECT s.i,
         ({a} * r.z + s.x) {IDIV} {a1},
         greatest(r.mx,
                  abs(({a} * r.z + s.x) {IDIV} {a1} - s.x))
  FROM rec r JOIN src s ON s.i = r.i + 1
)
SELECT CAST(i AS BIGINT) AS i, CAST(z AS BIGINT) AS z,
       CAST(mx AS BIGINT) AS mx
FROM rec
"""


@given(pred=_predicates(), a=st.sampled_from([1, 3, 7]))
@settings(max_examples=30, deadline=None)
def test_recursive_smoothing_differential(engines, pred, a):
    """Property 27 (round-11): the exact-integer smoothing recurrence
    family behind stats_ewma_control_chart — z' = (a*z + x) div (a+1),
    alpha = 1/(a+1) — replayed via WITH RECURSIVE in BOTH engines
    (Spark 4.x recursion operator vs DuckDB's), over the first 30
    predicate-selected order keys, comparing the ENTIRE trajectory
    (every step's z and running max |excursion|), not just the final
    state. Pins two things at once: that the two recursion operators
    walk identical step orders, and that Spark `div` / DuckDB `//`
    truncate identically inside a recursive step — the combination the
    oracle corpus exercises only at fixed alpha = 1/4."""
    spark, con = engines
    s_rows = sorted(
        tuple(r) for r in spark.sql(
            _REC_SMOOTH_SQL.format(pred=pred, a=a, a1=a + 1,
                                   IDIV="div")).collect()
    )
    d_rows = sorted(map(tuple, con.execute(
        _REC_SMOOTH_SQL.format(pred=pred, a=a, a1=a + 1,
                               IDIV="//")).fetchall()))
    assert s_rows == d_rows, f"recursive smoothing divergence: {pred} a={a}"


@given(pred=_predicates(), m=st.integers(min_value=2, max_value=9),
       k=st.integers(min_value=0, max_value=2000))
@settings(max_examples=40, deadline=None)
def test_greatest_least_null_skip_differential(engines, pred, m, k):
    """Property 28 (round-11): greatest/least NULL-skip semantics —
    both engines return the extreme of the NON-NULL operands (NULL only
    if all are) — combined with abs(), the exact operand kit the drift
    folds and recursive oracles lean on (EWMA chart's
    greatest(mx, abs(z-mu)), PH's least(mnm, mup)). Probed identical
    before pinning (greatest(1,NULL)=1 in both). Shared SQL text; the
    CASE injects NULLs into one operand on a fuzzed modulus so every
    group exercises both the skip path and the all-present path."""
    sql = (
        "SELECT o_orderstatus, "
        "CAST(SUM(greatest(CASE WHEN o_orderkey % "
        f"{m} = 0 THEN NULL ELSE o_orderkey END, "
        f"o_custkey, abs(o_custkey - {k}))) AS BIGINT) AS g, "
        "CAST(SUM(least(CASE WHEN o_orderkey % "
        f"{m} = 0 THEN NULL ELSE o_orderkey END, "
        f"o_custkey, abs(o_custkey - {k}))) AS BIGINT) AS l, "
        "CAST(COUNT(*) AS BIGINT) AS n "
        f"FROM orders WHERE {pred} GROUP BY o_orderstatus"
    )
    s, d = _both(engines, sql)
    assert s == d, f"greatest/least divergence: {pred} m={m} k={k}"


_ENC_KEY = (
    "lpad(CAST(cnt AS STRING), 19, '0') || '|' || "
    "translate(s1 || ' ' || s2, 'abcdefghijklmnopqrstuvwxyz ', "
    "'zyxwvutsrqponmlkjihgfedcba{') || '~'"
)

_ENC_SQL = f"""
WITH g AS (
  SELECT replace(lower(substr(o_orderpriority, 3,
                              1 + (o_orderkey % @W1@))), ' ', '') AS s1,
         replace(lower(substr(o_orderpriority, 3,
                              1 + (o_custkey % @W2@))), ' ', '') AS s2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders WHERE @PRED@ GROUP BY 1, 2
)
SELECT max({_ENC_KEY}) AS mx FROM g
"""

_DIRECT_SQL = """
WITH g AS (
  SELECT replace(lower(substr(o_orderpriority, 3,
                              1 + (o_orderkey % {w1}))), ' ', '') AS s1,
         replace(lower(substr(o_orderpriority, 3,
                              1 + (o_custkey % {w2}))), ' ', '') AS s2,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders WHERE {pred} GROUP BY 1, 2
),
r AS (SELECT s1, s2, cnt,
             row_number() OVER (ORDER BY cnt DESC, s1, s2) AS rk FROM g)
SELECT s1, s2, cnt FROM r WHERE rk = 1
"""


@given(pred=_predicates(), w1=st.integers(min_value=1, max_value=6),
       w2=st.integers(min_value=1, max_value=5))
@settings(max_examples=30, deadline=None)
def test_argmax_order_encoding_differential(engines, pred, w1, w2):
    """Property 29 (round-11): the single-aggregate argmax device
    text_bpe_train_merges leans on — max over `zero-padded count ‖
    order-INVERTED symbol string ('{'-mapped separator, '~'
    terminator)` must pick exactly the (count DESC, s1 ASC, s2 ASC)
    winner. Checked two ways at once: the encoded max DECODES to the
    same row that a direct ORDER BY ... rk=1 window returns (within
    each engine — the encoding is order-faithful, prefix cases
    included), and both engines agree on both forms (shared SQL text;
    substr widths fuzzed so s1 is sometimes a strict prefix of another
    group's s1 — the case a naive char-inversion without the
    terminator gets wrong)."""
    spark, con = engines
    enc = (_ENC_SQL.replace("@PRED@", pred)
           .replace("@W1@", str(w1)).replace("@W2@", str(w2)))
    direct = _DIRECT_SQL.format(pred=pred, w1=w1, w2=w2)
    s_mx = spark.sql(enc).collect()[0]["mx"]
    d_mx = con.execute(enc).fetchone()[0]
    assert s_mx == d_mx, f"encoded max diverges: {pred} w=({w1},{w2})"
    s_row = [tuple(r) for r in spark.sql(direct).collect()]
    d_row = list(map(tuple, con.execute(direct).fetchall()))
    assert s_row == d_row, f"direct argmax diverges: {pred}"
    if s_mx is None:
        assert s_row == []
        return
    inv = s_mx[20:-1]
    dec = inv.translate(str.maketrans(
        "zyxwvutsrqponmlkjihgfedcba{",
        "abcdefghijklmnopqrstuvwxyz "))
    s1, _, s2 = dec.partition(" ")
    assert (s1, s2, int(s_mx[:19])) == s_row[0], (
        f"encoding is not order-faithful: decoded {(s1, s2)} vs "
        f"direct {s_row[0]} for {pred}")


# -- property 30: cumulative-ratio drift trajectory (round-12) --------------

_SRM_DRIFT_SQL = """
WITH firstseen AS (
  SELECT o_custkey AS uid, MIN(CAST(o_orderdate AS DATE)) AS d,
         CAST((o_custkey % @M@) % 2 AS BIGINT) AS t
  FROM orders WHERE @PRED@ GROUP BY o_custkey
),
daily AS (
  SELECT d, CAST(SUM(1 - t) AS BIGINT) AS c0,
         CAST(SUM(t) AS BIGINT) AS c1
  FROM firstseen GROUP BY d
),
cum AS (
  SELECT d,
         CAST(SUM(c0) OVER (ORDER BY d) AS BIGINT) AS n0,
         CAST(SUM(c1) OVER (ORDER BY d) AS BIGINT) AS n1
  FROM daily
)
SELECT d, n0, n1,
       ROUND((CAST(n0 AS DOUBLE) - (n0 + n1) / 2.0)
             * (CAST(n0 AS DOUBLE) - (n0 + n1) / 2.0)
             / ((n0 + n1) / 2.0)
             + (CAST(n1 AS DOUBLE) - (n0 + n1) / 2.0)
             * (CAST(n1 AS DOUBLE) - (n0 + n1) / 2.0)
             / ((n0 + n1) / 2.0), 4) AS chi2,
       ((CAST(n0 AS DOUBLE) - (n0 + n1) / 2.0)
        * (CAST(n0 AS DOUBLE) - (n0 + n1) / 2.0)
        / ((n0 + n1) / 2.0)
        + (CAST(n1 AS DOUBLE) - (n0 + n1) / 2.0)
        * (CAST(n1 AS DOUBLE) - (n0 + n1) / 2.0)
        / ((n0 + n1) / 2.0)) > 3.841 AS flag
FROM cum ORDER BY d
"""


@given(pred=_predicates(), m=st.integers(min_value=2, max_value=13))
@settings(max_examples=30, deadline=None)
def test_srm_drift_trajectory_differential(engines, pred, m):
    """Property 30 (round-12): the cumulative-ratio drift device
    event_ab_srm_drift_daily leans on — a no-partition cumulative SUM
    OVER (ORDER BY unique day) feeding the 1-dof chi-square IEEE tree
    (half as a double, squares divided once, ROUND 4 dp, exact 3.841
    threshold) — must produce the identical FULL trajectory in both
    engines under arbitrary predicates and fuzzed modular arm splits
    (the md5 arm device itself is pinned separately by the hash-exact
    srm family oracles; here the split is engine-neutral `% m % 2` so
    the shared SQL text isolates the window + float tree). Pins the
    cumulative-window frame default (RANGE CURRENT ROW over a unique
    key), HUGEINT-vs-BIGINT window-sum casting, the rounding of a
    shared double tree at the 4th decimal, and boundary behavior of
    the > comparison against the exact literal."""
    spark, con = engines
    sql = _SRM_DRIFT_SQL.replace("@PRED@", pred).replace("@M@", str(m))
    s_rows = [tuple(r) for r in spark.sql(sql).collect()]
    d_rows = [tuple(r) for r in con.execute(sql).fetchall()]
    assert s_rows == d_rows, f"trajectory diverges: {pred} m={m}"
