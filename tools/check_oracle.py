"""Local mimic of the driver's correctness gate: run every registered query
on Spark AND its DuckDB oracle at the given sf, compare row count, sorted
column names, and the order-insensitive multiset of row values.

Stricter than any plausible driver hash: values must match EXACTLY after
canonicalization (floats via repr, timestamps via isoformat). If this
passes, any order-insensitive value-hash passes.

Usage: python tools/check_oracle.py [--sf DIR] [--only name1,name2] [-v]
"""

from __future__ import annotations

import argparse
import decimal
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wireduck_spark.registry import TABLES, load_all_queries
from wireduck_spark.session import get_spark


def canon(v):
    """Canonical hashable form of one cell value.

    Decimal is deliberately NOT collapsed into int/float: the driver
    fetches oracle results through Arrow, where DuckDB HUGEINT (e.g. any
    un-cast `SUM(BIGINT)` arithmetic) surfaces as decimal128 and hashes
    differently from Spark's BIGINT (round-5 `seq_pack_greedy` lesson).
    Keeping the skew visible here forces the oracle SQL to CAST."""
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{v}"
    if isinstance(v, decimal.Decimal):
        return f"d:{v.normalize()}"
    if isinstance(v, float):
        if math.isnan(v):
            return "f:nan"
        if v == int(v) and abs(v) < 2**53:
            return f"i:{int(v)}"  # 5.0 == 5 across engines
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "l:[" + ",".join(canon(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return f"t:{v.isoformat()}"
    if isinstance(v, (bytes, bytearray)):
        return f"x:{bytes(v).hex()}"
    return f"s:{v}"


def row_key(row, col_order):
    return tuple(canon(row[i]) for i in col_order)


def compare(name, spark_df, duck_rows, duck_cols, verbose=False):
    spark_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    problems = []
    if sorted(c.lower() for c in spark_cols) != sorted(c.lower() for c in duck_cols):
        problems.append(f"columns differ: spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        return problems
    if len(s_rows) != len(duck_rows):
        problems.append(f"row count: spark={len(s_rows)} duck={len(duck_rows)}")
    # align column order by sorted name (the driver sorts by name)
    s_order = [spark_cols.index(c) for c in sorted(spark_cols, key=str.lower)]
    d_order = [duck_cols.index(c) for c in sorted(duck_cols, key=str.lower)]
    s_set = sorted(row_key(r, s_order) for r in s_rows)
    d_set = sorted(row_key(r, d_order) for r in duck_rows)
    if s_set != d_set:
        n_bad = sum(1 for a, b in zip(s_set, d_set) if a != b) + abs(
            len(s_set) - len(d_set)
        )
        problems.append(f"values differ ({n_bad} positions of {len(s_set)})")
        if verbose:
            shown = 0
            for a, b in zip(s_set, d_set):
                if a != b and shown < 5:
                    problems.append(f"  spark={a}")
                    problems.append(f"  duck ={b}")
                    shown += 1
    return problems


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    queries = load_all_queries()
    names = sorted(queries)
    if args.only:
        names = [n for n in names if n in set(args.only.split(","))]

    spark = get_spark("check-oracle", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    passed = failed = skipped = zero_green = 0
    for name in names:
        spec = queries[name]
        t0 = time.time()
        try:
            df = spec.fn(spark, args.sf)
            if spec.oracle is None:
                n = df.count()
                print(f"  ~ {name}: rows-only ({n} rows, {time.time()-t0:.1f}s)")
                skipped += 1
                continue
            # Fetch through Arrow to mirror the driver's path: DuckDB
            # HUGEINT becomes decimal128 here (it would be a plain
            # Python int via fetchall), so oracle type skew that breaks
            # the driver hash also fails this local gate.
            tbl = con.execute(spec.oracle).fetch_arrow_table()
            duck_cols = list(tbl.column_names)
            duck_rows = [
                tuple(rec[c] for c in duck_cols) for rec in tbl.to_pylist()
            ]
            problems = compare(name, df, duck_rows, duck_cols, args.verbose)
        except Exception:
            print(f"  ✗ {name}: EXCEPTION")
            traceback.print_exc(limit=10)
            failed += 1
            continue
        dt = time.time() - t0
        if problems:
            print(f"  ✗ {name} ({dt:.1f}s)")
            for p in problems:
                print(f"      {p}")
            failed += 1
        else:
            # A hash-green on ZERO rows only certifies that both engines
            # agree on empty — evidentially worthless, and how
            # join_anti/dedup_embedding_cosine hid fixture degeneracy for
            # nine rounds (found when the r11 rotation re-gated them).
            # Surface it loudly so the class can't re-enter the corpus.
            if not duck_rows:
                zero_green += 1
                print(f"  ⚠ {name} ({dt:.1f}s) 0-ROW GREEN — degenerate "
                      "evidence, fix the query or the fixture predicate")
            else:
                print(f"  ✓ {name} ({dt:.1f}s)")
            passed += 1
    print(f"\n{passed} passed, {failed} failed, {skipped} rows-only, "
          f"{zero_green} zero-row greens")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
