"""Compose EVERY per-table degenerate recipe into one corpus
(SURVEY §13 item 1b): events + lineitem/orders + customer/supplier/part
degenerate rows simultaneously, plus the documents and embeddings
adversarial rows from the r13/r14 robustness suites.

A per-table sweep cannot fire cross-table interactions — a degenerate
customer joined to a degenerate order, a NULL-ts event for a NULL-name
user — so the composed corpus re-runs the ENTIRE oracle battery with
every table degenerate at once.

Usage: python tools/make_degenerate_all.py [OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

import make_degenerate_dims as dims
import make_degenerate_events as events
import make_degenerate_lineitem as lineitem

SF = "/root/testdata/sf0.001"

DOCS_ROWS = [
    # doc_id, text, lang, source, n_chars — the r13 docs-battery classes
    (900001, None, "en", "src0", 0),
    (900002, "", "en", "src0", 0),
    (900003, "   ", "en", "src1", 3),
    (900004, "a", "en", "src1", 1),
    (900005, "!!! ??? ...", "en", "src2", 11),
    (900006, "héllo wörld 你好世界 🎉 café", "zh", "src2", 24),
    (900007, "the quick brown fox jumps over the lazy dog today", "en",
     "src1", 49),
    (900008, "the quick brown fox jumps over the lazy dog today", "en",
     "src2", 49),
]


def build(out_dir: str) -> str:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    con = duckdb.connect()

    def append(table: str, rows, cast_ts_col: int | None = None):
        src = os.path.join(SF, f"{table}.parquet")
        con.execute(
            f"CREATE OR REPLACE TABLE t AS SELECT * FROM read_parquet(?)",
            [src])
        width = len(rows[0])
        ph = ["?"] * width
        if cast_ts_col is not None:
            ph[cast_ts_col] = "CAST(? AS TIMESTAMP)"
        con.executemany(f"INSERT INTO t VALUES ({', '.join(ph)})", rows)
        con.execute(
            f"COPY t TO '{os.path.join(out_dir, table + '.parquet')}' "
            "(FORMAT PARQUET)")

    append("events", events.ROWS, cast_ts_col=1)
    append("lineitem", lineitem.LINEITEM_ROWS, cast_ts_col=10)
    append("orders", lineitem.ORDERS_ROWS, cast_ts_col=4)
    append("customer", dims.CUSTOMER_ROWS)
    append("supplier", dims.SUPPLIER_ROWS)
    append("part", dims.PART_ROWS)
    append("documents", DOCS_ROWS)

    # embeddings: dim-width arrays; mirror the r14 robustness rows
    con.execute(
        "CREATE OR REPLACE TABLE t AS SELECT * FROM read_parquet(?)",
        [os.path.join(SF, "embeddings.parquet")])
    (dim,) = con.execute("SELECT len(embedding) FROM t LIMIT 1").fetchone()
    zero = [0.0] * dim
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [(900001, zero, 0), (900002, None, 0), (900003, zero, None),
         (900004, zero, 0), (900005, None, 0)])
    con.execute(
        f"COPY t TO '{os.path.join(out_dir, 'embeddings.parquet')}' "
        "(FORMAT PARQUET)")
    con.close()

    for f in os.listdir(SF):
        if f.endswith(".parquet") and not os.path.exists(
                os.path.join(out_dir, f)):
            os.symlink(os.path.join(SF, f), os.path.join(out_dir, f))
    return out_dir


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate_all"
    print(build(out))
