"""Build the degenerate-lineitem/orders probe corpus (SURVEY §12 item 5
recipe; the events/documents/embeddings device pointed at the TPC-H
tables).

Copies sf0.001 via symlink into OUT_DIR and replaces lineitem.parquet
and orders.parquet with the originals + appended degenerate rows:
NULL dates, NULL/negative/zero quantities and prices, exact-half-cent
prices, 1e10 magnitudes, NULL flags/priorities, duplicate primary keys
(two lineitem rows sharing (orderkey, linenumber); two orders sharing
o_orderkey — fan-out through every join), an order with no lineitems,
lineitems with no order (orphaned FK), and month-end boundary dates
(Feb 29 leap day, Dec 31, month ends around the TPC-H q1 cutoffs).

Usage: python tools/make_degenerate_lineitem.py [OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SF = "/root/testdata/sf0.001"

LINEITEM_ROWS = [
    # (orderkey, partkey, suppkey, linenumber, qty, extprice, disc, tax,
    #  returnflag, linestatus, shipdate)
    (900001, 1, 1, 1, None, 1000.00, 0.05, 0.02, "N", "O",
     "1997-06-15"),                                  # NULL quantity
    (900001, 2, 2, 2, 10.0, None, 0.05, 0.02, "N", "O",
     "1997-06-16"),                                  # NULL price
    (900001, 3, 3, 3, 10.0, 1000.00, None, None, "N", "O",
     "1997-06-17"),                                  # NULL disc/tax
    (900002, 4, 4, 1, -5.0, 500.00, 0.05, 0.02, "R", "F",
     "1997-07-01"),                                  # negative qty
    (900002, 5, 5, 2, 5.0, -500.00, 0.05, 0.02, "R", "F",
     "1997-07-02"),                                  # negative price
    (900003, 6, 6, 1, 0.0, 0.00, 0.0, 0.0, "A", "F",
     "1997-08-01"),                                  # zero qty + price
    (900003, 7, 7, 2, 1.0, 0.125, 0.05, 0.02, "A", "F",
     "1997-08-02"),                                  # exact half-cent
    (900004, 8, 8, 1, 1.0, 1.0e10, 0.05, 0.02, "N", "O",
     "1997-09-01"),                                  # 1e10 magnitude
    (900005, 9, 9, 1, 10.0, 1000.00, 0.05, 0.02, None, None,
     "1997-10-01"),                                  # NULL flags
    (900006, 10, 10, 1, 10.0, 1000.00, 0.05, 0.02, "N", "O",
     None),                                          # NULL shipdate
    (900007, 11, 11, 1, 10.0, 1000.00, 0.05, 0.02, "N", "O",
     "1997-11-05"),                                  # dup (okey, line) a
    (900007, 11, 11, 1, 20.0, 2000.00, 0.06, 0.03, "N", "O",
     "1997-11-06"),                                  # dup (okey, line) b
    (900008, 12, 12, 1, 10.0, 1000.00, 0.05, 0.02, "N", "O",
     "1996-02-29"),                                  # leap day
    (900008, 12, 12, 2, 10.0, 1000.00, 0.05, 0.02, "N", "O",
     "1998-12-31"),                                  # year end
    (900008, 12, 12, 3, 10.0, 1000.00, 0.05, 0.02, "N", "O",
     "1998-11-30"),                                  # q1 cutoff region
    (900999, 13, 13, 1, 10.0, 1000.00, 0.05, 0.02, "N", "O",
     "1997-12-01"),                                  # orphan: no order
]

ORDERS_ROWS = [
    # (orderkey, custkey, status, totalprice, orderdate, priority)
    (900001, 3, "O", 100000.00, "1997-06-10", "1-URGENT"),
    (900002, 4, "F", 100.00, "1997-06-28", "2-HIGH"),
    (900003, 5, "F", 0.125, "1997-07-30", None),        # NULL priority
    (900004, 6, "O", 1.0e10, "1997-08-28", "3-MEDIUM"),  # 1e10 total
    (900005, 7, "O", -100.00, None, "4-NOT SPECIFIED"),  # NULL date, neg
    (900006, None, "O", 100.00, "1997-09-30", "5-LOW"),  # NULL custkey
    (900007, 8, "O", 100.00, "1996-02-29", "5-LOW"),     # leap day
    (900010, 9, "O", 100.00, "1997-10-15", "1-URGENT"),  # no lineitems
    (900011, 10, "O", 100.00, "1997-10-16", "2-HIGH"),   # dup okey a
    (900011, 10, "P", 200.00, "1997-10-17", "2-HIGH"),   # dup okey b
]


def build(out_dir: str) -> str:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for f in os.listdir(SF):
        if f.endswith(".parquet") and f not in (
                "lineitem.parquet", "orders.parquet"):
            os.symlink(os.path.join(SF, f), os.path.join(out_dir, f))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE li AS SELECT * FROM read_parquet(?)",
        [os.path.join(SF, "lineitem.parquet")])
    con.executemany(
        "INSERT INTO li VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, "
        "CAST(? AS TIMESTAMP))", LINEITEM_ROWS)
    con.execute(
        f"COPY li TO '{os.path.join(out_dir, 'lineitem.parquet')}' "
        "(FORMAT PARQUET)")
    con.execute(
        "CREATE TABLE ord AS SELECT * FROM read_parquet(?)",
        [os.path.join(SF, "orders.parquet")])
    con.executemany(
        "INSERT INTO ord VALUES (?, ?, ?, ?, CAST(? AS TIMESTAMP), ?)",
        ORDERS_ROWS)
    con.execute(
        f"COPY ord TO '{os.path.join(out_dir, 'orders.parquet')}' "
        "(FORMAT PARQUET)")
    con.close()
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate_lineitem"
    print(build(out))
