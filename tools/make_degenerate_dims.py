"""Build the degenerate-dimension probe corpus (customer / supplier /
part — the last fixture tables the adversarial-corpus device had not
swept after documents / embeddings / events / lineitem+orders / pcap).

Copies sf0.001 via symlink into OUT_DIR and replaces the three dimension
parquets with the originals + appended degenerate rows: NULL names /
balances / segments / types, negative balances, zero and half-cent
retail prices, DUPLICATE primary keys (two customers sharing c_custkey —
fan-out through every customer join), orphaned foreign keys
(nationkey 99 exists in no nation), and NULL foreign keys.

Usage: python tools/make_degenerate_dims.py [OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SF = "/root/testdata/sf0.001"

CUSTOMER_ROWS = [
    # (custkey, name, nationkey, acctbal, mktsegment)
    (900001, None, 1, 100.00, "BUILDING"),          # NULL name
    (900002, "Customer#deg2", None, 100.00, "AUTOMOBILE"),  # NULL nation
    (900003, "Customer#deg3", 99, 100.00, "MACHINERY"),     # orphan nation
    (900004, "Customer#deg4", 2, None, "HOUSEHOLD"),        # NULL balance
    (900005, "Customer#deg5", 3, -999.99, "FURNITURE"),     # negative bal
    (900006, "Customer#deg6", 4, 0.125, None),              # half-cent,
                                                            # NULL segment
    (900007, "Customer#deg7a", 5, 10.00, "BUILDING"),       # dup key a
    (900007, "Customer#deg7b", 6, 20.00, "AUTOMOBILE"),     # dup key b
]

SUPPLIER_ROWS = [
    (900001, None, 1, 100.00),                # NULL name
    (900002, "Supplier#deg2", None, -50.00),  # NULL nation, negative
    (900003, "Supplier#deg3", 99, 0.125),     # orphan nation, half-cent
    (900004, "Supplier#deg4a", 2, 10.00),     # dup key a
    (900004, "Supplier#deg4b", 3, 20.00),     # dup key b
]

PART_ROWS = [
    (900001, None, "Brand#99", "DEGENERATE TYPE", 1, 100.00),  # NULL name
    (900002, "deg part 2", None, None, None, None),  # NULL brand/type/
                                                     # size/price
    (900003, "deg part 3", "Brand#99", "zero price", 0, 0.00),
    (900004, "deg part 4", "Brand#99", "half cent", 50, 0.125),
    (900005, "deg part 5a", "Brand#99", "dup key", 1, 10.00),
    (900005, "deg part 5b", "Brand#98", "dup key", 2, 20.00),
]


def build(out_dir: str) -> str:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    replaced = {"customer.parquet", "supplier.parquet", "part.parquet"}
    for f in os.listdir(SF):
        if f.endswith(".parquet") and f not in replaced:
            os.symlink(os.path.join(SF, f), os.path.join(out_dir, f))
    con = duckdb.connect()
    for tbl, rows, width in (
            ("customer", CUSTOMER_ROWS, 5),
            ("supplier", SUPPLIER_ROWS, 4),
            ("part", PART_ROWS, 6)):
        con.execute(
            f"CREATE TABLE {tbl}_t AS SELECT * FROM read_parquet(?)",
            [os.path.join(SF, f"{tbl}.parquet")])
        ph = ", ".join("?" * width)
        con.executemany(f"INSERT INTO {tbl}_t VALUES ({ph})", rows)
        con.execute(
            f"COPY {tbl}_t TO '{os.path.join(out_dir, tbl + '.parquet')}'"
            " (FORMAT PARQUET)")
    con.close()
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate_dims"
    print(build(out))
