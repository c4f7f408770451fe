"""Build the degenerate-events probe corpus (SURVEY §12 item 0 recipe).

Copies sf0.001 via symlink into OUT_DIR and replaces events.parquet with
sf0.001 events + 10 appended degenerate rows: NULL ts, NULL user, NULL
event_type, NULL value, negative value, exact-half-cent 0.125, 1e10
"cents" magnitude, a duplicate (user, ts) pair, and a singleton user.

Usage: python tools/make_degenerate_events.py [OUT_DIR]
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

SF = "/root/testdata/sf0.001"

ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (900001, None, 3, "click", 10.0, '{"k": 1}'),              # NULL ts
    (900002, "2024-01-02 03:04:05", None, "view", 5.5, None),  # NULL user
    (900003, "2024-01-03 04:05:06", 4, None, 7.25, '{"k": 2}'),# NULL type
    (900004, "2024-01-04 05:06:07", 5, "click", None, None),   # NULL value
    (900005, "2024-01-05 06:07:08", 6, "purchase", -42.17, '{"k": 3}'),
    (900006, "2024-01-06 07:08:09", 7, "view", 0.125, None),   # half-cent
    (900007, "2024-01-07 08:09:10", 8, "error", 1.0e10, None), # 1e10 cents
    (900008, "2024-01-08 09:10:11", 9, "click", 3.0, None),    # dup (user,ts) a
    (900009, "2024-01-08 09:10:11", 9, "signup", 4.0, None),   # dup (user,ts) b
    (900010, "2024-01-09 10:11:12", 999999, "view", 1.0, None),# singleton user
]


def build(out_dir: str) -> str:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    for f in os.listdir(SF):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(SF, f), os.path.join(out_dir, f))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE ev AS SELECT * FROM read_parquet(?)",
        [os.path.join(SF, "events.parquet")])
    con.executemany(
        "INSERT INTO ev VALUES (?, CAST(? AS TIMESTAMP), ?, ?, ?, ?)",
        ROWS)
    dest = os.path.join(out_dir, "events.parquet")
    con.execute(f"COPY ev TO '{dest}' (FORMAT PARQUET)")
    con.close()
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/degenerate_events"
    print(build(out))
