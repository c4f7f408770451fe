"""Boundary-literal pins for gap sessionization and interval sweeps.

The fixture's event times essentially never land EXACTLY on the 30-min
session gap or produce exactly-touching activity intervals, so the
oracle gate passes whether the boundary is inclusive or exclusive —
the same fixture-blind class tests/test_asof_semantics.py closes for
the as-of family. These pins run the real builders over handcrafted
events where the boundary is hit exactly, against the documented
semantics: a gap of exactly 30:00 continues the session (the split is
STRICTLY greater), and an interval ending exactly when another starts
is NOT concurrent (half-open [t, t+30m) — ends sort before starts at
one instant)."""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _write(spark, tmp, rows):
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
              "event_type STRING, value DOUBLE, props STRING")
    df.coalesce(1).write.parquet(str(tmp / "events.parquet"))
    return str(tmp)


def _both(spark, sf, name):
    got = sorted(tuple(r)
                 for r in QUERIES[name].fn(spark, sf).collect())
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet/*.parquet')")
    try:
        oracle = sorted(tuple(r)
                        for r in con.execute(QUERIES[name].oracle)
                        .fetchall())
    finally:
        con.close()
    assert got == oracle, f"{name}: Spark/DuckDB diverge on the boundary"
    return got


def test_session_gap_boundary_is_strictly_greater(spark, tmp_path):
    """Events 30:00 apart share a session; 30:00.000001 splits."""
    def ev(eid, sec_off, us_off=0):
        return (eid, T0 + dt.timedelta(seconds=sec_off,
                                       microseconds=us_off),
                1, "view", 1.0, "{}")

    sf = _write(spark, tmp_path, [
        ev(1, 0),
        ev(2, 1800),            # exactly 30:00 later -> SAME session
        ev(3, 3600),            # again exactly 30:00 -> still same
        ev(4, 5400, 1),         # 30:00.000001 -> NEW session
    ])
    rows = _both(spark, sf, "event_sessionization_gap")
    # (user, session_no, start, n_events, duration_secs, sum_cents)
    assert [(r[1], r[3]) for r in rows] == [(1, 3), (2, 1)]
    assert rows[0][4] == 3600  # first session spans the two full gaps


def test_peak_concurrency_touching_intervals_not_concurrent(
        spark, tmp_path):
    """An interval ending exactly when the next starts must not count
    as overlap (half-open sweep: -1 sorts before +1 at one instant);
    one microsecond earlier they do overlap."""
    def ev(eid, user, sec_off, us_off=0):
        return (eid, T0 + dt.timedelta(seconds=sec_off,
                                       microseconds=us_off),
                user, "view", 1.0, "{}")

    sf = _write(spark, tmp_path, [
        # user 1: back-to-back touching intervals -> peak 1
        ev(1, 1, 0),
        ev(2, 1, 1800),
        # user 2: second interval starts 1 us BEFORE the first ends
        ev(3, 2, 0),
        ev(4, 2, 1799, 999_999),
    ])
    rows = _both(spark, sf, "event_peak_concurrency")
    peaks = {r[0]: r[1] for r in rows}
    assert peaks == {1: 1, 2: 2}


def test_session_window_exact_gap_merges(spark, tmp_path):
    """Spark's native F.session_window merges an event arriving EXACTLY
    `gap` after its predecessor (windows touch -> same session; probed
    r13); the oracle's gaps-and-islands rewrite must split on strictly-
    greater, not `>=` — the original `>=` diverged precisely here."""
    def ev(eid, user, sec_off, us_off=0):
        return (eid, T0 + dt.timedelta(seconds=sec_off,
                                       microseconds=us_off),
                user, "view", 1.0, "{}")

    sf = _write(spark, tmp_path, [
        # user 1: exactly 10:00 apart twice -> ONE session of 3
        ev(1, 1, 0),
        ev(2, 1, 600),
        ev(3, 1, 1200),
        # user 2: 10:00.000001 apart -> TWO sessions
        ev(4, 2, 0),
        ev(5, 2, 600, 1),
    ])
    rows = _both(spark, sf, "tw_session")
    by_user = {}
    for user, _start, end, n, _cents in rows:
        by_user.setdefault(user, []).append((n, end))
    assert by_user[1] == [(3, "2024-03-01 12:30:00")]
    assert sorted(n for n, _ in by_user[2]) == [1, 1]


def test_tumbling_window_edge_event_goes_to_next_bucket(spark, tmp_path):
    """An event exactly on the hour belongs to the NEXT tumbling window
    (start-inclusive, end-exclusive) in both F.window and time_bucket."""
    def ev(eid, sec_off, us_off=0):
        return (eid, T0 + dt.timedelta(seconds=sec_off,
                                       microseconds=us_off),
                1, "view", 1.0, "{}")

    sf = _write(spark, tmp_path, [
        ev(1, -1, 999_999),     # 11:59:59.999999 -> the 11:00 bucket
        ev(2, 0),               # exactly 12:00:00 -> the 12:00 bucket
        ev(3, 3600),            # exactly 13:00:00 -> the 13:00 bucket
    ])
    rows = _both(spark, sf, "tw_tumbling")
    counts = {r[0]: r[2] for r in rows}
    assert counts == {"2024-03-01 11:00:00": 1,
                      "2024-03-01 12:00:00": 1,
                      "2024-03-01 13:00:00": 1}
