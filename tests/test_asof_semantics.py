"""Adversarial-fixture semantics pins for the as-of join family.

The driver fixture's clicks and purchases almost never collide on a
timestamp, so the oracle gate cannot distinguish inclusive from
exclusive bounds, tie-breaks, or tolerance-boundary rounding — exactly
the places as-of implementations rot. This suite runs the REAL query
builders (operators/timeseries.py) over a handcrafted events.parquet
where every edge is present, and compares THREE independent
implementations row-for-row: the Spark union-merge rewrite, the
registered DuckDB ASOF-JOIN oracle text, and a brute-force pure-Python
scan of the documented semantics.

Edges covered: purchase exactly AT the click timestamp (inclusive both
directions), clicks before any purchase / after all purchases, a user
with no purchases at all, duplicate purchases at one timestamp (max
pre-aggregation), equidistant purchases around a click (nearest
tie-break: backward), duplicate clicks at one timestamp, the tolerance
boundary at exactly 1 hour (inclusive) vs 1h + 1s (stale), and
non-click/purchase event types interleaved as noise.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from wireduck_spark.registry import load_all_queries

QUERIES = load_all_queries()

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(eid, ts_offset_s, user, etype, value):
    return (eid, T0 + dt.timedelta(seconds=ts_offset_s), user, etype,
            value, "{}")


# (event_id, ts, user_id, event_type, value, props)
ROWS = [
    # user 1: purchase exactly AT the click ts (inclusive bounds)
    _ev(100, 0, 1, "purchase", 10.0),
    _ev(101, 0, 1, "click", None),
    _ev(102, -50, 1, "purchase", 5.0),
    _ev(103, 60, 1, "purchase", 20.0),
    # user 2: click BEFORE any purchase (backward null, forward match)
    _ev(200, 0, 2, "click", None),
    _ev(201, 30, 2, "purchase", 7.0),
    # user 3: click AFTER all purchases (forward null, backward match)
    _ev(300, 0, 3, "purchase", 3.0),
    _ev(301, 40, 3, "click", None),
    # user 4: no purchases at all (everything null)
    _ev(400, 0, 4, "click", None),
    # user 5: duplicate purchases at ONE ts (max pre-agg) + clicks around
    _ev(500, 0, 5, "purchase", 8.0),
    _ev(501, 0, 5, "purchase", 12.0),
    _ev(502, 10, 5, "click", None),
    _ev(503, -10, 5, "click", None),
    # user 6: tolerance boundary — purchase exactly 3600s before one
    # click (fresh, inclusive), 3601s before another (stale)
    _ev(600, 0, 6, "purchase", 30.0),
    _ev(601, 3600, 6, "click", None),
    _ev(602, 3601, 6, "click", None),
    # user 7: equidistant purchases around a click (nearest: backward)
    _ev(700, -20, 7, "purchase", 1.0),
    _ev(701, 20, 7, "purchase", 2.0),
    _ev(702, 0, 7, "click", None),
    # user 8: duplicate clicks at one ts
    _ev(800, -5, 8, "purchase", 4.0),
    _ev(801, 0, 8, "click", None),
    _ev(802, 0, 8, "click", None),
    # noise: other event types must be ignored entirely
    _ev(900, 0, 1, "view", 99.0),
    _ev(901, 1, 2, "error", 99.0),
]


@pytest.fixture(scope="module")
def asof_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("asof_events")
    df = spark.createDataFrame(
        ROWS, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
              "event_type STRING, value DOUBLE, props STRING")
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def _spark_rows(spark, asof_dir, name):
    return sorted(
        tuple(r) for r in QUERIES[name].fn(spark, asof_dir).collect())


def _duck_rows(asof_dir, name):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{asof_dir}/events.parquet/*.parquet')")
    try:
        return sorted(tuple(r) for r in
                      con.execute(QUERIES[name].oracle).fetchall())
    finally:
        con.close()


def _purchases():
    agg: dict[tuple[int, dt.datetime], float] = {}
    for _, ts, user, etype, value, _p in ROWS:
        if etype == "purchase":
            k = (user, ts)
            agg[k] = max(agg.get(k, float("-inf")), value)
    return agg


def _clicks():
    return [(eid, user, ts) for eid, ts, user, etype, _v, _p in ROWS
            if etype == "click"]


def _brute(direction):
    """Documented semantics, scanned pairwise: backward = latest
    purchase at-or-before, forward = earliest at-or-after, nearest =
    smallest |dt| with backward winning ties, tolerance = backward
    nulled when older than exactly 3600 s."""
    out = []
    purchases = _purchases()
    for eid, user, ts in _clicks():
        mine = [(p_ts, v) for (u, p_ts), v in purchases.items()
                if u == user]
        back = max(((p, v) for p, v in mine if p <= ts), default=None)
        fwd = min(((p, v) for p, v in mine if p >= ts), default=None)
        ts_s = ts.strftime("%Y-%m-%d %H:%M:%S")
        if direction == "backward":
            out.append((eid, user, ts_s,
                        round(back[1], 2) if back else None))
        elif direction == "forward":
            out.append((eid, user, ts_s,
                        round(fwd[1], 2) if fwd else None))
        elif direction == "tolerance":
            fresh = back and (ts - back[0]).total_seconds() <= 3600
            out.append((eid, user, ts_s,
                        round(back[1], 2) if fresh else None))
        else:  # nearest
            if back is None and fwd is None:
                # no purchase at all: both twins render the default
                # 'backward' label with a NULL value (the oracle's CASE
                # falls through f_ts IS NULL first)
                out.append((eid, user, ts_s, "backward", None))
                continue
            if fwd is None:
                pick, d = back, "backward"
            elif back is None:
                pick, d = fwd, "forward"
            elif (ts - back[0]) <= (fwd[0] - ts):
                pick, d = back, "backward"
            else:
                pick, d = fwd, "forward"
            out.append((eid, user, ts_s, d, round(pick[1], 2)))
    return sorted(out)


@pytest.mark.parametrize("name,direction", [
    ("join_asof", "backward"),
    ("join_asof_forward", "forward"),
    ("join_asof_nearest", "nearest"),
    ("join_asof_tolerance", "tolerance"),
])
def test_asof_family_three_way_on_adversarial_events(
        spark, asof_dir, name, direction):
    got_spark = _spark_rows(spark, asof_dir, name)
    got_duck = _duck_rows(asof_dir, name)
    expected = _brute(direction)
    assert got_spark == expected, f"{name}: Spark diverges from semantics"
    assert got_duck == expected, f"{name}: oracle diverges from semantics"


def test_adversarial_fixture_is_not_vacuous(spark, asof_dir):
    """The fixture must actually exercise the edges: at least one NULL
    per direction, a same-ts inclusive match, a nearest tie, and a
    fresh/stale tolerance split — otherwise the three-way compare
    degenerates into the driver-fixture blind spot this file exists
    to close."""
    back = dict(((e, u), v) for e, u, _t, v in _brute("backward"))
    fwd = dict(((e, u), v) for e, u, _t, v in _brute("forward"))
    tol = dict(((e, u), v) for e, u, _t, v in _brute("tolerance"))
    near = {(e, u): (d, v) for e, u, _t, d, v in _brute("nearest")}
    assert back[(101, 1)] == 10.0          # same-ts purchase, inclusive
    assert fwd[(101, 1)] == 10.0           # inclusive both directions
    assert back[(200, 2)] is None and fwd[(200, 2)] == 7.0
    assert fwd[(301, 3)] is None and back[(301, 3)] == 3.0
    assert back[(400, 4)] is None and fwd[(400, 4)] is None
    assert back[(502, 5)] == 12.0          # max over same-ts duplicates
    assert tol[(601, 6)] == 30.0           # exactly 1 h old: fresh
    assert tol[(602, 6)] is None           # 1 h + 1 s old: stale
    assert near[(702, 7)] == ("backward", 1.0)  # equidistant tie
    assert near[(801, 8)] == near[(802, 8)]     # duplicate clicks agree
    assert near[(400, 4)] == ("backward", None)  # no purchase: NULL row
