"""Event-analytics operators (functions/analytics.py): hand-checked
semantics plus randomized DuckDB conformance for inter_event_gaps,
cohort_retention and cooccurring_event_pairs."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from signal_collect_ray.functions.analytics import (
    WEEK_US,
    cohort_retention,
    cooccurring_event_pairs,
    inter_event_gaps,
    week_floor_us,
)

_US = 1_000_000


def _ev_table(users, ts_s, types=None):
    n = len(users)
    return pa.table(
        {
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(
                [t * _US for t in ts_s], pa.timestamp("us")
            ),
            "event_type": pa.array(
                types if types is not None else ["e"] * n, pa.string()
            ),
        }
    )


def test_week_floor_matches_duckdb():
    con = duckdb.connect()
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 2_000_000_000, size=200) * np.int64(_US)
    want = (
        con.execute(
            "SELECT epoch_us(date_trunc('week', make_timestamp(x))) "
            "FROM (SELECT unnest(?) AS x)",
            [ts.tolist()],
        )
        .fetchnumpy()
        .popitem()[1]
    )
    np.testing.assert_array_equal(week_floor_us(ts), want)


def test_inter_event_gaps_hand():
    # user 1: events at 10, 25, 25, 100 → gaps NULL, 15, 0, 75 (s)
    # user 2: single event → gap NULL
    tbl = _ev_table([1, 1, 2, 1, 1], [25, 10, 50, 100, 25])
    rows = inter_event_gaps(rd.from_arrow(tbl)).take_all()
    got = sorted(
        (r["user_id"], r["ts_us"], r["gap_us"]) for r in rows
    )
    assert got == [
        (1, 10 * _US, None),
        (1, 25 * _US, 0),
        (1, 25 * _US, 15 * _US),
        (2, 50 * _US, None),
        (1, 100 * _US, 75 * _US),
    ] or got == sorted(
        [
            (1, 10 * _US, None),
            (1, 25 * _US, 15 * _US),
            (1, 25 * _US, 0),
            (1, 100 * _US, 75 * _US),
            (2, 50 * _US, None),
        ]
    )
    # multiset invariant: same (user, ts, gap) rows regardless of tie order
    assert len(got) == 5
    assert sum(1 for _, _, g in got if g is None) == 2


def test_cohort_retention_hand():
    wk = WEEK_US // _US  # one week in seconds
    # user 1 first active week 0, active again week 2
    # user 2 first active week 2 only
    tbl = _ev_table([1, 1, 1, 2], [100, 200, 2 * wk + 5, 2 * wk + 9])
    rows = cohort_retention(rd.from_arrow(tbl)).take_all()
    got = {(r["cohort_us"], r["k"]): r["n_users"] for r in rows}
    w0 = int(week_floor_us(np.array([100 * _US]))[0])
    w2 = int(week_floor_us(np.array([(2 * wk + 5) * _US]))[0])
    assert got == {(w0, 0): 1, (w0, (w2 - w0) // WEEK_US): 1, (w2, 0): 1}


def test_cooccurrence_hand():
    tbl = _ev_table(
        [1, 1, 1, 2, 2, 3],
        [1, 2, 3, 4, 5, 6],
        ["a", "b", "a", "b", "c", "a"],
    )
    rows = cooccurring_event_pairs(rd.from_arrow(tbl)).take_all()
    got = {(r["type_a"], r["type_b"]): r["n_users"] for r in rows}
    assert got == {("a", "b"): 1, ("b", "c"): 1}
    # min support prunes
    rows2 = cooccurring_event_pairs(
        rd.from_arrow(tbl), min_users=2
    ).take_all()
    assert rows2 == []


@st.composite
def _rand_events(draw):
    n = draw(st.integers(0, 40))
    users = [draw(st.integers(0, 5)) for _ in range(n)]
    ts = [draw(st.integers(0, 40 * 86_400)) for _ in range(n)]
    types = [draw(st.sampled_from(["a", "b", "c", "d"])) for _ in range(n)]
    return users, ts, types


def _con(tbl):
    con = duckdb.connect()
    con.register("ev", tbl)
    con.execute("CREATE VIEW events AS SELECT * FROM ev")
    return con


@given(_rand_events())
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_retention_matches_duckdb(inp):
    users, ts, _ = inp
    tbl = _ev_table(users, ts)
    got = sorted(
        (r["cohort_us"], r["k"], r["n_users"])
        for r in cohort_retention(rd.from_arrow(tbl)).take_all()
    )
    want = sorted(
        tuple(r)
        for r in _con(tbl)
        .execute(
            "WITH uw AS (SELECT DISTINCT user_id, "
            "epoch_us(date_trunc('week', ts)) AS w FROM events), "
            "fw AS (SELECT user_id, MIN(w) AS cw FROM uw GROUP BY user_id) "
            "SELECT fw.cw, (uw.w - fw.cw) // 604800000000, COUNT(*) "
            "FROM uw JOIN fw USING (user_id) GROUP BY 1, 2"
        )
        .fetchall()
    )
    assert got == want


@given(_rand_events())
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_cooccurrence_matches_duckdb(inp):
    users, ts, types = inp
    tbl = _ev_table(users, ts, types)
    got = sorted(
        (r["type_a"], r["type_b"], r["n_users"])
        for r in cooccurring_event_pairs(rd.from_arrow(tbl)).take_all()
    )
    want = sorted(
        tuple(r)
        for r in _con(tbl)
        .execute(
            "WITH ut AS (SELECT DISTINCT user_id, event_type FROM events) "
            "SELECT a.event_type, b.event_type, COUNT(*) FROM ut a "
            "JOIN ut b ON a.user_id = b.user_id "
            "AND a.event_type < b.event_type GROUP BY 1, 2"
        )
        .fetchall()
    )
    assert got == want


@given(_rand_events())
@settings(
    max_examples=15, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_gaps_match_duckdb(inp):
    users, ts, _ = inp
    tbl = _ev_table(users, ts)
    got = sorted(
        (r["user_id"], r["ts_us"], r["gap_us"])
        for r in inter_event_gaps(rd.from_arrow(tbl)).take_all()
        if r["gap_us"] is not None
    )
    # ties make per-row gap assignment order-dependent; the row multiset
    # of non-null gaps is invariant (diffs of the per-user sorted ts)
    want = sorted(
        tuple(r)
        for r in _con(tbl)
        .execute(
            "SELECT user_id, epoch_us(ts), epoch_us(ts) - "
            "LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
            "FROM events QUALIFY 3 IS NOT NULL AND epoch_us(ts) - "
            "LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) "
            "IS NOT NULL"
        )
        .fetchall()
    )
    assert got == want


def test_melt_roundtrip(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.functions.analytics import melt

    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2], pa.int64()),
                "a": pa.array([10, 20], pa.int64()),
                "b": pa.array([30, 40], pa.int64()),
            }
        )
    )
    rows = sorted(
        (r["k"], r["metric"], r["value"])
        for r in melt(ds, ["k"], ["a", "b"]).take_all()
    )
    assert rows == [
        (1, "a", 10), (1, "b", 30), (2, "a", 20), (2, "b", 40),
    ]
