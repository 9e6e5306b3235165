"""Property-based conformance: the temporal operators vs an in-process
DuckDB oracle on randomized inputs (hypothesis). These cover shapes the
fixed driver queries cannot — empty sides, single-row keys, boundary
equality, users present on only one side."""

import duckdb
import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _events(draw, n_users=4, max_rows=30, unique_ts=True):
    n = draw(st.integers(0, max_rows))
    users = [draw(st.integers(0, n_users - 1)) for _ in range(n)]
    if unique_ts:
        ts = draw(
            st.lists(
                st.integers(0, 10_000), min_size=n, max_size=n, unique=True
            )
        )
    else:
        ts = [draw(st.integers(0, 10_000)) for _ in range(n)]
    vals = [round(draw(st.floats(0, 100, allow_nan=False)), 2) for _ in range(n)]
    return users, ts, vals


@st.composite
def _asof_inputs(draw):
    lu, lt, _ = _events(draw)
    ru, rt, rv = _events(draw)
    return (lu, lt), (ru, rt, rv)


@given(_asof_inputs())
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_asof_join_matches_duckdb(inputs):
    from signal_collect_ray.functions.joins import asof_join

    (lu, lt), (ru, rt, rv) = inputs
    left = pa.table(
        {
            "event_id": pa.array(list(range(len(lu))), pa.int64()),
            "user_id": pa.array(lu, pa.int64()),
            "ts_us": pa.array(lt, pa.int64()),
        }
    )
    right = pa.table(
        {
            "user_id": pa.array(ru, pa.int64()),
            "ts_us": pa.array(rt, pa.int64()),
            "value": pa.array(rv, pa.float64()),
        }
    )
    # right side must be tie-free per (user, ts): the as-of pick among
    # equal timestamps is implementation-defined on both engines
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    dedup = con.execute(
        "SELECT user_id, ts_us, MAX(value) AS value FROM r "
        "GROUP BY user_id, ts_us"
    ).arrow()
    want = {
        row[0]: row[1]
        for row in con.execute(
            "SELECT l.event_id, r2.value FROM l ASOF LEFT JOIN "
            "(SELECT user_id, ts_us, MAX(value) AS value FROM r "
            " GROUP BY user_id, ts_us) r2 "
            "ON l.user_id = r2.user_id AND r2.ts_us <= l.ts_us"
        ).fetchall()
    }
    got = {
        r["event_id"]: r["value_asof"]
        for r in asof_join(
            rd.from_arrow(left), rd.from_arrow(pa.table(dedup))
        ).take_all()
    }
    assert got == want


@st.composite
def _session_inputs(draw):
    u, t, v = _events(draw, n_users=3, max_rows=25, unique_ts=True)
    gap = draw(st.integers(1, 5_000))
    return u, t, v, gap


@given(_session_inputs())
@settings(
    max_examples=25, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
def test_sessionize_matches_duckdb(inputs):
    from signal_collect_ray.functions.windows import sessionize

    u, t, v, gap = inputs
    ev = pa.table(
        {
            "user_id": pa.array(u, pa.int64()),
            "ts": pa.array(t, pa.timestamp("us")),
            "value": pa.array(v, pa.float64()),
        }
    )
    con = duckdb.connect()
    con.register("events", ev)
    want = {
        (r[0], r[1]): (r[2], r[3], r[4])
        for r in con.execute(
            f"""
            WITH o AS (SELECT user_id, ts, value, CASE WHEN
              epoch_us(ts) - epoch_us(LAG(ts) OVER
                (PARTITION BY user_id ORDER BY ts)) > {gap} THEN 1
              ELSE 0 END AS brk FROM events),
            s AS (SELECT user_id, ts, value, SUM(brk) OVER
              (PARTITION BY user_id ORDER BY ts
               ROWS UNBOUNDED PRECEDING) AS session FROM o)
            SELECT user_id, session, COUNT(*),
                   epoch_us(MIN(ts)), epoch_us(MAX(ts))
            FROM s GROUP BY user_id, session
            """
        ).fetchall()
    }
    got = {
        (r["user_id"], r["session"]): (r["n_events"], r["start_us"], r["end_us"])
        for r in sessionize(rd.from_arrow(ev), gap_s=gap / 1e6).take_all()
    }
    assert got == want
