"""Streaming-window operators over event logs.

The reference engine has no windowing (its streams are vertex signals),
but a training-data/link-graph pipeline at 100 TB ingests event logs —
crawl logs, click streams — and needs the two canonical shapes:

* ``tumbling_window``: fixed-width buckets. Pure map (vectorized window
  key) + built-in groupby aggregates — Ray Data's hash aggregation is
  already partial-per-block + final, so the only exchange carries one
  row per (window, type) per block, not per event.
* ``sessionize``: gap-based sessions per user. One hash exchange on
  ``user_id`` (groupby), then a fully vectorized per-user kernel
  (sort + diff > gap + cumsum + reduceat). Skew is bounded by the
  hottest single user's event count — the same bound any per-user
  sessionizer has; a user's history must be co-resident to sessionize.

Both return epoch-microsecond int64 timestamps so DuckDB oracles can
mirror them exactly (``epoch_us``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import pin_schema

_SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session", pa.int64()),
        ("n_events", pa.int64()),
        ("start_us", pa.int64()),
        ("end_us", pa.int64()),
        ("sum_value", pa.float64()),
    ]
)


class _UserSessions:
    """One user's events → session rows (vectorized; no Python loop)."""

    __name__ = "_UserSessions"

    def __init__(self, gap_us: int):
        self.gap_us = gap_us

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        val = tbl.column("value").to_numpy(zero_copy_only=False)[order]
        uid = int(tbl.column("user_id")[0].as_py())
        # a session break wherever the inter-event gap exceeds the limit
        brk = np.empty(len(ts), dtype=bool)
        brk[0] = True
        brk[1:] = np.diff(ts) > self.gap_us
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(ts)]]) - 1
        n = np.concatenate([starts[1:], [len(ts)]]) - starts
        # exact integer cents (inputs are 2-dp): order-independent sum —
        # a float accumulation can straddle the 6-dp rounding boundary
        # depending on addition order (the de299fd money-sum bug class)
        cents = np.rint(val * 100.0).astype(np.int64)
        sums = np.add.reduceat(cents, starts) / 100.0
        return pa.table(
            {
                "user_id": pa.array(np.full(len(starts), uid), pa.int64()),
                "session": pa.array(np.arange(len(starts)), pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends], pa.int64()),
                "sum_value": pa.array(sums, pa.float64()),
            }
        )


def sessionize(events_ds, gap_s: float = 14400.0):
    """Gap-based sessionization: consecutive events of a user belong to
    one session while the inter-event gap stays ≤ ``gap_s``. Returns one
    row per (user_id, session) with count, start/end (epoch µs) and the
    value sum — the sessions table a feature pipeline joins against."""
    gap_us = int(gap_s * 1_000_000)
    ev = events_ds.select_columns(["user_id", "ts", "value"])
    out = ev.groupby("user_id").map_groups(
        _UserSessions(gap_us), batch_format="pyarrow"
    )
    return pin_schema(out, _SESSION_SCHEMA)


def _cents_to_value(tbl: pa.Table) -> pa.Table:
    """Final map after a cents Sum: divide the exact integer once.
    The oracle divides the identical integer by the identical 100.0,
    so both sides land on the same IEEE double bit-for-bit."""
    c = tbl.column("cents").to_numpy(zero_copy_only=False)
    i = tbl.schema.get_field_index("cents")
    return tbl.set_column(i, "cents", pa.array(c / 100.0, pa.float64())).rename_columns(
        [n if n != "cents" else "sum_value" for n in tbl.column_names]
    )


class _WindowKey:
    __name__ = "_WindowKey"

    def __init__(self, width_us: int):
        self.width_us = width_us

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // self.width_us) * self.width_us
        # exact integer cents → the distributed Sum is order-independent
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_us": pa.array(win, pa.int64()),
                "event_type": tbl.column("event_type"),
                "cents": pa.array(
                    np.rint(v * 100.0).astype(np.int64), pa.int64()
                ),
            }
        )


def tumbling_window(events_ds, width_s: float = 3600.0):
    """Fixed-width (tumbling) window aggregate per event type: count and
    value sum per (window_start, event_type). The window key is a
    vectorized floor-div map; Ray Data's hash aggregation pre-combines
    per block, so the exchange is O(windows × types), not O(events)."""
    from ray.data.aggregate import Count, Sum

    width_us = int(width_s * 1_000_000)
    ev = events_ds.select_columns(["ts", "event_type", "value"])
    keyed = ev.map_batches(_WindowKey(width_us), batch_format="pyarrow")
    agg = keyed.groupby(["window_us", "event_type"]).aggregate(
        Count(alias_name="n_events"),
        Sum("cents", alias_name="cents"),
    )
    return agg.map_batches(_cents_to_value, batch_format="pyarrow")


class _SlidingWindowKey:
    """Explode each event into every sliding window that covers it —
    ceil(width/slide) copies per row, fully vectorized (one repeat +
    one tiled arange per batch)."""

    __name__ = "_SlidingWindowKey"

    def __init__(self, width_us: int, slide_us: int):
        if width_us % slide_us != 0:
            raise ValueError("width must be a multiple of slide")
        self.width_us = width_us
        self.slide_us = slide_us
        self.k = width_us // slide_us

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts)
        # windows containing t start at floor(t/slide)*slide - j*slide,
        # j = 0..k-1 (all starts w on slide boundaries with
        # t-width < w <= t)
        newest = (ts // self.slide_us) * self.slide_us
        offs = np.arange(self.k, dtype=np.int64) * self.slide_us
        win = np.repeat(newest, self.k) - np.tile(offs, n)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), self.k))
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        cents = np.repeat(np.rint(v * 100.0).astype(np.int64), self.k)
        return pa.table(
            {
                "window_us": pa.array(win, pa.int64()),
                "event_type": tbl.column("event_type").take(idx),
                "cents": pa.array(cents, pa.int64()),
            }
        )


def sliding_window(events_ds, width_s: float = 7200.0, slide_s: float = 3600.0):
    """Overlapping (sliding) window aggregate per event type — each
    event lands in width/slide windows (flat-map key explosion, then
    the same pre-combined hash aggregation as tumbling_window). A
    window's key is its START timestamp; an event at t belongs to
    windows starting in (t - width, t] on slide boundaries."""
    from ray.data.aggregate import Count, Sum

    width_us = int(width_s * 1_000_000)
    slide_us = int(slide_s * 1_000_000)
    ev = events_ds.select_columns(["ts", "event_type", "value"])
    keyed = ev.map_batches(
        _SlidingWindowKey(width_us, slide_us), batch_format="pyarrow"
    )
    agg = keyed.groupby(["window_us", "event_type"]).aggregate(
        Count(alias_name="n_events"),
        Sum("cents", alias_name="cents"),
    )
    return agg.map_batches(_cents_to_value, batch_format="pyarrow")


class _RunningTotals:
    """One user's co-partitioned events → ts-ordered cumulative sum."""

    __name__ = "_RunningTotals"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        ts = tbl.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.argsort(ts, kind="stable")
        t = tbl.take(pa.array(order, pa.int64()))
        v = t.column("value").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "ts_us": pa.array(ts[order], pa.int64()),
                "running_value": pa.array(
                    np.round(np.cumsum(v), 6), pa.float64()
                ),
            }
        )


def running_totals(events_ds):
    """Per-user cumulative value ordered by time — the prefix-aggregate
    window (SUM OVER ... ROWS UNBOUNDED PRECEDING). One user_id
    exchange; the per-key kernel is one sort + one cumsum, and the
    addition order is the timestamp order on BOTH engine and oracle, so
    prefix sums match bit-for-bit before the shared ROUND(,6)."""
    ev = events_ds.select_columns(["user_id", "ts", "value"])
    return ev.groupby("user_id").map_groups(
        _RunningTotals(), batch_format="pyarrow"
    )
