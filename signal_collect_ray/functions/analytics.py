"""Event-log analytics operators: inter-event gaps (LAG), cohort
retention, and market-basket co-occurrence.

The reference engine computes over vertex signals, but the web-scale
pipeline this repo targets also ingests event logs (crawl logs, click
streams), and three more canonical analytics shapes were still missing
after the windowing family (`windows.py`):

* ``inter_event_gaps`` — the LAG window: each event annotated with the
  microseconds since the same user's previous event. ONE hash exchange
  on ``user_id``; the per-partition kernel is a single lexsort + diff
  over ALL users in the partition (no per-user Python), so skew is
  bounded by the hottest partition, not the hottest user.
* ``cohort_retention`` — the product-analytics retention matrix:
  users cohorted by first active week, counted per (cohort, week
  offset). ONE user exchange (each user's weeks must be co-resident to
  find the first), per-partition distinct + partial counts, then a
  tiny (cohort, k) sum — the exchange after the user shuffle carries
  one row per (cohort, k) per partition, never per event.
* ``cooccurring_event_pairs`` — market-basket pair counts: for every
  unordered pair of event types, how many users did both. Per-block
  distinct (user, type) partials bound the user exchange to one row
  per (block, user, type); the per-partition kernel emits each user's
  within-segment pairs (``np.triu_indices`` over segments — segment
  width is the per-user distinct-type count, small by construction),
  then partial pair counts ride a tiny final groupby.

All three mirror exactly in ANSI SQL (LAG OVER, date_trunc('week') +
integer week arithmetic, distinct self-join), so the driver's DuckDB
parity harness pins them end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import part_of

_DAY_US = 86_400 * 1_000_000
WEEK_US = 7 * _DAY_US


def week_floor_us(ts_us: np.ndarray) -> np.ndarray:
    """Monday-aligned week truncation of epoch-µs timestamps — the same
    bucket DuckDB's ``date_trunc('week', ts)`` yields (1970-01-01 was a
    Thursday, so Mondays satisfy ``(day + 3) % 7 == 0``)."""
    day = ts_us // _DAY_US
    monday = day - ((day + 3) % 7)
    return monday * _DAY_US


def _ts_us(tbl: pa.Table, col: str = "ts") -> np.ndarray:
    return tbl.column(col).cast(pa.int64()).to_numpy(zero_copy_only=False)


class _PartitionLag:
    """One hash partition (MANY users) → per-event gap to the user's
    previous event. Fully vectorized: lexsort by (user, ts) then one
    diff; user boundaries become NULL gaps (SQL LAG semantics)."""

    __name__ = "_PartitionLag"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        ts = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        if len(uid) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "ts_us": pa.array([], pa.int64()),
                    "gap_us": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ts, uid))
        u = uid[order]
        t = ts[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        gap = np.zeros(len(t), dtype=np.int64)
        gap[1:] = t[1:] - t[:-1]
        gap[first] = 0
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "ts_us": pa.array(t, pa.int64()),
                # mask=True → NULL: a user's first event has no LAG
                "gap_us": pa.array(gap, pa.int64(), mask=first),
            }
        )


def inter_event_gaps(events_ds, num_partitions: int = 16):
    """Per-event microseconds since the same user's previous event —
    ``epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER
    BY ts)``. First event per user gets NULL.

    One ``part`` exchange; each partition handles all of its users in
    one lexsort+diff kernel. With equal timestamps inside a user the
    per-row gap assignment depends on tie order, but the (user, ts,
    gap) ROW MULTISET does not (diffs of a sorted sequence), which is
    what the order-insensitive oracle hash compares."""

    def keyed(tbl: pa.Table) -> pa.Table:
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": tbl.column("user_id"),
                "ts_us": pa.array(_ts_us(tbl), pa.int64()),
                "part": pa.array(part_of(uid, num_partitions), pa.int32()),
            }
        )

    ev = events_ds.select_columns(["user_id", "ts"])
    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_PartitionLag(), batch_format="pyarrow")
    )


class _PartitionRetention:
    """One hash partition (MANY users) → partial (cohort_us, k) counts.

    Users are whole within a partition, so per-partition distinct-user
    counts per (cohort, k) are disjoint across partitions and a plain
    Sum finishes them."""

    __name__ = "_PartitionRetention"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        wk = tbl.column("week_us").to_numpy(zero_copy_only=False)
        if len(uid) == 0:
            return pa.table(
                {
                    "cohort_us": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "n_users": pa.array([], pa.int64()),
                }
            )
        pairs = np.stack([uid, wk], axis=1)
        pairs = np.unique(pairs, axis=0)  # sorted by (uid, week)
        u, w = pairs[:, 0], pairs[:, 1]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        # cohort week = the user's first (minimum) active week
        cohort = w[np.repeat(np.flatnonzero(first), np.diff(
            np.append(np.flatnonzero(first), len(u))
        ))]
        k = (w - cohort) // WEEK_US
        key = np.stack([cohort, k], axis=1)
        uniq, counts = np.unique(key, axis=0, return_counts=True)
        return pa.table(
            {
                "cohort_us": pa.array(uniq[:, 0], pa.int64()),
                "k": pa.array(uniq[:, 1], pa.int64()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )


def cohort_retention(events_ds, num_partitions: int = 16):
    """Weekly cohort retention: rows (cohort_us, k, n_users) where
    ``cohort_us`` is the Monday (epoch µs) of a user's first active
    week and ``n_users`` counts that cohort's users active in week
    ``cohort + k``. (k=0 row is the cohort size.)

    Per-block distinct (user, week) partials bound the user exchange;
    the post-exchange aggregate carries one row per (cohort, k) per
    partition — tiny at any corpus scale."""
    from ray.data.aggregate import Sum

    def keyed(tbl: pa.Table) -> pa.Table:
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        wk = week_floor_us(_ts_us(tbl))
        pairs = np.unique(np.stack([uid, wk], axis=1), axis=0)
        return pa.table(
            {
                "user_id": pa.array(pairs[:, 0], pa.int64()),
                "week_us": pa.array(pairs[:, 1], pa.int64()),
                "part": pa.array(
                    part_of(pairs[:, 0], num_partitions), pa.int32()
                ),
            }
        )

    ev = events_ds.select_columns(["user_id", "ts"])
    partial = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_PartitionRetention(), batch_format="pyarrow")
    )
    agg = partial.groupby(["cohort_us", "k"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )
    return agg


class _PartitionPairs:
    """One hash partition (MANY users) → partial co-occurrence counts
    over unordered event-type pairs. Segment width = a user's distinct
    type count (bounded by the type vocabulary), so the per-segment
    ``np.triu_indices`` is O(types²) — constant — per user."""

    __name__ = "_PartitionPairs"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        uid = tbl.column("user_id").to_numpy(zero_copy_only=False)
        et = tbl.column("event_type")
        # dictionary-encode the (small) type vocabulary once per call
        codes_arr = et.combine_chunks().dictionary_encode()
        vocab = np.array(codes_arr.dictionary.to_pylist(), dtype=object)
        codes = codes_arr.indices.to_numpy(zero_copy_only=False)
        # sort codes by VOCAB STRING so pair order is (a < b) lexicographic
        rank = np.empty(len(vocab), dtype=np.int64)
        rank[np.argsort(vocab)] = np.arange(len(vocab))
        r = rank[codes]
        pairs = np.unique(np.stack([uid, r], axis=1), axis=0)
        u, c = pairs[:, 0], pairs[:, 1]
        starts = np.flatnonzero(
            np.concatenate([[True], u[1:] != u[:-1]])
        )
        lens = np.diff(np.append(starts, len(u)))
        a_all, b_all = [], []
        for s, n in zip(starts, lens):
            if n < 2:
                continue
            ia, ib = np.triu_indices(n, k=1)
            a_all.append(c[s + ia])
            b_all.append(c[s + ib])
        if not a_all:
            return empty
        a = np.concatenate(a_all)
        b = np.concatenate(b_all)
        key = np.stack([a, b], axis=1)
        uniq, counts = np.unique(key, axis=0, return_counts=True)
        inv = np.empty(len(vocab), dtype=object)
        inv[rank] = vocab
        return pa.table(
            {
                "type_a": pa.array(inv[uniq[:, 0]].tolist(), pa.string()),
                "type_b": pa.array(inv[uniq[:, 1]].tolist(), pa.string()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )


def cooccurring_event_pairs(
    events_ds, min_users: int = 1, num_partitions: int = 16
):
    """Market-basket co-occurrence: for every unordered pair of event
    types (``type_a < type_b``), the number of distinct users that did
    both. ``min_users`` filters low-support pairs (a-priori pruning).

    Per-block distinct partials → one user exchange → per-partition
    pair emission (users are whole per partition, so partial counts sum
    disjointly) → final pair groupby over at most |types|² rows."""
    from ray.data.aggregate import Sum

    def keyed(tbl: pa.Table) -> pa.Table:
        # per-block distinct (user, type) — Arrow hash group-by, no rows
        distinct = tbl.group_by(["user_id", "event_type"]).aggregate([])
        uid = distinct.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": distinct.column("user_id"),
                "event_type": distinct.column("event_type"),
                "part": pa.array(part_of(uid, num_partitions), pa.int32()),
            }
        )

    ev = events_ds.select_columns(["user_id", "event_type"])
    partial = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_PartitionPairs(), batch_format="pyarrow")
    )
    agg = partial.groupby(["type_a", "type_b"]).aggregate(
        Sum("n_users", alias_name="n_users")
    )
    if min_users > 1:
        agg = agg.filter(expr=f"n_users >= {int(min_users)}")
    return agg


class _ValueHistogram:
    """Block → (value, count) partial histogram over a rounded-float
    column keyed as int64 micro-units (exact on both engines)."""

    __name__ = "_ValueHistogram"

    def __init__(self, col: str, digits: int):
        self.col = col
        self.scale = 10 ** digits

    def __call__(self, tbl: pa.Table) -> pa.Table:
        v = tbl.column(self.col).to_numpy(zero_copy_only=False)
        vi = np.round(np.round(v, 6) * self.scale).astype(np.int64)
        u, c = np.unique(vi, return_counts=True)
        return pa.table({"vi": pa.array(u, pa.int64()),
                         "n": pa.array(c, pa.int64())})


def gini_concentration(ds, col: str, digits: int = 6):
    """Gini coefficient of ``col`` — the standard inequality measure
    (mean absolute difference over twice the mean; public formula),
    e.g. of PageRank mass to quantify attention concentration on a web
    graph. Exact under the repo's 6-digit rounding convention: values
    are bucketed to int micro-units first, so ties are counted
    identically by the SQL mirror's pairwise form.

    Scale shape: per-block ``np.unique`` histograms, one tiny
    ``groupby(vi)`` over blocks x distinct-values rows, then an O(K)
    sorted cumsum fold on the driver (K = distinct rounded values,
    bounded by the rounding granularity — never by row count). The
    O(K²) pairwise definition is collapsed to cumulative sums:
    sum_{k<l} f_k f_l (v_l - v_k) = sum_l f_l (v_l F_{l-1} - S_{l-1}).
    Returns a one-row Table ``{"gini": float64}`` rounded to 6."""
    from ray.data.aggregate import Sum

    rows = (
        ds.select_columns([col])
        .map_batches(_ValueHistogram(col, digits), batch_format="pyarrow")
        .groupby("vi")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    )
    vi = np.array([r["vi"] for r in rows], dtype=np.float64) / (10 ** digits)
    f = np.array([r["n"] for r in rows], dtype=np.float64)
    order = np.argsort(vi)
    vi, f = vi[order], f[order]
    n, s = f.sum(), float(f @ vi)
    cum_f = np.concatenate([[0.0], np.cumsum(f)])[:-1]       # F_{l-1}
    cum_s = np.concatenate([[0.0], np.cumsum(f * vi)])[:-1]  # S_{l-1}
    mad_half = float(f @ (vi * cum_f - cum_s))               # sum_{k<l} pairs
    gini = 0.0 if n == 0 or s == 0 else 2.0 * mad_half / (2.0 * n * s)
    return pa.table({"gini": pa.array([round(gini, 6)], pa.float64())})


def time_decayed_sum(
    events_ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    half_life_s: float = 86400.0,
    digits: int = 6,
):
    """Per-key half-life-decayed value sum — the standard recency-
    weighted engagement score (exponential time decay, public
    formula): Σ value·2^(−(t_ref − ts)/half_life) with t_ref = the
    corpus max timestamp, so every weight is ≤ 1 and the result is
    reproducible for a fixed snapshot.

    Scale shape: one tiny ``max(ts)`` aggregate broadcast as a plain
    float, then per-block vectorized partial sums per key and ONE
    ``groupby(key)`` over block×key partial rows — the same
    pre-aggregated exchange every other aggregation here uses.

    Returns a Dataset (key_col, decayed_sum) rounded to ``digits``."""
    from ray.data.aggregate import Sum

    import pyarrow.compute as pc
    from ray.data.aggregate import Max

    sel = events_ds.select_columns([key_col, ts_col, val_col])

    def block_max(tbl: pa.Table) -> pa.Table:
        m = pc.max(tbl.column(ts_col).cast(pa.int64())).as_py()
        return pa.table({"m": pa.array([m if m is not None else 0], pa.int64())})

    t_ref_us = int(sel.map_batches(block_max, batch_format="pyarrow").max("m"))

    def partial(tbl: pa.Table) -> pa.Table:
        ts = tbl.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False
        )
        v = tbl.column(val_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        w = v * np.exp2(-(t_ref_us - ts) / (half_life_s * 1e6))
        t = pa.table({key_col: tbl.column(key_col),
                      "w": pa.array(w, pa.float64())})
        agg = t.group_by(key_col).aggregate([("w", "sum")])
        return agg.rename_columns([key_col, "w"])

    agg = sel.map_batches(partial, batch_format="pyarrow").groupby(
        key_col
    ).aggregate(Sum("w", alias_name="decayed_sum"))

    def final(tbl: pa.Table) -> pa.Table:
        s = tbl.column("decayed_sum").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key_col: tbl.column(key_col),
                "decayed_sum": pa.array(np.round(s, digits), pa.float64()),
            }
        )

    return agg.map_batches(final, batch_format="pyarrow")


def _lex_first_rows(tbl: pa.Table, key: str, order_cols) -> pa.Table:
    """Keep the lexicographically-first row (by ``order_cols``) per
    ``key`` — one vectorized lexsort + boundary mask, no per-key loop."""
    k = tbl.column(key).to_numpy(zero_copy_only=False)
    sort_keys = [
        tbl.column(c).to_numpy(zero_copy_only=False) for c in order_cols
    ]
    # np.lexsort: LAST key is primary → (reversed order cols, key first)
    order = np.lexsort(tuple(reversed(sort_keys)) + (k,))
    k_sorted = k[order]
    first = np.ones(len(k_sorted), dtype=bool)
    first[1:] = k_sorted[1:] != k_sorted[:-1]
    return tbl.take(pa.array(order[first], pa.int64()))


def first_event_per_key(
    events_ds,
    event_type: str | None = None,
    key: str = "user_id",
    num_partitions: int = 16,
    latest: bool = False,
):
    """First (or, with ``latest=True``, last) event per key in
    (ts, event_id) order — the ROW_NUMBER()=1 window without a global
    sort: a per-block vectorized argmin keeps one candidate row per key
    per block, then ONE hash exchange on the key merges candidates with
    the same kernel per partition (P Python calls total, never a
    per-key ``map_groups``). At 10^12 events the exchange carries ≤
    distinct-keys-per-block rows, not events.

    Returns (key, {first,last}_ts_us, {first,last}_event_id,
    {first,last}_value); value rounds to 6 (float-mirror convention)."""
    import pyarrow.compute as pc

    pre = "last" if latest else "first"
    c_ts, c_id, c_val = f"{pre}_ts_us", f"{pre}_event_id", f"{pre}_value"
    cols = [key, "ts", "event_id", "value"]
    sel = events_ds.select_columns(
        cols + (["event_type"] if event_type is not None else [])
    )

    def extreme(t: pa.Table) -> pa.Table:
        if not latest:
            return _lex_first_rows(t, key, (c_ts, c_id))
        neg = pa.table(
            {
                "_nts": pa.array(
                    -t.column(c_ts).to_numpy(zero_copy_only=False),
                    pa.int64(),
                ),
                "_nid": pa.array(
                    -t.column(c_id).to_numpy(zero_copy_only=False),
                    pa.int64(),
                ),
            }
        )
        t2 = t
        for name in neg.schema.names:
            t2 = t2.append_column(name, neg.column(name))
        return _lex_first_rows(t2, key, ("_nts", "_nid")).drop_columns(
            ["_nts", "_nid"]
        )

    def block_first(tbl: pa.Table) -> pa.Table:
        if event_type is not None:
            tbl = tbl.filter(pc.equal(tbl.column("event_type"), event_type))
        t = pa.table(
            {
                key: tbl.column(key),
                c_ts: tbl.column("ts").cast(pa.int64()),
                c_id: tbl.column("event_id"),
                c_val: tbl.column("value"),
            }
        )
        win = extreme(t)
        kv = win.column(key).to_numpy(zero_copy_only=False)
        return win.append_column(
            "part", pa.array(part_of(kv, num_partitions), pa.int32())
        )

    def merge(tbl: pa.Table) -> pa.Table:
        win = extreme(tbl)
        v = np.round(win.column(c_val).to_numpy(zero_copy_only=False), 6)
        return pa.table(
            {
                key: win.column(key),
                c_ts: win.column(c_ts),
                c_id: win.column(c_id),
                c_val: pa.array(v, pa.float64()),
            }
        )

    from signal_collect_ray.util import pin_schema

    out = (
        sel.map_batches(block_first, batch_format="pyarrow")
        .groupby("part")
        .map_groups(merge, batch_format="pyarrow")
    )
    return pin_schema(
        out,
        pa.schema(
            [
                (key, pa.int64()),
                (c_ts, pa.int64()),
                (c_id, pa.int64()),
                (c_val, pa.float64()),
            ]
        ),
    )


def last_event_per_key(
    events_ds,
    event_type: str | None = None,
    key: str = "user_id",
    num_partitions: int = 16,
):
    """Latest event per key (ts desc, event_id desc) — the CDC/SCD
    "current state" snapshot (dedup-by-latest upsert compaction); same
    two-phase argmin shape as :func:`first_event_per_key`."""
    return first_event_per_key(
        events_ds,
        event_type=event_type,
        key=key,
        num_partitions=num_partitions,
        latest=True,
    )


def _skyline_kernel(tbl: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Rows NOT strictly dominated on (x, y), both maximized — one
    vectorized pass: sort (x desc, y desc), a row survives iff its y is
    its x-run's max AND strictly above the best y of any greater-x run."""
    n = tbl.num_rows
    if n == 0:
        return tbl
    x = tbl.column(x_col).to_numpy(zero_copy_only=False).astype(np.float64)
    y = tbl.column(y_col).to_numpy(zero_copy_only=False).astype(np.float64)
    order = np.lexsort((-y, -x))
    xs, ys = x[order], y[order]
    run_start = np.ones(n, dtype=bool)
    run_start[1:] = xs[1:] != xs[:-1]
    starts = np.flatnonzero(run_start)
    run_ids = np.cumsum(run_start) - 1
    run_max = ys[starts][run_ids]  # y desc within run → first = max
    pm = np.maximum.accumulate(ys)
    m_run = np.concatenate([[-np.inf], pm[starts[1:] - 1]])
    m = m_run[run_ids]  # best y among rows with STRICTLY greater x
    kept = (ys == run_max) & (ys > m)
    return tbl.take(pa.array(order[kept], pa.int64()))


def pareto_frontier(ds, x_col: str, y_col: str, group_col: str | None = None):
    """Skyline / Pareto frontier on two maximized columns — the
    multi-objective selection pass (e.g. "longest AND highest-quality
    documents") a curation pipeline uses to pick exemplars; with
    ``group_col``, one independent frontier per group (per-language
    exemplars). Distributed shape: every block prunes to its local
    (per-group) frontier with one vectorized kernel (dominated rows
    never leave the block — at 10^12 rows the exchange carries only
    per-block frontiers), then ONE groupby finalizer merges candidates
    with the same kernel. Worst case (all points mutually
    non-dominated, e.g. a perfect diagonal) degenerates to the full
    input in the final task — real score distributions prune orders of
    magnitude. Strict-dominance semantics: ties/duplicate points are
    kept (exactly SQL's NOT EXISTS strict dominator)."""

    def kern(tbl: pa.Table) -> pa.Table:
        if group_col is None:
            return _skyline_kernel(tbl, x_col, y_col)
        # per-group: sort rows by group, apply the kernel per segment
        g = tbl.column(group_col).to_numpy(zero_copy_only=False)
        if g.dtype == object:
            _, codes = np.unique(g.astype(str), return_inverse=True)
        else:
            codes = g
        order = np.argsort(codes, kind="stable")
        t = tbl.take(pa.array(order, pa.int64()))
        codes = codes[order]
        starts = np.flatnonzero(
            np.r_[True, codes[1:] != codes[:-1]]
        ).tolist() + [len(codes)]
        parts = [
            _skyline_kernel(t.slice(starts[i], starts[i + 1] - starts[i]),
                            x_col, y_col)
            for i in range(len(starts) - 1)
        ]
        return pa.concat_tables(parts) if parts else tbl.slice(0, 0)

    def block(tbl: pa.Table) -> pa.Table:
        win = kern(tbl)
        if group_col is None:
            return win.append_column(
                "g", pa.array(np.zeros(win.num_rows, np.int64), pa.int64())
            )
        return win

    key = "g" if group_col is None else group_col

    def final(tbl: pa.Table) -> pa.Table:
        win = kern(tbl)
        return win.drop_columns(["g"]) if group_col is None else win

    return (
        ds.map_batches(block, batch_format="pyarrow")
        .groupby(key)
        .map_groups(final, batch_format="pyarrow")
    )


def grouped_mode(ds, key: str, val: str, num_partitions: int = 16):
    """Per-key MODE (most frequent value; ties break by value
    ascending) — the categorical summarizer (top event type per user,
    dominant language per host). Per-block (key, value) count partials
    bound the exchange to distinct pairs per block; one hash exchange
    on the key merges counts and resolves the argmax per key with a
    single vectorized kernel per partition. Returns (key, mode_val,
    mode_count)."""

    def partial(tbl: pa.Table) -> pa.Table:
        t = tbl.select([key, val])
        agg = t.group_by([key, val]).aggregate([([], "count_all")])
        k = agg.column(key).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key: agg.column(key),
                val: agg.column(val),
                "cnt": agg.column("count_all"),
                "part": pa.array(part_of(k, num_partitions), pa.int32()),
            }
        )

    def resolve(tbl: pa.Table) -> pa.Table:
        t = (
            tbl.select([key, val, "cnt"])
            .group_by([key, val])
            .aggregate([("cnt", "sum")])
        )
        k = t.column(key).to_numpy(zero_copy_only=False)
        c = t.column("cnt_sum").to_numpy(zero_copy_only=False)
        v = t.column(val)
        # argmax per key: count desc, then value asc — lexsort + first
        if pa.types.is_string(v.type):
            v_np = np.asarray(v.to_pylist(), dtype=object)
            v_rank = np.unique(v_np, return_inverse=True)[1]
        else:
            v_np = v.to_numpy(zero_copy_only=False)
            v_rank = v_np
        order = np.lexsort((v_rank, -c, k))
        k_s = k[order]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        rows = order[first]
        return pa.table(
            {
                key: t.column(key).take(pa.array(rows, pa.int64())),
                "mode_val": t.column(val).take(pa.array(rows, pa.int64())),
                "mode_count": pa.array(c[rows], pa.int64()),
            }
        )

    return (
        ds.select_columns([key, val])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(resolve, batch_format="pyarrow")
    )


def winsorized_stats(ds, col: str, lo_q: float = 0.01, hi_q: float = 0.99,
                     scale: int = 100):
    """Winsorized summary of a numeric column — the outlier-robust
    cleaning pass (clip at exact order-statistic quantiles, then mean):
    values are fixed-point scaled to int64, EXACT lo/hi quantiles come
    from the mergeable counting-histogram (one tiny exchange — never a
    global sort), and a second streaming pass clips + aggregates.
    Quantile rank convention: ceil(q·n), 1-based (same as
    exact_quantiles_int). Returns a one-row table
    (lo_cut, hi_cut, n, mean_winsorized) rounded to 6."""
    from signal_collect_ray.functions.aggregations import exact_quantiles_int

    def fixed(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {"vi": pa.array(np.round(v * scale).astype(np.int64), pa.int64())}
        )

    fx = ds.select_columns([col]).map_batches(
        fixed, batch_format="pyarrow"
    ).materialize()
    qs = exact_quantiles_int(fx, "vi", [lo_q, hi_q])
    lo_cut, hi_cut = qs[0][1], qs[1][1]
    if lo_cut is None:
        return pa.table(
            {
                "lo_cut": pa.array([None], pa.float64()),
                "hi_cut": pa.array([None], pa.float64()),
                "n": pa.array([0], pa.int64()),
                "mean_winsorized": pa.array([None], pa.float64()),
            }
        )

    def partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column("vi").to_numpy(zero_copy_only=False)
        clipped = np.clip(v, lo_cut, hi_cut) / scale
        return pa.table(
            {
                "s": pa.array([float(clipped.sum())], pa.float64()),
                "n": pa.array([len(clipped)], pa.int64()),
            }
        )

    parts = fx.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    s = sum(r["s"] for r in parts)
    return pa.table(
        {
            "lo_cut": pa.array([lo_cut / scale], pa.float64()),
            "hi_cut": pa.array([hi_cut / scale], pa.float64()),
            "n": pa.array([n], pa.int64()),
            "mean_winsorized": pa.array(
                [round(s / n, 6) if n else None], pa.float64()
            ),
        }
    )


def pearson_corr(ds, x_col: str, y_col: str, digits: int = 6):
    """Pearson correlation of two numeric columns in ONE streaming
    pass: each block reduces to the five sufficient moments
    (n, Σx, Σy, Σxy, Σx², Σy²), the driver folds a handful of floats —
    no shuffle at any scale. Returns a one-row table
    (n, corr) with corr rounded to ``digits`` (None when degenerate)."""

    def partial(tbl: pa.Table) -> pa.Table:
        x = tbl.column(x_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        y = tbl.column(y_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([float(x.sum())], pa.float64()),
                "sy": pa.array([float(y.sum())], pa.float64()),
                "sxy": pa.array([float((x * y).sum())], pa.float64()),
                "sxx": pa.array([float((x * x).sum())], pa.float64()),
                "syy": pa.array([float((y * y).sum())], pa.float64()),
            }
        )

    parts = ds.select_columns([x_col, y_col]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    n = sum(r["n"] for r in parts)
    sx = sum(r["sx"] for r in parts)
    sy = sum(r["sy"] for r in parts)
    sxy = sum(r["sxy"] for r in parts)
    sxx = sum(r["sxx"] for r in parts)
    syy = sum(r["syy"] for r in parts)
    num = n * sxy - sx * sy
    den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
    corr = round(num / np.sqrt(den2), digits) if n > 1 and den2 > 0 else None
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "corr": pa.array([corr], pa.float64()),
        }
    )


def weekly_type_trend(events_ds):
    """Week-over-week trend per event type: counts per (week,
    event_type) plus the LAG delta to the type's previous ACTIVE week —
    the window-function-on-aggregate shape (dashboard trend lines).
    Per-block (week, type) count partials bound the exchange; the
    post-aggregate LAG runs per type on a tiny table (weeks × types
    rows). First week per type gets a NULL delta (SQL LAG)."""
    from ray.data.aggregate import Sum

    def partial(tbl: pa.Table) -> pa.Table:
        wk = week_floor_us(_ts_us(tbl))
        t = pa.table(
            {"week_us": pa.array(wk, pa.int64()),
             "event_type": tbl.column("event_type")}
        )
        agg = t.group_by(["week_us", "event_type"]).aggregate(
            [([], "count_all")]
        )
        return pa.table(
            {
                "week_us": agg.column("week_us"),
                "event_type": agg.column("event_type"),
                "cnt": agg.column("count_all"),
            }
        )

    counts = (
        events_ds.select_columns(["ts", "event_type"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["week_us", "event_type"])
        .aggregate(Sum("cnt", alias_name="n"))
    )

    def lag(tbl: pa.Table) -> pa.Table:
        wk = tbl.column("week_us").to_numpy(zero_copy_only=False)
        n = tbl.column("n").to_numpy(zero_copy_only=False)
        order = np.argsort(wk, kind="stable")
        wk_s, n_s = wk[order], n[order]
        delta = np.zeros(len(n_s), np.int64)
        delta[1:] = n_s[1:] - n_s[:-1]
        first = np.zeros(len(n_s), dtype=bool)
        if len(first):
            first[0] = True
        return pa.table(
            {
                "week_us": pa.array(wk_s, pa.int64()),
                "event_type": tbl.column("event_type").take(
                    pa.array(order, pa.int64())
                ),
                "n": pa.array(n_s, pa.int64()),
                "delta": pa.array(delta, pa.int64(), mask=first),
            }
        )

    return counts.groupby("event_type").map_groups(
        lag, batch_format="pyarrow"
    )


def rank_in_group(
    events_ds,
    key: str = "user_id",
    num_partitions: int = 16,
):
    """Full per-key ROW_NUMBER() (ordered by ts, event_id) — the
    sequence-number window every sessionization/funnel feature set
    needs. Unlike the rn=1 argmin (``first_event_per_key``) every row
    gets its rank, so all of a key's rows must co-reside: ONE hash
    exchange on the key, then a single lexsort + segmented-iota kernel
    per partition (all keys of the partition in one vectorized pass —
    never a per-key ``map_groups``). Skew bound: the hottest single
    key's rows, the same bound any per-key window has.

    Returns (key, ts_us, event_id, seq) with seq starting at 1."""

    def keyed(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                key: tbl.column(key),
                "ts_us": tbl.column("ts").cast(pa.int64()),
                "event_id": tbl.column("event_id"),
                "part": pa.array(part_of(k, num_partitions), pa.int32()),
            }
        )

    def number(tbl: pa.Table) -> pa.Table:
        k = tbl.column(key).to_numpy(zero_copy_only=False)
        ts = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        e = tbl.column("event_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, ts, k))
        k_s = k[order]
        first = np.ones(len(k_s), dtype=bool)
        first[1:] = k_s[1:] != k_s[:-1]
        starts = np.flatnonzero(first)
        # segmented iota: global index minus the segment start's index
        seq = np.arange(len(k_s), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(k_s)))
        ) + 1
        return pa.table(
            {
                key: pa.array(k_s, pa.int64()),
                "ts_us": pa.array(ts[order], pa.int64()),
                "event_id": pa.array(e[order], pa.int64()),
                "seq": pa.array(seq, pa.int64()),
            }
        )

    return (
        events_ds.select_columns([key, "ts", "event_id"])
        .map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(number, batch_format="pyarrow")
    )


def melt(ds, id_cols, value_cols, var_name: str = "metric",
         value_name: str = "value"):
    """UNPIVOT / melt: widen-to-long reshape — each input row emits one
    (id_cols…, var_name, value_name) row per value column. Pure
    per-batch kernel (k column gathers + one concat), no exchange, no
    Python row loop; the inverse of ``pivot_counts``. Value columns
    must share one Arrow type."""

    def kernel(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        k = len(value_cols)

        def chunks_of(col):
            ca = tbl.column(col)
            return list(ca.chunks) or [pa.array([], type=ca.type)]

        cols = {}
        for c in id_cols:
            cols[c] = pa.chunked_array(chunks_of(c) * k)
        cols[var_name] = pa.array(
            np.repeat(np.array(value_cols, dtype=object), n).tolist(),
            pa.string(),
        )
        vtype = tbl.column(value_cols[0]).type
        cols[value_name] = pa.chunked_array(
            [ch.cast(vtype) for c in value_cols for ch in chunks_of(c)],
            type=vtype,
        )
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")
