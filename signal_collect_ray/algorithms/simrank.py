"""SimRank — "two pages are similar when their in-linkers are similar"
(Jeh & Widom 2002, public literature). The classic link-graph
structural-similarity measure alongside co-citation / Adamic-Adar
(``cocitation.py``); the reference has no such operator — it belongs to
the link-analytics surface the north rule targets.

Truncated to TWO iterations from the identity (s₀ = I), the standard
web-scale regime (scores decay as Cᵏ; k=2 already separates related
pages). With decay C and in-neighbor sets I(·):

    s₁(u, v) = C·|I(u)∩I(v)| / (|I(u)|·|I(v)|)   (u ≠ v;  s₁(u,u) = 1)
    s₂(a, b) = C / (|I(a)|·|I(b)|) · Σ_{u∈I(a), v∈I(b)} s₁(u, v)

Exactness protocol (bit-identical to the SQL mirror, no float-sum-order
hazard): s₁ is QUANTIZED to integer micro-units n₁ = half-away-round of
1e6·s₁ — one float expression over integers, deterministic on both
sides; the s₂ inner double-sum is then an INTEGER sum
(order-independent under any distribution), and the final score is one
more float expression + round(6) before the top-k cut.

Distribution shape (no driver materialization of anything O(E)):
  1. in-degrees + co-citation counts: the existing one-exchange kernels
     (``cocitation._in_degrees`` / ``_pairs_from_partition``).
  2. n₁ build: two ``capped_broadcast_join`` lookups of the in-degree
     table (broadcast under the byte cap, co-partitioned hash join
     above it).
  3. the s₂ double expansion Σ_{u,v} n₁(u,v)·[a∈O(u)]·[b∈O(v)] factors
     as m(v, a) = Σ_u n₁(u,v)·[a∈O(u)], then num(a,b) = Σ_v m(v,a)·
     [b∈O(v)] — TWO co-partitioned expansion joins against the edge
     table (tagged-union groupby, one vectorized kernel per hash
     partition, in-group integer pre-combine before each exchange).
Skew/scale knob: ``min_n1`` prunes micro-scores below a threshold
between the two expansions (SimRank mass is heavy-tailed; production
runs threshold s₁ — with the default 0 the computation is exact, which
is what the SQL-oracle gate runs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithms.cocitation import (
    _in_degrees,
    _pairs_from_partition,
)
from signal_collect_ray.algorithms.triangles import _np
from signal_collect_ray.util import pair_hash, part_of

C_NUM, C_DEN = 3, 4  # decay C = 0.75 (dyadic)
MICRO = 1_000_000


def _round_half_away_int(x: np.ndarray) -> np.ndarray:
    """DuckDB ROUND(x, 0) semantics: half away from zero (inputs here
    are non-negative)."""
    return np.floor(x + 0.5).astype(np.int64)


def _round_half_away6(x: np.ndarray) -> np.ndarray:
    """DuckDB ROUND(x, 6) semantics on non-negative scores."""
    return np.floor(x * 1e6 + 0.5) / 1e6


def _tag(key, a, b, side: int, num_partitions: int) -> pa.Table:
    """One tagged-union row block: side 0 = edge (key=src, f1=dst),
    side 1 = carry (key, f1=carry id, f2=integer weight)."""
    key = np.asarray(key, np.int64)
    return pa.table(
        {
            "upart": pa.array(part_of(key, num_partitions), pa.int32()),
            "key": pa.array(key, pa.int64()),
            "f1": pa.array(np.asarray(a, np.int64), pa.int64()),
            "f2": pa.array(np.asarray(b, np.int64), pa.int64()),
            "side": pa.array(np.full(len(key), side, np.int8), pa.int8()),
        }
    )


def _expand_stage(union_ds, num_partitions: int, final: bool):
    """One co-partitioned expansion: groups hold edge rows
    (key=src, f1=dst) and carry rows (key, f1=carry, f2=weight); each
    carry row fans out over the key's out-neighborhood. Non-final
    stages emit rows re-keyed by the carry id (ready for the next
    expansion); the final stage emits (id_a < id_b) pair partials
    routed by the exact pair hash."""

    def kernel(tbl: pa.Table) -> pa.Table:
        side = tbl.column("side").to_numpy(zero_copy_only=False)
        key = _np(tbl, "key")
        f1 = _np(tbl, "f1")
        f2 = _np(tbl, "f2")
        em = side == 0
        ek, eo = key[em], f1[em]
        pk, pc, pw = key[~em], f1[~em], f2[~em]
        empty = pa.table(
            {
                "upart": pa.array([], pa.int32()),
                "key": pa.array([], pa.int64()),
                "f1": pa.array([], pa.int64()),
                "f2": pa.array([], pa.int64()),
                "side": pa.array([], pa.int8()),
            }
        )
        if not len(ek) or not len(pk):
            return empty
        edges = np.unique(np.stack([ek, eo], axis=1), axis=0)
        ek, eo = edges[:, 0], edges[:, 1]
        lo = np.searchsorted(ek, pk, side="left")
        hi = np.searchsorted(ek, pk, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        if total == 0:
            return empty
        ridx = np.repeat(np.arange(len(pk)), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)])[:-1]
        pos = np.arange(total) - offs[ridx] + lo[ridx]
        out = eo[pos]  # a neighbor of key, per expanded row
        carry = pc[ridx]
        w = pw[ridx]
        if final:
            keep = carry < out  # ordered num(a,b): keep a<b once
            a, b, w = carry[keep], out[keep], w[keep]
            u, inv = np.unique(np.stack([a, b], axis=1), axis=0, return_inverse=True)
            s = np.zeros(len(u), np.int64)
            np.add.at(s, inv, w)
            gp = part_of(pair_hash(u[:, 0], u[:, 1]).view(np.int64), num_partitions)
            return pa.table(
                {
                    "upart": pa.array(gp, pa.int32()),
                    "key": pa.array(u[:, 0], pa.int64()),
                    "f1": pa.array(u[:, 1], pa.int64()),
                    "f2": pa.array(s, pa.int64()),
                    "side": pa.array(np.ones(len(u), np.int8), pa.int8()),
                }
            )
        # combine partials by (next_key=carry, neighbor) — integer sums
        u, inv = np.unique(np.stack([carry, out], axis=1), axis=0, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, w)
        return _tag(u[:, 0], u[:, 1], s, 1, num_partitions)

    return union_ds.groupby("upart").map_groups(kernel, batch_format="pyarrow")


def simrank_top_pairs(
    edges_ds,
    k: int = 20,
    num_partitions: int = 32,
    min_n1: int = 0,
    lookup_cap_bytes=None,
):
    """Top-k vertex pairs by 2-iteration SimRank. Returns a pyarrow
    Table (id_a, id_b, simrank), score-desc then (id_a, id_b) asc;
    scores rounded to 6 digits BEFORE ranking so the SQL mirror decides
    every boundary identically."""
    import ray.data as rd

    from signal_collect_ray.functions.joins import (
        _BROADCAST_JOIN_LIMIT,
        capped_broadcast_join,
    )

    cap = _BROADCAST_JOIN_LIMIT if lookup_cap_bytes is None else lookup_cap_bytes
    # materialize the two SHARED inputs once — the edge table feeds five
    # downstream consumers and the in-degree table four joins; without
    # this every consumer re-executes the full upstream lineage. Blocks
    # land in the object store (spillable), never on the driver.
    edges = edges_ds.select_columns(["src", "dst"]).materialize()

    ind = _in_degrees(edges, num_partitions).materialize()  # (vid, deg)

    # co-citation counts |I(a) ∩ I(b)| (a < b), exact
    def add_spart(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "spart", pa.array(part_of(_np(tbl, "src"), num_partitions), pa.int32())
        )

    def count(tbl: pa.Table) -> pa.Table:
        a, b = _np(tbl, "id_a"), _np(tbl, "id_b")
        u, inv = np.unique(np.stack([a, b], axis=1), axis=0, return_inverse=True)
        c = np.zeros(len(u), np.int64)
        np.add.at(c, inv, 1)
        return pa.table(
            {
                "ua": pa.array(u[:, 0], pa.int64()),
                "ub": pa.array(u[:, 1], pa.int64()),
                "cnt": pa.array(c, pa.int64()),
            }
        )

    cc = (
        edges.map_batches(add_spart, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(_pairs_from_partition(None, num_partitions), batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(count, batch_format="pyarrow")
    )

    # n1 micro-units: one float expression over integers per pair
    def ren(cols):
        def f(tbl: pa.Table) -> pa.Table:
            return tbl.rename_columns(cols)

        return f

    cc_da = capped_broadcast_join(
        cc, ind.map_batches(ren(["ua", "da"]), batch_format="pyarrow"),
        on="ua", max_broadcast_bytes=cap, num_partitions=num_partitions,
    )
    cc_db = capped_broadcast_join(
        cc_da, ind.map_batches(ren(["ub", "db"]), batch_format="pyarrow"),
        on="ub", max_broadcast_bytes=cap, num_partitions=num_partitions,
    )

    cmul = MICRO * C_NUM / C_DEN  # 750000.0, exact

    def n1_rows(tbl: pa.Table) -> pa.Table:
        ua, ub = _np(tbl, "ua"), _np(tbl, "ub")
        cnt = _np(tbl, "cnt")
        da, db = _np(tbl, "da"), _np(tbl, "db")
        n = _round_half_away_int(cmul * cnt / (da * db))
        if min_n1:
            keep = n >= min_n1
            ua, ub, n = ua[keep], ub[keep], n[keep]
        # mirror both orientations (s1 symmetric; the double sum is ordered)
        key = np.concatenate([ua, ub])
        carry = np.concatenate([ub, ua])
        w = np.concatenate([n, n])
        return _tag(key, carry, w, 1, num_partitions)

    n1o = cc_db.map_batches(n1_rows, batch_format="pyarrow")

    # diagonal s1(u,u)=1 for every source vertex, from the edges
    def diag(tbl: pa.Table) -> pa.Table:
        s = np.unique(_np(tbl, "src"))
        return _tag(s, s, np.full(len(s), MICRO, np.int64), 1, num_partitions)

    diag_rows = edges.map_batches(diag, batch_format="pyarrow")

    def edge_rows(tbl: pa.Table) -> pa.Table:
        return _tag(_np(tbl, "src"), _np(tbl, "dst"),
                    np.zeros(tbl.num_rows, np.int64), 0, num_partitions)

    erows = edges.map_batches(edge_rows, batch_format="pyarrow").materialize()

    stage_a = _expand_stage(erows.union(n1o).union(diag_rows), num_partitions, final=False)
    pairs = _expand_stage(erows.union(stage_a), num_partitions, final=True)

    # exact integer pair sums, then score + per-partition top-k prune
    def pair_sum(tbl: pa.Table) -> pa.Table:
        a, b = _np(tbl, "key"), _np(tbl, "f1")
        w = _np(tbl, "f2")
        u, inv = np.unique(np.stack([a, b], axis=1), axis=0, return_inverse=True)
        s = np.zeros(len(u), np.int64)
        np.add.at(s, inv, w)
        return pa.table(
            {
                "id_a": pa.array(u[:, 0], pa.int64()),
                "id_b": pa.array(u[:, 1], pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    summed = pairs.groupby("upart").map_groups(pair_sum, batch_format="pyarrow")
    sa = capped_broadcast_join(
        summed, ind.map_batches(ren(["id_a", "da"]), batch_format="pyarrow"),
        on="id_a", max_broadcast_bytes=cap, num_partitions=num_partitions,
    )
    sb = capped_broadcast_join(
        sa, ind.map_batches(ren(["id_b", "db"]), batch_format="pyarrow"),
        on="id_b", max_broadcast_bytes=cap, num_partitions=num_partitions,
    )

    def score_prune(tbl: pa.Table) -> pa.Table:
        # pairs are already unique after pair_sum's exchange, so a
        # per-BATCH top-k prune needs no further shuffle
        a, b = _np(tbl, "id_a"), _np(tbl, "id_b")
        s = _np(tbl, "s")
        da, db = _np(tbl, "da"), _np(tbl, "db")
        # one float expression over integers — mirrors the SQL term for term
        val = _round_half_away6((C_NUM / C_DEN) * s / (float(MICRO) * da * db))
        if len(a) > k:
            order = np.lexsort((b, a, -val))[:k]
            a, b, val = a[order], b[order], val[order]
        return pa.table(
            {
                "id_a": pa.array(a, pa.int64()),
                "id_b": pa.array(b, pa.int64()),
                "simrank": pa.array(val, pa.float64()),
            }
        )

    top = sb.map_batches(score_prune, batch_format="pyarrow").take_all()
    top.sort(key=lambda r: (-r["simrank"], r["id_a"], r["id_b"]))
    top = top[:k]
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in top], pa.int64()),
            "id_b": pa.array([r["id_b"] for r in top], pa.int64()),
            "simrank": pa.array([r["simrank"] for r in top], pa.float64()),
        }
    )
