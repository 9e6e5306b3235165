"""Triangle counting & clustering coefficient — join-based.

The reference computes the clustering coefficient by signaling whole
neighbor sets along every edge and intersecting in collect
(``/root/reference/src/main/scala/com/signalcollect/examples/
ClusteringCoefficient.scala:24-47``) — O(Σ deg²) traffic, not
combiner-friendly. Per SURVEY §7.4.3 we replace it with the standard
distributed canonical-edge join:

1. symmetrize + dedup to unique undirected edges (one groupby shuffle),
2. compute undirected degrees (pre-combined per batch, tiny groupby),
3. orient every edge from the lower-(degree, id) endpoint to the higher
   — the classic O(E^1.5) bound on shipped adjacency,
4. co-partition by hash(src): build each source's oriented adjacency
   list locally and attach it to its out-edges (zero-copy Arrow list
   columns),
5. co-partition by hash(dst): intersect N⁺(src) with N⁺(dst) per edge;
   every common w closes a triangle (src, dst, w), counted once,
6. per-vertex counts via a final pre-combined groupby(vid).sum.

Per-vertex counts equal the reference's Σ|N(v)∩N(u)|/2; the clustering
coefficient is 2·tri(v)/(deg·(deg−1)) (ClusteringCoefficient.scala:31-38).

All joins are explicit tagged-union co-partition joins (no broadcast of
the vertex set), so the pipeline holds at web scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import part_of, segment_starts, segment_sum


def _np(tbl: pa.Table, col: str) -> np.ndarray:
    return tbl.column(col).combine_chunks().to_numpy(zero_copy_only=False)


def _unique_undirected(edges_ds):
    """(src,dst[,weight]) → unique (a,b) with a<b, self-loops dropped."""

    def canon(tbl: pa.Table) -> pa.Table:
        s, d = _np(tbl, "src"), _np(tbl, "dst")
        keep = s != d
        s, d = s[keep], d[keep]
        a, b = np.minimum(s, d), np.maximum(s, d)
        # in-batch pre-dedup before the shuffle
        key = np.stack([a, b], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {"a": pa.array(uniq[:, 0], pa.int64()), "b": pa.array(uniq[:, 1], pa.int64())}
        )

    canoned = edges_ds.map_batches(canon, batch_format="pyarrow")

    def dedup_group(tbl: pa.Table) -> pa.Table:
        a, b = _np(tbl, "a"), _np(tbl, "b")
        key = np.stack([a, b], axis=1)
        uniq = np.unique(key, axis=0)
        return pa.table(
            {"a": pa.array(uniq[:, 0], pa.int64()), "b": pa.array(uniq[:, 1], pa.int64())}
        )

    # co-partition by hash(a) and dedup within partition — exact, since
    # equal (a,b) pairs share the partition key a.
    def add_part(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "gpart", pa.array(part_of(_np(tbl, "a"), 64), pa.int32())
        )

    return (
        canoned.map_batches(add_part, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(dedup_group, batch_format="pyarrow")
    )


def _sum_by_key(ds, key_col, val_col, num_partitions=64):
    """hash-partitioned exact sum-by-key: per-batch partial segment_sum,
    one groupby on the (low-cardinality int32) partition id, vectorized
    final sum per group. Much cheaper than the native high-cardinality
    ``groupby(key).aggregate(Sum)`` (which sorts every row by key)."""

    def partial(tbl: pa.Table) -> pa.Table:
        k, c = segment_sum(_np(tbl, key_col), _np(tbl, val_col))
        return pa.table(
            {
                "gpart": pa.array(part_of(k, num_partitions), pa.int32()),
                key_col: pa.array(k, pa.int64()),
                val_col: pa.array(c, pa.int64()),
            }
        )

    def final(tbl: pa.Table) -> pa.Table:
        k, c = segment_sum(_np(tbl, key_col), _np(tbl, val_col))
        return pa.table(
            {key_col: pa.array(k, pa.int64()), val_col: pa.array(c, pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(final, batch_format="pyarrow")
    )


def _degrees(unique_edges_ds, num_partitions=64):
    """Undirected degree per vertex: (vid:int64, deg:int64)."""

    def contribs(tbl: pa.Table) -> pa.Table:
        a, b = _np(tbl, "a"), _np(tbl, "b")
        vid, cnt = segment_sum(
            np.concatenate([a, b]), np.ones(2 * len(a), dtype=np.int64)
        )
        return pa.table(
            {"vid": pa.array(vid, pa.int64()), "deg": pa.array(cnt, pa.int64())}
        )

    return _sum_by_key(
        unique_edges_ds.map_batches(contribs, batch_format="pyarrow"),
        "vid",
        "deg",
        num_partitions,
    )


def _attach(left_ds, left_key, right_ds, right_key, attach_cols, num_partitions=64):
    """Co-partitioned hash join: gather ``attach_cols`` from right onto left.

    Tagged-union pattern (ray_guide 'Joins and lookups'): both sides get
    ``jpart = hash(key) % P``; one groupby(jpart) co-locates them; inside
    the group a vectorized searchsorted gather attaches the columns.
    Right keys must be unique. Left rows with no match are dropped.
    """

    left_schema = left_ds.schema()
    right_schema = right_ds.schema()
    left_cols = list(left_schema.names)
    attach_types = {
        n: right_schema.types[right_schema.names.index(n)] for n in attach_cols
    }
    left_types = {n: left_schema.types[left_schema.names.index(n)] for n in left_cols}

    def tag(kind, key_col):
        def fn(tbl: pa.Table) -> pa.Table:
            k = _np(tbl, key_col)
            n = len(tbl)
            cols = {}
            for c in left_cols:
                cols[c] = (
                    tbl.column(c) if c in tbl.column_names and kind == 1
                    else pa.nulls(n, left_types[c])
                )
            for c in attach_cols:
                cols[c] = (
                    tbl.column(c) if kind == 0 else pa.nulls(n, attach_types[c])
                )
            cols["jkey"] = pa.array(k, pa.int64())
            cols["jpart"] = pa.array(part_of(k, num_partitions), pa.int32())
            cols["jkind"] = pa.array(np.full(n, kind, dtype=np.int8), pa.int8())
            return pa.table(cols)

        return fn

    left_t = left_ds.map_batches(tag(1, left_key), batch_format="pyarrow")
    right_t = right_ds.map_batches(tag(0, right_key), batch_format="pyarrow")

    def join_group(tbl: pa.Table) -> pa.Table:
        kind = _np(tbl, "jkind")
        lmask = kind == 1
        left = tbl.filter(pa.array(lmask))
        right = tbl.filter(pa.array(~lmask))
        rk = _np(right, "jkey")
        order = np.argsort(rk, kind="stable")
        rk = rk[order]
        lk = _np(left, "jkey")
        pos = np.searchsorted(rk, lk)
        pos_c = np.minimum(pos, max(len(rk) - 1, 0))
        ok = (len(rk) > 0) & (pos < len(rk))
        ok = ok & (rk[pos_c] == lk) if len(rk) else np.zeros(len(lk), dtype=bool)
        take_left = pa.array(np.flatnonzero(ok), pa.int64())
        out = left.select(left_cols).take(take_left)
        ridx = pa.array(order[pos_c[ok]], pa.int64())
        for col in attach_cols:
            out = out.append_column(col, right.column(col).combine_chunks().take(ridx))
        return out

    return (
        left_t.union(right_t)
        .groupby("jpart")
        .map_groups(join_group, batch_format="pyarrow")
    )


class _OrientAndShip:
    """groupby(spart) stage: build each src's oriented adjacency locally,
    emit (dpart, dst, src, nbrs_src) edge rows + (dpart, dst=-1, src,
    nbrs) adjacency-owner rows for the intersect stage."""

    __name__ = "_OrientAndShip"

    def __init__(self, num_partitions: int):
        self.P = num_partitions

    def __call__(self, tbl: pa.Table) -> pa.Table:
        s, d = _np(tbl, "src"), _np(tbl, "dst")
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        starts = segment_starts(s)
        offsets = np.append(starts, len(s)).astype(np.int32)
        src_ids = s[starts]
        adj = pa.ListArray.from_arrays(pa.array(offsets), pa.array(d, pa.int64()))
        # one row per edge: ship N+(src) to dst's partition
        edge_rows = pa.table(
            {
                "ipart": pa.array(part_of(d, self.P), pa.int32()),
                "key": pa.array(d, pa.int64()),
                "other": pa.array(s, pa.int64()),
                "nbrs": adj.take(
                    pa.array(
                        np.repeat(
                            np.arange(len(src_ids)), np.diff(offsets.astype(np.int64))
                        ),
                        pa.int64(),
                    )
                ),
            }
        )
        owner_rows = pa.table(
            {
                "ipart": pa.array(part_of(src_ids, self.P), pa.int32()),
                "key": pa.array(src_ids, pa.int64()),
                "other": pa.array(
                    np.full(len(src_ids), -1, dtype=np.int64), pa.int64()
                ),
                "nbrs": adj,
            }
        )
        return pa.concat_tables([edge_rows, owner_rows])


class _Intersect:
    """groupby(ipart) stage: close wedges against the partition's local
    edge set — fully vectorized.

    The shipped edge rows ARE the wedge set: row (u→v, N+(u)) flattens
    to wedges (u, v, w) for w ∈ N+(u); wedge (u,v,w) closes a triangle
    iff (v,w) is an oriented edge, and all (v,*) edges live in THIS
    partition (routed by hash(v)). Membership = 64-bit pair-hash
    pre-filter (vectorized searchsorted) + EXACT per-candidate verify
    (binary search in N+(v)) — hash collisions only cost verify time,
    never correctness."""

    __name__ = "_Intersect"

    def __call__(self, tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"vid": pa.array([], pa.int64()), "triangles": pa.array([], pa.int64())}
        )
        wedges = _closed_wedges(tbl)
        if wedges is None:
            return empty
        wu, wv, ww = wedges
        contrib_vid = np.concatenate([wu, wv, ww])
        contrib_cnt = np.ones(3 * len(wu), dtype=np.int64)
        vid, cnt = segment_sum(contrib_vid, contrib_cnt)
        return pa.table(
            {"vid": pa.array(vid, pa.int64()), "triangles": pa.array(cnt, pa.int64())}
        )


def _closed_wedges(tbl: pa.Table):
    """Shared wedge-closing core of the intersect stage: returns the
    verified triangle corner arrays (u, v, w) for one ipart group, or
    None when the group closes nothing. (u,v), (u,w), (v,w) are all
    oriented edges of the triangle — consumers aggregate per vertex
    (_Intersect) or per edge (ktruss edge support)."""
    from signal_collect_ray.util import pair_hash

    kind_other = _np(tbl, "other")
    owners = tbl.filter(pa.array(kind_other < 0))
    edges = tbl.filter(pa.array(kind_other >= 0))
    if len(owners) == 0 or len(edges) == 0:
        return None
    ok = _np(owners, "key")
    oorder = np.argsort(ok, kind="stable")
    ok = ok[oorder]
    onbrs = owners.column("nbrs").combine_chunks().take(
        pa.array(oorder, pa.int64())
    )
    off = onbrs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = onbrs.values.to_numpy(zero_copy_only=False)

    # local oriented-edge key set (v, w) for membership tests
    ocounts = np.diff(off)
    v_rep = np.repeat(ok, ocounts)
    ekeys = np.sort(pair_hash(v_rep, vals))

    e_dst = _np(edges, "key")
    e_src = _np(edges, "other")
    e_nbrs = edges.column("nbrs").combine_chunks()
    eoff = e_nbrs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    evals = e_nbrs.values.to_numpy(zero_copy_only=False)

    ecounts = np.diff(eoff)
    wedge_u = np.repeat(e_src, ecounts)
    wedge_v = np.repeat(e_dst, ecounts)
    wedge_w = evals

    wkeys = pair_hash(wedge_v, wedge_w)
    pos = np.searchsorted(ekeys, wkeys)
    pos_c = np.minimum(pos, len(ekeys) - 1)
    cand = ekeys[pos_c] == wkeys

    # exact verification of the hash matches — vectorized ragged
    # binary search: each candidate searches its owner's sorted
    # adjacency segment, all candidates advanced together per
    # bisection round (≤ log2(max_deg) vectorized passes).
    ci = np.flatnonzero(cand)
    if len(ci) == 0:
        return None
    vl = np.searchsorted(ok, wedge_v[ci])
    w_q = wedge_w[ci]
    lo = off[vl].copy()
    hi = off[vl + 1].copy()
    while True:
        open_m = lo < hi
        if not open_m.any():
            break
        mid = (lo + hi) >> 1
        mv = vals[np.minimum(mid, len(vals) - 1)]
        go_right = open_m & (mv < w_q)
        go_left = open_m & ~go_right
        lo[go_right] = mid[go_right] + 1
        hi[go_left] = mid[go_left]
    in_range = lo < off[vl + 1]
    verified = in_range & (vals[np.minimum(lo, len(vals) - 1)] == w_q)
    tri = ci[verified]
    if len(tri) == 0:
        return None
    return wedge_u[tri], wedge_v[tri], wedge_w[tri]


# Above this many vertices the degree table is joined (two co-partition
# shuffles) instead of broadcast. 20M vertices ≈ 320 MB of (vid, deg)
# int64 pairs in the object store — read zero-copy by every orient task,
# shipped once per node, not per batch.
BROADCAST_DEGREE_LIMIT = 20_000_000


def _oriented_edges(edges_ds, num_partitions=64):
    # uniq/degs feed multiple consumers — materialize once (small:
    # O(E) ids / O(V) degree rows) instead of re-executing the lineage
    # per consumer (Ray Datasets are lazy; branches recompute).
    uniq = _unique_undirected(edges_ds).select_columns(["a", "b"]).materialize()
    degs = _degrees(uniq, num_partitions).materialize()

    n_vertices = degs.count()
    if n_vertices == 0:
        # no surviving undirected edges (e.g. self-loops only)
        def to_oriented(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "spart": pa.array([], pa.int32()),
                    "src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64()),
                }
            )

        return uniq.map_batches(to_oriented, batch_format="pyarrow"), degs
    if n_vertices <= BROADCAST_DEGREE_LIMIT:
        # broadcast path: ray.put the sorted (vid, deg) arrays once;
        # every orient batch does two zero-copy searchsorted lookups.
        import ray

        dt = pa.concat_tables(
            [pa.table(b) if not isinstance(b, pa.Table) else b
             for b in degs.iter_batches(batch_format="pyarrow", batch_size=None)]
        ).sort_by("vid")
        deg_ref = ray.put(
            {
                "vid": dt.column("vid").combine_chunks().to_numpy(),
                "deg": dt.column("deg").combine_chunks().to_numpy(),
            }
        )

        class _OrientBroadcast:
            __name__ = "_OrientBroadcast"

            def __init__(self, deg_ref, P):
                self.deg_ref, self.P = deg_ref, P
                self._deg = None

            def _lookup(self, ids):
                if self._deg is None:
                    import ray as _r

                    self._deg = _r.get(self.deg_ref)
                pos = np.searchsorted(self._deg["vid"], ids)
                return self._deg["deg"][pos]

            def __call__(self, tbl: pa.Table) -> pa.Table:
                a, b = _np(tbl, "a"), _np(tbl, "b")
                da, db = self._lookup(a), self._lookup(b)
                a_first = (da < db) | ((da == db) & (a < b))
                src = np.where(a_first, a, b)
                dst = np.where(a_first, b, a)
                return pa.table(
                    {
                        "spart": pa.array(part_of(src, self.P), pa.int32()),
                        "src": pa.array(src, pa.int64()),
                        "dst": pa.array(dst, pa.int64()),
                    }
                )

        return (
            uniq.map_batches(
                _OrientBroadcast(deg_ref, num_partitions), batch_format="pyarrow"
            ),
            degs,
        )

    # join path (vertex set too large to broadcast): two co-partitioned
    # hash joins attach deg_a / deg_b.
    with_da = _attach(uniq, "a", degs.rename_columns(["vid", "deg_a"]), "vid", ["deg_a"])
    with_db = _attach(
        with_da, "b", degs.rename_columns(["vid", "deg_b"]), "vid", ["deg_b"]
    )

    def orient(tbl: pa.Table) -> pa.Table:
        a, b = _np(tbl, "a"), _np(tbl, "b")
        da, db = _np(tbl, "deg_a"), _np(tbl, "deg_b")
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        return pa.table(
            {
                "spart": pa.array(part_of(src, num_partitions), pa.int32()),
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
            }
        )

    return with_db.map_batches(orient, batch_format="pyarrow"), degs


def triangle_counts(edges_ds, num_partitions: int = 64):
    """Per-vertex triangle counts: Dataset (vid:int64, triangles:int64).

    Vertices on no triangle are absent (count 0).
    """
    return _sum_by_key(
        _triangle_partials(edges_ds, num_partitions),
        "vid",
        "triangles",
        num_partitions,
    )


def _triangle_partials(edges_ds, num_partitions: int = 64):
    oriented, _ = _oriented_edges(edges_ds, num_partitions)
    shipped = oriented.groupby("spart").map_groups(
        _OrientAndShip(num_partitions), batch_format="pyarrow"
    )
    return shipped.groupby("ipart").map_groups(_Intersect(), batch_format="pyarrow")


def total_triangles(edges_ds, num_partitions: int = 64) -> int:
    """Total distinct triangles in the (undirected-ized) graph.

    Sums the per-partition partials directly — no per-vertex shuffle."""
    from ray.data.aggregate import Sum

    partials = _triangle_partials(edges_ds, num_partitions)
    row = partials.aggregate(Sum("triangles", alias_name="t3"))
    total = row["t3"] if row and row["t3"] is not None else 0
    return int(total) // 3


def clustering_coefficient(edges_ds, num_partitions: int = 64):
    """Per-vertex local clustering coefficient (reference formula
    Σ|N(v)∩N(u)| / (deg·(deg−1)) = 2·tri / (deg·(deg−1))).

    Returns Dataset (vid:int64, coefficient:float64) over ALL vertices
    (0.0 when deg < 2 or no triangles).
    """
    uniq = _unique_undirected(edges_ds).select_columns(["a", "b"]).materialize()
    degs = _degrees(uniq).materialize()
    tris = triangle_counts(edges_ds, num_partitions)
    joined = _attach(
        degs, "vid", tris.rename_columns(["tvid", "triangles"]), "tvid", ["triangles"]
    )

    def finish(tbl: pa.Table) -> pa.Table:
        deg = _np(tbl, "deg").astype(np.float64)
        tri = _np(tbl, "triangles").astype(np.float64)
        denom = deg * (deg - 1.0)
        coeff = np.where(denom > 0, 2.0 * tri / np.maximum(denom, 1.0), 0.0)
        return pa.table(
            {
                "vid": tbl.column("vid"),
                "coefficient": pa.array(coeff, pa.float64()),
            }
        )

    with_tri = joined.map_batches(finish, batch_format="pyarrow")

    # vertices with no triangles were dropped by the inner join — union
    # them back with coefficient 0.
    tri_vids = with_tri.select_columns(["vid"])

    def zero_rows(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "vid": tbl.column("vid"),
                "coefficient": pa.array(np.zeros(len(tbl)), pa.float64()),
            }
        )

    all_zero = degs.map_batches(zero_rows, batch_format="pyarrow")

    def add_part(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "gpart", pa.array(part_of(_np(tbl, "vid"), num_partitions), pa.int32())
        )

    def max_by_vid(tbl: pa.Table) -> pa.Table:
        vid = _np(tbl, "vid")
        c = _np(tbl, "coefficient")
        order = np.argsort(vid, kind="stable")
        vid, c = vid[order], c[order]
        starts = segment_starts(vid)
        out = np.maximum.reduceat(c, starts) if len(vid) else c
        return pa.table(
            {
                "vid": pa.array(vid[starts], pa.int64()),
                "coefficient": pa.array(out, pa.float64()),
            }
        )

    return (
        with_tri.union(all_zero)
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("gpart")
        .map_groups(max_by_vid, batch_format="pyarrow")
    )


def triangle_list(edges_ds, num_partitions: int = 64):
    """Enumerate every distinct triangle as a canonical (a < b < c) row
    — the same two-exchange degree-oriented wedge closure as
    ``triangle_counts`` (each triangle closes exactly ONE wedge in the
    orientation DAG, so rows are exactly the triangles, no dedup
    needed); the per-group kernel just id-sorts the corner triple
    instead of aggregating per vertex. Output size is the triangle
    count itself — stream it to a sink, don't take_all at web scale."""

    def lister(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "a": pa.array([], pa.int64()),
                "b": pa.array([], pa.int64()),
                "c": pa.array([], pa.int64()),
            }
        )
        w = _closed_wedges(tbl)
        if w is None:
            return empty
        m = np.sort(np.stack(w, axis=1), axis=1)
        return pa.table(
            {
                "a": pa.array(m[:, 0], pa.int64()),
                "b": pa.array(m[:, 1], pa.int64()),
                "c": pa.array(m[:, 2], pa.int64()),
            }
        )

    oriented, _ = _oriented_edges(edges_ds, num_partitions)
    shipped = oriented.groupby("spart").map_groups(
        _OrientAndShip(num_partitions), batch_format="pyarrow"
    )
    return shipped.groupby("ipart").map_groups(lister, batch_format="pyarrow")


def diamond_count(edges_ds, num_partitions: int = 64) -> int:
    """Total diamonds (two triangles sharing an edge, K4 minus one
    edge, counted per shared edge): Σ_e C(t_e, 2) where t_e is the
    number of triangles containing undirected edge e.

    Built on the same degree-oriented wedge closure as
    ``triangle_list`` — each triangle row is exploded into its 3
    canonical (a < b) edges with a per-batch pre-combined count, one
    hash exchange on the edge key, and a per-group C(t,2) fold, so the
    shipped volume is O(#triangles) and the exchange is O(#triangle
    edges), never all-pairs. Pure integer arithmetic end to end."""
    tris = triangle_list(edges_ds, num_partitions)

    def explode(tbl: pa.Table) -> pa.Table:
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        b = tbl.column("b").to_numpy(zero_copy_only=False)
        c = tbl.column("c").to_numpy(zero_copy_only=False)
        # 3 canonical edges per triangle; pre-combine within the batch
        lo = np.concatenate([a, a, b])
        hi = np.concatenate([b, c, c])
        order = np.lexsort((hi, lo))
        lo, hi = lo[order], hi[order]
        # composite sort key only for segment detection within the batch
        changed = np.ones(len(lo), dtype=bool)
        if len(lo) > 1:
            changed[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        starts = np.flatnonzero(changed)
        counts = np.diff(np.append(starts, len(lo)))
        lo, hi = lo[starts], hi[starts]
        return pa.table(
            {
                "epart": pa.array(
                    part_of(lo * np.int64(1_000_003) + hi, num_partitions),
                    pa.int32(),
                ),
                "lo": pa.array(lo, pa.int64()),
                "hi": pa.array(hi, pa.int64()),
                "t": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    def fold(tbl: pa.Table) -> pa.Table:
        lo = tbl.column("lo").to_numpy(zero_copy_only=False)
        hi = tbl.column("hi").to_numpy(zero_copy_only=False)
        t = tbl.column("t").to_numpy(zero_copy_only=False)
        # sum partials per edge within the group, then C(t,2)
        order = np.lexsort((hi, lo))
        lo, hi, t = lo[order], hi[order], t[order]
        changed = np.ones(len(lo), dtype=bool)
        if len(lo) > 1:
            changed[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
        starts = np.flatnonzero(changed)
        te = np.add.reduceat(t, starts) if len(t) else t
        d = int((te * (te - 1) // 2).sum()) if len(te) else 0
        return pa.table({"d": pa.array([d], pa.int64())})

    from ray.data.aggregate import Sum

    partials = (
        tris.map_batches(explode, batch_format="pyarrow")
        .groupby("epart")
        .map_groups(fold, batch_format="pyarrow")
    )
    row = partials.aggregate(Sum("d", alias_name="diamonds"))
    return int(row["diamonds"]) if row and row["diamonds"] is not None else 0
