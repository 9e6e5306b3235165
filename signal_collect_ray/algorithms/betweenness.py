"""Betweenness centrality — sampled-source Brandes (Brandes 2001;
the pivot-sampling approximation of Brandes & Pich 2007, public
literature). The canonical "which pages sit on the most shortest
paths" ranking for link graphs.

Exact betweenness is an all-sources problem (O(V·E)); every practical
system samples k pivot sources and scales. The per-source dependency
accumulation is an independent O(E) job, so the Ray shape is
embarrassingly parallel: ONE remote task per pivot, each running a
vectorized level-synchronous Brandes pass over the dense CSR. The CSR
is assembled ONCE by a remote prep task from the graph's per-partition
object-store blocks and shared zero-copy by every pivot task on the
node (on a multi-node cluster Ray replicates it once per node — the
GraphX-style "graph fits a node, sources scale out" regime). When the
graph does NOT fit a node, ``mode="auto"`` degrades to the IMPLEMENTED
distributed join path (``_pivot_deps_join``): per pivot, the SPCount
forward (dist, σ) recurrence plus a level-descending reverse sweep,
each level one capped join + one groupby over the shortest-path-DAG
edges — dense/join bit-equality pinned in tests/test_betweenness.py.

Contributions from all pivots sum on the driver (k short float
vectors). Deterministic: pure integer BFS + float accumulation in a
fixed level order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import expand_ranges


def _dense_csr(csrs):
    """Combine per-partition CSR blocks into one dense-index CSR:
    (vids sorted, indptr, dst_idx) with dsts remapped to vid rank."""
    srcs, dsts, indptrs = [], [], []
    for csr in csrs:
        srcs.append(csr["src_ids"])
        dsts.append(csr["dst"])
        indptrs.append(np.diff(csr["indptr"]))
    src_ids = np.concatenate(srcs) if srcs else np.empty(0, np.int64)
    counts = np.concatenate(indptrs) if indptrs else np.empty(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, np.int64)
    vids = np.unique(np.concatenate([src_ids, dst]))
    # order sources by vid; expand their segments in that order
    order = np.argsort(src_ids, kind="stable")
    seg_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    eidx = expand_ranges(seg_starts[order], counts[order])
    dst_sorted = dst[eidx]
    # per-vertex out-degree in vid order (0 for sinks)
    deg = np.zeros(len(vids), dtype=np.int64)
    deg[np.searchsorted(vids, src_ids[order])] = counts[order]
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int64)
    dst_idx = np.searchsorted(vids, dst_sorted).astype(np.int64)
    return vids, indptr, dst_idx


def _brandes_from(s_idx: int, indptr, dst_idx, n: int) -> np.ndarray:
    """One pivot's dependency vector (Brandes' accumulation), vectorized
    per BFS level."""
    sigma = np.zeros(n)
    dist = np.full(n, -1, np.int64)
    sigma[s_idx] = 1.0
    dist[s_idx] = 0
    levels = [np.array([s_idx], np.int64)]
    frontier = levels[0]
    d = 0
    while len(frontier):
        counts = indptr[frontier + 1] - indptr[frontier]
        eidx = expand_ranges(indptr[frontier], counts)
        if not len(eidx):
            break
        tgt = dst_idx[eidx]
        src_rep = np.repeat(frontier, counts)
        # first discovery at level d+1
        new_mask = dist[tgt] == -1
        if new_mask.any():
            dist[tgt[new_mask]] = d + 1
        # shortest-path counts flow along edges to level d+1 vertices
        on_sp = dist[tgt] == d + 1
        np.add.at(sigma, tgt[on_sp], sigma[src_rep[on_sp]])
        frontier = np.unique(tgt[new_mask]) if new_mask.any() else np.empty(
            0, np.int64
        )
        if len(frontier):
            levels.append(frontier)
        d += 1
    # reverse accumulation: for edge v->w on a shortest path
    # (dist[w] == dist[v]+1), v accumulates sigma[v]/sigma[w]·(1+δ[w]);
    # levels processed deepest-first so every successor's δ is final
    delta = np.zeros(n)
    for lvl in reversed(levels):
        counts = indptr[lvl + 1] - indptr[lvl]
        eidx = expand_ranges(indptr[lvl], counts)
        if not len(eidx):
            continue
        tgt = dst_idx[eidx]
        src_rep = np.repeat(lvl, counts)
        on_sp = dist[tgt] == dist[src_rep] + 1
        contrib = np.zeros(len(eidx))
        contrib[on_sp] = (
            sigma[src_rep[on_sp]] / sigma[tgt[on_sp]]
        ) * (1.0 + delta[tgt[on_sp]])
        np.add.at(delta, src_rep, contrib)
    delta[s_idx] = 0.0
    return delta


#: Dense-CSR byte budget for one node: above it ``mode="auto"``
#: degrades to the distributed join path (k per-pivot forward σ
#: passes + level-descending reverse sweeps as co-partitioned
#: dataset joins — nothing O(V) or O(E) on any single node).
DENSE_NODE_BYTES = 4 << 30

#: Post-union coalesce width for the join path's growing state /
#: contribution tables. Scale note: at billion-vertex scale raise this
#: (blocks should stay ~128 MB); the cost is one small repartition per
#: BFS level.
_STATE_BLOCKS = 16


def _dense_bytes_estimate(graph) -> int:
    """Bytes the dense path would pin per node: the remapped CSR
    (indptr + dst_idx) plus the per-pivot working vectors."""
    n_e = int(graph.num_edges)
    n_v_upper = 2 * n_e  # vids ≤ 2·edges without a count pass
    return n_e * 8 + n_v_upper * 8 * 4


def _pivot_deps_join(edges, source: int, cap: int, want_edges: bool):
    """One pivot's Brandes dependencies as DISTRIBUTED dataset joins —
    the scale path when the graph doesn't fit a node. Forward pass:
    the SPCount level-synchronous (dist, σ) recurrence, one
    frontier→edges capped join + one groupby per BFS level (exact σ:
    every level-L vertex receives all its level-L−1 contributions in
    the same round). Reverse sweep: shortest-path-DAG edges
    (dist_w == dist_v + 1) materialize once, then levels walk
    deepest-first — per level one capped join of the previous level's
    δ plus one groupby(src). All joins route through
    ``capped_broadcast_join`` (broadcast under the byte cap,
    co-partitioned hash-join above it). Returns
    (vertex-delta Dataset (vid, delta) — source excluded, matching
    the dense path's ``delta[s]=0`` — and edge-contribution Dataset
    (src, dst, c) or None)."""
    import pyarrow as pa
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from signal_collect_ray.functions.joins import capped_broadcast_join

    state = rd.from_arrow(
        pa.table(
            {
                "vid": pa.array([source], pa.int64()),
                "dist": pa.array([0], pa.int64()),
                "sigma": pa.array([1], pa.int64()),
            }
        )
    ).materialize()
    frontier = state
    level = 0
    while True:
        f = frontier.map_batches(
            lambda t: pa.table(
                {"src": t.column("vid"), "fsig": t.column("sigma")}
            ),
            batch_format="pyarrow",
        )
        cand = (
            capped_broadcast_join(edges, f, on="src", max_broadcast_bytes=cap)
            .map_batches(
                lambda t: pa.table(
                    {"vid": t.column("dst"), "sig": t.column("fsig")}
                ),
                batch_format="pyarrow",
            )
            .groupby("vid")
            .aggregate(Sum("sig", alias_name="sigma"))
        )
        seen = state.map_batches(
            lambda t: pa.table(
                {
                    "vid": t.column("vid"),
                    "seen": pa.array(
                        np.ones(t.num_rows, dtype=np.int8), pa.int8()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        lvl_next = level + 1

        def unseen(t: pa.Table, d=lvl_next) -> pa.Table:
            keep = t.filter(pa.compute.is_null(t.column("seen")))
            n = keep.num_rows
            return pa.table(
                {
                    "vid": keep.column("vid"),
                    "dist": pa.array(np.full(n, d, dtype=np.int64)),
                    "sigma": keep.column("sigma").cast(pa.int64()),
                }
            )

        new = (
            capped_broadcast_join(
                cand, seen, on="vid", how="left", max_broadcast_bytes=cap
            )
            .map_batches(unseen, batch_format="pyarrow")
            .materialize()
        )
        if new.count() == 0:
            break
        # union concatenates block lists; without a coalesce the state
        # block count compounds ~3× per level (every downstream map
        # then pays one task per tiny block — measured exponential
        # slowdown). One small repartition per level keeps it flat.
        state = (
            state.union(new).repartition(_STATE_BLOCKS).materialize()
        )
        frontier = new
        level += 1

    maxd = int(state.aggregate(Max("dist", alias_name="m"))["m"])

    def keyed(key: str, pre: str):
        def fn(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    key: t.column("vid"),
                    f"d{pre}": t.column("dist"),
                    f"s{pre}": t.column("sigma"),
                }
            )

        return fn

    e1 = capped_broadcast_join(
        edges,
        state.map_batches(keyed("src", "v"), batch_format="pyarrow"),
        on="src",
        max_broadcast_bytes=cap,
    )
    e2 = capped_broadcast_join(
        e1,
        state.map_batches(keyed("dst", "w"), batch_format="pyarrow"),
        on="dst",
        max_broadcast_bytes=cap,
    )

    def dag_only(t: pa.Table) -> pa.Table:
        dv = t.column("dv").to_numpy(zero_copy_only=False)
        dw = t.column("dw").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(dw == dv + 1)).select(
            ["src", "dst", "dv", "sv", "sw"]
        )

    sp = e2.map_batches(dag_only, batch_format="pyarrow").materialize()
    delta_prev = None  # (vid, delta) of level L+1
    vertex_parts, edge_parts = [], []
    for lv in range(maxd - 1, -1, -1):

        def at_level(t: pa.Table, want=lv) -> pa.Table:
            dv = t.column("dv").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(dv == want))

        lvl_e = sp.map_batches(at_level, batch_format="pyarrow")
        if delta_prev is not None:
            lvl_e = capped_broadcast_join(
                lvl_e,
                delta_prev.map_batches(
                    lambda t: pa.table(
                        {"dst": t.column("vid"), "dlt": t.column("delta")}
                    ),
                    batch_format="pyarrow",
                ),
                on="dst",
                how="left",
                max_broadcast_bytes=cap,
            )

        def contrib(t: pa.Table) -> pa.Table:
            sv = t.column("sv").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            sw = t.column("sw").to_numpy(zero_copy_only=False).astype(
                np.float64
            )
            if "dlt" in t.column_names:
                dlt = (
                    pa.compute.fill_null(t.column("dlt"), 0.0)
                    .to_numpy(zero_copy_only=False)
                )
            else:
                dlt = np.zeros(t.num_rows)
            c = (sv / sw) * (1.0 + dlt)
            return pa.table(
                {
                    "src": t.column("src"),
                    "dst": t.column("dst"),
                    "c": pa.array(c, pa.float64()),
                }
            )

        ec = lvl_e.map_batches(contrib, batch_format="pyarrow")
        if want_edges:
            edge_parts.append(ec.materialize())
            ec = edge_parts[-1]
        new_delta = (
            ec.map_batches(
                lambda t: pa.table(
                    {"vid": t.column("src"), "c": t.column("c")}
                ),
                batch_format="pyarrow",
            )
            .groupby("vid")
            .aggregate(Sum("c", alias_name="delta"))
            .materialize()
        )
        vertex_parts.append(new_delta)
        delta_prev = new_delta

    def drop_source(t: pa.Table, s=source) -> pa.Table:
        vid = t.column("vid").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vid != s))

    vdeps = None
    for p in vertex_parts:
        vdeps = p if vdeps is None else vdeps.union(p)
    if vdeps is not None:
        vdeps = vdeps.map_batches(drop_source, batch_format="pyarrow")
    edeps = None
    if want_edges:
        for p in edge_parts:
            edeps = p if edeps is None else edeps.union(p)
    return vdeps, edeps


def _valid_sources(graph, sources) -> list:
    """Pivot vids that actually exist in the graph (k rows, tiny)."""
    want = set(int(s) for s in np.asarray(sources, dtype=np.int64))

    def hit(t):
        vid = t.column("vid").to_numpy(zero_copy_only=False)
        keep = np.array([int(v) in want for v in vid], dtype=bool)
        return t.select(["vid"]).filter(pa.array(keep))

    import pyarrow as pa

    rows = (
        graph.vertices_ds()
        .map_batches(hit, batch_format="pyarrow")
        .take_all()
    )
    return sorted(int(r["vid"]) for r in rows)


def betweenness_sampled(
    graph,
    sources=None,
    sample_mod: int = 1,
    round_half_away: bool = False,
    mode: str = "auto",
    max_node_bytes: int = DENSE_NODE_BYTES,
    join_cap: int = 256 << 20,
):
    """Approximate betweenness from pivot ``sources`` (explicit vid
    list, or every vertex with ``vid % sample_mod == 0``). Returns
    (vid, betweenness) — the UNSCALED sum of pivot dependencies
    (multiply by V/k to estimate the exact values). ``sample_mod=1``
    over all vertices IS exact Brandes (pinned in tests vs a
    brute-force all-pairs path counter).

    ``mode="dense"`` is the fits-a-node fast path (broadcast CSR, one
    Ray task per pivot); ``mode="join"`` is the distributed degradation
    (``_pivot_deps_join``); ``"auto"`` probes the dense CSR byte
    estimate against ``max_node_bytes`` — the same byte-probe idiom as
    Louvain's ``mode="auto"``. Dense/join equality is pinned in
    tests/test_betweenness.py."""
    import pyarrow as pa
    import ray

    if mode == "auto":
        mode = (
            "dense" if _dense_bytes_estimate(graph) <= max_node_bytes
            else "join"
        )
    if mode == "join":
        from ray.data.aggregate import Sum

        from signal_collect_ray.functions.joins import capped_broadcast_join

        edges = graph.edges_ds(columns=("src", "dst")).materialize()
        if sources is None:
            src_list = [
                int(r["vid"])
                for r in graph.vertices_ds()
                .map_batches(
                    lambda t, m=sample_mod: t.select(["vid"]).filter(
                        pa.array(
                            t.column("vid").to_numpy(zero_copy_only=False)
                            % m
                            == 0
                        )
                    ),
                    batch_format="pyarrow",
                )
                .take_all()
            ]
        else:
            src_list = _valid_sources(graph, sources)
        total = None
        for s in src_list:
            vdeps, _ = _pivot_deps_join(edges, s, join_cap, want_edges=False)
            if vdeps is not None:
                total = vdeps if total is None else total.union(vdeps)
        if total is not None:
            total = (
                total.groupby("vid")
                .aggregate(Sum("delta", alias_name="dep"))
            )

        def final(t: pa.Table, rha=round_half_away) -> pa.Table:
            dep = (
                pa.compute.fill_null(t.column("dep"), 0.0)
                .to_numpy(zero_copy_only=False)
                if "dep" in t.column_names
                else np.zeros(t.num_rows)
            )
            if rha:
                f = 10.0 ** 6
                r = np.sign(dep) * np.floor(np.abs(dep) * f + 0.5) / f
            else:
                r = np.round(dep, 6)
            return pa.table(
                {
                    "vid": t.column("vid"),
                    "betweenness": pa.array(r, pa.float64()),
                }
            )

        verts = graph.vertices_ds().select_columns(["vid"])
        if total is None:
            return verts.map_batches(final, batch_format="pyarrow")
        joined = capped_broadcast_join(
            verts,
            total.map_batches(
                lambda t: pa.table(
                    {"vid": t.column("vid"), "dep": t.column("dep")}
                ),
                batch_format="pyarrow",
            ),
            on="vid",
            how="left",
            max_broadcast_bytes=join_cap,
        )
        return joined.map_batches(final, batch_format="pyarrow")

    csr_refs = graph.csr_refs()

    @ray.remote
    def prep(*csrs):
        return _dense_csr(list(csrs))

    vids, indptr, dst_idx = ray.get(
        prep.remote(*[csr_refs[q] for q in sorted(csr_refs)])
    )
    n = len(vids)
    if sources is None:
        src_list = vids[vids % sample_mod == 0]
    else:
        src_list = np.asarray(sources, dtype=np.int64)
    pos = np.searchsorted(vids, src_list)
    pos = pos[(pos < n) & (vids[np.minimum(pos, n - 1)] == src_list)]

    indptr_ref = ray.put(indptr)
    dst_ref = ray.put(dst_idx)

    @ray.remote
    def pivot(s_idx, indptr_a, dst_a):
        # CSR refs arrive as task ARGS so Ray dereferences them
        # zero-copy from the local object store
        return _brandes_from(int(s_idx), indptr_a, dst_a, n)

    total = np.zeros(n)
    refs = [pivot.remote(int(s), indptr_ref, dst_ref) for s in pos]
    for r in refs:
        total += ray.get(r)
    if round_half_away:
        f = 10.0 ** 6
        rounded = np.sign(total) * np.floor(np.abs(total) * f + 0.5) / f
    else:
        rounded = np.round(total, 6)
    return pa.table(
        {
            "vid": pa.array(vids, pa.int64()),
            "betweenness": pa.array(rounded, pa.float64()),
        }
    )


def _brandes_edges_from(s_idx: int, indptr, dst_idx, n: int) -> np.ndarray:
    """One pivot's PER-EDGE dependency vector (Girvan-Newman edge
    betweenness contribution): for each CSR edge slot (v → w) on a
    shortest path, σ_v/σ_w · (1 + δ_w). Same two passes as
    ``_brandes_from``; the reverse pass scatters into edge slots."""
    sigma = np.zeros(n)
    dist = np.full(n, -1, np.int64)
    sigma[s_idx] = 1.0
    dist[s_idx] = 0
    levels = [np.array([s_idx], np.int64)]
    frontier = levels[0]
    d = 0
    while len(frontier):
        counts = indptr[frontier + 1] - indptr[frontier]
        eidx = expand_ranges(indptr[frontier], counts)
        if not len(eidx):
            break
        tgt = dst_idx[eidx]
        src_rep = np.repeat(frontier, counts)
        new_mask = dist[tgt] == -1
        if new_mask.any():
            dist[tgt[new_mask]] = d + 1
        on_sp = dist[tgt] == d + 1
        np.add.at(sigma, tgt[on_sp], sigma[src_rep[on_sp]])
        frontier = np.unique(tgt[new_mask]) if new_mask.any() else np.empty(
            0, np.int64
        )
        if len(frontier):
            levels.append(frontier)
        d += 1
    delta = np.zeros(n)
    edge_dep = np.zeros(len(dst_idx))
    for lvl in reversed(levels):
        counts = indptr[lvl + 1] - indptr[lvl]
        eidx = expand_ranges(indptr[lvl], counts)
        if not len(eidx):
            continue
        tgt = dst_idx[eidx]
        src_rep = np.repeat(lvl, counts)
        on_sp = dist[tgt] == dist[src_rep] + 1
        contrib = np.zeros(len(eidx))
        contrib[on_sp] = (
            sigma[src_rep[on_sp]] / sigma[tgt[on_sp]]
        ) * (1.0 + delta[tgt[on_sp]])
        edge_dep[eidx] += contrib
        np.add.at(delta, src_rep, contrib)
    return edge_dep


def edge_betweenness_pivots(
    graph,
    sources,
    top_k: int = 20,
    mode: str = "auto",
    max_node_bytes: int = DENSE_NODE_BYTES,
    join_cap: int = 256 << 20,
):
    """Girvan-Newman edge betweenness restricted to a pivot source set:
    Σ over pivots of per-edge shortest-path dependencies, top-k edges
    by (rounded score DESC, src, dst). ``mode="dense"``: broadcast-CSR
    pivot fan-out — per-pivot work is an independent Ray task reading
    the CSR zero-copy from the object store. ``mode="join"``: the
    distributed degradation (per-edge contributions from
    ``_pivot_deps_join``, one (src, dst) groupby, distributed sort +
    limit). ``"auto"`` picks by the dense byte probe, like
    betweenness_sampled."""
    import pyarrow as pa
    import ray

    if mode == "auto":
        mode = (
            "dense" if _dense_bytes_estimate(graph) <= max_node_bytes
            else "join"
        )
    if mode == "join":
        from ray.data.aggregate import Sum

        edges = graph.edges_ds(columns=("src", "dst")).materialize()
        contribs = None
        for s in _valid_sources(graph, sources):
            _, edeps = _pivot_deps_join(edges, s, join_cap, want_edges=True)
            if edeps is not None:
                contribs = (
                    edeps if contribs is None else contribs.union(edeps)
                )
        empty = pa.table(
            {
                "src": pa.array([], pa.int64()),
                "dst": pa.array([], pa.int64()),
                "betweenness": pa.array([], pa.float64()),
            }
        )
        if contribs is None:
            return empty

        def rounded_pos(t: pa.Table) -> pa.Table:
            c = t.column("c").to_numpy(zero_copy_only=False)
            f = 10.0 ** 6
            bet = np.sign(c) * np.floor(np.abs(c) * f + 0.5) / f
            out = pa.table(
                {
                    "src": t.column("src"),
                    "dst": t.column("dst"),
                    "betweenness": pa.array(bet, pa.float64()),
                }
            )
            return out.filter(pa.array(bet > 0))

        return (
            contribs.groupby(["src", "dst"])
            .aggregate(Sum("c", alias_name="c"))
            .map_batches(rounded_pos, batch_format="pyarrow")
            .sort(
                ["betweenness", "src", "dst"],
                descending=[True, False, False],
            )
            .limit(top_k)
        )

    csr_refs = graph.csr_refs()

    @ray.remote
    def prep(*csrs):
        return _dense_csr(list(csrs))

    vids, indptr, dst_idx = ray.get(
        prep.remote(*[csr_refs[q] for q in sorted(csr_refs)])
    )
    n = len(vids)
    src_list = np.asarray(sources, dtype=np.int64)
    pos = np.searchsorted(vids, src_list)
    pos = pos[(pos < n) & (vids[np.minimum(pos, n - 1)] == src_list)]

    indptr_ref = ray.put(indptr)
    dst_ref = ray.put(dst_idx)

    @ray.remote
    def pivot(s_idx, indptr_a, dst_a):
        return _brandes_edges_from(int(s_idx), indptr_a, dst_a, n)

    total = np.zeros(len(dst_idx))
    for r in [pivot.remote(int(s), indptr_ref, dst_ref) for s in pos]:
        total += ray.get(r)
    # CSR slot -> (src vid, dst vid)
    deg = np.diff(indptr)
    esrc = vids[np.repeat(np.arange(n), deg)]
    edst = vids[dst_idx]
    f = 10.0 ** 6
    bet = np.sign(total) * np.floor(np.abs(total) * f + 0.5) / f
    keep = bet > 0
    esrc, edst, bet = esrc[keep], edst[keep], bet[keep]
    order = np.lexsort((edst, esrc, -bet))[:top_k]
    return pa.table(
        {
            "src": pa.array(esrc[order], pa.int64()),
            "dst": pa.array(edst[order], pa.int64()),
            "betweenness": pa.array(bet[order], pa.float64()),
        }
    )
