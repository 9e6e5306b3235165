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
GraphX-style "graph fits a node, sources scale out" regime; when the
graph does NOT fit a node, betweenness degrades to k engine SSSP runs
plus a reverse sweep, the harmonic_closeness shape).

Contributions from all pivots sum on the driver (k short float
vectors). Deterministic: pure integer BFS + float accumulation in a
fixed level order.
"""

from __future__ import annotations

import numpy as np

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


def betweenness_sampled(
    graph, sources=None, sample_mod: int = 1, round_half_away: bool = False
):
    """Approximate betweenness from pivot ``sources`` (explicit vid
    list, or every vertex with ``vid % sample_mod == 0``). Returns a
    pyarrow Table (vid, betweenness) — the UNSCALED sum of pivot
    dependencies (multiply by V/k to estimate the exact values).
    ``sample_mod=1`` over all vertices IS exact Brandes (pinned in
    tests vs a brute-force all-pairs path counter)."""
    import pyarrow as pa
    import ray

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


def edge_betweenness_pivots(graph, sources, top_k: int = 20):
    """Girvan-Newman edge betweenness restricted to a pivot source set:
    Σ over pivots of per-edge shortest-path dependencies, top-k edges
    by (rounded score DESC, src, dst). Same broadcast-CSR pivot fan-out
    as betweenness_sampled — per-pivot work is an independent Ray task
    reading the CSR zero-copy from the object store."""
    import pyarrow as pa
    import ray

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
