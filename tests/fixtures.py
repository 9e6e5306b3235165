"""Conformance fixture topologies + independent oracles (FIXTURES.md §3).

Topologies mirror the reference test suite
(``/root/reference/src/test/scala/com/signalcollect/IntegrationSpec.scala``
graphs and generators at lines 110-222, 238-295). Oracles are
independently-coded dense/driver implementations (numpy power iteration,
union-find, brute-force triangle scan) — no engine code reused.
"""

from __future__ import annotations

import numpy as np


def cycle(n: int):
    s = np.arange(n, dtype=np.int64)
    return s, (s + 1) % n


def star5():
    # IntegrationSpec.scala:124-136 — leaves 0..3 each point at center 4
    return np.array([0, 1, 2, 3], dtype=np.int64), np.array([4, 4, 4, 4], dtype=np.int64)


def grid(w: int, h: int):
    """Undirected grid, 4-neighborhood, both directions (IntegrationSpec Grid)."""
    src, dst = [], []
    for y in range(h):
        for x in range(w):
            v = y * w + x
            if x + 1 < w:
                src += [v, v + 1]
                dst += [v + 1, v]
            if y + 1 < h:
                src += [v, v + w]
                dst += [v + w, v]
    return np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64)


def torus(w: int, h: int):
    """Torus, 4-neighborhood, both directions (IntegrationSpec Torus)."""
    src, dst = [], []
    for y in range(h):
        for x in range(w):
            v = y * w + x
            r = y * w + (x + 1) % w
            d = ((y + 1) % h) * w + x
            src += [v, r, v, d]
            dst += [r, v, d, v]
    return np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64)


def grid8(w: int, h: int):
    """8-neighborhood grid, both directions (GameOfLife.scala:85-92 /
    SchellingSegregation.scala:76-83 neighbors())."""
    offs = [(-1, -1), (0, -1), (1, -1), (-1, 0), (1, 0), (-1, 1), (0, 1), (1, 1)]
    src, dst = [], []
    for y in range(h):
        for x in range(w):
            v = y * w + x
            for dx, dy in offs:
                nx, ny = x + dx, y + dy
                if 0 <= nx < w and 0 <= ny < h:
                    src.append(v)
                    dst.append(ny * w + nx)
    return np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64)


def sym_cycle4():
    s, d = cycle(4)
    return np.concatenate([s, d]), np.concatenate([d, s])


def sym_star5():
    s, d = star5()
    return np.concatenate([s, d]), np.concatenate([d, s])


def two_clusters():
    """Cliques {0,1,2} and {8,9,10} joined by chain 2-3-...-8, bidirectional
    (ChineseWhispersClustering.scala:60-101)."""
    s = [0, 1, 0, 2, 1, 2, 8, 9, 8, 10, 9, 10] + list(range(2, 8))
    d = [1, 0, 2, 0, 2, 1, 9, 8, 10, 8, 10, 9] + list(range(3, 9))
    s2 = s + d
    d2 = d + s
    return np.array(s2, dtype=np.int64), np.array(d2, dtype=np.int64)


def cc_graph6():
    """Undirected: 1-2,1-3,1-4,1-5,2-3,3-5,5-6,1-6 (ClusteringCoefficient.scala:49-78)."""
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (2, 3), (3, 5), (5, 6), (1, 6)]
    s = np.array([a for a, b in pairs] + [b for a, b in pairs], dtype=np.int64)
    d = np.array([b for a, b in pairs] + [a for a, b in pairs], dtype=np.int64)
    return s, d


def disconnected():
    """cycle5 on ids 0-4 ∪ sym_cycle4 on ids 10-13."""
    s1, d1 = cycle(5)
    s2, d2 = sym_cycle4()
    return np.concatenate([s1, s2 + 10]), np.concatenate([d1, d2 + 10])


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

def pagerank_oracle(src, dst, weight=None, damping=0.85, tol=1e-13, max_iter=10000):
    """Dense power iteration of the REFERENCE formulation: unnormalized,
    r = (1-d) + d * Σ_in r_u * w_uv / sumw_u, no dangling redistribution
    (examples/PageRank.scala:49-68). Returns (vids_sorted, ranks)."""
    vids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    w = np.ones(len(src)) if weight is None else np.asarray(weight, float)
    si = np.array([idx[v] for v in src])
    di = np.array([idx[v] for v in dst])
    sumw = np.zeros(n)
    np.add.at(sumw, si, w)
    r = np.full(n, 1 - damping)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] * w / sumw[si])
        r_new = (1 - damping) + damping * contrib
        if np.abs(r_new - r).max() < tol:
            r = r_new
            break
        r = r_new
    return vids, r


def pagerank_oracle_k_steps(src, dst, k, damping=0.85):
    """Exactly k synchronous supersteps from r0 = 1-d (threshold 0)."""
    vids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    si = np.array([idx[v] for v in src])
    di = np.array([idx[v] for v in dst])
    outd = np.zeros(n)
    np.add.at(outd, si, 1.0)
    r = np.full(n, 1 - damping)
    for _ in range(k):
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] / outd[si])
        r = (1 - damping) + damping * contrib
    return vids, r


def cc_oracle(src, dst):
    """Union-find: min-reachable-label per vertex over undirected edges."""
    vids = np.unique(np.concatenate([src, dst]))
    parent = {int(v): int(v) for v in vids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(src, dst):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return vids, np.array([find(int(v)) for v in vids], dtype=np.int64)


def sssp_oracle(src, dst, source):
    """Driver BFS/Dijkstra with unit weights."""
    import heapq

    vids = np.unique(np.concatenate([src, dst]))
    adj: dict = {int(v): [] for v in vids}
    for a, b in zip(src, dst):
        adj[int(a)].append(int(b))
    dist = {int(v): np.inf for v in vids}
    dist[int(source)] = 0.0
    q = [(0.0, int(source))]
    while q:
        d, v = heapq.heappop(q)
        if d > dist[v]:
            continue
        for u in adj[v]:
            nd = d + 1.0
            if nd < dist[u]:
                dist[u] = nd
                heapq.heappush(q, (nd, u))
    return vids, np.array([dist[int(v)] for v in vids])


def cellular_oracle(src, dst, state0, rule, k):
    """k synchronous steps of a neighborhood-sum cellular rule on an
    arbitrary edge list. ``rule(state, nsum, deg) -> state`` — coded
    against plain adjacency scatter, independent of the engine."""
    vids = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(vids)}
    si = np.array([idx[int(v)] for v in src])
    di = np.array([idx[int(v)] for v in dst])
    deg = np.zeros(len(vids), dtype=np.int64)
    np.add.at(deg, si, 1)
    state = np.asarray(state0, dtype=np.int64).copy()
    for _ in range(k):
        nsum = np.zeros(len(vids), dtype=np.int64)
        np.add.at(nsum, di, state[si])
        state = rule(state, nsum, deg)
    return vids, state


def gol_rule(state, nsum, deg):
    return np.where(nsum == 3, 1, np.where(nsum == 2, state, 0)).astype(np.int64)


def schelling_rule(threshold):
    def rule(state, nsum, deg):
        equal = np.where(state == 1, nsum, deg - nsum)
        frac = equal / np.maximum(deg, 1)
        content = (frac >= threshold) | (deg == 0)
        return np.where(content, state, (state + 1) % 2).astype(np.int64)

    return rule


def triangle_oracle(src, dst):
    """Brute-force per-vertex triangle counts over the undirected-ized graph."""
    import itertools

    vids = np.unique(np.concatenate([src, dst]))
    nbrs = {int(v): set() for v in vids}
    for a, b in zip(src, dst):
        if a != b:
            nbrs[int(a)].add(int(b))
            nbrs[int(b)].add(int(a))
    tri = {int(v): 0 for v in vids}
    total = 0
    for v in vids:
        v = int(v)
        ns = sorted(nbrs[v])
        for a, b in itertools.combinations(ns, 2):
            if b in nbrs[a]:
                tri[v] += 1
    total = sum(tri.values()) // 3
    return vids, np.array([tri[int(v)] for v in vids], dtype=np.int64), total


def ppr_oracle(src, dst, sources, damping=0.85, tol=1e-13, max_iter=10000):
    """Dense personalized PageRank: r = b + d * Σ_in r_u / outd_u with
    teleport baseline b_v = (1-d)·[v ∈ sources]."""
    vids = np.unique(np.concatenate([src, dst]))
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    si = np.array([idx[v] for v in src])
    di = np.array([idx[v] for v in dst])
    outd = np.zeros(n)
    np.add.at(outd, si, 1.0)
    b = np.zeros(n)
    for s in sources:
        if s in idx:
            b[idx[s]] = 1 - damping
    r = b.copy()
    for _ in range(max_iter):
        contrib = np.zeros(n)
        np.add.at(contrib, di, r[si] / outd[si])
        r_new = b + damping * contrib
        if np.abs(r_new - r).max() < tol:
            return vids, r_new
        r = r_new
    return vids, r
