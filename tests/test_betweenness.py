"""Brandes betweenness conformance vs a brute-force pair-counting
oracle (sigma_st(v) = sigma_sv * sigma_vt when distances add up)."""

import numpy as np
import pytest

from signal_collect_ray import Graph
from signal_collect_ray.algorithms.betweenness import betweenness_sampled


def _bfs_counts(adj, n, s):
    dist = np.full(n, -1)
    sigma = np.zeros(n)
    dist[s], sigma[s] = 0, 1.0
    frontier = [s]
    while frontier:
        nxt = []
        for v in frontier:
            for w in adj.get(v, ()):
                if dist[w] == -1:
                    dist[w] = dist[v] + 1
                    nxt.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        frontier = nxt
    return dist, sigma


def _exact_betweenness(src, dst, vids):
    n = len(vids)
    vi = {v: i for i, v in enumerate(vids)}
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(vi[s], []).append(vi[d])
    D, S = [], []
    for s in range(n):
        d_, s_ = _bfs_counts(adj, n, s)
        D.append(d_)
        S.append(s_)
    bc = np.zeros(n)
    for s in range(n):
        for t in range(n):
            if s == t or D[s][t] < 0:
                continue
            for v in range(n):
                if v in (s, t):
                    continue
                if D[s][v] >= 0 and D[v][t] >= 0 and D[s][v] + D[v][t] == D[s][t]:
                    bc[v] += S[s][v] * S[v][t] / S[s][t]
    return bc


def test_betweenness_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(13)
    n, m = 14, 40
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    for P in (2, 3):
        g = Graph.from_edge_arrays(src, dst, str(tmp_path / f"bw{P}"),
                                   num_partitions=P)
        t = betweenness_sampled(g, sample_mod=1)  # all sources = exact
        vids = np.array(t.column("vid").to_pylist())
        got = np.array(t.column("betweenness").to_pylist())
        exp = _exact_betweenness(src, dst, vids)
        assert got == pytest.approx(exp, abs=1e-5)


def test_betweenness_path_graph(ray_session, tmp_path):
    # 0->1->2->3: exact bc = [0, 2, 2, 0] (1 lies on 0-2,0-3; 2 on 0-3,1-3)
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "p"), num_partitions=2)
    t = betweenness_sampled(g)
    got = dict(zip(t.column("vid").to_pylist(),
                   t.column("betweenness").to_pylist()))
    assert got == {0: 0.0, 1: 2.0, 2: 2.0, 3: 0.0}
    # explicit pivot subset: only source 0 contributes — 1 lies on the
    # 0→2 and 0→3 paths (dependency 2), 2 only on 0→3
    t0 = betweenness_sampled(g, sources=[0])
    got0 = dict(zip(t0.column("vid").to_pylist(),
                    t0.column("betweenness").to_pylist()))
    assert got0 == {0: 0.0, 1: 2.0, 2: 1.0, 3: 0.0}
