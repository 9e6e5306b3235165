"""Coreness (algorithms/coreness.py): the distributed h-index fixpoint
must equal the classic sequential min-degree peel (the defining
algorithm for core numbers) on random graphs, at any partition count."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms.coreness import Coreness


def _peel_coreness(src, dst):
    """Textbook sequential peel: repeatedly remove the min-degree
    vertex; coreness = degree at removal time, max-monotone."""
    import collections

    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    k = 0
    alive = set(adj)
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.discard(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return core


@pytest.mark.parametrize("seed,P", [(2, 4), (9, 1), (9, 8)])
def test_coreness_equals_sequential_peel(tmp_path, seed, P):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, 50, 500).astype(np.int64)
    dst = rng.randint(0, 50, 500).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    pairs = np.unique(
        np.stack([np.minimum(src, dst), np.maximum(src, dst)], axis=1), axis=0
    )
    s, d = pairs[:, 0], pairs[:, 1]
    sym_s = np.concatenate([s, d])
    sym_d = np.concatenate([d, s])
    g = Graph.from_edge_arrays(
        sym_s, sym_d, str(tmp_path / f"g{seed}{P}"), num_partitions=P
    )
    eng = SuperstepEngine(
        EngineConfig(num_partitions=P, eps=1e-9, max_supersteps=64)
    )
    info = eng.run(
        g, Coreness(), run_dir=str(tmp_path / f"r{seed}{P}"), resume=False
    )
    t = info.state_table()
    got = {
        int(v): int(c)
        for v, c in zip(t.column("vid").to_pylist(), t.column("state").to_pylist())
    }
    want = _peel_coreness(s, d)
    assert got == want
