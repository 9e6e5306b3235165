"""SCC conformance: the engine's forward-backward coloring vs an
independent Tarjan implementation on directed fixtures and random
graphs."""

import numpy as np
import pytest

from signal_collect_ray.algorithms.scc import scc_labels


def _tarjan(src, dst):
    """Iterative Tarjan — independent oracle, no engine code."""
    vids = np.unique(np.concatenate([src, dst]))
    adj = {int(v): [] for v in vids}
    for s, d in zip(src, dst):
        adj[int(s)].append(int(d))
    index = {}
    low = {}
    on_stack = set()
    stack = []
    out = {}
    counter = [0]
    for root in map(int, vids):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return {int(v): out[int(v)] for v in vids}


def _check(tmp_path, src, dst):
    import ray.data as rd
    import pyarrow as pa

    edges = rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )
    t = scc_labels(edges, str(tmp_path / "scc"))
    got = dict(zip(t.column("vid").to_pylist(), t.column("scc").to_pylist()))
    want = _tarjan(np.asarray(src), np.asarray(dst))
    assert got == want


def test_scc_two_cycles_and_bridge(tmp_path, ray_session):
    # cycle {0,1,2} → bridge → cycle {5,6}, plus a dangling tail
    src = np.array([0, 1, 2, 2, 5, 6, 6], dtype=np.int64)
    dst = np.array([1, 2, 0, 5, 6, 5, 7], dtype=np.int64)
    _check(tmp_path, src, dst)


def test_scc_dag_is_all_singletons(tmp_path, ray_session):
    src = np.array([0, 0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3, 3], dtype=np.int64)
    _check(tmp_path, src, dst)


def test_scc_random_graph(tmp_path, ray_session):
    rng = np.random.RandomState(11)
    n = 80
    src = rng.randint(0, n, 240).astype(np.int64)
    dst = rng.randint(0, n, 240).astype(np.int64)
    keep = src != dst
    _check(tmp_path, src[keep], dst[keep])
