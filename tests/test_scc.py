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


def test_scc_driver_holds_only_pivots(tmp_path, ray_session, monkeypatch):
    """Scale guard: the outer loop must never materialize the edge
    table or per-round O(E)/O(V) masks on the driver. Static check that
    the banned idioms are gone, plus a functional check that the pivot
    arrays the driver DOES hold are bounded by the SCC count per round,
    not the edge count."""
    import inspect

    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.algorithms import scc as scc_mod
    from signal_collect_ray.algorithms.scc import _BackMark, scc_labels

    src_text = inspect.getsource(scc_mod)
    assert "iter_batches" not in src_text
    assert "to_pandas" not in src_text
    assert "take_all" in src_text  # per-part COUNT rows only

    # graph: 3-cycle + 4-cycle + chain; every round's pivot set must be
    # <= number of SCCs finished that round (here <= 4 per round)
    src = [0, 1, 2, 10, 11, 12, 13, 2, 13, 20]
    dst = [1, 2, 0, 11, 12, 13, 10, 10, 20, 21]
    seen_pivot_sizes = []
    orig_init = _BackMark.__init__

    def spy_init(self, pivots_sorted):
        seen_pivot_sizes.append(len(pivots_sorted))
        orig_init(self, pivots_sorted)

    monkeypatch.setattr(_BackMark, "__init__", spy_init)
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64())})
    )
    t = scc_labels(edges, str(tmp_path / "scc_mem"))
    got = dict(zip(t.column("vid").to_pylist(), t.column("scc").to_pylist()))
    want = _tarjan(np.asarray(src), np.asarray(dst))
    assert got == want
    assert seen_pivot_sizes and all(s <= 4 for s in seen_pivot_sizes)


def test_scc_long_cycle_single_component(tmp_path):
    # a 520-cycle is ONE SCC but its reach propagation needs 520
    # supersteps: the old 500-superstep cap silently truncated the
    # forward/backward reach sets and returned 520 singletons — the
    # quiescence-bounded guard must close the full cycle
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.algorithms.scc import scc_labels

    m = 520
    edges = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.arange(m), pa.int64()),
                "dst": pa.array((np.arange(m) + 1) % m, pa.int64()),
            }
        )
    )
    out = scc_labels(edges, str(tmp_path), num_partitions=4).to_pandas()
    assert out["scc"].nunique() == 1
    assert len(out) == m
