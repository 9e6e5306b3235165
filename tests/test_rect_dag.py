"""Conformance for rectangle (4-cycle) counting and DAG longest-path
layering vs independent brute-force oracles."""

import itertools
import os

import numpy as np
import pyarrow as pa
import ray.data as rd

from signal_collect_ray.algorithms import (
    DagLongestPath,
    layers_from_state,
    rectangle_count,
)


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )


def _brute_rectangles(src, dst):
    """Enumerate 4-vertex subsets; each of the 3 pairings of a subset
    into a cyclic order is a C4 iff its 4 edges exist. Independent of
    the codeg identity the operator uses."""
    adj = set()
    verts = set()
    for s, d in zip(src, dst):
        if s != d:
            adj.add((min(s, d), max(s, d)))
            verts.update((int(s), int(d)))

    def e(x, y):
        return (min(x, y), max(x, y)) in adj

    total = 0
    for a, b, c, d in itertools.combinations(sorted(verts), 4):
        for p, q, r, s in ((a, b, c, d), (a, b, d, c), (a, c, b, d)):
            if e(p, q) and e(q, r) and e(r, s) and e(s, p):
                total += 1
    return total


def test_rectangles_square_plus_diag(ray_session):
    # a square 0-1-2-3 with a diagonal and a pendant vertex
    src = np.array([0, 1, 2, 3, 0, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 0, 2, 4], dtype=np.int64)
    assert rectangle_count(_edges_ds(src, dst), num_partitions=4) == 1


def test_rectangles_k4(ray_session):
    src, dst = [], []
    for a, b in itertools.combinations(range(4), 2):
        src.append(a)
        dst.append(b)
    assert rectangle_count(
        _edges_ds(np.array(src), np.array(dst)), num_partitions=4
    ) == 3


def test_rectangles_random_vs_brute(ray_session):
    rng = np.random.RandomState(7)
    n = 18
    src = rng.randint(0, n, 70).astype(np.int64)
    dst = rng.randint(0, n, 70).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    got = rectangle_count(_edges_ds(src, dst), num_partitions=4)
    assert got == _brute_rectangles(src, dst)


def _brute_layers(src, dst, rounds):
    vids = np.unique(np.concatenate([src, dst]))
    lay = {int(v): 0 for v in vids}
    for _ in range(rounds):
        nxt = dict(lay)
        for s, d in zip(src, dst):
            nxt[int(d)] = max(nxt[int(d)], lay[int(s)] + 1)
        lay = nxt
    return lay


def _run_dag(tmp_path, src, dst, k):
    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.engine_resident import ResidentEngine

    g = Graph.build(
        _edges_ds(src, dst), os.path.join(str(tmp_path), "g"),
        num_partitions=4,
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=0.0, max_supersteps=k)
    )
    info = eng.run(
        g, DagLongestPath(), run_dir=os.path.join(str(tmp_path), "run"),
        resume=False,
    )
    t = layers_from_state(info.state_table())
    return dict(zip(t.column("vid").to_pylist(), t.column("layer").to_pylist()))


def test_dag_chain_and_branch(tmp_path, ray_session):
    # 0→1→2→3 chain plus 0→3 shortcut: layer = longest path, not BFS
    src = np.array([0, 1, 2, 0], dtype=np.int64)
    dst = np.array([1, 2, 3, 3], dtype=np.int64)
    got = _run_dag(tmp_path, src, dst, 10)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_dag_random_k_rounds_match_jacobi(tmp_path, ray_session):
    """Bounded k rounds on the engine == k-step Jacobi, even before the
    fixpoint (the oracle_sql parity argument)."""
    rng = np.random.RandomState(13)
    n = 40
    src = rng.randint(0, n, 160).astype(np.int64)
    dst = rng.randint(0, n, 160).astype(np.int64)
    keep = src < dst  # DAG by construction
    src, dst = src[keep], dst[keep]
    for k in (2, 5):
        got = _run_dag(tmp_path / f"k{k}", src, dst, k)
        assert got == _brute_layers(src, dst, k)


def test_sssp_tree_parents(tmp_path, ray_session):
    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import SSSP, shortest_path_tree
    from signal_collect_ray.engine_resident import ResidentEngine

    rng = np.random.RandomState(23)
    n = 50
    src = rng.randint(0, n, 150).astype(np.int64)
    dst = rng.randint(0, n, 150).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph.build(
        _edges_ds(src, dst), os.path.join(str(tmp_path), "g"),
        num_partitions=4,
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=0.0, max_supersteps=60)
    )
    info = eng.run(
        g, SSSP(0), run_dir=os.path.join(str(tmp_path), "run"), resume=False
    )
    state = info.state_table()
    out = shortest_path_tree(_edges_ds(src, dst), state, num_partitions=4)
    got = {
        r["vid"]: r["parent"] for r in out.take_all()
    }
    # independent BFS
    import collections

    adj = collections.defaultdict(list)
    for s, d in zip(src, dst):
        adj[int(s)].append(int(d))
    dist = {0: 0}
    q = collections.deque([0])
    while q:
        u = q.popleft()
        for w in adj[u]:
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    want = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s in dist and d in dist and dist[d] == dist[s] + 1:
            want[d] = min(want.get(d, s), s)
    assert got == want
    assert 0 not in got  # source has no parent


def test_sssp_tree_join_path(tmp_path, ray_session, monkeypatch):
    """Force the co-partitioned-join fallback; same parents."""
    import signal_collect_ray.algorithms.sssp as sssp_mod
    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import SSSP
    from signal_collect_ray.engine_resident import ResidentEngine

    src = np.array([0, 0, 1, 2, 3, 1], dtype=np.int64)
    dst = np.array([1, 2, 3, 3, 4, 4], dtype=np.int64)
    g = Graph.build(
        _edges_ds(src, dst), os.path.join(str(tmp_path), "g"),
        num_partitions=2,
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=2, eps=0.0, max_supersteps=20)
    )
    info = eng.run(
        g, SSSP(0), run_dir=os.path.join(str(tmp_path), "run"), resume=False
    )
    state = info.state_table()
    want = {
        r["vid"]: r["parent"]
        for r in sssp_mod.shortest_path_tree(
            _edges_ds(src, dst), state, num_partitions=2
        ).take_all()
    }
    monkeypatch.setattr(sssp_mod, "BROADCAST_DIST_LIMIT", 0)
    got = {
        r["vid"]: r["parent"]
        for r in sssp_mod.shortest_path_tree(
            _edges_ds(src, dst), state, num_partitions=2
        ).take_all()
    }
    assert got == want == {1: 0, 2: 0, 3: 1, 4: 1}


def test_triangle_list_enumeration(ray_session):
    from signal_collect_ray.algorithms import total_triangles, triangle_list

    rng = np.random.RandomState(31)
    n = 25
    src = rng.randint(0, n, 120).astype(np.int64)
    dst = rng.randint(0, n, 120).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    rows = triangle_list(_edges_ds(src, dst), num_partitions=4).take_all()
    got = {(r["a"], r["b"], r["c"]) for r in rows}
    assert len(rows) == len(got)  # each triangle exactly once
    adj = set()
    for s, d in zip(src, dst):
        adj.add((min(s, d), max(s, d)))
    want = set()
    for a, b in adj:
        for c in range(n):
            if c > b and (a, c) in adj and (b, c) in adj:
                want.add((a, b, c))
    assert got == want
    assert len(got) == total_triangles(_edges_ds(src, dst), num_partitions=4)


def test_degenerate_graphs(tmp_path, ray_session):
    """Empty / self-loop-only / single-edge inputs run clean through
    the new operators."""
    from signal_collect_ray.algorithms import (
        total_triangles,
        triangle_list,
    )
    from signal_collect_ray.algorithms.scc import scc_labels

    # self-loops only → no edges after filtering
    src = np.array([3, 4], dtype=np.int64)
    dst = np.array([3, 4], dtype=np.int64)
    assert rectangle_count(_edges_ds(src, dst), num_partitions=2) == 0
    assert triangle_list(_edges_ds(src, dst), num_partitions=2).count() == 0
    assert total_triangles(_edges_ds(src, dst), num_partitions=2) == 0
    t = scc_labels(_edges_ds(src, dst), str(tmp_path / "scc_self"))
    assert t.num_rows == 0  # self-loops dropped, no vertices remain

    # one real edge
    src = np.array([0], dtype=np.int64)
    dst = np.array([1], dtype=np.int64)
    assert rectangle_count(_edges_ds(src, dst), num_partitions=2) == 0
    t = scc_labels(_edges_ds(src, dst), str(tmp_path / "scc_one"))
    got = dict(zip(t.column("vid").to_pylist(), t.column("scc").to_pylist()))
    assert got == {0: 0, 1: 1}
