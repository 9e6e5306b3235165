"""Hamiltonian simple-path enumeration conformance — the reference demo
graph (``examples/Hamiltonian.scala:34-54``) plus an independent
brute-force DFS enumerator on random bidirectional graphs."""

import numpy as np
import pytest

from signal_collect_ray import Graph
from signal_collect_ray.algorithms import best_paths, simple_paths

# the reference demo: a=0 b=1 c=2 d=3 e=4, bidirectional weighted edges
# (Hamiltonian.scala:40-54)
DEMO = [(0, 3, 3), (0, 1, 1), (3, 1, 2), (3, 2, 1), (1, 2, 1), (4, 0, 1)]


def _demo_graph(tmp_path, num_partitions=2):
    src = np.array([e[0] for e in DEMO], dtype=np.int64)
    dst = np.array([e[1] for e in DEMO], dtype=np.int64)
    w = np.array([e[2] for e in DEMO], dtype=np.float64)
    return Graph.from_edge_arrays(
        src, dst, str(tmp_path / "g"), weight=w,
        num_partitions=num_partitions, symmetric=True,
    )


def _brute(edges):
    """Independent oracle: DFS-enumerate every simple path over the
    symmetrized adjacency; returns {(path_str, final_vertex): weight}."""
    adj = {}
    for s, d, w in edges:
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    out = {}
    for v0 in adj:
        stack = [(v0, (v0,), 0.0)]
        while stack:
            v, path, w = stack.pop()
            out[(",".join(map(str, path)), v)] = w
            for nxt, ew in adj[v]:
                if nxt not in path:
                    stack.append((nxt, path + (nxt,), w + ew))
    return out


def _brute_best(edges):
    """Reference toString semantics (longest, then min weight) with the
    deterministic min-path-string extra tie-break."""
    paths = _brute(edges)
    best = {}
    for (p, v), w in paths.items():
        key = (-p.count(",") - 1, w, p)
        if v not in best or key < best[v]:
            best[v] = key
    return {
        v: (-k[0], k[1], k[2]) for v, k in best.items()
    }


def _paths_of(ds):
    df = ds.to_pandas()
    if df.empty:
        return {}
    return {
        (p, int(c)): float(w)
        for p, c, w in zip(df["path"], df["cur"], df["w"])
    }


def test_demo_graph_full_path_set(tmp_path):
    g = _demo_graph(tmp_path)
    got = _paths_of(simple_paths(g))
    want = _brute(DEMO)
    assert got == want


def test_demo_graph_best_paths(tmp_path):
    g = _demo_graph(tmp_path)
    tbl = best_paths(simple_paths(g))
    want = _brute_best(DEMO)
    assert tbl.num_rows == 5
    for row in tbl.to_pylist():
        bl, bw, bp = want[row["vid"]]
        assert row["best_len"] == bl
        assert row["best_w"] == pytest.approx(bw)
        assert row["best_path"] == bp
    # Hamiltonian paths exist in the demo graph — but not ending at
    # a(=0): e(=4) is a degree-1 leaf on a, so e must be a path endpoint
    # and any path ending at a would need a as both e's successor and
    # the final vertex (the reference's own "depending on the starting
    # vertex" caveat, Hamiltonian.scala:53)
    best_len = {r["vid"]: r["best_len"] for r in tbl.to_pylist()}
    assert best_len == {0: 4, 1: 5, 2: 5, 3: 5, 4: 5}
    # e.g. the min-weight Hamiltonian path into d(=3): e->a->b->c->d, w 4
    d_row = [r for r in tbl.to_pylist() if r["vid"] == 3][0]
    assert d_row["best_path"] == "4,0,1,2,3"
    assert d_row["best_w"] == pytest.approx(4.0)


def test_random_graph_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(11)
    n, m = 9, 14
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(
        np.stack(
            [np.minimum(src[keep], dst[keep]), np.maximum(src[keep], dst[keep])],
            axis=1,
        ),
        axis=0,
    )
    w = ((pairs[:, 0] * 7 + pairs[:, 1] * 13) % 5 + 1).astype(np.float64)
    edges = [
        (int(s), int(d), float(ww)) for (s, d), ww in zip(pairs, w)
    ]
    g = Graph.from_edge_arrays(
        pairs[:, 0], pairs[:, 1], str(tmp_path / "g"), weight=w,
        num_partitions=4, symmetric=True,
    )
    assert _paths_of(simple_paths(g)) == pytest.approx(_brute(edges))


def test_dangling_destination_rejected(tmp_path):
    # the reference requires a bidirectional graph with no dangling
    # vertices; an excluded destination must raise, not silently corrupt
    # the visited bitmask
    src = np.array([0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3], dtype=np.int64)
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "g"), num_partitions=2, symmetric=True,
        exclude_vertices=np.array([3], dtype=np.int64),
    )
    with pytest.raises(ValueError, match="dangling"):
        simple_paths(g).materialize()


def test_vertex_cap(tmp_path):
    src = np.arange(70, dtype=np.int64)
    dst = (src + 1) % 70
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "g"), num_partitions=2, symmetric=True
    )
    with pytest.raises(ValueError, match="64 vertices"):
        simple_paths(g)
