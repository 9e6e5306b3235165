"""PathQuery conformance — the reference demo graph and query
(``examples/PathQuery.scala:166-189``) plus an independent brute-force
path enumerator on random graphs."""

import numpy as np
import pytest

from signal_collect_ray import Graph
from signal_collect_ray.algorithms.pathquery import compile_chains, path_query


def _brute_paths(src, dst, start, nodes):
    """Independent oracle: enumerate matching paths by DFS over the
    compiled chains (adjacency dict, Python sets)."""
    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set()).add(d)
    out = set()
    for chain in compile_chains(nodes):
        stack = [(start, [])]
        while stack:
            v, path = stack.pop()
            pos = len(path)
            if pos == len(chain):
                out.add((",".join(map(str, path)), len(path)))
                continue
            node = chain[pos]
            for nxt in sorted(adj.get(v, ())):
                if node[0] == "fixed" and nxt != node[1]:
                    continue
                stack.append((nxt, path + [nxt]))
    return out


def _run(g, start, nodes):
    df = path_query(g, start, nodes).to_pandas()
    if df.empty:  # Ray's to_pandas drops columns on 0-row datasets
        return set()
    return set(zip(df["path"].tolist(), df["len"].tolist()))


def test_compile_chains_star_semantics():
    # star(m) consumes 1..m+1 wildcards (PathQuery.scala:44-53)
    chains = compile_chains([("star", 2), ("fixed", 9)])
    assert [len(c) for c in chains] == [2, 3, 4]
    assert all(c[-1] == ("fixed", 9) for c in chains)
    with pytest.raises(ValueError):
        compile_chains([])


def test_reference_demo_graph(tmp_path):
    # the PathQueryExample graph and query: star(max=5) then fixed(2)
    src = np.array([0, 0, 1, 2, 3, 4, 2], dtype=np.int64)
    dst = np.array([1, 2, 2, 3, 4, 2, 5], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    nodes = [("star", 5), ("fixed", 2)]
    got = _run(g, 0, nodes)
    assert got == _brute_paths(src, dst, 0, nodes)
    # spot-pin the shortest and the longest match
    assert ("1,2", 2) in got
    assert ("2,3,4,2,3,4,2", 7) in got


def test_random_graph_matches_bruteforce(tmp_path):
    rng = np.random.default_rng(3)
    n, m = 40, 160
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # dedup (Graph.build of the query layer uses distinct edges)
    pairs = np.unique(np.stack([src, dst], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    for nodes in (
        [("wild",), ("fixed", 7), ("wild",)],
        [("star", 2), ("fixed", 5)],
        [("fixed", 11), ("star", 1), ("fixed", 3)],
    ):
        got = _run(g, 0, nodes)
        assert got == _brute_paths(src, dst, 0, nodes)


def test_no_matches_is_empty(tmp_path):
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    assert _run(g, 0, [("wild",), ("fixed", 99)]) == set()


def _sim_walks(src, dst, walk_len, seed, start_mod):
    """Independent oracle: simulate the md5-argmod walk on an adjacency
    dict of sorted deduplicated neighbor lists."""
    import hashlib

    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set()).add(d)
    adj = {s: sorted(ds) for s, ds in adj.items()}
    rows = set()
    for w in sorted({s for s in src.tolist() if s % start_mod == 0}):
        cur = w
        rows.add((w, 0, w))
        for t in range(1, walk_len + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            h = int.from_bytes(
                hashlib.md5(f"{seed}:{w}:{t}".encode()).digest()[:4], "big"
            )
            cur = nbrs[h % len(nbrs)]
            rows.add((w, t, cur))
    return rows


def test_random_walks_match_simulator(tmp_path):
    from signal_collect_ray.algorithms.walks import random_walks

    rng = np.random.default_rng(7)
    n, m = 30, 120
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    exp = _sim_walks(src, dst, walk_len=5, seed=9, start_mod=3)
    for P in (2, 4):  # determinism across partitioning
        g = Graph.from_edge_arrays(
            src, dst, str(tmp_path / f"gw{P}"), num_partitions=P
        )
        df = random_walks(g, walk_len=5, seed=9, start_mod=3).to_pandas()
        got = set(zip(df["walk_id"], df["step"], df["vid"]))
        assert got == exp


def test_random_walks_sink_stops(tmp_path):
    from signal_collect_ray.algorithms.walks import random_walks

    # 0 -> 1 -> 2 (sink): the walk from 0 emits exactly steps 0..2
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "gs"), num_partitions=2)
    df = random_walks(g, walk_len=8, seed=1, start_mod=1).to_pandas()
    rows = sorted(zip(df["walk_id"], df["step"], df["vid"]))
    assert rows == [(0, 0, 0), (0, 1, 1), (0, 2, 2), (1, 0, 1), (1, 1, 2)]
