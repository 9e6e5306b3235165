"""node2vec biased walks (algorithms/walks.py node2vec_walks) vs an
independent sequential simulator implementing the identical md5 draw
sequence and Grover-Leskovec weights with rejection sampling."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

from signal_collect_ray.graph import Graph


def _h32(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big")


def _simulate(adj, starts, walk_len, p, q, seed, max_attempts=64):
    """adj: vid -> sorted list of out-neighbors (deduped)."""
    traces = []
    for w in starts:
        path = [w]
        # step 1: uniform
        nbrs = adj.get(w)
        if not nbrs:
            traces.extend((w, i, v) for i, v in enumerate(path))
            continue
        cur = nbrs[_h32(f"{seed}:{w}:1") % len(nbrs)]
        prev = w
        path.append(cur)
        for t in range(2, walk_len + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            big_q = max(1.0 / p, 1.0, 1.0 / q)
            nxt = None
            for a in range(max_attempts + 1):
                prop = nbrs[_h32(f"{seed}:{w}:{t}:{a}") % len(nbrs)]
                if prop == prev:
                    wt = 1.0 / p
                elif prop in adj.get(prev, ()):
                    wt = 1.0
                else:
                    wt = 1.0 / q
                if a == max_attempts:
                    nxt = prop
                    break
                u = _h32(f"{seed}:{w}:{t}:{a}:acc") / 4294967296.0
                if u < wt / big_q:
                    nxt = prop
                    break
            prev, cur = cur, nxt
            path.append(cur)
        traces.extend((w, i, v) for i, v in enumerate(path))
    return sorted(traces)


def _build(edges, tmp_path, P=4):
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
        }
    )
    return Graph.build(
        rd.from_arrow(t), str(tmp_path / "g"), num_partitions=P, dedup=True
    )


def test_node2vec_matches_simulator(tmp_path):
    from signal_collect_ray.algorithms.walks import node2vec_walks

    rng = np.random.default_rng(17)
    n_v, n_e = 40, 240
    edges = sorted(
        {
            (int(a), int(b))
            for a, b in zip(
                rng.integers(0, n_v, n_e), rng.integers(0, n_v, n_e)
            )
            if a != b
        }
    )
    adj = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for v in adj:
        adj[v] = sorted(set(adj[v]))

    g = _build(edges, tmp_path)
    ds = node2vec_walks(g, walk_len=6, p=0.25, q=4.0, seed=7, start_mod=5)
    got = sorted(
        (r["walk_id"], r["step"], r["vid"]) for r in ds.take_all()
    )
    starts = sorted({a for a, _ in edges} | {b for _, b in edges})
    starts = [v for v in starts if v % 5 == 0 and v in adj]
    # engine seeds walks from SOURCE vertices only (vids with out-edges)
    want = _simulate(adj, starts, 6, 0.25, 4.0, 7)
    assert got == want
    # the bias must actually bite: some step-2+ rows exist
    assert any(s >= 2 for _, s, _ in got)


def test_node2vec_uniform_p1_q1(tmp_path):
    """p=q=1 accepts every proposal on the first attempt."""
    from signal_collect_ray.algorithms.walks import node2vec_walks

    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2)]
    adj = {0: [1, 2], 1: [2], 2: [3], 3: [0]}
    g = _build(edges, tmp_path)
    ds = node2vec_walks(g, walk_len=5, p=1.0, q=1.0, seed=3, start_mod=1)
    got = sorted((r["walk_id"], r["step"], r["vid"]) for r in ds.take_all())
    want = _simulate(adj, [0, 1, 2, 3], 5, 1.0, 1.0, 3)
    assert got == want
