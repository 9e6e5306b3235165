"""Boruvka minimum spanning forest (algorithms/mst.py) vs a union-find
Kruskal oracle under the same (weight, u, v) edge total order."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from signal_collect_ray.algorithms.mst import minimum_spanning_forest


def _kruskal(edges):
    """edges: iterable of (u, v, w) — returns the unique MSF under the
    (w, u, v) total order as a set of (u, v, w)."""
    # canonicalize: min endpoint first, parallel edges keep min weight
    best = {}
    for u, v, w in edges:
        if u == v:
            continue
        a, b = (u, v) if u < v else (v, u)
        if (a, b) not in best or w < best[(a, b)]:
            best[(a, b)] = w
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _run(edges, tmp_path, num_partitions=4):
    t = pa.table(
        {
            "src": pa.array([e[0] for e in edges], pa.int64()),
            "dst": pa.array([e[1] for e in edges], pa.int64()),
            "weight": pa.array([float(e[2]) for e in edges], pa.float64()),
        }
    )
    ds = minimum_spanning_forest(
        rd.from_arrow(t).repartition(3),
        str(tmp_path),
        num_partitions=num_partitions,
    )
    rows = ds.take_all()
    out = {(r["u"], r["v"], r["weight"]) for r in rows}
    # the forest is an edge SET — duplicate rows (the pre-pointer-doubling
    # under-contraction bug: a partially merged component re-picks an
    # already-selected tree edge next round) are a failure even when the
    # set compare would mask them
    assert len(rows) == len(out), "duplicate forest rows"
    return out


def test_mst_hand_triangle(tmp_path):
    # triangle 0-1 (1), 1-2 (2), 0-2 (3) → forest drops the heaviest
    got = _run([(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0)], tmp_path)
    assert got == {(0, 1, 1.0), (1, 2, 2.0)}


def test_mst_disconnected_with_ties_and_parallels(tmp_path):
    edges = [
        # component A: 4-cycle with ALL-EQUAL weights → (w,u,v) order
        (0, 1, 5.0), (1, 2, 5.0), (2, 3, 5.0), (3, 0, 5.0),
        # parallel edge + self loop noise
        (0, 1, 9.0), (2, 2, 1.0),
        # component B: a pair
        (10, 11, 1.0),
    ]
    got = _run(edges, tmp_path)
    assert got == _kruskal(edges)
    # 4-vertex cycle keeps 3 edges; pair keeps 1
    assert len(got) == 4


def test_mst_random_vs_kruskal(tmp_path):
    rng = np.random.default_rng(5)
    n_v, n_e = 60, 300
    edges = [
        (int(a), int(b), float(w))
        for a, b, w in zip(
            rng.integers(0, n_v, n_e),
            rng.integers(0, n_v, n_e),
            rng.integers(1, 8, n_e),  # few distinct weights → many ties
        )
    ]
    got = _run(edges, tmp_path, num_partitions=4)
    want = _kruskal(edges)
    assert got == want
    # spanning invariant: |forest| = |vertices touched| - |components|
    verts = {u for u, v, _ in edges if u != v} | {
        v for u, v, _ in edges if u != v
    }
    comps = {}

    def find(x):
        while comps.setdefault(x, x) != x:
            comps[x] = comps[comps[x]]
            x = comps[x]
        return x

    for u, v, _ in edges:
        if u != v:
            comps[find(u)] = find(v)
    n_comp = len({find(x) for x in verts})
    assert len(got) == len(verts) - n_comp


def test_mst_monotone_chain(tmp_path):
    # strictly increasing weights along a path: every vertex's min edge
    # points to its predecessor, so the round-1 merge graph is ONE
    # O(V)-long parent chain — the case where a superstep-capped
    # min-label CC under-contracts (duplicating forest rows) and
    # pointer doubling must converge in O(log V)
    m = 257
    edges = [(i, i + 1, float(i + 1)) for i in range(m - 1)]
    got = _run(edges, tmp_path)
    assert got == {(i, i + 1, float(i + 1)) for i in range(m - 1)}


def test_mst_join_fallback_matches_broadcast(tmp_path, monkeypatch):
    # cap=0 forces the co-partitioned hash-self-join doubling path;
    # result must be bit-identical to the broadcast-path Kruskal forest
    from signal_collect_ray.algorithms import mst as mst_mod

    rng = np.random.default_rng(11)
    edges = [
        (int(a), int(b), float(w))
        for a, b, w in zip(
            rng.integers(0, 30, 80),
            rng.integers(0, 30, 80),
            rng.integers(1, 6, 80),
        )
    ]
    monkeypatch.setattr(mst_mod, "_LABEL_BROADCAST_LIMIT", 0)
    got = _run(edges, tmp_path)
    assert got == _kruskal(edges)


def test_pair_cc_closure_long_chain(tmp_path):
    # a 97-hop duplicate chain: min-label CC needs ~97 supersteps, so a
    # 64-capped run silently under-converges and keeps extra
    # representatives — the raised runaway guard must close the whole
    # chain to ONE representative (the min id)
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.functions.dedup import duplicate_ids_from_pairs

    n = 98
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array(list(range(n - 1)), pa.int64()),
                "id_b": pa.array(list(range(1, n)), pa.int64()),
            }
        )
    )
    drops = {r["id"] for r in duplicate_ids_from_pairs(
        pairs, str(tmp_path)
    ).take_all()}
    assert drops == set(range(1, n))


def test_mst_huge_ids_beyond_float53(tmp_path):
    # ids above 2^53 are not float64-representable: the relabel's
    # null-mask must come from Arrow, not a float-NaN round trip
    base = 1 << 60
    edges = [
        (base, base + 1, 1.0),
        (base + 1, base + 2, 2.0),
        (base, base + 2, 3.0),
    ]
    got = _run(edges, tmp_path)
    assert got == {(base, base + 1, 1.0), (base + 1, base + 2, 2.0)}
