"""4-clique count and local bridges vs itertools brute force on seeded
random graphs (algorithms/cliques.py bitset kernels)."""

from itertools import combinations

import numpy as np
import pyarrow as pa
import ray.data as rd

from signal_collect_ray.algorithms.cliques import (
    four_clique_count,
    local_bridges,
)


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table(
            {"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())}
        )
    )


def _random_graph(n, m, seed):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    keep = src != dst
    return src[keep], dst[keep]


def _undirected_set(src, dst):
    return {(min(a, b), max(a, b)) for a, b in zip(src.tolist(), dst.tolist())}


def test_four_cliques_match_bruteforce():
    for seed, n, m in [(1, 18, 80), (2, 25, 140), (3, 12, 60)]:
        src, dst = _random_graph(n, m, seed)
        ue = _undirected_set(src, dst)
        verts = sorted({v for e in ue for v in e})
        want = sum(
            1
            for q in combinations(verts, 4)
            if all(
                (min(a, b), max(a, b)) in ue for a, b in combinations(q, 2)
            )
        )
        got = four_clique_count(_edges_ds(src, dst), num_partitions=4)
        assert got == want, (seed, got, want)


def test_local_bridges_match_bruteforce():
    for seed, n, m in [(4, 20, 40), (5, 30, 45)]:
        src, dst = _random_graph(n, m, seed)
        ue = _undirected_set(src, dst)
        nbrs: dict = {}
        for a, b in ue:
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        want = sorted(
            (a, b) for a, b in ue if not (nbrs[a] & nbrs[b])
        )
        out = local_bridges(_edges_ds(src, dst), num_partitions=4)
        got = sorted(
            (r["a"], r["b"]) for r in out.take_all()
        )
        assert got == want, (seed, got, want)


def test_four_cliques_empty_and_k4():
    # no edges at all → self-loop-only input
    src = np.array([3, 7], dtype=np.int64)
    dst = np.array([3, 7], dtype=np.int64)
    assert four_clique_count(_edges_ds(src, dst)) == 0
    # K4 has exactly one 4-clique; K5 has five
    k4 = np.array(list(combinations(range(4), 2)), dtype=np.int64)
    assert four_clique_count(_edges_ds(k4[:, 0], k4[:, 1])) == 1
    k5 = np.array(list(combinations(range(5), 2)), dtype=np.int64)
    assert four_clique_count(_edges_ds(k5[:, 0], k5[:, 1])) == 5


def test_triad_census_matches_bruteforce():
    from signal_collect_ray.algorithms.cliques import triad_census

    for seed, n, m in [(7, 15, 60), (8, 25, 120)]:
        src, dst = _random_graph(n, m, seed)
        de = set(zip(src.tolist(), dst.tolist()))
        cyc = sum(
            1
            for a, b in de
            for c in range(n)
            if a < b and a < c and (b, c) in de and (c, a) in de
        )
        trans = sum(
            1
            for a, b in de
            for c in range(n)
            if (b, c) in de and (a, c) in de
        )
        got_cyc, got_trans = triad_census(_edges_ds(src, dst))
        assert (got_cyc, got_trans) == (cyc, trans), (seed,)
