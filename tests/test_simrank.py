"""SimRank (algorithms/simrank.py): the distributed two-expansion
pipeline must equal a dense brute-force SimRank-2 with the identical
integer micro-unit quantization, on a random directed graph — and the
forced co-partitioned hash-join fallback (cap=0) must match the
broadcast path bit for bit."""

import numpy as np
import pyarrow as pa
import pytest

from signal_collect_ray.algorithms.simrank import simrank_top_pairs


def _brute_top(src, dst, k):
    V = int(max(src.max(), dst.max())) + 1
    A = np.zeros((V, V), bool)
    A[src, dst] = True  # A[u, a]: edge u -> a
    ind = A.sum(axis=0).astype(np.int64)
    # s1 micro-units
    n1 = np.zeros((V, V), np.int64)
    shared = A.T.astype(np.int64) @ A.astype(np.int64)  # |I(a) ∩ I(b)|
    for a in range(V):
        for b in range(V):
            if a != b and shared[a, b] > 0:
                n1[a, b] = np.floor(
                    750000.0 * shared[a, b] / (ind[a] * ind[b]) + 0.5
                ).astype(np.int64)
    has_out = A.any(axis=1)
    np.fill_diagonal(n1, 0)
    n1[np.diag_indices(V)] = np.where(has_out, 1_000_000, 0)
    rows = []
    for a in range(V):
        if ind[a] == 0:
            continue
        for b in range(a + 1, V):
            if ind[b] == 0:
                continue
            ia = np.flatnonzero(A[:, a])
            ib = np.flatnonzero(A[:, b])
            s = int(n1[np.ix_(ia, ib)].sum())
            val = np.floor(0.75 * s / (1e6 * ind[a] * ind[b]) * 1e6 + 0.5) / 1e6
            if s:
                rows.append((a, b, val))
    rows.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rows[:k]


@pytest.fixture(scope="module")
def graph_ds(ray_session):
    import ray.data as rd

    rng = np.random.RandomState(11)
    src = rng.randint(0, 25, 160).astype(np.int64)
    dst = rng.randint(0, 25, 160).astype(np.int64)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(pairs[:, 0], pa.int64()),
                "dst": pa.array(pairs[:, 1], pa.int64()),
            }
        )
    )
    return ds, pairs[:, 0], pairs[:, 1]


def test_simrank_equals_dense_bruteforce(graph_ds):
    ds, src, dst = graph_ds
    got = simrank_top_pairs(ds, k=15, num_partitions=4).to_pylist()
    want = _brute_top(src, dst, 15)
    assert [(r["id_a"], r["id_b"], r["simrank"]) for r in got] == want


def test_simrank_hash_join_fallback_identical(graph_ds):
    ds, _, _ = graph_ds
    a = simrank_top_pairs(ds, k=10, num_partitions=4)
    b = simrank_top_pairs(ds, k=10, num_partitions=4, lookup_cap_bytes=0)
    assert a.equals(b)
