"""Maximal matching (algorithms/matching.py): validity + maximality on
random symmetric graphs, exact result on the forced disjoint-edge
fixture, and partition-count determinism (the mix64-handshake result
must be a pure function of the graph)."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms.matching import MaximalMatching


def _run(src, dst, tmp_path, P=4, tag=""):
    sym_s = np.concatenate([src, dst]).astype(np.int64)
    sym_d = np.concatenate([dst, src]).astype(np.int64)
    g = Graph.from_edge_arrays(
        sym_s, sym_d, str(tmp_path / f"g{tag}{P}"), num_partitions=P
    )
    eng = SuperstepEngine(
        EngineConfig(num_partitions=P, eps=1e-6, max_supersteps=300)
    )
    info = eng.run(
        g, MaximalMatching(), run_dir=str(tmp_path / f"r{tag}{P}"), resume=False
    )
    t = info.state_table()
    vid = np.array(t.column("vid").to_pylist(), np.int64)
    st = np.array(t.column("state").to_pylist(), np.int64)
    order = np.argsort(vid)
    return vid[order], st[order], sym_s, sym_d


def _assert_valid_maximal(vid, st, src, dst):
    assert (st >= -1).all(), "undecided vertices remain"
    pos = {int(v): i for i, v in enumerate(vid)}
    # partner symmetry + edge-backed
    eset = set(zip(src.tolist(), dst.tolist()))
    for v, s in zip(vid, st):
        if s >= 0:
            assert st[pos[int(s)]] == v, "partner pointers not symmetric"
            assert (int(v), int(s)) in eset, "matched pair is not an edge"
    # maximality: no edge with both endpoints unmatched
    for a, b in eset:
        assert not (st[pos[a]] == -1 and st[pos[b]] == -1), (a, b)


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_matching_valid_and_maximal_random(tmp_path, seed):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, 60, 400).astype(np.int64)
    dst = rng.randint(0, 60, 400).astype(np.int64)
    keep = src != dst
    vid, st, s, d = _run(src[keep], dst[keep], tmp_path, tag=f"s{seed}")
    _assert_valid_maximal(vid, st, s, d)
    assert (st >= 0).sum() >= 2  # something actually matched


def test_matching_deterministic_across_P(tmp_path):
    rng = np.random.RandomState(5)
    src = rng.randint(0, 40, 250).astype(np.int64)
    dst = rng.randint(0, 40, 250).astype(np.int64)
    keep = src != dst
    results = {}
    for P in (1, 3, 8):
        vid, st, _, _ = _run(src[keep], dst[keep], tmp_path, P=P, tag="d")
        results[P] = (vid.tolist(), st.tolist())
    assert results[1] == results[3] == results[8]


def test_matching_disjoint_edges_forced(tmp_path):
    # isolated edges leave no choice: every pair must match
    k = np.arange(0, 30, 2, dtype=np.int64)
    vid, st, s, d = _run(k, k + 1, tmp_path, tag="f")
    assert (st == (vid ^ 1)).all()


def test_matching_star_exactly_one_pair(tmp_path):
    # star: center matches exactly one leaf, the rest retire
    leaves = np.arange(1, 12, dtype=np.int64)
    src = np.zeros(len(leaves), np.int64)
    vid, st, s, d = _run(src, leaves, tmp_path, tag="st")
    _assert_valid_maximal(vid, st, s, d)
    assert (st >= 0).sum() == 2
    assert st[0] >= 1  # the center is matched
