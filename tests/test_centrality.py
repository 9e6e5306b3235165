"""Katz and eigenvector centrality conformance vs independent numpy
oracles (dense matrix recurrences), both executors, fixture topologies
(FIXTURES.md §3)."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import EigenvectorCentrality, KatzCentrality
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx

ALPHA, BETA = 0.05, 0.15


def _katz_numpy(src, dst, n, k):
    x = np.full(n, BETA)
    for _ in range(k):
        nx = np.zeros(n)
        np.add.at(nx, dst, x[src])
        x = BETA + ALPHA * nx
    return x


def _eig_numpy(src, dst, n, k):
    x = np.ones(n)
    for _ in range(k):
        nx = np.zeros(n)
        np.add.at(nx, dst, x[src])
        x = nx
    return x


def _run(engine_cls, algo, src, dst, tmp_path, k, P=4, tag=""):
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / f"g{tag}"), num_partitions=P
    )
    cfg = EngineConfig(num_partitions=P, max_supersteps=k, eps=0.0)
    info = engine_cls(cfg).run(
        g, algo, run_dir=str(tmp_path / f"r{tag}"), resume=False
    )
    t = info.state_table()
    vid = t.column("vid").to_numpy(zero_copy_only=False)
    order = np.argsort(vid)
    return vid[order], t.column("state").to_numpy(zero_copy_only=False)[order]


@pytest.mark.parametrize("engine_cls", [SuperstepEngine, ResidentEngine])
def test_katz_star(engine_cls, tmp_path):
    # leaves -> center: center accumulates 4 leaf contributions per step
    src, dst = fx.star5()
    vid, got = _run(engine_cls, KatzCentrality(ALPHA, BETA), src, dst, tmp_path, k=3)
    want = _katz_numpy(src, dst, 5, 3)
    np.testing.assert_allclose(got, want[vid], rtol=1e-12)
    assert got[4] > got[0]  # center strictly more central than a leaf


@pytest.mark.parametrize("engine_cls", [SuperstepEngine, ResidentEngine])
def test_katz_random_digraph(engine_cls, tmp_path):
    rng = np.random.default_rng(11)
    n, m = 60, 400
    e = np.unique(rng.integers(0, n, size=(m, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    src, dst = e[:, 0].astype(np.int64), e[:, 1].astype(np.int64)
    for k in (1, 4):
        vid, got = _run(
            engine_cls, KatzCentrality(ALPHA, BETA), src, dst, tmp_path,
            k=k, tag=f"k{k}",
        )
        np.testing.assert_allclose(got, _katz_numpy(src, dst, n, k)[vid], rtol=1e-9)


@pytest.mark.parametrize("engine_cls", [SuperstepEngine, ResidentEngine])
def test_eigenvector_random_digraph(engine_cls, tmp_path):
    rng = np.random.default_rng(13)
    n, m = 60, 400
    e = np.unique(rng.integers(0, n, size=(m, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    src, dst = e[:, 0].astype(np.int64), e[:, 1].astype(np.int64)
    for k in (1, 4):
        vid, got = _run(
            engine_cls, EigenvectorCentrality(), src, dst, tmp_path,
            k=k, tag=f"k{k}",
        )
        np.testing.assert_allclose(got, _eig_numpy(src, dst, n, k)[vid], rtol=1e-9)


def test_eigenvector_converges_to_principal(tmp_path):
    # On a strongly-connected cycle-with-chords graph, many normalized
    # power steps approach the principal eigenvector of A^T.
    src, dst = fx.cycle(12)
    src = np.concatenate([src, np.arange(0, 12, 3, dtype=np.int64)])
    dst = np.concatenate([dst, (np.arange(0, 12, 3, dtype=np.int64) + 5) % 12])
    vid, got = _run(ResidentEngine, EigenvectorCentrality(), src, dst, tmp_path, k=60)
    got = got / np.linalg.norm(got)
    A = np.zeros((12, 12))
    A[src, dst] = 1.0
    w, V = np.linalg.eig(A.T)
    top = np.abs(V[:, np.argmax(np.abs(w))].real)
    top = top / np.linalg.norm(top)
    np.testing.assert_allclose(got, top[vid], atol=1e-6)


def test_katz_partition_invariance(tmp_path):
    src, dst = fx.grid(5, 4)
    results = []
    for P in (1, 3, 8):
        _, got = _run(
            ResidentEngine, KatzCentrality(ALPHA, BETA), src, dst, tmp_path,
            k=4, P=P, tag=f"p{P}",
        )
        results.append(got)
    for got in results[1:]:
        np.testing.assert_allclose(got, results[0], rtol=1e-12)
