"""Asynchronous-mode equivalence — the IntegrationSpec contract
(reference ``IntegrationSpec.scala:44-68`` runs every algorithm under
both Synchronous and OptimizedAsynchronous and requires the same
answers). Fold-style algorithms (delta PageRank, SSSP, CC,
TokenDiffusion) must reach the synchronous fixpoint under chaotic
async scheduling; snapshot algorithms must be refused."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph
from signal_collect_ray.algorithms import (
    ChineseWhispers,
    ConnectedComponents,
    PageRank,
    SSSP,
    TokenDiffusion,
)
from signal_collect_ray.engine_async import AsyncEngine
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _rand_graph(tmp_path, tag, n=300, m=1500, seed=5, sym=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / f"g{tag}"), num_partitions=4, symmetric=sym
    )
    return g


def _states(info):
    t = info.state_table()
    return (
        np.asarray(t.column("vid").to_pylist()),
        np.asarray(t.column("state").to_pylist()),
    )


def _sync(tmp_path, g, algo, tag, eps=1e-6, threshold=0.0, steps=200):
    eng = ResidentEngine(
        EngineConfig(
            num_partitions=4, eps=eps, max_supersteps=steps,
            signal_threshold=threshold,
        ),
        num_workers=2,
    )
    return eng.run(g, algo, run_dir=str(tmp_path / f"rs{tag}"), resume=False)


def _async(tmp_path, g, algo, tag, threshold=0.0):
    eng = AsyncEngine(
        EngineConfig(num_partitions=4, signal_threshold=threshold),
        num_workers=3,
    )
    return eng.run(g, algo, run_dir=str(tmp_path / f"ra{tag}"))


def test_async_cc_matches_sync(tmp_path):
    g = _rand_graph(tmp_path, "cc", sym=True)
    vs, ss = _states(_sync(tmp_path, g, ConnectedComponents(), "cc"))
    va, sa = _states(_async(tmp_path, g, ConnectedComponents(), "cc"))
    info_a = None
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)


def test_async_sssp_matches_sync_and_oracle(tmp_path):
    g = _rand_graph(tmp_path, "sp", seed=9)
    info_a = _async(tmp_path, g, SSSP(0), "sp")
    assert info_a.converged
    vs, ss = _states(_sync(tmp_path, g, SSSP(0), "sp"))
    va, sa = _states(info_a)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)


def test_async_pagerank_reaches_sync_fixpoint(tmp_path):
    g = _rand_graph(tmp_path, "pr", seed=13)
    info_a = _async(tmp_path, g, PageRank(), "pr", threshold=1e-9)
    assert info_a.converged
    va, sa = _states(info_a)
    # independent oracle: dense power iteration of the reference formula
    e = g.edges_ds().to_pandas()
    vids, want = fx.pagerank_oracle(e["src"].values, e["dst"].values)
    np.testing.assert_array_equal(va, vids)
    np.testing.assert_allclose(sa, want, atol=1e-6)


def test_async_token_diffusion_conserves_and_matches(tmp_path):
    # DAG diamond: async must pool all mass at the sink like sync
    src = np.array([0, 0, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 3, 3], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "gtok"), num_partitions=2)
    info = AsyncEngine(EngineConfig(num_partitions=2), num_workers=2).run(
        g, TokenDiffusion(0), run_dir=str(tmp_path / "rtok")
    )
    assert info.converged
    va, sa = _states(info)
    out = dict(zip(va.tolist(), sa.tolist()))
    assert out == {0: 0.0, 1: 0.0, 2: 0.0, 3: 1.0}


def test_async_refuses_snapshot_algorithms(tmp_path):
    g = _rand_graph(tmp_path, "cw", sym=True)
    with pytest.raises(NotImplementedError):
        AsyncEngine(EngineConfig(num_partitions=4), num_workers=2).run(
            g, ChineseWhispers(), run_dir=str(tmp_path / "rcw")
        )


def _rand_weighted_graph(tmp_path, tag, n=60, m=400, seed=17, wlo=1, whi=50):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.integers(wlo, whi, m).astype(np.float64)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    g = Graph.build(
        rd.from_arrow(pa.table({"src": src, "dst": dst, "weight": w})),
        str(tmp_path / f"g{tag}"),
        num_partitions=4,
    )
    return g, int(src[0])


def test_async_widest_path_matches_sync(tmp_path):
    """(max, min) semiring is monotone ⇒ order-free: the async engine
    must reach the sync fixpoint exactly."""
    from signal_collect_ray.algorithms import WidestPath

    g, s0 = _rand_weighted_graph(tmp_path, "wp")
    info_a = _async(tmp_path, g, WidestPath(s0), "wp")
    assert info_a.converged
    vs, ss = _states(_sync(tmp_path, g, WidestPath(s0), "wp", eps=1e-12))
    va, sa = _states(info_a)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)


def test_async_earliest_arrival_matches_sync(tmp_path):
    """Temporal earliest-arrival min-fold is monotone ⇒ async equals
    the sync fixpoint bit-for-bit."""
    from signal_collect_ray.algorithms import EarliestArrival

    g, s0 = _rand_weighted_graph(
        tmp_path, "ea", wlo=10, whi=1000, seed=29
    )
    info_a = _async(tmp_path, g, EarliestArrival(s0, t0=0.0), "ea")
    assert info_a.converged
    vs, ss = _states(
        _sync(tmp_path, g, EarliestArrival(s0, t0=0.0), "ea", eps=1e-12)
    )
    va, sa = _states(info_a)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)
