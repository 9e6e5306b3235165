"""HITS (hubs & authorities) conformance vs an independent numpy
power-iteration oracle, on the signed-bidirected graph encoding
(algorithms/hits.py), under both executors."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import Hits
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _signed_double(src, dst):
    n = len(src)
    return (
        np.concatenate([src, dst]),
        np.concatenate([dst, src]),
        np.concatenate([np.ones(n), -np.ones(n)]),
    )


def _hits_numpy(src, dst, n, k):
    """Simultaneous-update HITS, unnormalized, k rounds."""
    hub, auth = np.ones(n), np.ones(n)
    for _ in range(k):
        nh, na = np.zeros(n), np.zeros(n)
        np.add.at(na, dst, hub[src])  # auth(v) = sum hub over in-links
        np.add.at(nh, src, auth[dst])  # hub(u) = sum auth over out-links
        hub, auth = nh, na
    return hub, auth


def _run(engine_cls, src, dst, tmp_path, k, P=4, tag=""):
    s2, d2, w = _signed_double(src, dst)
    g = Graph.from_edge_arrays(
        s2, d2, str(tmp_path / f"g{tag}"), weight=w, num_partitions=P
    )
    cfg = EngineConfig(num_partitions=P, max_supersteps=k, eps=0.0)
    eng = engine_cls(cfg)
    info = eng.run(g, Hits(), run_dir=str(tmp_path / f"r{tag}"), resume=False)
    t = info.state_table()
    vid = t.column("vid").to_numpy(zero_copy_only=False)
    order = np.argsort(vid)
    return (
        vid[order],
        t.column("state").to_numpy(zero_copy_only=False)[order],
        t.column("last").to_numpy(zero_copy_only=False)[order],
    )


@pytest.mark.parametrize("engine_cls", [SuperstepEngine, ResidentEngine])
def test_star_hits(engine_cls, tmp_path):
    # leaves 0..3 -> center 4: after any k>=1, center is the only
    # authority and leaves the only hubs
    src, dst = fx.star5()
    vid, hub, auth = _run(engine_cls, src, dst, tmp_path, k=3)
    eh, ea = _hits_numpy(src, dst, 5, 3)
    np.testing.assert_allclose(hub, eh[vid], rtol=1e-12)
    np.testing.assert_allclose(auth, ea[vid], rtol=1e-12)
    assert auth[4] > 0 and np.all(auth[:4] == 0)
    assert hub[4] == 0 and np.all(hub[:4] > 0)


@pytest.mark.parametrize("engine_cls", [SuperstepEngine, ResidentEngine])
def test_random_digraph_hits_matches_numpy(engine_cls, tmp_path):
    rng = np.random.default_rng(7)
    n, m = 60, 400
    e = np.unique(rng.integers(0, n, size=(m, 2)), axis=0)
    e = e[e[:, 0] != e[:, 1]]
    src, dst = e[:, 0].astype(np.int64), e[:, 1].astype(np.int64)
    for k in (1, 4):
        vid, hub, auth = _run(engine_cls, src, dst, tmp_path, k=k, tag=f"k{k}")
        eh, ea = _hits_numpy(src, dst, n, k)
        np.testing.assert_allclose(hub, eh[vid], rtol=1e-9)
        np.testing.assert_allclose(auth, ea[vid], rtol=1e-9)


def test_partition_invariance(tmp_path):
    src, dst = fx.grid(5, 4)
    results = []
    for P in (1, 3, 8):
        vid, hub, auth = _run(ResidentEngine, src, dst, tmp_path, k=4, P=P, tag=f"p{P}")
        results.append((hub, auth))
    for hub, auth in results[1:]:
        np.testing.assert_allclose(hub, results[0][0], rtol=1e-12)
        np.testing.assert_allclose(auth, results[0][1], rtol=1e-12)


def _salsa_numpy(src, dst, n, k):
    """Simultaneous-update SALSA, unnormalized, k rounds."""
    outd = np.bincount(src, minlength=n).astype(float)
    ind = np.bincount(dst, minlength=n).astype(float)
    hub, auth = np.ones(n), np.ones(n)
    for _ in range(k):
        nh, na = np.zeros(n), np.zeros(n)
        np.add.at(na, dst, hub[src] / outd[src])
        np.add.at(nh, src, auth[dst] / ind[dst])
        hub, auth = nh, na
    return hub, auth


def _run_salsa(engine_cls, src, dst, tmp_path, k, P=4, tag=""):
    from signal_collect_ray.algorithms import Salsa

    s2, d2, w = _signed_double(src, dst)
    g = Graph.from_edge_arrays(
        s2, d2, str(tmp_path / f"gs{tag}"), weight=w, num_partitions=P
    )
    cfg = EngineConfig(num_partitions=P, max_supersteps=k, eps=0.0)
    eng = engine_cls(cfg)
    info = eng.run(g, Salsa(), run_dir=str(tmp_path / f"rs{tag}"), resume=False)
    t = info.state_table()
    vid = t.column("vid").to_numpy(zero_copy_only=False)
    order = np.argsort(vid)
    return (
        vid[order],
        t.column("state").to_numpy(zero_copy_only=False)[order],
        t.column("last").to_numpy(zero_copy_only=False)[order],
    )


@pytest.mark.parametrize("engine_cls", [SuperstepEngine, ResidentEngine])
def test_star_salsa(engine_cls, tmp_path):
    src, dst = fx.star5()
    vid, hub, auth = _run_salsa(engine_cls, src, dst, tmp_path, k=3)
    eh, ea = _salsa_numpy(src, dst, 5, 3)
    np.testing.assert_allclose(hub, eh[vid], rtol=1e-12)
    np.testing.assert_allclose(auth, ea[vid], rtol=1e-12)


@pytest.mark.parametrize("engine_cls", [SuperstepEngine, ResidentEngine])
def test_random_salsa(engine_cls, tmp_path):
    rng = np.random.RandomState(5)
    n = 40
    src = rng.randint(0, n, 200).astype(np.int64)
    dst = rng.randint(0, n, 200).astype(np.int64)
    keep = src != dst
    # dedup (the engines build a deduplicated CSR)
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    vid, hub, auth = _run_salsa(engine_cls, src, dst, tmp_path, k=4)
    eh, ea = _salsa_numpy(src, dst, n, 4)
    np.testing.assert_allclose(hub, eh[vid], rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(auth, ea[vid], rtol=1e-9, atol=1e-12)
