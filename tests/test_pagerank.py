"""PageRank conformance — the reference's own test expectations
(IntegrationSpec.scala:110-164, ComputationTerminationSpec.scala:79-97)
plus allclose-1e-6 against an independent dense oracle and
determinism across partition counts (FIXTURES.md)."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import PageRank
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _run_pr(tmp_path, src, dst, P=4, eps=1e-8, max_supersteps=400, **kw):
    """Convergence-length runs go through the resident executor (the
    throughput path); per-step equality of the durable Ray Data executor
    with this one is pinned by test_resident.py, and its short anchors
    below run on it directly."""
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / f"g{P}"), num_partitions=P)
    eng = ResidentEngine(
        EngineConfig(num_partitions=P, eps=eps, max_supersteps=max_supersteps),
        num_workers=2,
    )
    info = eng.run(g, PageRank(), run_dir=str(tmp_path / f"run{P}"), resume=False, **kw)
    t = info.state_table()
    return info, t.column("vid").to_numpy(), t.column("state").to_numpy()


def _run_pr_durable(tmp_path, src, dst, P=4, eps=1e-8, max_supersteps=400, **kw):
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / f"gd{P}"), num_partitions=P)
    eng = SuperstepEngine(EngineConfig(num_partitions=P, eps=eps, max_supersteps=max_supersteps))
    info = eng.run(g, PageRank(), run_dir=str(tmp_path / f"rund{P}"), resume=False, **kw)
    t = info.state_table()
    return info, t.column("vid").to_numpy(), t.column("state").to_numpy()


def test_cycle5_all_ranks_one(tmp_path):
    # IntegrationSpec.scala:110-122 — 5-cycle: every rank → 1.0
    src, dst = fx.cycle(5)
    info, vid, r = _run_pr(tmp_path, src, dst)
    assert info.converged
    assert np.allclose(r, 1.0, atol=1e-6)


def test_star5_center_and_leaves(tmp_path):
    # IntegrationSpec.scala:124-136 — star: center 0.66, leaves 0.15
    src, dst = fx.star5()
    info, vid, r = _run_pr(tmp_path, src, dst)
    vals = dict(zip(vid, r))
    assert abs(vals[4] - 0.66) < 1e-5
    for leaf in range(4):
        assert abs(vals[leaf] - 0.15) < 1e-5


def test_grid2x2_all_one(tmp_path):
    src, dst = fx.grid(2, 2)
    info, vid, r = _run_pr(tmp_path, src, dst)
    assert np.allclose(r, 1.0, atol=1e-6)


def test_torus5x5_all_one(tmp_path):
    # IntegrationSpec.scala:152-164
    src, dst = fx.torus(5, 5)
    info, vid, r = _run_pr(tmp_path, src, dst)
    assert np.allclose(r, 1.0, atol=1e-6)


def test_cycle1000_one_superstep_anchor(tmp_path):
    # ComputationTerminationSpec.scala:79-97 — exactly one synchronous
    # step on a 1000-cycle with threshold 0 gives state 0.2775.
    # Runs on the durable Ray Data executor (cheap: 1 superstep).
    src, dst = fx.cycle(1000)
    info, vid, r = _run_pr_durable(tmp_path, src, dst, max_supersteps=1)
    assert info.supersteps == 1
    assert np.allclose(r, 0.2775, atol=1e-12)


def test_oracle_allclose_on_irregular_graph(tmp_path):
    # deterministic irregular directed graph incl. dangling vertices
    rng = np.random.RandomState(42)
    n = 120
    src = rng.randint(0, n, 600).astype(np.int64)
    dst = rng.randint(0, n, 600).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    info, vid, r = _run_pr(tmp_path, src, dst, P=4)
    ovid, orank = fx.pagerank_oracle(src, dst)
    assert (vid == ovid).all()
    assert np.allclose(r, orank, atol=1e-6)


def test_disconnected_components_converge(tmp_path):
    src, dst = fx.disconnected()
    info, vid, r = _run_pr(tmp_path, src, dst)
    ovid, orank = fx.pagerank_oracle(src, dst)
    assert np.allclose(r, orank, atol=1e-6)


def test_determinism_across_partition_counts(tmp_path):
    # durable executor: identical bits regardless of partition count P
    src, dst = fx.torus(4, 4)
    results = {}
    for P in (1, 2, 8):
        _, vid, r = _run_pr_durable(tmp_path, src, dst, P=P, max_supersteps=10)
        results[P] = (vid, r)
    v1, r1 = results[1]
    for P in (2, 8):
        v, r = results[P]
        assert (v == v1).all()
        assert np.allclose(r, r1, rtol=0, atol=1e-12)


def test_weighted_pagerank_matches_oracle(tmp_path):
    # company-valuation-style weighted fixpoint (CompanyValuation.scala:25-33)
    src = np.array([0, 0, 1, 2, 3, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 3, 0, 1], dtype=np.int64)
    w = np.array([2.0, 1.0, 4.0, 1.0, 1.0, 3.0])
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "gw"), weight=w, num_partitions=2)
    eng = ResidentEngine(EngineConfig(num_partitions=2, eps=1e-9), num_workers=2)
    info = eng.run(g, PageRank(), run_dir=str(tmp_path / "runw"), resume=False)
    t = info.state_table()
    ovid, orank = fx.pagerank_oracle(src, dst, weight=w)
    assert np.allclose(t.column("state").to_numpy(), orank, atol=1e-6)


def test_personalized_pagerank_matches_oracle(tmp_path):
    from signal_collect_ray.algorithms import PersonalizedPageRank

    rng = np.random.RandomState(7)
    n = 100
    src = rng.randint(0, n, 500).astype(np.int64)
    dst = rng.randint(0, n, 500).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    sources = (3, 58)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=1e-9, max_supersteps=500),
        num_workers=2,
    )
    info = eng.run(
        g, PersonalizedPageRank(sources), run_dir=str(tmp_path / "run"),
        resume=False,
    )
    t = info.state_table()
    vid = t.column("vid").to_numpy()
    r = t.column("state").to_numpy()
    ovid, orank = fx.ppr_oracle(src, dst, sources)
    assert (vid == ovid).all()
    assert np.allclose(r, orank, atol=1e-6)
    # teleport mass confined to the seed neighborhood: unreachable
    # vertices stay exactly 0
    reach = {int(s) for s in sources if s in set(vid)}
    frontier = list(reach)
    adj = {}
    for s, d in zip(src, dst):
        adj.setdefault(int(s), []).append(int(d))
    while frontier:
        u = frontier.pop()
        for v in adj.get(u, []):
            if v not in reach:
                reach.add(v)
                frontier.append(v)
    unreachable = np.array([int(v) not in reach for v in vid])
    assert np.all(r[unreachable] == 0.0)
