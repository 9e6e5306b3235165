"""AbsorptionProb — k-step absorbing-walk hit probability semantics on
a planted directed graph, plus the reversed-weighted-graph build."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import AbsorptionProb


def _run(edges, k, tmp_path, seed_mod=17):
    # build the REVERSED graph with weight 1/outdeg(original src),
    # exactly as pipelines.queries._graph_absorb does
    src = np.array([a for a, _ in edges], dtype=np.int64)
    dst = np.array([b for _, b in edges], dtype=np.int64)
    outd = {v: int((src == v).sum()) for v in set(src)}
    w = np.array([1.0 / outd[a] for a, _ in edges])
    g = Graph.from_edge_arrays(
        dst, src, str(tmp_path / f"g{k}"), num_partitions=2, weight=w
    )
    eng = SuperstepEngine(EngineConfig(num_partitions=2, max_supersteps=k))
    info = eng.run(
        g, AbsorptionProb(seed_mod), run_dir=str(tmp_path / f"r{k}"),
        resume=False,
    )
    t = info.state_table()
    return dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))


def test_absorption_planted(tmp_path):
    # 17 absorbs; 1 -> {17, 3}; 2 -> {1, 5}; 3 -> {2}; 5 is a sink.
    # h1(1)=1/2; h2(2)=(h1(1)+h1(5))/2=1/4; h3(3)=h2(2)=1/4;
    # h3(1)=(1+h2(3))/2=1/2 (h(3) still 0 at round 2).
    edges = [(1, 17), (1, 3), (2, 1), (2, 5), (3, 2)]
    got = _run(edges, 3, tmp_path)
    assert got[17] == 1.0
    assert abs(got[1] - 0.5) < 1e-12
    assert abs(got[2] - 0.25) < 1e-12
    assert abs(got[3] - 0.25) < 1e-12
    assert got[5] == 0.0


def test_absorption_dangling_resets(tmp_path):
    # 5 is a sink (no out-edges): its probability is 0 every round even
    # after receiving nothing; 4 -> 5 contributes nothing back.
    edges = [(4, 5), (4, 17)]
    got = _run(edges, 4, tmp_path)
    assert got[5] == 0.0
    assert abs(got[4] - 0.5) < 1e-12
