"""Chinese Whispers label propagation — cluster-partition comparison
(tie-break is deterministic here, unlike the reference; SURVEY §7.4.2)."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import ChineseWhispers

from tests import fixtures as fx


def _clusters(vids, labels):
    groups = {}
    for v, l in zip(vids, labels):
        groups.setdefault(l, set()).add(v)
    return sorted(frozenset(g) for g in groups.values())


def test_two_clusters_partition(tmp_path):
    # ChineseWhispersClustering.scala:60-101 — cliques {0,1,2} and
    # {8,9,10} joined by chain 2-3-…-8: members of each clique must end
    # in one cluster together.
    src, dst = fx.two_clusters()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    eng = SuperstepEngine(EngineConfig(num_partitions=4, max_supersteps=30))
    info = eng.run(g, ChineseWhispers(), run_dir=str(tmp_path / "r"), resume=False)
    t = info.state_table()
    lab = dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))
    assert lab[0] == lab[1] == lab[2]
    assert lab[8] == lab[9] == lab[10]
    assert lab[0] != lab[8]


def test_determinism_across_P(tmp_path):
    src, dst = fx.two_clusters()
    results = {}
    for P in (1, 2, 8):
        g = Graph.from_edge_arrays(src, dst, str(tmp_path / f"g{P}"), num_partitions=P)
        eng = SuperstepEngine(EngineConfig(num_partitions=P, max_supersteps=30))
        info = eng.run(g, ChineseWhispers(), run_dir=str(tmp_path / f"r{P}"), resume=False)
        results[P] = info.state_table().column("state").to_pylist()
    assert results[1] == results[2] == results[8]


def test_clique_collapses_to_min_label(tmp_path):
    # complete graph K4 — all vertices adopt one label; deterministic
    # tie-break (max weight then MIN label) picks 0.
    n = 4
    src, dst = [], []
    for a in range(n):
        for b in range(n):
            if a != b:
                src.append(a)
                dst.append(b)
    g = Graph.from_edge_arrays(
        np.array(src, dtype=np.int64), np.array(dst, dtype=np.int64),
        str(tmp_path / "g"), num_partitions=2,
    )
    eng = SuperstepEngine(EngineConfig(num_partitions=2, max_supersteps=20))
    info = eng.run(g, ChineseWhispers(), run_dir=str(tmp_path / "r"), resume=False)
    labels = set(info.state_table().column("state").to_pylist())
    assert labels == {0}


def test_seeded_labelprop_clamps_and_majority(tmp_path):
    """Planted path 0-7-14 plus a fan: seeds 0,7,14 (labels 0,2,4);
    vertex 1 neighbors {0, 7, 14} -> 3-way count tie -> min label 0;
    vertex 2 neighbors {7,3} -> label 2; vertex 3 picks 2's label up in
    round 2; seeds never move."""
    from signal_collect_ray.algorithms import SeededLabelProp

    edges = [(0, 1), (7, 1), (14, 1), (7, 2), (3, 2)]
    sym = edges + [(b, a) for a, b in edges]
    src = np.array([a for a, _ in sym], dtype=np.int64)
    dst = np.array([b for _, b in sym], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    eng = SuperstepEngine(EngineConfig(num_partitions=2, max_supersteps=3))
    info = eng.run(
        g, SeededLabelProp(), run_dir=str(tmp_path / "r"), resume=False
    )
    t = info.state_table()
    got = dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))
    assert got[0] == 0 and got[7] == 2 and got[14] == 4  # clamped seeds
    assert got[1] == 0  # 3-way tie -> min label
    assert got[2] == 2  # majority over labeled neighbors only
    assert got[3] == 2  # round 2: picks up 2's label via symmetry
