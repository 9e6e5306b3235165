"""Vertex coloring conformance — the reference's IntegrationSpec coloring
corpus (IntegrationSpec.scala:166-194): symmetric 4-cycle / 5-star / grid,
assert a proper coloring (no neighbor conflict) at convergence."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph
from signal_collect_ray.algorithms import VertexColoring
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _run(tmp_path, src, dst, num_colors, P=4, tag=""):
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / f"g{tag}"), num_partitions=P)
    eng = ResidentEngine(
        EngineConfig(num_partitions=P, max_supersteps=100), num_workers=2
    )
    info = eng.run(
        g, VertexColoring(num_colors), run_dir=str(tmp_path / f"r{tag}"), resume=False
    )
    t = info.state_table()
    colors = dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))
    return info, colors


def _assert_proper(colors, src, dst, num_colors):
    for s, d in zip(src, dst):
        assert colors[int(s)] != colors[int(d)], (s, d, colors)
    assert all(0 <= c < num_colors for c in colors.values())


def test_sym_cycle4_two_colors(tmp_path):
    src, dst = fx.sym_cycle4()
    info, colors = _run(tmp_path, src, dst, 2)
    assert info.converged
    _assert_proper(colors, src, dst, 2)


def test_sym_star5_two_colors(tmp_path):
    src, dst = fx.sym_star5()
    info, colors = _run(tmp_path, src, dst, 2)
    assert info.converged
    _assert_proper(colors, src, dst, 2)


def test_grid_four_colors(tmp_path):
    s, d = fx.grid(3, 3)
    src = np.concatenate([s, d])
    dst = np.concatenate([d, s])
    info, colors = _run(tmp_path, src, dst, 4)
    assert info.converged
    _assert_proper(colors, src, dst, 4)


def test_determinism_across_P(tmp_path):
    src, dst = fx.sym_cycle4()
    runs = {}
    for P in (1, 2, 4):
        _, colors = _run(tmp_path, src, dst, 2, P=P, tag=str(P))
        runs[P] = colors
    assert runs[1] == runs[2] == runs[4]
