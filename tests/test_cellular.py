"""Game of Life / Schelling conformance — reference
``examples/GameOfLife.scala`` and ``examples/SchellingSegregation.scala``
on 8-neighborhood grids, checked against an independent numpy cellular
simulator (tests/fixtures.py) and classic still-life / oscillator
invariants. Proves the Algorithm surface covers agent simulation, not
just numeric fixpoints."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph
from signal_collect_ray.algorithms import GameOfLife, SchellingSegregation
from signal_collect_ray.engine import SuperstepEngine
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _run(tmp_path, algo, src, dst, steps, tag, resident=True, P=4):
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / f"g{tag}"), num_partitions=P)
    cfg = EngineConfig(num_partitions=P, max_supersteps=steps, eps=1e-9)
    eng = (
        ResidentEngine(cfg, num_workers=2) if resident else SuperstepEngine(cfg)
    )
    info = eng.run(g, algo, run_dir=str(tmp_path / f"r{tag}"), resume=False)
    t = info.state_table()
    return dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))


def _states(d, vids):
    return np.array([d[int(v)] for v in vids], dtype=np.int64)


def test_gol_block_still_life(tmp_path):
    # 2x2 block in a 4x4 grid: every live cell has 3 live neighbors → static
    src, dst = fx.grid8(4, 4)
    block = np.array([5, 6, 9, 10], dtype=np.int64)
    out = _run(tmp_path, GameOfLife(alive_vids=block), src, dst, 6, "block")
    alive = sorted(v for v, s in out.items() if s == 1)
    assert alive == [5, 6, 9, 10]


def test_gol_blinker_oscillates(tmp_path):
    # vertical blinker in a 5x5 grid flips to horizontal after one step
    src, dst = fx.grid8(5, 5)
    vertical = np.array([7, 12, 17], dtype=np.int64)
    out1 = _run(tmp_path, GameOfLife(alive_vids=vertical), src, dst, 1, "b1")
    assert sorted(v for v, s in out1.items() if s == 1) == [11, 12, 13]
    out2 = _run(tmp_path, GameOfLife(alive_vids=vertical), src, dst, 2, "b2")
    assert sorted(v for v, s in out2.items() if s == 1) == [7, 12, 17]


def test_gol_random_grid_matches_oracle_both_engines(tmp_path):
    rng = np.random.default_rng(7)
    w = h = 8
    src, dst = fx.grid8(w, h)
    state0 = (rng.random(w * h) < 0.4).astype(np.int64)
    alive = np.flatnonzero(state0).astype(np.int64)
    vids, want = fx.cellular_oracle(src, dst, state0, fx.gol_rule, 5)
    for resident in (True, False):
        out = _run(
            tmp_path, GameOfLife(alive_vids=alive), src, dst, 5,
            f"rand{resident}", resident=resident,
        )
        got = _states(out, vids)
        np.testing.assert_array_equal(got, want)


def test_schelling_checkerboard_content(tmp_path):
    # checkerboard at threshold 0.45: every interior cell sees 4/8 equal
    # (diagonals), borders ≥ 1/3 — all content, fixed point after step 1? No:
    # corner cells see 1/3 equal = 0.33 < 0.45 → they flip. Use 0.3 so ALL
    # cells are content and the configuration is static.
    w = h = 6
    src, dst = fx.grid8(w, h)
    board = np.array(
        [(x + y) % 2 for y in range(h) for x in range(w)], dtype=np.int64
    )
    alive = np.flatnonzero(board).astype(np.int64)
    out = _run(
        tmp_path, SchellingSegregation(0.3, alive_vids=alive), src, dst, 5, "cb"
    )
    got = np.array([out[v] for v in range(w * h)], dtype=np.int64)
    np.testing.assert_array_equal(got, board)


def test_schelling_random_grid_matches_oracle(tmp_path):
    rng = np.random.default_rng(11)
    w = h = 8
    src, dst = fx.grid8(w, h)
    state0 = (rng.random(w * h) < 0.5).astype(np.int64)
    alive = np.flatnonzero(state0).astype(np.int64)
    vids, want = fx.cellular_oracle(
        src, dst, state0, fx.schelling_rule(0.45), 4
    )
    out = _run(
        tmp_path, SchellingSegregation(0.45, alive_vids=alive), src, dst, 4, "rs"
    )
    got = _states(out, vids)
    np.testing.assert_array_equal(got, want)


def test_sudoku_constraint_propagation(tmp_path):
    """Sudoku conformance (reference examples/Sudoku.scala:33-62):
    naked-singles propagation on an 81-cell peer graph solves a puzzle
    whose solution is recoverable by singles, on both executors."""
    from signal_collect_ray.algorithms.sudoku import Sudoku, sudoku_edges

    sol = np.array(
        [(i * 3 + i // 3 + j) % 9 + 1 for i in range(9) for j in range(9)],
        dtype=np.int64,
    )
    rng = np.random.default_rng(0)
    removed = set(rng.choice(81, 35, replace=False).tolist())
    givens = {c: int(sol[c]) for c in range(81) if c not in removed}

    src, dst = sudoku_edges()
    for resident in (True, False):
        out = _run(
            tmp_path, Sudoku(givens), src, dst, 30, f"sud{resident}",
            resident=resident,
        )
        digits = {v: int(np.log2(m)) for v, m in out.items()}
        assert all(
            bin(int(m)).count("1") == 1 for m in out.values()
        ), "unsolved cells"
        np.testing.assert_array_equal(
            np.array([digits[c] for c in range(81)]), sol
        )


def test_kcore_clique_plus_chain(tmp_path, ray_session):
    """4-clique (3-core) with a pendant chain: the chain peels away
    round by round; the clique survives k=3 but not k=4."""
    import numpy as np

    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import KCore
    from signal_collect_ray.engine_resident import ResidentEngine

    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),  # K4
             (3, 4), (4, 5), (5, 6)]                          # chain
    src = np.array([a for a, b in pairs] + [b for a, b in pairs], np.int64)
    dst = np.array([b for a, b in pairs] + [a for a, b in pairs], np.int64)

    def run(k):
        g = Graph.from_edge_arrays(
            src, dst, str(tmp_path / f"g{k}"), num_partitions=2
        )
        eng = ResidentEngine(
            EngineConfig(num_partitions=2, eps=0.0, max_supersteps=10),
            num_workers=2,
        )
        info = eng.run(
            g, KCore(k), run_dir=str(tmp_path / f"run{k}"), resume=False
        )
        t = info.state_table()
        return dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))

    c3 = run(3)
    assert [c3[v] for v in range(7)] == [1, 1, 1, 1, 0, 0, 0]
    c4 = run(4)
    assert all(v == 0 for v in c4.values())
    c1 = run(1)
    assert all(v == 1 for v in c1.values())
