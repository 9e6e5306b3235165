"""Per-superstep global aggregator (Algorithm.has_global): dangling-
mass PageRank vs a sequential numpy simulator, resume mid-run, and the
resident/async refusals."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import DanglingPageRank


def _edges():
    # small graph WITH dangling vertices: 4 and 5 have no out-edges
    src = np.array([0, 0, 1, 2, 3, 3, 1], dtype=np.int64)
    dst = np.array([1, 2, 2, 3, 4, 5, 4], dtype=np.int64)
    return src, dst


def _simulate(src, dst, k, damping=0.85):
    vids = np.unique(np.concatenate([src, dst]))
    n = len(vids)
    idx = {int(v): i for i, v in enumerate(vids)}
    outd = np.zeros(n)
    for s in src:
        outd[idx[int(s)]] += 1
    r = np.full(n, 1.0 - damping)
    for _ in range(k):
        d_mass = r[outd == 0].sum()
        inc = np.zeros(n)
        for s, t in zip(src, dst):
            inc[idx[int(t)]] += r[idx[int(s)]] / outd[idx[int(s)]]
        r = (1.0 - damping) + damping * (inc + d_mass / n)
    return {int(v): r[idx[int(v)]] for v in vids}


def _ranks(info):
    t = info.state_table()
    return {
        int(v): float(s)
        for v, s in zip(
            t.column("vid").to_pylist(), t.column("state").to_pylist()
        )
    }


def test_dangling_pagerank_matches_simulator(tmp_path):
    src, dst = _edges()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    eng = SuperstepEngine(
        EngineConfig(num_partitions=2, eps=0.0, max_supersteps=5)
    )
    info = eng.run(
        g, DanglingPageRank(g.num_vertices), run_dir=str(tmp_path / "r"),
        resume=False,
    )
    want = _simulate(src, dst, 5)
    got = _ranks(info)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])
    # sanity: the dangling term actually matters on this graph
    flat = _simulate(src, dst, 5, damping=0.85)
    assert any(
        m.get("global_value", 0.0) > 0.0 for m in info.per_step
    )
    assert flat  # simulator itself produced the compared values


def test_dangling_pagerank_resume_restores_global(tmp_path):
    src, dst = _edges()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    run_dir = str(tmp_path / "r")
    eng2 = SuperstepEngine(
        EngineConfig(num_partitions=2, eps=0.0, max_supersteps=2)
    )
    eng2.run(g, DanglingPageRank(g.num_vertices), run_dir=run_dir, resume=False)
    eng5 = SuperstepEngine(
        EngineConfig(num_partitions=2, eps=0.0, max_supersteps=5)
    )
    info = eng5.run(
        g, DanglingPageRank(g.num_vertices), run_dir=run_dir, resume=True
    )
    want = _simulate(src, dst, 5)
    got = _ranks(info)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, (v, got[v], want[v])


def test_resident_and_async_refuse_global(tmp_path):
    from signal_collect_ray.engine_async import AsyncEngine
    from signal_collect_ray.engine_resident import ResidentEngine

    src, dst = _edges()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    algo = DanglingPageRank(g.num_vertices)
    with pytest.raises(NotImplementedError, match="global aggregator"):
        ResidentEngine(
            EngineConfig(num_partitions=2, max_supersteps=3)
        ).run(g, algo, run_dir=str(tmp_path / "rr"), resume=False)
    with pytest.raises(NotImplementedError, match="global aggregator"):
        AsyncEngine(
            EngineConfig(num_partitions=2, max_supersteps=3)
        ).run(g, algo, run_dir=str(tmp_path / "ra"), resume=False)


def test_legacy_float_gpartial_coercion():
    """Checkpoints written before gpartial became a JSON string carry
    raw floats in their manifests; resume must re-encode them (and must
    NOT drop a legacy 0.0 through a truthiness check)."""
    from signal_collect_ray.engine import SuperstepEngine, _coerce_gpartial

    assert _coerce_gpartial(None) == ""
    assert _coerce_gpartial("") == ""
    assert _coerce_gpartial("0.5") == "0.5"  # modern wire form untouched
    assert _coerce_gpartial(0.0) == "0.0"  # legacy zero preserved
    assert _coerce_gpartial(0.25) == "0.25"

    class _SumAlgo:
        has_global = True

        def reduce_global(self, partials):
            return sum(partials)

    manifest = {
        "parts": [
            {"gpartial": 0.0},  # legacy float zero — must participate
            {"gpartial": "1.5"},  # modern JSON string
            {"gpartial": None},  # never had a partial
            {"gpartial": 0.25},  # legacy float
            {"gpartial": ""},  # modern empty
        ]
    }
    SuperstepEngine._reduce_global(_SumAlgo(), manifest)
    assert manifest["global_value"] == 1.75
