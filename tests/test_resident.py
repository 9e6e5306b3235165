"""Resident executor ≡ Ray Data executor: identical results, shared
checkpoint format (cross-executor resume)."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import ChineseWhispers, ConnectedComponents, PageRank
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _graph(tmp_path, P=4):
    rng = np.random.RandomState(5)
    n = 300
    src = rng.randint(0, n, 1500).astype(np.int64)
    dst = rng.randint(0, n, 1500).astype(np.int64)
    keep = src != dst
    return Graph.from_edge_arrays(src[keep], dst[keep], str(tmp_path / "g"), num_partitions=P)


def test_pagerank_identical_per_step(tmp_path):
    # 12 bounded supersteps: per-step state equality pins both executors
    # to the same semantics (convergence-length parity is covered by the
    # cheaper CC case below and cross-executor resume).
    g = _graph(tmp_path)
    cfg = EngineConfig(num_partitions=4, eps=1e-8, max_supersteps=12)
    a = SuperstepEngine(cfg).run(g, PageRank(), run_dir=str(tmp_path / "rd"), resume=False)
    b = ResidentEngine(cfg, num_workers=3).run(
        g, PageRank(), run_dir=str(tmp_path / "res"), resume=False
    )
    assert a.supersteps == b.supersteps == 12
    ta, tb = a.state_table(), b.state_table()
    assert ta.column("vid").to_pylist() == tb.column("vid").to_pylist()
    # float sums differ only in summation order between executors
    assert np.allclose(
        ta.column("state").to_numpy(), tb.column("state").to_numpy(),
        rtol=0, atol=1e-12,
    )
    assert ta.column("active").to_pylist() == tb.column("active").to_pylist()


def test_cc_identical_at_convergence(tmp_path):
    g = _graph(tmp_path)
    from signal_collect_ray.pipelines.queries import _sym_dedup
    gs = Graph.build(
        _sym_dedup(g.edges_ds()), str(tmp_path / "gs"), num_partitions=4
    )
    cfg = EngineConfig(num_partitions=4, max_supersteps=50)
    a = SuperstepEngine(cfg).run(gs, ConnectedComponents(), run_dir=str(tmp_path / "rdc"), resume=False)
    b = ResidentEngine(cfg, num_workers=3).run(
        gs, ConnectedComponents(), run_dir=str(tmp_path / "resc"), resume=False
    )
    assert a.converged and b.converged
    assert a.supersteps == b.supersteps
    assert a.state_table().column("state").to_pylist() == b.state_table().column(
        "state"
    ).to_pylist()


def test_cw_identical(tmp_path):
    src, dst = fx.two_clusters()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    cfg = EngineConfig(num_partitions=4, max_supersteps=20)
    a = SuperstepEngine(cfg).run(g, ChineseWhispers(), run_dir=str(tmp_path / "rd"), resume=False)
    b = ResidentEngine(cfg, num_workers=2).run(
        g, ChineseWhispers(), run_dir=str(tmp_path / "res"), resume=False
    )
    assert a.state_table().column("state").to_pylist() == b.state_table().column(
        "state"
    ).to_pylist()


def test_cross_executor_resume(tmp_path):
    g = _graph(tmp_path)
    cfg = EngineConfig(num_partitions=4, eps=1e-8, max_supersteps=300)
    full = ResidentEngine(cfg, num_workers=2).run(
        g, PageRank(), run_dir=str(tmp_path / "full"), resume=False
    )
    # start under the Ray Data executor, resume under the resident one
    SuperstepEngine(cfg).run(
        g, PageRank(), run_dir=str(tmp_path / "x"), resume=False, max_supersteps=4
    )
    resumed = ResidentEngine(cfg, num_workers=2).run(
        g, PageRank(), run_dir=str(tmp_path / "x"), resume=True
    )
    assert resumed.converged
    assert resumed.supersteps == full.supersteps
    assert np.allclose(
        resumed.state_table().column("state").to_numpy(),
        full.state_table().column("state").to_numpy(),
        rtol=0, atol=1e-12,
    )


def test_resident_checkpoint_interval(tmp_path):
    import glob
    import os

    g = _graph(tmp_path)
    cfg = EngineConfig(num_partitions=4, eps=1e-8, max_supersteps=50)
    info = ResidentEngine(cfg, num_workers=2).run(
        g, PageRank(), run_dir=str(tmp_path / "r"), resume=False,
        checkpoint_interval=10,
    )
    steps = sorted(
        int(os.path.basename(d).split("=")[1])
        for d in glob.glob(str(tmp_path / "r" / "step=*"))
    )
    # step 0, every 10th, and the terminal step
    assert 0 in steps
    assert info.supersteps == steps[-1]
    assert all(s % 10 == 0 or s == info.supersteps for s in steps)


def test_worker_failure_recovers_from_checkpoint(tmp_path):
    """Fault tolerance: a worker actor killed mid-run must not lose the
    run — the engine rebuilds the pool and resumes from the latest
    complete per-superstep checkpoint, converging to the same states as
    a clean run (EngineConfig.max_worker_restarts)."""
    import threading
    import time

    import ray

    from signal_collect_ray.algorithms import SSSP

    # long directed chain → one superstep per hop → plenty of time to
    # inject the failure while the run is in flight
    n = 240
    src = np.arange(n - 1, dtype=np.int64)
    dst = np.arange(1, n, dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "gchain"), num_partitions=4)
    cfg = EngineConfig(num_partitions=4, eps=0.0, max_supersteps=500)

    clean = ResidentEngine(cfg, num_workers=2).run(
        g, SSSP(0), run_dir=str(tmp_path / "clean"), resume=False,
        checkpoint_interval=5,
    )
    want = clean.state_table().column("state").to_pylist()

    eng = ResidentEngine(cfg, num_workers=2)
    result: dict = {}

    def go():
        try:
            result["info"] = eng.run(
                g, SSSP(0), run_dir=str(tmp_path / "faulty"), resume=False,
                checkpoint_interval=5,
            )
        except Exception as e:  # surface in the main thread
            result["err"] = e

    th = threading.Thread(target=go)
    th.start()
    killed = False
    deadline = time.monotonic() + 60
    while time.monotonic() < deadline and th.is_alive():
        ns = getattr(eng, "_last_ns", None)
        if ns is not None and ns.per_step and ns.per_step[-1]["superstep"] >= 5:
            ray.kill(ns.workers[0], no_restart=True)
            killed = True
            break
        time.sleep(0.005)
    th.join(120)
    assert killed, "run finished before the failure could be injected"
    assert "err" not in result, f"run failed instead of recovering: {result.get('err')}"
    info = result["info"]
    assert info.converged
    assert info.state_table().column("state").to_pylist() == want
