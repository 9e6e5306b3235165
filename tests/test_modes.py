"""Execution-mode surface — OptimizedAsynchronous, ContinuousAsynchronous
and Interactive (reference ``configuration/ExecutionMode.scala:34-88``),
plus the ``execute`` dispatcher. The IntegrationSpec contract
(``IntegrationSpec.scala:44-68``) requires the same answers from every
mode an algorithm is eligible for."""

import os
import time

import numpy as np
import pytest

from signal_collect_ray import (
    EngineConfig,
    ExecutionMode,
    Graph,
    SumStatesTermination,
    execute,
)
from signal_collect_ray.algorithms import ConnectedComponents, PageRank, SSSP
from signal_collect_ray.engine_async import AsyncEngine
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _rand_graph(tmp_path, tag, n=300, m=1500, seed=5, sym=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    return Graph.from_edge_arrays(
        src, dst, str(tmp_path / f"g{tag}"), num_partitions=4, symmetric=sym
    )


def _states(info):
    t = info.state_table()
    return (
        np.asarray(t.column("vid").to_pylist()),
        np.asarray(t.column("state").to_pylist()),
    )


def _sync(tmp_path, g, algo, tag, eps=1e-6, steps=200):
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=eps, max_supersteps=steps),
        num_workers=2,
    )
    return eng.run(g, algo, run_dir=str(tmp_path / f"rs{tag}"), resume=False)


# -- OptimizedAsynchronous --------------------------------------------------


def test_optimized_async_cc_matches_sync(tmp_path):
    g = _rand_graph(tmp_path, "occ", sym=True)
    vs, ss = _states(_sync(tmp_path, g, ConnectedComponents(), "occ"))
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=3)
    info = eng.run(
        g, ConnectedComponents(), run_dir=str(tmp_path / "oacc"),
        mode="optimized",
    )
    assert info.converged
    va, sa = _states(info)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)


def test_optimized_async_pagerank_matches_oracle(tmp_path):
    g = _rand_graph(tmp_path, "opr", seed=11)
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=3)
    info = eng.run(
        g, PageRank(), run_dir=str(tmp_path / "oapr"), mode="optimized",
        signal_threshold=1e-9,
    )
    assert info.converged
    va, sa = _states(info)
    # independent oracle: dense power iteration of the reference formula
    e = g.edges_ds().to_pandas()
    vids, want = fx.pagerank_oracle(e["src"].values, e["dst"].values)
    np.testing.assert_array_equal(va, vids)
    np.testing.assert_allclose(sa, want, atol=1e-6)


def test_async_mode_validated(tmp_path):
    g = _rand_graph(tmp_path, "mv")
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=2)
    with pytest.raises(ValueError, match="mode"):
        eng.run(g, SSSP(0), run_dir=str(tmp_path / "mv"), mode="bogus")


# -- ContinuousAsynchronous -------------------------------------------------


def test_continuous_blocking_requires_time_limit(tmp_path):
    g = _rand_graph(tmp_path, "ctl")
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=2)
    with pytest.raises(ValueError, match="time_limit_s"):
        eng.run(g, SSSP(0), run_dir=str(tmp_path / "ctl"), continuous=True)


def test_continuous_blocking_runs_past_quiescence(tmp_path):
    g = _rand_graph(tmp_path, "cbl", sym=True)
    vs, ss = _states(_sync(tmp_path, g, ConnectedComponents(), "cbl"))
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=3)
    t0 = time.monotonic()
    info = eng.run(
        g, ConnectedComponents(), run_dir=str(tmp_path / "cbl"),
        continuous=True, time_limit_s=3.0,
    )
    # a continuous run never terminates on quiescence — only the limit
    assert time.monotonic() - t0 >= 3.0
    assert info.termination_reason == "TimeLimitReached"
    va, sa = _states(info)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)


def test_continuous_handle_query_stop(tmp_path):
    g = _rand_graph(tmp_path, "chd", sym=True)
    vs, ss = _states(_sync(tmp_path, g, ConnectedComponents(), "chd"))
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=3)
    comp = eng.start(g, ConnectedComponents(), run_dir=str(tmp_path / "chd"))
    # continuous querying: aggregate over LIVE state while it runs
    agg = SumStatesTermination(threshold=0.0)
    mid = comp.aggregate(agg)
    assert np.isfinite(mid)
    for _ in range(400):
        if comp.status()["quiescent"]:
            break
        time.sleep(0.02)
    st = comp.status()
    assert st["quiescent"]
    assert comp.running  # stalled but still running — the continuous contract
    final_sum = comp.aggregate(agg)
    info = comp.stop()
    assert not comp.running
    assert info.converged  # quiesced at stop time
    va, sa = _states(info)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)
    assert final_sum == pytest.approx(float(np.sum(sa)))


def test_continuous_immediate_stop_joins_worker_loops(tmp_path):
    """stop() right after start() must not deadlock: on the threaded
    actor a stop_loop() can be served BEFORE run_local begins, so the
    loop must honor a pre-set stop flag (never clear it)."""
    g = _rand_graph(tmp_path, "cis", sym=True)
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=3)
    comp = eng.start(g, ConnectedComponents(), run_dir=str(tmp_path / "cis"))
    info = comp.stop()  # would hang on ray.get(loop_refs) if racy
    assert info.termination_reason in ("Stopped", "Converged")
    # idempotent: the cached final info comes back
    assert comp.stop() is info


def test_continuous_stop_failure_is_not_retried_on_dead_pool(tmp_path):
    """If stop()'s final snapshot fails after the pool is released, a
    retried stop() must raise a clear error instead of re-driving dead
    actors (RayActorError)."""
    g = _rand_graph(tmp_path, "cfs", sym=True)
    eng = AsyncEngine(EngineConfig(num_partitions=4), num_workers=2)
    comp = eng.start(g, ConnectedComponents(), run_dir=str(tmp_path / "cfs"))
    # make write_final fail: final_dir path occupied by a plain FILE
    import shutil

    shutil.rmtree(comp._final_dir)
    with open(comp._final_dir, "w") as f:
        f.write("not a directory")
    with pytest.raises(Exception):
        comp.stop()
    # pool is released; a second stop() must fail fast and clearly
    with pytest.raises(RuntimeError, match="pool already released"):
        comp.stop()
    with pytest.raises(RuntimeError):
        comp.status()
    with pytest.raises(RuntimeError):
        comp.aggregate(SumStatesTermination(threshold=0.0))
    os.remove(comp._final_dir)


# -- Interactive ------------------------------------------------------------


def test_interactive_steps_match_run(tmp_path):
    g = _rand_graph(tmp_path, "int", sym=True)
    algo = ConnectedComponents()
    info_run = _sync(tmp_path, g, algo, "int")
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=1e-6, max_supersteps=200),
        num_workers=2,
    )
    comp = eng.interactive(
        g, algo, run_dir=str(tmp_path / "ri"), resume=False
    )
    assert comp.superstep == 0 and not comp.converged
    comp.step()
    assert comp.superstep == 1
    # mid-run observation between steps
    agg = SumStatesTermination(threshold=0.0)
    assert np.isfinite(comp.aggregate(agg))
    last = comp.run_to_convergence()
    assert comp.converged and comp.reason == "Converged"
    assert comp.superstep == info_run.supersteps
    info = comp.finish()
    assert info.converged and info.termination_reason == "Converged"
    vs, ss = _states(info_run)
    va, sa = _states(info)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)
    # manifests agree step-for-step with the batch run on the scheduling
    # counters (wall times differ)
    for mi, mr in zip(info.per_step, info_run.per_step):
        assert mi["superstep"] == mr["superstep"]
        assert mi["n_active"] == mr["n_active"]


def test_interactive_terminate_early_and_resume(tmp_path):
    g = _rand_graph(tmp_path, "itr", sym=True)
    algo = ConnectedComponents()
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=1e-6, max_supersteps=200),
        num_workers=2,
    )
    run_dir = str(tmp_path / "itr")
    comp = eng.interactive(g, algo, run_dir=run_dir, resume=False)
    comp.step(2)
    assert comp.superstep == 2 and not comp.converged
    info = comp.finish()
    assert info.termination_reason == "TerminatedByUser"
    assert os.path.exists(os.path.join(info.final_step_dir, "manifest.json"))
    # the on-demand checkpoint is a full engine checkpoint: resume the
    # batch executor from it and converge to the sync fixpoint
    info2 = eng.run(g, algo, run_dir=run_dir, resume=True)
    assert info2.converged
    vs, ss = _states(_sync(tmp_path, g, algo, "itr2"))
    va, sa = _states(info2)
    np.testing.assert_array_equal(vs, va)
    np.testing.assert_array_equal(ss, sa)


def test_interactive_break_conditions(tmp_path):
    # path graph 0-1-...-9: SSSP from 0 settles vertex d at superstep d,
    # so a condition on vertex 5 must pause the run at exactly step 5
    n = 10
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "gbc"), num_partitions=4, symmetric=True
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=1e-9, max_supersteps=50),
        num_workers=2,
    )
    comp = eng.interactive(
        g, SSSP(0), run_dir=str(tmp_path / "bc"), resume=False
    )
    from signal_collect_ray.modes import BreakCondition

    cid = comp.add_break_condition(BreakCondition(5, "state_changes"))
    comp.run_to_convergence()
    assert comp.triggered == {cid: 5.0}
    assert comp.superstep == 5 and not comp.converged
    # removing the condition lets the run continue to the fixpoint
    comp.remove_break_condition(cid)
    cid2 = comp.add_break_condition(BreakCondition(9, "state_below", 9.5))
    comp.run_to_convergence()
    assert comp.triggered == {cid2: 9.0}
    assert comp.superstep == 9
    comp.remove_break_condition(cid2)
    comp.run_to_convergence()
    assert comp.converged and not comp.triggered
    info = comp.finish()
    va, sa = _states(info)
    np.testing.assert_array_equal(sa[va], np.arange(n, dtype=float))

    # unknown vertex surfaces as an error at check time
    with pytest.raises(KeyError):
        comp.add_break_condition(BreakCondition(999, "state_changes"))
    # invalid kinds / missing thresholds are rejected up front
    with pytest.raises(ValueError, match="kind"):
        BreakCondition(0, "bogus")
    with pytest.raises(ValueError, match="threshold"):
        BreakCondition(0, "state_above")


# -- dispatcher -------------------------------------------------------------


def test_execute_dispatcher_all_modes(tmp_path):
    g = _rand_graph(tmp_path, "dsp", sym=True)
    algo = ConnectedComponents()
    cfg = EngineConfig(num_partitions=4)
    ref = execute(
        g, algo, mode="synchronous", config=cfg,
        run_dir=str(tmp_path / "d1"), resume=False,
    )
    assert ref.converged
    vs, ss = _states(ref)

    for mode in ("pure_asynchronous", "optimized_asynchronous"):
        info = execute(
            g, algo, mode=mode, config=cfg,
            run_dir=str(tmp_path / f"d-{mode}"),
        )
        assert info.converged
        va, sa = _states(info)
        np.testing.assert_array_equal(ss, sa)

    comp = execute(
        g, algo, mode=ExecutionMode.CONTINUOUS_ASYNCHRONOUS, config=cfg,
        run_dir=str(tmp_path / "d-cont"),
    )
    for _ in range(400):
        if comp.status()["quiescent"]:
            break
        time.sleep(0.02)
    info = comp.stop()
    va, sa = _states(info)
    np.testing.assert_array_equal(ss, sa)

    icomp = execute(
        g, algo, mode="interactive", config=cfg,
        run_dir=str(tmp_path / "d-int"), resume=False,
    )
    icomp.run_to_convergence()
    info = icomp.finish()
    va, sa = _states(info)
    np.testing.assert_array_equal(ss, sa)

    durable = execute(
        g, algo, mode="synchronous", executor="durable", config=cfg,
        run_dir=str(tmp_path / "d-dur"), resume=False,
    )
    va, sa = _states(durable)
    np.testing.assert_array_equal(ss, sa)
