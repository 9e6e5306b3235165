"""Mid-computation graph mutation — the GraphEditor streaming-edit path
(reference ``GraphEditor.scala:37-201``: add/remove edges while a
computation runs, interleaved with computation rounds; mutations are
followed by full re-scoring per ``WorkerImplementation.scala:396-414``).

The durable engine polls ``edge_deltas(step)`` each superstep; a delta
rebuilds the graph via Graph.update, migrates state (survivors keep
state, new vertices get algo.init) and re-enqueues every vertex."""

import numpy as np
import pyarrow as pa
import pytest

from signal_collect_ray import EngineConfig, Graph
from signal_collect_ray.algorithms import ConnectedComponents, TokenDiffusion
from signal_collect_ray.engine import SuperstepEngine

from tests import fixtures as fx


def _edges_ds(src, dst):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "src": pa.array(np.asarray(src, np.int64), pa.int64()),
                "dst": pa.array(np.asarray(dst, np.int64), pa.int64()),
            }
        )
    )


def _labels(info):
    t = info.state_table()
    return dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))


def test_streaming_edge_adds_match_static_cc(tmp_path):
    src, dst = fx.two_clusters()
    eng = SuperstepEngine(EngineConfig(num_partitions=2, max_supersteps=60))

    g_static = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "gs"), num_partitions=2
    )
    info_s = eng.run(
        g_static, ConnectedComponents(), run_dir=str(tmp_path / "rs"), resume=False
    )
    assert info_s.converged
    want = _labels(info_s)

    # stream the same edge list in three chunks: initial build + two
    # mid-run deltas (the later chunks introduce vertices the initial
    # graph has never seen)
    n = len(src)
    i1, i2 = n // 3, 2 * n // 3
    g0 = Graph.from_edge_arrays(
        src[:i1], dst[:i1], str(tmp_path / "g0"), num_partitions=2
    )

    pending = [(src[i1:i2], dst[i1:i2]), (src[i2:], dst[i2:])]

    def deltas(step):
        # chunk 1 arrives once step 1 has run, chunk 2 once step 3 has —
        # a converged run drains the remainder (the engine re-polls on
        # convergence), so arrival interleaves with computation either way
        if len(pending) == 2 and step >= 1:
            return {"add_edges_ds": _edges_ds(*pending.pop(0))}
        if len(pending) == 1 and step >= 3:
            return {"add_edges_ds": _edges_ds(*pending.pop(0))}
        return None

    info = eng.run(
        g0, ConnectedComponents(), run_dir=str(tmp_path / "rm"), resume=False,
        edge_deltas=deltas,
    )
    assert info.converged
    assert any(m.get("mutation") for m in info.per_step)
    assert _labels(info) == want


def test_midrun_edge_removal_redirects_tokens(tmp_path):
    # path 0->1->2->3 plus a side edge 1->9; removing 1->9 at step 2
    # (before vertex 1 forwards) sends ALL token mass down the path
    src = np.array([0, 1, 1, 2], dtype=np.int64)
    dst = np.array([1, 2, 9, 3], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    eng = SuperstepEngine(EngineConfig(num_partitions=2, max_supersteps=6, eps=1e-12))

    def deltas(step):
        if step == 1:  # after superstep 1 delivered mass to vertex 1
            return {
                "remove_edges_ds": _edges_ds(
                    np.array([1], np.int64), np.array([9], np.int64)
                )
            }
        return None

    info = eng.run(
        g, TokenDiffusion(0), run_dir=str(tmp_path / "r"), resume=False,
        edge_deltas=deltas,
    )
    out = _labels(info)
    # all mass goes down the path; vertex 9 (edge-less after the removal)
    # leaves the graph — Graph.update's vertex set is the edge endpoints
    assert out[3] == 1.0 and 9 not in out, out
    assert abs(sum(out.values()) - 1.0) < 1e-12

    # without the removal the side vertex receives half the mass
    g2 = Graph.from_edge_arrays(src, dst, str(tmp_path / "g2"), num_partitions=2)
    info2 = eng.run(g2, TokenDiffusion(0), run_dir=str(tmp_path / "r2"), resume=False)
    out2 = _labels(info2)
    assert out2[9] == 0.5 and out2[3] == 0.5, out2
