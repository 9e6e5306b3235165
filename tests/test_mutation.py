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
from signal_collect_ray.algorithms import (
    ConnectedComponents,
    CrawlingPageRank,
    PageRank,
    TokenDiffusion,
)
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


def _crawl_closure(link_map, seeds):
    """Vertices/edges a crawl starting from ``seeds`` eventually adds."""
    seen, frontier = set(), set(seeds)
    src, dst = [], []
    while frontier:
        v = frontier.pop()
        if v in seen:
            continue
        seen.add(v)
        for u in link_map.get(v, ()):
            src.append(v)
            dst.append(u)
            if u not in seen:
                frontier.add(u)
    return np.array(src, np.int64), np.array(dst, np.int64)


def test_algorithm_emitted_mutations_webcrawler(tmp_path):
    """GraphEditor parity (WebCrawler.scala:38-47): PageRank over a graph
    that GROWS from inside the algorithm (emit_edges on first visit)
    converges to the same ranks as a static build of the fully crawled
    graph."""
    rng = np.random.RandomState(7)
    n_web = 30
    link_map = {
        v: sorted(set(int(x) for x in rng.randint(0, n_web, 4)) - {v})
        for v in range(n_web)
    }
    # seed graph: just the links of page 0 — the crawler discovers the rest
    seed_src = np.array([0] * len(link_map[0]), np.int64)
    seed_dst = np.array(link_map[0], np.int64)

    # eps 1e-7 → fixpoint error ≤ ~6e-7 per side (geometric tail), well
    # inside the 5e-6 comparison; keeps the two ~90-superstep durable
    # runs affordable in CI
    eng = SuperstepEngine(
        EngineConfig(num_partitions=4, eps=1e-7, max_supersteps=400)
    )
    g0 = Graph.from_edge_arrays(
        seed_src, seed_dst, str(tmp_path / "g0"), num_partitions=4
    )
    info = eng.run(
        g0, CrawlingPageRank(link_map), run_dir=str(tmp_path / "rc"),
        resume=False,
    )
    assert info.converged
    assert any(m.get("mutation") for m in info.per_step)
    got = _labels(info)

    # static build of the crawled closure, plain PageRank
    full_src, full_dst = _crawl_closure(link_map, {0} | set(link_map[0]))
    gs = Graph.from_edge_arrays(
        full_src, full_dst, str(tmp_path / "gs"), num_partitions=4
    )
    info_s = eng.run(
        gs, PageRank(), run_dir=str(tmp_path / "rs"), resume=False,
    )
    want = _labels(info_s)
    assert set(got) == set(want)
    for v, r in want.items():
        assert abs(got[v] - r) < 5e-6, (v, got[v], r)


def test_emitting_algorithms_refused_by_resident_and_async(tmp_path):
    from signal_collect_ray.engine_async import AsyncEngine
    from signal_collect_ray.engine_resident import ResidentEngine

    src = np.array([0, 1], np.int64)
    dst = np.array([1, 2], np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    algo = CrawlingPageRank({0: [1]})
    with pytest.raises(NotImplementedError, match="mutations"):
        ResidentEngine(EngineConfig(num_partitions=2), num_workers=2).run(
            g, algo, run_dir=str(tmp_path / "rr"), resume=False
        )
    with pytest.raises(NotImplementedError, match="mutations"):
        AsyncEngine(EngineConfig(num_partitions=2), num_workers=2).run(
            g, algo, run_dir=str(tmp_path / "ra")
        )


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
