"""Pluggable vertex→partition mapper — the reference's
VertexToWorkerMapper injection surface (``GraphBuilder.withMapperFactory``,
``DefaultVertexToWorkerMapper.scala:28-35`` hash default,
``features/MapperSpec.scala:34-83`` custom-mapper test: same results
under a non-default placement).

The mapper is a property of the GRAPH (build-time placement); both
executors route signals with ``graph.part_fn``, so results must be
identical under any mapper."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph
from signal_collect_ray.algorithms import ConnectedComponents, PageRank
from signal_collect_ray.engine import SuperstepEngine
from signal_collect_ray.engine_resident import ResidentEngine
from signal_collect_ray.util import HostAffinityMapper


def _rand_edges(n=60, m=240, seed=11):
    rng = np.random.RandomState(seed)
    src = rng.randint(0, n, m).astype(np.int64)
    dst = rng.randint(0, n, m).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


def _ranks(info):
    t = info.state_table()
    return dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))


def test_custom_mapper_same_results(tmp_path):
    """MapperSpec semantics: a custom placement changes WHERE vertices
    live, never WHAT the computation returns — pinned on both executors."""
    src, dst = _rand_edges()
    mapper = HostAffinityMapper(host_mod=7)

    g_def = Graph.from_edge_arrays(src, dst, str(tmp_path / "gd"), num_partitions=4)
    g_cus = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "gc"), num_partitions=4, part_fn=mapper
    )
    assert g_cus.meta["mapper"] == "host_affinity"
    assert (g_def.num_vertices, g_def.num_edges) == (
        g_cus.num_vertices,
        g_cus.num_edges,
    )

    # fixed 20 steps, eps=0: the two placements must agree BIT-identically
    # (same per-vertex sums in a different partition layout)
    cfg = EngineConfig(num_partitions=4, eps=0.0, max_supersteps=20)
    for eng in (SuperstepEngine(cfg), ResidentEngine(cfg, num_workers=2)):
        tag = type(eng).__name__
        r_def = _ranks(
            eng.run(g_def, PageRank(), run_dir=str(tmp_path / f"rd{tag}"),
                    resume=False)
        )
        r_cus = _ranks(
            eng.run(g_cus, PageRank(), run_dir=str(tmp_path / f"rc{tag}"),
                    resume=False)
        )
        assert set(r_def) == set(r_cus)
        for v in r_def:
            assert r_def[v] == pytest.approx(r_cus[v], abs=1e-12), (tag, v)


def test_host_affinity_colocates_hosts(tmp_path):
    """Locality demo: under HostAffinityMapper every page of a host
    (vid % host_mod) lands on ONE partition — the placement a web graph
    wants so host-internal links never cross partitions."""
    src, dst = _rand_edges(n=80, m=400, seed=5)
    mapper = HostAffinityMapper(host_mod=9)
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "g"), num_partitions=4, part_fn=mapper
    )
    t = g.vertices_ds().to_pandas()
    by_host = t.groupby(t["vid"] % 9)["part"].nunique()
    assert (by_host == 1).all()
    # min-label CC agrees with the default-placement run (signals cross
    # partitions correctly under the custom routing)
    src_s = np.concatenate([src, dst])
    dst_s = np.concatenate([dst, src])
    gs = Graph.from_edge_arrays(
        src_s, dst_s, str(tmp_path / "gs"), num_partitions=4, part_fn=mapper
    )
    gd = Graph.from_edge_arrays(src_s, dst_s, str(tmp_path / "gsd"), num_partitions=4)
    eng = ResidentEngine(EngineConfig(num_partitions=4, max_supersteps=60), num_workers=2)
    lc = _ranks(eng.run(gs, ConnectedComponents(), run_dir=str(tmp_path / "rc"), resume=False))
    ld = _ranks(eng.run(gd, ConnectedComponents(), run_dir=str(tmp_path / "rdd"), resume=False))
    assert lc == ld


def test_reload_requires_same_mapper(tmp_path):
    src, dst = _rand_edges(n=20, m=40)
    mapper = HostAffinityMapper(host_mod=5)
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "g"), num_partitions=2, part_fn=mapper
    )
    with pytest.raises(ValueError, match="custom"):
        Graph.load(g.graph_dir)
    g2 = Graph.load(g.graph_dir, part_fn=mapper)
    assert g2.num_edges == g.num_edges
