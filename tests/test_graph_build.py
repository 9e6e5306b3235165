"""Graph build: partitioning, degrees, CSR layout, weight sums."""

import numpy as np
import pytest

from signal_collect_ray import Graph
from signal_collect_ray.util import part_of

from tests import fixtures as fx


def test_build_degrees_and_counts(tmp_path):
    src, dst = fx.star5()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    assert g.num_vertices == 5
    assert g.num_edges == 4
    vt = g.vertices_ds().to_pandas().set_index("vid").sort_index()
    assert vt.loc[4, "out_degree"] == 0
    for leaf in range(4):
        assert vt.loc[leaf, "out_degree"] == 1
        assert vt.loc[leaf, "sum_out_weight"] == 1.0
    # partition column matches the canonical mapping
    assert (
        vt["part"].values
        == part_of(vt.index.values.astype(np.int64), 4)
    ).all()


def test_weighted_degrees(tmp_path):
    src = np.array([0, 0, 1])
    dst = np.array([1, 2, 2])
    w = np.array([2.0, 3.0, 5.0])
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), weight=w, num_partitions=2)
    vt = g.vertices_ds().to_pandas().set_index("vid").sort_index()
    assert vt.loc[0, "sum_out_weight"] == 5.0
    assert vt.loc[1, "sum_out_weight"] == 5.0
    assert vt.loc[2, "sum_out_weight"] == 0.0


def test_edge_shards_sorted_and_partitioned(tmp_path):
    import pyarrow.parquet as pq

    src, dst = fx.torus(4, 4)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    total = 0
    for f in g.edge_files():
        t = pq.read_table(f)
        s = t.column("src").to_numpy()
        assert (np.diff(s) >= 0).all()
        p = int(f.split("part-")[1].split(".")[0])
        assert (part_of(s, 4) == p).all()
        total += len(t)
    assert total == g.num_edges


def test_csr_refs_roundtrip(tmp_path):
    import ray

    src, dst = fx.cycle(10)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=3)
    refs = g.csr_refs()
    n_edges = 0
    for p, ref in refs.items():
        csr = ray.get(ref)
        n_edges += len(csr["dst"])
        assert len(csr["indptr"]) == len(csr["src_ids"]) + 1
        assert (csr["sum_out_weight"] > 0).all()
    assert n_edges == 10


def test_build_dedup_equals_pre_deduped(tmp_path):
    # sym_edges + dedup=True build ≡ _sym_dedup + plain build
    import numpy as np

    from signal_collect_ray.pipelines.queries import _sym_dedup, sym_edges

    rng = np.random.RandomState(9)
    src = rng.randint(0, 50, 400).astype(np.int64)
    dst = rng.randint(0, 50, 400).astype(np.int64)
    keep = src != dst
    g0 = Graph.from_edge_arrays(src[keep], dst[keep], str(tmp_path / "g0"), num_partitions=4)
    a = Graph.build(_sym_dedup(g0.edges_ds()), str(tmp_path / "ga"), num_partitions=4)
    b = Graph.build(
        sym_edges(g0.edges_ds()), str(tmp_path / "gb"), num_partitions=4, dedup=True
    )
    assert a.num_vertices == b.num_vertices
    assert a.num_edges == b.num_edges
    ta = a.edges_ds().to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    tb = b.edges_ds().to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert (ta[["src", "dst", "weight"]].values == tb[["src", "dst", "weight"]].values).all()


def test_graph_update_add_remove(tmp_path):
    # GraphEditor.addEdge/removeEdge parity (batch rebuild), idempotent
    # duplicate adds (MultipleVertexAdditionsSpec semantics)
    import numpy as np
    import ray.data as rd
    import pyarrow as pa

    src = np.array([0, 1, 2, 3], dtype=np.int64)
    dst = np.array([1, 2, 3, 0], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)

    adds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([5, 5, 0], pa.int64()),   # 5->6 added twice
                "dst": pa.array([6, 6, 2], pa.int64()),
            }
        )
    )
    removes = rd.from_arrow(
        pa.table(
            {
                "src": pa.array([1, 9], pa.int64()),      # remove 1->2; 9->9 absent
                "dst": pa.array([2, 9], pa.int64()),
            }
        )
    )
    g2 = g.update(str(tmp_path / "g2"), add_edges_ds=adds, remove_edges_ds=removes)
    edges = sorted(
        (r["src"], r["dst"]) for r in g2.edges_ds().take_all()
    )
    assert edges == [(0, 1), (0, 2), (2, 3), (3, 0), (5, 6)]
    # vertices: endpoints of surviving edges only
    vids = sorted(r["vid"] for r in g2.vertices_ds().take_all())
    assert vids == [0, 1, 2, 3, 5, 6]
    assert g2.num_edges == 5


def test_contracted_host_graph(tmp_path):
    # contraction: vid -> vid % 3, self-loops dropped, parallel edge
    # weights SUMMED (host-graph aggregation)
    import numpy as np

    from signal_collect_ray import Graph

    src = np.array([0, 3, 1, 4, 2, 5, 0], dtype=np.int64)
    dst = np.array([1, 4, 2, 5, 0, 3, 2], dtype=np.int64)
    w = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0])
    g = Graph.from_edge_arrays(
        src, dst, str(tmp_path / "g"), weight=w, num_partitions=4
    )
    gc = g.contracted(lambda v: v % 3, str(tmp_path / "gc"), num_partitions=2)
    got = sorted(
        (r["src"], r["dst"], r["weight"]) for r in gc.edges_ds().take_all()
    )
    # oracle: brute-force contraction
    want = {}
    for s, d, ww in zip(src % 3, dst % 3, w):
        if s != d:
            want[(int(s), int(d))] = want.get((int(s), int(d)), 0.0) + ww
    assert got == sorted((s, d, ww) for (s, d), ww in want.items())
    assert gc.num_vertices == 3
