"""Triangle counts & clustering coefficient vs brute-force oracle
(ClusteringCoefficient.scala:24-47 formula; FIXTURES.md cc_graph6)."""

import numpy as np
import pytest
import ray.data as rd
import pyarrow as pa

from signal_collect_ray.algorithms import (
    clustering_coefficient,
    total_triangles,
    triangle_counts,
)

from tests import fixtures as fx


def _edges_ds(src, dst):
    return rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def test_cc_graph6_counts():
    src, dst = fx.cc_graph6()
    ovid, otri, ototal = fx.triangle_oracle(src, dst)
    got = {r["vid"]: r["triangles"] for r in triangle_counts(_edges_ds(src, dst)).take_all()}
    for v, t in zip(ovid, otri):
        assert got.get(int(v), 0) == t, (v, t, got)
    assert total_triangles(_edges_ds(src, dst)) == ototal


def test_clustering_coefficient_formula():
    src, dst = fx.cc_graph6()
    ovid, otri, _ = fx.triangle_oracle(src, dst)
    # undirected degree
    deg = {}
    for a, b in zip(*fx.cc_graph6()):
        deg[int(a)] = deg.get(int(a), 0)
    import collections

    und = collections.defaultdict(set)
    for a, b in zip(src, dst):
        und[int(a)].add(int(b))
        und[int(b)].add(int(a))
    got = {
        r["vid"]: r["coefficient"]
        for r in clustering_coefficient(_edges_ds(src, dst)).take_all()
    }
    for v, t in zip(ovid, otri):
        d = len(und[int(v)])
        expect = 2.0 * t / (d * (d - 1)) if d > 1 else 0.0
        assert abs(got[int(v)] - expect) < 1e-12, v


def test_random_graph_vs_oracle():
    rng = np.random.RandomState(3)
    n = 60
    src = rng.randint(0, n, 400).astype(np.int64)
    dst = rng.randint(0, n, 400).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    ovid, otri, ototal = fx.triangle_oracle(src, dst)
    got = {r["vid"]: r["triangles"] for r in triangle_counts(_edges_ds(src, dst)).take_all()}
    for v, t in zip(ovid, otri):
        assert got.get(int(v), 0) == t
    assert total_triangles(_edges_ds(src, dst)) == ototal


def test_triangle_free_graph():
    src, dst = fx.cycle(6)  # directed 6-cycle has no triangles
    assert total_triangles(_edges_ds(src, dst)) == 0


def test_cocitation_top_pairs(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.algorithms.cocitation import cocitation_top_pairs

    # sources 0/1 both link {10,11,12}; source 2 links {10,11}
    src = np.array([0, 0, 0, 1, 1, 1, 2, 2], dtype=np.int64)
    dst = np.array([10, 11, 12, 10, 11, 12, 10, 11], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    t = cocitation_top_pairs(edges, k=10)
    rows = list(zip(t.column("id_a").to_pylist(),
                    t.column("id_b").to_pylist(),
                    t.column("n").to_pylist()))
    assert rows[0] == (10, 11, 3)
    assert set(rows[1:]) == {(10, 12, 2), (11, 12, 2)}
    # deterministic tie order: (10,12) before (11,12)
    assert rows[1] == (10, 12, 2)
    # out-degree cap keeps the lexically smallest dsts
    t2 = cocitation_top_pairs(edges, k=10, max_out_degree=2)
    pairs2 = set(zip(t2.column("id_a").to_pylist(),
                     t2.column("id_b").to_pylist()))
    assert pairs2 == {(10, 11)}


def test_adamic_adar_top_pairs(ray_session):
    import math

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.algorithms.cocitation import adamic_adar_top_pairs

    # sources 0/1 both link {10,11,12} (outdeg 3); source 2 links
    # {10,11} (outdeg 2) — its weight 1/ln(2) is LARGER, so (10,11)
    # wins on Adamic-Adar even though co-citation counts tie on hubs
    src = np.array([0, 0, 0, 1, 1, 1, 2, 2], dtype=np.int64)
    dst = np.array([10, 11, 12, 10, 11, 12, 10, 11], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    t = adamic_adar_top_pairs(edges, k=10)
    rows = list(zip(t.column("id_a").to_pylist(),
                    t.column("id_b").to_pylist(),
                    t.column("aa").to_pylist()))
    w3, w2 = 1.0 / math.log(3), 1.0 / math.log(2)
    assert rows[0][:2] == (10, 11)
    assert rows[0][2] == pytest.approx(2 * w3 + w2, abs=2e-6)
    assert rows[1] == (10, 12, round(2 * w3, 6))
    assert rows[2] == (11, 12, round(2 * w3, 6))
    # cap truncates emission but weights keep the TRUE out-degree:
    # sources 0/1 emit only (10,11) at weight 1/ln(3) each
    t2 = adamic_adar_top_pairs(edges, k=10, max_out_degree=2)
    rows2 = list(zip(t2.column("id_a").to_pylist(),
                     t2.column("id_b").to_pylist(),
                     t2.column("aa").to_pylist()))
    assert rows2 == [(10, 11, round(2 * w3 + w2, 6))]


def test_ktruss_peeling(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.algorithms.ktruss import ktruss

    # K5 (a 5-truss... every edge in 3 triangles) plus a pendant
    # triangle attached by a bridge, plus a tail edge
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    extra = [(4, 10), (10, 11), (11, 12), (12, 10), (12, 20)]
    pairs = k5 + extra
    src = np.array([a for a, b in pairs], np.int64)
    dst = np.array([b for a, b in pairs], np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst}))

    def pairs_of(t):
        return set(zip(t.column("a").to_pylist(), t.column("b").to_pylist()))

    # k=3: every edge on ≥1 triangle survives; bridge (4,10) and tail
    # (12,20) peel away
    t3 = pairs_of(ktruss(edges, 3))
    assert t3 == set(k5) | {(10, 11), (10, 12), (11, 12)}
    # k=4: each edge needs ≥2 triangles — only K5 (3 per edge) survives
    t4 = pairs_of(ktruss(edges, 4))
    assert t4 == set(k5)
    # k=5: K5 still qualifies (3 = 5-2)
    assert pairs_of(ktruss(edges, 5)) == set(k5)
    # k=6: needs 4 triangles/edge → empty
    assert pairs_of(ktruss(edges, 6)) == set()
    # k=2: everything incl. triangle-free edges survives (canonical a<b)
    canon = {(min(a, b), max(a, b)) for a, b in pairs}
    assert pairs_of(ktruss(edges, 2)) == canon


def test_jaccard_top_pairs(ray_session, monkeypatch):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.algorithms import cocitation

    # sources 0/1 link {10,11,12}; source 2 links {10,11}:
    # indeg(10)=indeg(11)=3, indeg(12)=2
    # J(10,11)=3/(3+3-3)=1.0; J(10,12)=J(11,12)=2/(3+2-2)=2/3
    src = np.array([0, 0, 0, 1, 1, 1, 2, 2], dtype=np.int64)
    dst = np.array([10, 11, 12, 10, 11, 12, 10, 11], dtype=np.int64)
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    expected = [
        (10, 11, 1.0),
        (10, 12, round(2 / 3, 6)),
        (11, 12, round(2 / 3, 6)),
    ]
    t = cocitation.jaccard_top_pairs(edges, k=10)
    rows = list(zip(t.column("id_a").to_pylist(),
                    t.column("id_b").to_pylist(),
                    t.column("jac").to_pylist()))
    assert rows == expected
    # join fallback path (degree table "too large" to broadcast) must
    # produce the identical result
    monkeypatch.setattr(cocitation, "BROADCAST_INDEG_LIMIT", 0)
    t2 = cocitation.jaccard_top_pairs(edges, k=10)
    rows2 = list(zip(t2.column("id_a").to_pylist(),
                     t2.column("id_b").to_pylist(),
                     t2.column("jac").to_pylist()))
    assert rows2 == expected


def test_jaccard_random_vs_bruteforce(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray.algorithms.cocitation import jaccard_top_pairs

    rng = np.random.RandomState(11)
    src = rng.randint(0, 30, 300).astype(np.int64)
    dst = rng.randint(0, 30, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # brute force over distinct edges
    uniq = set(zip(src.tolist(), dst.tolist()))
    in_sets = {}
    for s, d in uniq:
        in_sets.setdefault(d, set()).add(s)
    scores = []
    vs = sorted(in_sets)
    for i, a in enumerate(vs):
        for b in vs[i + 1:]:
            common = len(in_sets[a] & in_sets[b])
            if common:
                union = len(in_sets[a] | in_sets[b])
                scores.append((round(common / union, 6), a, b))
    scores.sort(key=lambda r: (-r[0], r[1], r[2]))
    expected = [(a, b, j) for j, a, b in scores[:15]]
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    t = jaccard_top_pairs(edges, k=15)
    rows = list(zip(t.column("id_a").to_pylist(),
                    t.column("id_b").to_pylist(),
                    t.column("jac").to_pylist()))
    assert rows == expected
