"""Connected components (exact labels) and SSSP conformance
(IntegrationSpec.scala:196-222, FIXTURES.md §3)."""

import numpy as np

from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
from signal_collect_ray.algorithms import ConnectedComponents, SSSP

from tests import fixtures as fx


def _eng(P=4):
    return SuperstepEngine(EngineConfig(num_partitions=P, eps=1e-9, max_supersteps=200))


def test_cc_sym_cycle4(tmp_path):
    src, dst = fx.sym_cycle4()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    info = _eng().run(g, ConnectedComponents(), run_dir=str(tmp_path / "r"), resume=False)
    t = info.state_table()
    assert t.column("state").to_pylist() == [0, 0, 0, 0]


def test_cc_disconnected_exact_labels(tmp_path):
    src, dst = fx.disconnected()
    sym_s = np.concatenate([src, dst])
    sym_d = np.concatenate([dst, src])
    g = Graph.from_edge_arrays(sym_s, sym_d, str(tmp_path / "g"), num_partitions=4)
    info = _eng().run(g, ConnectedComponents(), run_dir=str(tmp_path / "r"), resume=False)
    t = info.state_table()
    vid = np.array(t.column("vid").to_pylist())
    lab = np.array(t.column("state").to_pylist())
    ovid, olab = fx.cc_oracle(sym_s, sym_d)
    assert (vid == ovid).all()
    assert (lab == olab).all()
    assert set(lab) == {0, 10}


def test_cc_determinism_across_P(tmp_path):
    src, dst = fx.two_clusters()
    labs = {}
    for P in (1, 3, 8):
        g = Graph.from_edge_arrays(src, dst, str(tmp_path / f"g{P}"), num_partitions=P)
        info = _eng(P).run(g, ConnectedComponents(), run_dir=str(tmp_path / f"r{P}"), resume=False)
        labs[P] = info.state_table().column("state").to_pylist()
    assert labs[1] == labs[3] == labs[8]


def test_sssp_sym_cycle4_dist_equals_id(tmp_path):
    # IntegrationSpec.scala:196-208 — on the 4-cycle (directed), dist = id
    src, dst = fx.cycle(4)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=2)
    info = _eng(2).run(g, SSSP(0), run_dir=str(tmp_path / "r"), resume=False)
    t = info.state_table()
    assert t.column("state").to_pylist() == [0.0, 1.0, 2.0, 3.0]


def test_sssp_sym_star5(tmp_path):
    # IntegrationSpec.scala:210-222 — star, source = center 4
    src, dst = fx.sym_star5()
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    info = _eng().run(g, SSSP(4), run_dir=str(tmp_path / "r"), resume=False)
    t = info.state_table()
    vals = dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))
    assert vals[4] == 0.0
    for leaf in range(4):
        assert vals[leaf] == 1.0


def test_sssp_oracle_random_graph(tmp_path):
    rng = np.random.RandomState(7)
    n = 80
    src = rng.randint(0, n, 300).astype(np.int64)
    dst = rng.randint(0, n, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    info = _eng().run(g, SSSP(0), run_dir=str(tmp_path / "r"), resume=False)
    t = info.state_table()
    ovid, odist = fx.sssp_oracle(src, dst, 0)
    assert (np.array(t.column("vid").to_pylist()) == ovid).all()
    got = np.array(t.column("state").to_pylist())
    assert np.array_equal(got, odist) or np.allclose(
        got, odist, equal_nan=True
    )


def test_multisource_bfs_two_seeds(tmp_path):
    # chain 0->1->2->3->4->5 with sources {0, 4}: dist = hops to the
    # NEAREST seed along forward edges
    from signal_collect_ray.algorithms import MultiSourceBFS

    src = np.array([0, 1, 2, 3, 4], dtype=np.int64)
    dst = np.array([1, 2, 3, 4, 5], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=3)
    info = _eng(3).run(
        g, MultiSourceBFS([0, 4]), run_dir=str(tmp_path / "r"), resume=False
    )
    t = info.state_table()
    got = dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 0.0, 5: 1.0}


def test_multisource_bfs_unreachable_inf(tmp_path):
    from signal_collect_ray.algorithms import MultiSourceBFS

    # 0->1, isolated pair 2->3: seeds {0} leave 2,3 at inf
    src = np.array([0, 2], dtype=np.int64)
    dst = np.array([1, 3], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g2"), num_partitions=2)
    info = _eng(2).run(
        g, MultiSourceBFS([0]), run_dir=str(tmp_path / "r2"), resume=False
    )
    t = info.state_table()
    got = dict(zip(t.column("vid").to_pylist(), t.column("state").to_pylist()))
    assert got[0] == 0.0 and got[1] == 1.0
    assert not np.isfinite(got[2]) and not np.isfinite(got[3])


def _bipartite_oracle(src, dst, n_ids):
    """Brute-force 2-coloring per component (BFS over adjacency sets)."""
    import collections

    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        adj[s].add(d)
        adj[d].add(s)
    color, out = {}, {}
    for start in sorted(adj):
        if start in color:
            continue
        comp, ok = [start], True
        color[start] = 0
        q = collections.deque([start])
        while q:
            u = q.popleft()
            for w in adj[u]:
                if w not in color:
                    color[w] = color[u] ^ 1
                    comp.append(w)
                    q.append(w)
                elif color[w] == color[u]:
                    ok = False
        out[min(comp)] = ok
    return out


def test_bipartite_classification_mixed_components(tmp_path):
    """Even cycle (bipartite) + odd cycle (not) + path (bipartite):
    the CC-roots + parity-BFS composition behind bipartite_components."""
    from signal_collect_ray.algorithms import ConnectedComponents, MultiSourceBFS

    # component A: 6-cycle on 0..5; B: 5-cycle on 10..14; C: path 20-21-22
    src = np.array(
        [0, 1, 2, 3, 4, 5, 10, 11, 12, 13, 14, 20, 21], dtype=np.int64
    )
    dst = np.array(
        [1, 2, 3, 4, 5, 0, 11, 12, 13, 14, 10, 21, 22], dtype=np.int64
    )
    ss = np.concatenate([src, dst])
    dd = np.concatenate([dst, src])
    g = Graph.from_edge_arrays(ss, dd, str(tmp_path / "g"), num_partitions=4)
    eng = _eng()
    info = eng.run(g, ConnectedComponents(), run_dir=str(tmp_path / "rc"), resume=False)
    t = info.state_table()
    vid = np.array(t.column("vid").to_pylist(), dtype=np.int64)
    lab = np.array(t.column("state").to_pylist(), dtype=np.int64)
    roots = np.unique(lab)
    info2 = eng.run(
        g, MultiSourceBFS(roots), run_dir=str(tmp_path / "rb"), resume=False
    )
    bt = info2.state_table()
    bv = np.array(bt.column("vid").to_pylist(), dtype=np.int64)
    bd = np.array(bt.column("state").to_pylist())
    order = np.argsort(bv)
    parity = (bd[order].astype(np.int64) % 2)
    pv = bv[order]
    same = parity[np.searchsorted(pv, ss)] == parity[np.searchsorted(pv, dd)]
    lorder = np.argsort(vid)
    ls = lab[lorder][np.searchsorted(vid[lorder], ss)]
    got = {}
    for c in roots:
        got[int(c)] = int(same[ls == c].sum()) == 0
    want = _bipartite_oracle(src, dst, 23)
    assert got == want
    assert got[0] is True and got[10] is False and got[20] is True


def test_landmark_bfs_equals_four_sssp_runs(tmp_path):
    # one packed-lane LandmarkBFS pass == k independent SSSP runs, on a
    # random-ish directed graph with an unreachable island (lane = 255)
    from signal_collect_ray.algorithms.sssp import (
        LandmarkBFS,
        unpack_landmark_table,
    )

    rng = np.random.RandomState(7)
    src = rng.randint(0, 40, 300).astype(np.int64)
    dst = rng.randint(0, 40, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    # island 50-51 unreachable from the landmarks
    src = np.concatenate([src, [50]])
    dst = np.concatenate([dst, [51]])
    lands = [0, 5, 11, 50]
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=4)
    info = _eng().run(
        g, LandmarkBFS(lands), run_dir=str(tmp_path / "lm"), resume=False
    )
    got = unpack_landmark_table(info.state_table(), lands).to_pandas()
    got = got.sort_values("vid").reset_index(drop=True)
    for lane, s in enumerate(lands):
        info_s = _eng().run(
            g, SSSP(s), run_dir=str(tmp_path / f"s{s}"), resume=False
        )
        t = info_s.state_table()
        vid = np.array(t.column("vid").to_pylist())
        d = np.array(t.column("state").to_pylist())
        order = np.argsort(vid)
        want = d[order]
        have = got[f"d{s}"].values
        finite = np.isfinite(want)
        assert (np.isnan(have) == ~finite).all()
        assert (have[finite] == want[finite]).all()


def test_spcount_matches_brute(tmp_path):
    """SPCount (dist, σ) equals brute-force BFS path counting on a
    random directed graph."""
    import collections

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
    from signal_collect_ray.algorithms import SPCount

    rng = np.random.default_rng(23)
    src = rng.integers(0, 40, 300).astype(np.int64)
    dst = rng.integers(0, 40, 300).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    g = Graph.build(
        rd.from_arrow(pa.table({"src": src, "dst": dst})),
        str(tmp_path / "g"),
        num_partitions=4,
        dedup=True,
    )
    eng = SuperstepEngine(
        EngineConfig(num_partitions=4, eps=0.0, max_supersteps=30)
    )
    info = eng.run(
        g, SPCount(int(src[0])), run_dir=str(tmp_path / "run"), resume=False
    )
    t = info.state_table()
    got = {
        int(v): (int(d), int(s))
        for v, d, s in zip(
            t.column("vid").to_pylist(),
            t.column("state").to_pylist(),
            t.column("last").to_pylist(),
        )
        if d < SPCount.INF
    }
    # brute: BFS levels + path counts over deduped edges
    adj = collections.defaultdict(set)
    for a, b in zip(src, dst):
        adj[int(a)].add(int(b))
    s0 = int(src[0])
    dist = {s0: 0}
    sigma = collections.defaultdict(int)
    sigma[s0] = 1
    frontier = [s0]
    while frontier:
        nxt = []
        for u in frontier:
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    nxt.append(w)
        for u in frontier:
            for w in adj[u]:
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        frontier = nxt
    want = {v: (dist[v], sigma[v]) for v in dist}
    assert got == want


def test_earliest_arrival_matches_brute(tmp_path):
    """EarliestArrival equals brute-force temporal Dijkstra on random
    timestamped edges."""
    import heapq

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray import EngineConfig, Graph, SuperstepEngine
    from signal_collect_ray.algorithms import EarliestArrival

    rng = np.random.default_rng(31)
    src = rng.integers(0, 25, 200).astype(np.int64)
    dst = rng.integers(0, 25, 200).astype(np.int64)
    t = rng.integers(10, 1000, 200).astype(np.float64)
    keep = src != dst
    src, dst, t = src[keep], dst[keep], t[keep]
    g = Graph.build(
        rd.from_arrow(
            pa.table({"src": src, "dst": dst, "weight": t})
        ),
        str(tmp_path / "g"),
        num_partitions=4,
    )
    eng = SuperstepEngine(
        EngineConfig(num_partitions=4, eps=1e-9, max_supersteps=40)
    )
    s0 = int(src[0])
    info = eng.run(
        g,
        EarliestArrival(s0, t0=0.0),
        run_dir=str(tmp_path / "run"),
        resume=False,
    )
    st = info.state_table()
    got = {
        int(v): (float(a) if np.isfinite(a) else None)
        for v, a in zip(
            st.column("vid").to_pylist(), st.column("state").to_pylist()
        )
    }
    # brute: label-correcting earliest arrival
    arr = {int(v): np.inf for v in got}
    arr[s0] = 0.0
    pq_ = [(0.0, s0)]
    adj = {}
    for a, b, tt in zip(src, dst, t):
        adj.setdefault(int(a), []).append((int(b), float(tt)))
    while pq_:
        a_u, u = heapq.heappop(pq_)
        if a_u > arr[u]:
            continue
        for v, tt in adj.get(u, []):
            if tt >= a_u and tt < arr[v]:
                arr[v] = tt
                heapq.heappush(pq_, (tt, v))
    for v, a in got.items():
        want = arr[v] if np.isfinite(arr[v]) else None
        assert a == want, (v, a, want)


def test_latest_departure_matches_brute(tmp_path):
    """LatestDeparture (reversed max-fold) equals a brute fixpoint."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import LatestDeparture
    from signal_collect_ray.engine_resident import ResidentEngine

    rng = np.random.default_rng(41)
    src = rng.integers(0, 25, 200).astype(np.int64)
    dst = rng.integers(0, 25, 200).astype(np.int64)
    t = rng.integers(10, 1000, 200).astype(np.float64)
    keep = src != dst
    src, dst, t = src[keep], dst[keep], t[keep]
    target, deadline = int(dst[0]), 1e6
    g = Graph.build(
        rd.from_arrow(pa.table({"src": dst, "dst": src, "weight": t})),
        str(tmp_path / "g"),
        num_partitions=4,
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=1e-9, max_supersteps=40)
    )
    info = eng.run(
        g,
        LatestDeparture(target, deadline),
        run_dir=str(tmp_path / "run"),
        resume=False,
    )
    st = info.state_table()
    got = {
        int(v): a
        for v, a in zip(
            st.column("vid").to_pylist(), st.column("state").to_pylist()
        )
    }
    dep = np.full(26, -np.inf)
    dep[target] = deadline
    for _ in range(30):
        usable = t <= dep[dst]
        np.maximum.at(dep, src[usable], t[usable])
        dep[target] = deadline
    for v, a in got.items():
        want = dep[v]
        if np.isfinite(want):
            assert a == want, (v, a, want)
        else:
            assert not np.isfinite(a), (v, a)


def test_widest_path_matches_brute(tmp_path):
    """WidestPath (max-min semiring) equals brute Dijkstra-style
    bottleneck search."""
    import heapq

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import WidestPath
    from signal_collect_ray.engine_resident import ResidentEngine

    rng = np.random.default_rng(53)
    src = rng.integers(0, 25, 200).astype(np.int64)
    dst = rng.integers(0, 25, 200).astype(np.int64)
    w = rng.integers(1, 50, 200).astype(np.float64)
    keep = src != dst
    src, dst, w = src[keep], dst[keep], w[keep]
    g = Graph.build(
        rd.from_arrow(pa.table({"src": src, "dst": dst, "weight": w})),
        str(tmp_path / "g"),
        num_partitions=4,
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=4, eps=1e-9, max_supersteps=40)
    )
    s0 = int(src[0])
    info = eng.run(
        g, WidestPath(s0), run_dir=str(tmp_path / "run"), resume=False
    )
    st = info.state_table()
    got = {
        int(v): a
        for v, a in zip(
            st.column("vid").to_pylist(), st.column("state").to_pylist()
        )
    }
    cap = {int(v): -np.inf for v in got}
    cap[s0] = np.inf
    pq_ = [(-np.inf, s0)]  # max-heap by negative capacity
    adj = {}
    for a, b, ww in zip(src, dst, w):
        adj.setdefault(int(a), []).append((int(b), float(ww)))
    heapq.heapify(pq_)
    pq_ = [(-cap[s0], s0)]
    while pq_:
        negc, u = heapq.heappop(pq_)
        c = -negc
        if c < cap[u]:
            continue
        for v, ww in adj.get(u, []):
            nc = min(c, ww)
            if nc > cap[v]:
                cap[v] = nc
                heapq.heappush(pq_, (-nc, v))
    for v, a in got.items():
        want = cap[v]
        if np.isfinite(want):
            assert a == want, (v, a, want)
        else:
            assert not np.isfinite(a) or a == want, (v, a, want)
