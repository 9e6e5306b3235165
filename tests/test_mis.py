"""Maximal-independent-set conformance: the engine's deterministic Luby
run vs an independently-coded numpy simulator of the same rule, plus
independence/maximality invariants on random symmetric graphs."""

import numpy as np
import pytest

from signal_collect_ray import EngineConfig, Graph
from signal_collect_ray.algorithms import MaximalIndependentSet
from signal_collect_ray.algorithms.mis import IN, OUT, UNDECIDED, _priority
from signal_collect_ray.engine_resident import ResidentEngine

from tests import fixtures as fx


def _mis_oracle(src, dst):
    """Independent simulation: same deterministic priorities, same
    synchronous rule — no engine code."""
    vids = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(vids)}
    si = np.array([idx[int(v)] for v in src])
    di = np.array([idx[int(v)] for v in dst])
    prio = _priority(vids)
    st = np.zeros(len(vids), dtype=np.int64)
    for _ in range(200):
        val = np.where(st == IN, -1.0, np.where(st == UNDECIDED, prio, np.inf))
        minv = np.full(len(vids), np.inf)
        np.minimum.at(minv, di, val[si])
        new = st.copy()
        undec = st == UNDECIDED
        new[undec & (minv < 0)] = OUT
        new[undec & (minv >= 0) & (prio < minv)] = IN
        if (new == st).all():
            break
        st = new
    return vids, st


def _run(tmp_path, src, dst, P=4):
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "g"), num_partitions=P)
    eng = ResidentEngine(
        EngineConfig(num_partitions=P, eps=0.0, max_supersteps=200),
        num_workers=2,
    )
    info = eng.run(
        g, MaximalIndependentSet(), run_dir=str(tmp_path / "run"), resume=False
    )
    t = info.state_table()
    return t.column("vid").to_numpy(), t.column("state").to_numpy()


@pytest.mark.parametrize("topo", ["sym_cycle4", "sym_star5", "two_clusters"])
def test_mis_matches_simulator(tmp_path, ray_session, topo):
    src, dst = getattr(fx, topo)()
    vid, st = _run(tmp_path, src, dst)
    ovid, ost = _mis_oracle(src, dst)
    assert (vid == ovid).all()
    assert (st == ost).all()
    assert set(np.unique(st)) <= {IN, OUT}


def test_mis_random_graph_invariants(tmp_path, ray_session):
    rng = np.random.RandomState(3)
    n = 150
    a = rng.randint(0, n, 700).astype(np.int64)
    b = rng.randint(0, n, 700).astype(np.int64)
    keep = a != b
    a, b = a[keep], b[keep]
    src = np.concatenate([a, b])
    dst = np.concatenate([b, a])
    vid, st = _run(tmp_path, src, dst)
    ovid, ost = _mis_oracle(src, dst)
    assert (st == ost).all()
    pos = {int(v): i for i, v in enumerate(vid)}
    in_set = {int(v) for v, s in zip(vid, st) if s == IN}
    # independence: no edge inside the set
    assert not any(int(s) in in_set and int(d) in in_set for s, d in zip(a, b))
    # maximality: every OUT vertex has an IN neighbor
    neigh = {}
    for s, d in zip(src, dst):
        neigh.setdefault(int(s), set()).add(int(d))
    for v, s in zip(vid, st):
        if s == OUT:
            assert neigh.get(int(v), set()) & in_set
        else:
            assert s == IN
