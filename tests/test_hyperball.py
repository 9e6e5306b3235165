"""HyperBall conformance: approximate neighborhood function vs an
exact boolean-matrix BFS closure, and partition-invariance."""

import numpy as np
import pytest

from signal_collect_ray import Graph
from signal_collect_ray.algorithms.hyperball import neighborhood_function


def _exact_nf(src, dst):
    V = np.unique(np.concatenate([src, dst]))
    vi = {v: i for i, v in enumerate(V)}
    E = np.zeros((len(V), len(V)), dtype=bool)
    for s, d in zip(src, dst):
        E[vi[s], vi[d]] = True
    cur = np.eye(len(V), dtype=bool)
    out = [int(cur.sum())]
    while True:
        nxt = cur | (E @ cur)
        if (nxt == cur).all():
            return out
        cur = nxt
        out.append(int(cur.sum()))


def test_hyperball_vs_exact_closure(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    n, m = 60, 240
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    pairs = np.unique(np.stack([src[keep], dst[keep]], axis=1), axis=0)
    src, dst = pairs[:, 0], pairs[:, 1]
    exact = _exact_nf(src, dst)

    results = []
    for P in (2, 4):
        g = Graph.from_edge_arrays(
            src, dst, str(tmp_path / f"hb{P}"), num_partitions=P
        )
        results.append(neighborhood_function(g, p=8))
    a, b = results
    # partition-invariant registers (same hashes, max-merge); the
    # driver's float sum order differs across P, hence approx
    assert a["nf"] == pytest.approx(b["nf"], rel=1e-12)
    assert a["rounds"] == len(exact) - 1  # converges at the true diameter
    assert len(a["nf"]) == len(exact)
    for e, got in zip(exact, a["nf"]):
        assert abs(got - e) / e < 0.15
    # effective diameter within one round of the exact one
    n_inf = exact[-1]
    eff_exact = next(t for t, x in enumerate(exact) if x >= 0.9 * n_inf)
    assert abs(a["effective_diameter"] - eff_exact) <= 1


def test_hyperball_sink_and_chain(ray_session, tmp_path):
    # 0 -> 1 -> 2: exact N = [3, 5, 6]; diameter 2; sinks counted
    src = np.array([0, 1], dtype=np.int64)
    dst = np.array([1, 2], dtype=np.int64)
    g = Graph.from_edge_arrays(src, dst, str(tmp_path / "chain"),
                               num_partitions=2)
    out = neighborhood_function(g, p=8)
    assert out["rounds"] == 2
    assert [round(x) for x in out["nf"]] == [3, 5, 6]
