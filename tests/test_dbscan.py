"""DBSCAN over cosine (functions/similarity.dbscan_cosine) vs a dense
brute-force reference — including border points (non-core with a core
neighbor) and noise, the two cases the planted blob fixture can't
exhibit."""

import numpy as np
import pyarrow as pa

from signal_collect_ray.functions.similarity import dbscan_cosine


def _brute(m, ids, threshold, min_pts):
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
    s = mn @ mn.T
    adj = s >= threshold
    np.fill_diagonal(adj, False)
    deg = adj.sum(axis=1)
    core = deg >= (min_pts - 1)
    n = len(ids)
    # CC over core-core edges, label = min id
    lab = {int(ids[i]): int(ids[i]) for i in range(n) if core[i]}
    changed = True
    while changed:
        changed = False
        for i in range(n):
            if not core[i]:
                continue
            for jj in np.flatnonzero(adj[i]):
                if core[jj]:
                    a, b = int(ids[i]), int(ids[jj])
                    mlab = min(lab[a], lab[b])
                    if lab[a] != mlab or lab[b] != mlab:
                        lab[a] = lab[b] = mlab
                        changed = True
    out = {}
    for i in range(n):
        v = int(ids[i])
        if core[i]:
            out[v] = lab[v]
        else:
            cl = [lab[int(ids[jj])] for jj in np.flatnonzero(adj[i]) if core[jj]]
            out[v] = min(cl) if cl else -1
    return out


def _run(m, ids, tmp_path, threshold, min_pts):
    import ray.data as rd

    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(m.astype(np.float64)), pa.list_(pa.float64())),
            }
        )
    )
    t = dbscan_cosine(
        ds, str(tmp_path / "w"), threshold=threshold, min_pts=min_pts
    )
    return {
        int(v): int(c)
        for v, c in zip(
            t.column("vec_id").to_pylist(), t.column("cluster").to_pylist()
        )
    }


def test_dbscan_border_and_noise(ray_session, tmp_path):
    # a 7-point arc path (18° spacing: consecutive cos ≈ 0.951 ≥ 0.9,
    # skip cos ≈ 0.809 < 0.9) — interior points are core (deg 2),
    # endpoints are genuine BORDER points (deg 1) — plus one isolated
    # noise point orthogonal to the arc plane
    ang = np.deg2rad(np.arange(7) * 18.0)
    arc = np.stack([np.cos(ang), np.sin(ang), np.zeros(7)], axis=1)
    noise = np.array([[0.0, 0.0, 1.0]])
    m = np.concatenate([arc, noise])
    ids = np.arange(len(m), dtype=np.int64)
    threshold, min_pts = 0.9, 3
    want = _brute(m, ids, threshold, min_pts)
    got = _run(m, ids, tmp_path, threshold, min_pts)
    assert got == want
    assert got[0] == 1 and got[6] == 1  # borders attach to the path CC
    assert got[3] == 1  # interior core, component min id = 1
    assert got[7] == -1  # isolated point is noise


def test_dbscan_matches_bruteforce_random(ray_session, tmp_path):
    rng = np.random.RandomState(17)
    centers = rng.randn(4, 8) * 10
    pts = np.concatenate(
        [c + 0.05 * rng.randn(9, 8) for c in centers]
        + [rng.randn(3, 8) * 10]  # strays
    )
    ids = np.arange(len(pts), dtype=np.int64) * 7  # non-dense ids
    want = _brute(pts, ids, 0.95, 5)
    got = _run(pts, ids, tmp_path, 0.95, 5)
    assert got == want
