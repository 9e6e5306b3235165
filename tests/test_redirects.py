"""Redirect-chain pointer doubling: resolution semantics, round
sufficiency, and broadcast-vs-join path equality (cap=0 A/B)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from signal_collect_ray.algorithms.redirects import resolve_redirects


def _planted(n, block):
    vid = np.arange(n, dtype=np.int64)
    nxt = np.where((vid % block == block - 1) | (vid == n - 1), vid, vid + 1)
    return rd.from_arrow(
        pa.table({"vid": pa.array(vid), "next": pa.array(nxt)})
    )


def _expected(n, block):
    vid = np.arange(n, dtype=np.int64)
    return np.minimum((vid // block) * block + block - 1, n - 1)


def _as_map(ds):
    t = pa.concat_tables(ds.iter_batches(batch_format="pyarrow", batch_size=None))
    return dict(zip(t.column("vid").to_pylist(), t.column("final").to_pylist()))


def test_resolves_full_chain(tmp_path):
    n, block = 300, 50
    got = _as_map(resolve_redirects(_planted(n, block), rounds=6))
    exp = _expected(n, block)
    assert all(got[v] == exp[v] for v in range(n))


def test_insufficient_rounds_shortcut_only(tmp_path):
    # 2 rounds shortcut exactly 4 hops: vid 0 in a 50-block lands at 4
    got = _as_map(resolve_redirects(_planted(100, 50), rounds=2))
    assert got[0] == 4
    assert got[46] == 49  # 3 hops away: clamped at the sink


def test_join_fallback_matches_broadcast(tmp_path):
    n, block = 200, 32
    fast = _as_map(resolve_redirects(_planted(n, block), rounds=5))
    slow = _as_map(
        resolve_redirects(
            _planted(n, block), rounds=5,
            max_broadcast_bytes=0, num_partitions=4,
        )
    )
    assert fast == slow
