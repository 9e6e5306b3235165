"""pack_sequences conformance vs a per-token Python simulation."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from signal_collect_ray.functions.text import pack_sequences
from signal_collect_ray.util import part_of


def _simulate(ids, lens, L, shards):
    """Append each doc's tokens one-by-one to its shard's stream."""
    out = set()
    stream_pos = {}
    for doc, n in sorted(zip(ids, lens)):
        if n == 0:
            continue
        sh = int(part_of(np.array([doc], np.int64), shards)[0])
        spans = {}
        for t in range(n):
            pos = stream_pos.get(sh, 0) + t
            blk = pos // L
            a, b = spans.get(blk, (t, t))
            spans[blk] = (min(a, t), max(b, t))
        stream_pos[sh] = stream_pos.get(sh, 0) + n
        for blk, (a, b) in spans.items():
            out.add((sh, blk, doc, a, b - a + 1))
    return out


def test_pack_sequences_matches_simulation(ray_session):
    rng = np.random.RandomState(3)
    ids = np.arange(100, dtype=np.int64)
    rng.shuffle(ids)
    lens = rng.randint(0, 40, 100).astype(np.int64)
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(lens, pa.int64())}
        )
    )
    got = {
        (r["shard"], r["block"], r["doc_id"], r["doc_off"], r["n_tok"])
        for r in pack_sequences(ds, seq_len=16, num_shards=4).take_all()
    }
    assert got == _simulate(ids.tolist(), lens.tolist(), 16, 4)


def test_pack_sequences_block_budget(ray_session):
    """Every block except each shard's last carries exactly seq_len."""
    rng = np.random.RandomState(5)
    ids = np.arange(60, dtype=np.int64)
    lens = rng.randint(1, 50, 60).astype(np.int64)
    ds = rd.from_arrow(
        pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "n": pa.array(lens, pa.int64())}
        )
    )
    rows = pack_sequences(ds, seq_len=32, num_shards=3).take_all()
    per_block = {}
    for r in rows:
        per_block[(r["shard"], r["block"])] = (
            per_block.get((r["shard"], r["block"]), 0) + r["n_tok"]
        )
    last = {}
    for sh, blk in per_block:
        last[sh] = max(last.get(sh, -1), blk)
    for (sh, blk), tot in per_block.items():
        if blk < last[sh]:
            assert tot == 32, (sh, blk, tot)
        else:
            assert 1 <= tot <= 32
