"""Deterministic random-walk sampling over the CSR graph shards.

Random walks are the sampling primitive behind DeepWalk / node2vec
embedding corpora and PPR-Nibble-style local clustering (Perozzi 2014,
Grover 2016 — public literature). The reference engine has no walk
operator; this one reuses the PathQuery frontier machinery
(``pathquery.py``, reference anchor ``examples/PathQuery.scala:28-160``):
each step hash-partitions the walk frontier by its current vertex and
advances it through that partition's CSR block — ONE co-partitioned
exchange per step, never materializing the graph on the driver.

Determinism: the "random" choice at step t of walk w is

    idx = u32(md5(f"{seed}:{w}:{t}")[:4]) mod outdeg(cur)

and the walk moves to the idx-th smallest out-neighbor (CSR segments
are (src, dst)-sorted and globally deduplicated, so the idx-th element
of the segment IS the idx-th smallest). One md5 per live walk per step
— the same reproducible-hash convention as ``functions.sampling``:
stable across runs, machines, partitioning, and engines, and exactly
mirrorable in SQL via ``row_number() OVER (PARTITION BY src ORDER BY
dst)`` + the md5-prefix arithmetic. Walks that reach a sink (no
out-edges in any shard) simply end early, exactly like an inner-join
SQL unroll.

Scale shape: ``walk_len`` sequential exchanges, each linear in the
number of LIVE walks (not edges); per-step state is (walk_id, cur) —
two int64 columns. The trace (walk_id, step, vid) streams out
per-step, so memory never holds more than one frontier.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import part_of

_TRACE_SCHEMA = pa.schema(
    [
        ("walk_id", pa.int64()),
        ("step", pa.int64()),
        ("vid", pa.int64()),
    ]
)


def _empty_frontier() -> pa.Table:
    return pa.table(
        {
            "walk_id": pa.array([], pa.int64()),
            "cur": pa.array([], pa.int64()),
        }
    )


class _WalkStep:
    """Advance every live walk in one graph partition by one step."""

    __name__ = "_WalkStep"

    def __init__(self, csr_refs, step: int, seed: int):
        self._refs = csr_refs
        self.step = step
        self.seed = seed

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        if tbl.num_rows == 0:
            return _empty_frontier()
        p = int(tbl.column("part")[0].as_py())
        ref = self._refs.get(p)
        if ref is None:
            return _empty_frontier()
        csr = ray.get(ref)
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        wid = tbl.column("walk_id").to_numpy(zero_copy_only=False)

        pos = np.searchsorted(csr["src_ids"], cur)
        pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
        found = (pos < len(csr["src_ids"])) & (csr["src_ids"][pos_c] == cur)
        if not found.any():
            return _empty_frontier()
        starts = csr["indptr"][pos_c[found]]
        deg = (csr["indptr"][pos_c[found] + 1] - starts).astype(np.uint64)
        wid_f = wid[found]
        pre = f"{self.seed}:".encode()
        suf = f":{self.step}".encode()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(pre + str(w).encode() + suf).digest()[:4],
                    "big",
                )
                for w in wid_f
            ),
            dtype=np.uint64,
            count=len(wid_f),
        )
        nxt = csr["dst"][starts + (h % deg).astype(np.int64)]
        return pa.table(
            {
                "walk_id": pa.array(wid_f, pa.int64()),
                "cur": pa.array(nxt, pa.int64()),
            }
        )


def random_walks(graph, walk_len: int = 8, seed: int = 42, start_mod: int = 1):
    """Run one deterministic walk of ``walk_len`` steps from every
    graph source vertex with ``vid % start_mod == 0`` (walk_id = the
    start vertex). Returns a Ray Dataset of trace rows
    ``(walk_id, step, vid)`` — step 0 is the start itself; a walk that
    hits a sink stops emitting."""
    import ray.data as rd

    P = graph.num_partitions
    csr_refs = graph.csr_refs()
    refs = csr_refs  # closure capture (dict part → ObjectRef, tiny)

    def seed_frontier(tbl: pa.Table) -> pa.Table:
        import ray

        parts = tbl.column("p").to_numpy(zero_copy_only=False)
        out = []
        for p in parts:
            ref = refs.get(int(p))
            if ref is None:
                continue
            src_ids = ray.get(ref)["src_ids"]
            sel = src_ids[src_ids % start_mod == 0]
            out.append(sel)
        ids = np.concatenate(out) if out else np.empty(0, np.int64)
        return pa.table(
            {
                "walk_id": pa.array(ids, pa.int64()),
                "cur": pa.array(ids, pa.int64()),
            }
        )

    frontier = rd.from_arrow(
        pa.table({"p": pa.array(np.arange(P, dtype=np.int64))})
    ).map_batches(seed_frontier, batch_format="pyarrow", batch_size=1)

    def assign_part(tbl: pa.Table) -> pa.Table:
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "part", pa.array(part_of(cur, P).astype(np.int64))
        )

    def trace(step):
        def f(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            return pa.table(
                {
                    "walk_id": tbl.column("walk_id"),
                    "step": pa.array(np.full(n, step, np.int64), pa.int64()),
                    "vid": tbl.column("cur"),
                }
            )

        return f

    frontier = frontier.materialize()
    traces = [frontier.map_batches(trace(0), batch_format="pyarrow")]
    for step in range(1, walk_len + 1):
        frontier = (
            frontier.map_batches(assign_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_WalkStep(csr_refs, step, seed), batch_format="pyarrow")
            # next step and this step's trace both re-read it
            .materialize()
        )
        if frontier.count() == 0:
            break
        traces.append(frontier.map_batches(trace(step), batch_format="pyarrow"))

    out = traces[0]
    for t in traces[1:]:
        out = out.union(t)
    return out
