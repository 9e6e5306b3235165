"""Hamiltonian / simple-path enumeration — the reference's Hamiltonian
example rebuilt Ray-Data-first (``examples/Hamiltonian.scala:69-128``).

The reference stores, per vertex, a map of every simple path ending at
that vertex (list key, summed edge weight value): edges forward the
source's path map minus paths already containing the target
(``HamiltonianEdge.signal``, ``Hamiltonian.scala:113-128``), and collect
unions the maps (``HamiltonianVertex.collect``, ``Hamiltonian.scala:77-85``).
The fixpoint state holds ALL simple paths — exponential, which the
reference itself flags ("Still need to test performance on complete and
larger graphs"); its constraint comment also requires a bidirectional
graph with no dangling vertices.

Per-vertex unbounded path maps don't fit a columnar vertex state, so —
like PathQuery — the rebuild runs the enumeration as an iterative
FRONTIER expansion over the engine's CSR shards: every vertex seeds a
1-vertex path, each hop hash-partitions the partial-path frontier by its
current vertex, expands through that partition's CSR block, and drops
extensions revisiting a vertex. One co-partitioned exchange per hop; the
union of all hop outputs is exactly the reference's fixpoint state
(path → weight, grouped by final vertex).

The visited set rides along as a 64-bit mask (vertex → bit via the
sorted global vid list), bounding support at 64 distinct vertices —
far beyond where exhaustive path enumeration is feasible anyway.

The reference prints, per vertex, the longest path ending there with the
minimum weight among longest (``HamiltonianVertex.toString``,
``Hamiltonian.scala:88-105``); its Map iteration order makes residual
ties arbitrary, so :func:`best_paths` adds the deterministic final
tie-break "min path string".
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import expand_ranges, part_of

_SCHEMA = pa.schema(
    [
        ("cur", pa.int64()),
        ("visited", pa.uint64()),
        ("path", pa.string()),
        ("w", pa.float64()),
        ("len", pa.int64()),
    ]
)


def _empty() -> pa.Table:
    return _SCHEMA.empty_table()


class _HamHop:
    """Expand every partial path in one graph partition through its
    current vertex's out-edges, dropping revisits."""

    __name__ = "_HamHop"

    def __init__(self, csr_refs, vids_ref):
        self._refs = csr_refs
        self._vids_ref = vids_ref  # sorted global vid array (<= 64)

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        if tbl.num_rows == 0:
            return _empty()
        p = int(tbl.column("part")[0].as_py())
        ref = self._refs.get(p)
        if ref is None:
            return _empty()
        csr = ray.get(ref)
        vids = ray.get(self._vids_ref)
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        visited = tbl.column("visited").to_numpy(zero_copy_only=False)
        paths = tbl.column("path").to_numpy(zero_copy_only=False)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        plen = tbl.column("len").to_numpy(zero_copy_only=False)

        pos = np.searchsorted(csr["src_ids"], cur)
        pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
        found = (pos < len(csr["src_ids"])) & (csr["src_ids"][pos_c] == cur)
        if not found.any():
            return _empty()
        starts = csr["indptr"][pos_c[found]]
        counts = csr["indptr"][pos_c[found] + 1] - starts
        eidx = expand_ranges(starts, counts)
        dst = csr["dst"][eidx]
        ew = csr["weight"][eidx]
        row_idx = np.repeat(np.flatnonzero(found), counts)

        # bit of each destination; the reference requires a bidirectional
        # graph with no dangling vertices — enforce it rather than let a
        # dst missing from the vertex table (Graph.build exclude_vertices
        # keeps such edges in the CSR) silently corrupt the bitmask
        pos_v = np.searchsorted(vids, dst)
        pos_vc = np.minimum(pos_v, len(vids) - 1)
        if not ((pos_v < len(vids)) & (vids[pos_vc] == dst)).all():
            bad = dst[~((pos_v < len(vids)) & (vids[pos_vc] == dst))]
            raise ValueError(
                f"dangling edge destination(s) {np.unique(bad)[:5].tolist()} "
                "not in the vertex table — the Hamiltonian algorithm "
                "requires a bidirectional graph with no dangling vertices"
            )
        bit = pos_v.astype(np.uint64)
        mask = np.uint64(1) << bit
        keep = (visited[row_idx] & mask) == 0
        if not keep.any():
            return _empty()
        ri = row_idx[keep]
        dst_k = dst[keep]
        # per-path string growth happens once per emitted path — the
        # output IS the path set, so this is not reducible below O(paths)
        grown = np.char.add(
            np.char.add(paths[ri].astype(str), ","),
            dst_k.astype(str),
        )
        return pa.table(
            {
                "cur": pa.array(dst_k, pa.int64()),
                "visited": pa.array(visited[ri] | mask[keep], pa.uint64()),
                "path": pa.array(grown, pa.string()),
                "w": pa.array(w[ri] + ew[keep], pa.float64()),
                "len": pa.array(plen[ri] + 1, pa.int64()),
            }
        )


def simple_paths(graph, max_hops: Optional[int] = None):
    """Enumerate every simple path in ``graph`` (the reference fixpoint
    state): returns a Ray Dataset ``(cur, path "v0,v1,..", w, len)`` —
    one row per simple path, ``cur`` its final vertex. Requires <= 64
    vertices (visited-set bitmask), mirroring the reference's
    tiny-graph-only feasibility."""
    import ray
    import ray.data as rd

    vid_arrays = [
        b.column("vid").to_numpy(zero_copy_only=False)
        for b in graph.vertices_ds()
        .select_columns(["vid"])
        .iter_batches(batch_format="pyarrow")
    ]
    vids = (
        np.sort(np.concatenate(vid_arrays))
        if vid_arrays
        else np.array([], dtype=np.int64)
    )
    n = len(vids)
    if n > 64:
        raise ValueError(
            f"simple_paths supports <= 64 vertices (got {n}): the "
            "reference algorithm enumerates all simple paths and is "
            "only feasible on tiny graphs"
        )
    if n == 0:
        return rd.from_arrow(_empty().drop_columns(["visited"]))
    vids_ref = ray.put(vids)
    P = graph.num_partitions
    csr_refs = graph.csr_refs()

    bits = np.uint64(1) << np.arange(n, dtype=np.uint64)
    frontier = rd.from_arrow(
        pa.table(
            {
                "cur": pa.array(vids, pa.int64()),
                "visited": pa.array(bits, pa.uint64()),
                "path": pa.array(vids.astype(str), pa.string()),
                "w": pa.array(np.zeros(n), pa.float64()),
                "len": pa.array(np.full(n, 1), pa.int64()),
            }
        )
    )

    def assign_part(tbl: pa.Table) -> pa.Table:
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "part", pa.array(part_of(cur, P).astype(np.int64))
        )

    hops = n - 1 if max_hops is None else min(max_hops, n - 1)
    results = [frontier]
    for _ in range(hops):
        frontier = (
            frontier.map_batches(assign_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_HamHop(csr_refs, vids_ref), batch_format="pyarrow")
            # the frontier feeds both the next hop and the result union —
            # materialize to stop lazy-branch recompute
            .materialize()
        )
        if frontier.count() == 0:
            break
        results.append(frontier)

    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out.drop_columns(["visited"])


def best_paths(ds) -> pa.Table:
    """Per final vertex: the reference's reported path — longest, then
    minimum weight, then (deterministic extra tie-break) minimum path
    string. Input: :func:`simple_paths` output. Returns
    ``(vid, best_len, best_w, best_path)`` sorted by vid."""

    def pick(tbl: pa.Table) -> pa.Table:
        ln = tbl.column("len").to_numpy(zero_copy_only=False)
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        path = tbl.column("path").to_numpy(zero_copy_only=False).astype(str)
        # lexsort: last key primary
        order = np.lexsort((path, w, -ln))
        i = int(order[0])
        return pa.table(
            {
                "vid": pa.array([tbl.column("cur")[i].as_py()], pa.int64()),
                "best_len": pa.array([int(ln[i])], pa.int64()),
                "best_w": pa.array([float(w[i])], pa.float64()),
                "best_path": pa.array([str(path[i])], pa.string()),
            }
        )

    parts = ds.groupby("cur").map_groups(pick, batch_format="pyarrow")
    batches = list(parts.sort("vid").iter_batches(batch_format="pyarrow"))
    out_schema = pa.schema(
        [
            ("vid", pa.int64()),
            ("best_len", pa.int64()),
            ("best_w", pa.float64()),
            ("best_path", pa.string()),
        ]
    )
    if not batches:
        return out_schema.empty_table()
    return pa.concat_tables(batches).cast(out_schema)
