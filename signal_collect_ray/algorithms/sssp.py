"""Single-source shortest paths.

Reference: ``examples/Sssp.scala:32-79`` — ``Location`` is a
DataFlowVertex with state ``Option[Int]`` (unknown = None) and ``Path``
an OptionalSignalEdge: signal = dist + weight when known, collect = min
(delta/on-delivery fold, ``DataFlowVertex.scala:47-54``). Min is
associative+commutative ⇒ combiner-safe. Unknown distance is encoded as
+inf; only vertices whose distance improved signal next round.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithm import Algorithm, StateDict
from signal_collect_ray.util import segment_min


class SSSP(Algorithm):
    name = "sssp"
    state_pa_type = pa.float64()
    signal_fields = [("val", pa.float64())]
    dense_agg = "min"
    dense_identity = np.inf
    dense_dtype = np.float64

    def __init__(self, source_vid: int):
        self.source = int(source_vid)

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = np.full(n, np.inf)
        is_src = vid == self.source
        state[is_src] = 0.0
        return {
            "state": state,
            "last": state.copy(),
            "active": is_src.copy(),
            "residual": is_src.astype(np.float64),
        }

    def src_values(self, sub: StateDict) -> StateDict:
        return {"dist": sub["state"]}

    def edge_values(self, expanded: StateDict, weight) -> StateDict:
        return {"val": expanded["dist"] + weight}

    def combine(self, dst, values):
        d, v = segment_min(dst, values["val"])
        return d, {"val": v}

    def collect(self, prev, dst, sig, signal_threshold) -> StateDict:
        state = prev["state"].copy()
        if len(dst):
            idx = self._align(prev["vid"], dst)
            state[idx] = np.minimum(state[idx], sig["val"])
        changed = state < prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }

    def collect_dense(self, prev, inc, signal_threshold):
        state = np.minimum(prev["state"], inc)
        changed = state < prev["state"]
        return {
            "state": state,
            "last": state.copy(),
            "active": changed,
            "residual": changed.astype(np.float64),
        }


class MultiSourceBFS(SSSP):
    """Unweighted BFS from a SOURCE SET: dist(v) = min hops from any
    source (finite ⇔ reachable). The reachability primitive of the
    Broder et al. (2000) bow-tie decomposition — run once forward from
    the core SCC and once on the reversed graph. Identical monotone
    min-fold to SSSP (dense min fast path, frontier-only signaling);
    only ``init`` seeds a set instead of a single vid."""

    name = "msbfs"

    def __init__(self, sources):
        self.sources = np.asarray(
            sorted(set(int(s) for s in sources)), np.int64
        )

    def init(self, vid, out_degree, sum_out_weight) -> StateDict:
        n = len(vid)
        state = np.full(n, np.inf)
        is_src = np.isin(vid, self.sources)
        state[is_src] = 0.0
        return {
            "state": state,
            "last": state.copy(),
            "active": is_src.copy(),
            "residual": is_src.astype(np.float64),
        }


# Above this many vertices the distance map is attached by two
# co-partitioned joins instead of broadcast (same rationale as
# triangles.BROADCAST_DEGREE_LIMIT).
BROADCAST_DIST_LIMIT = 20_000_000


def shortest_path_tree(edges_ds, state_table, num_partitions: int = 32):
    """Shortest-path-tree parents from a converged unweighted SSSP
    state: ``parent(v) = min { u : (u,v) ∈ E, dist(u) + 1 = dist(v) }``
    — the deterministic predecessor extraction (reference's Path edges
    carry the route implicitly; this materializes it). One streaming
    pass over the edges with the (vid, dist) arrays broadcast
    (``ray.put`` once, two searchsorted lookups per batch) below
    ``BROADCAST_DIST_LIMIT`` vertices, else two co-partitioned hash
    joins (``triangles._attach``); per-batch segment-min pre-combine,
    one hash exchange, exact min per vertex. Source and unreachable
    vertices emit no row. Returns a Dataset (vid, parent)."""
    import ray
    import ray.data as rd

    from signal_collect_ray.algorithms.triangles import _attach, _np
    from signal_collect_ray.util import part_of, segment_min

    vids = state_table.column("vid").to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    dist = state_table.column("state").to_numpy(zero_copy_only=False).astype(
        np.float64
    )
    order = np.argsort(vids, kind="stable")
    vs, dv = vids[order], dist[order]

    def emit(s, d, ds_, dd):
        ok = np.isfinite(ds_) & np.isfinite(dd) & (dd == ds_ + 1.0)
        v, p = d[ok], s[ok]
        v, p = segment_min(v, p)
        return pa.table(
            {
                "gpart": pa.array(part_of(v, num_partitions), pa.int32()),
                "vid": pa.array(v, pa.int64()),
                "parent": pa.array(p.astype(np.int64), pa.int64()),
            }
        )

    if len(vs) <= BROADCAST_DIST_LIMIT:
        ref = ray.put((vs, dv))

        class _Cand:
            __name__ = "_Cand"

            def __init__(self, ref):
                self.ref = ref
                self._m = None

            def _lookup(self, ids):
                if self._m is None:
                    import ray as _r

                    self._m = _r.get(self.ref)
                mv, md = self._m
                pos = np.searchsorted(mv, ids)
                pos_c = np.minimum(pos, len(mv) - 1)
                hit = (pos < len(mv)) & (mv[pos_c] == ids)
                out = np.full(len(ids), np.inf)
                out[hit] = md[pos_c[hit]]
                return out

            def __call__(self, tbl: pa.Table) -> pa.Table:
                s, d = _np(tbl, "src"), _np(tbl, "dst")
                return emit(s, d, self._lookup(s), self._lookup(d))

        cand = edges_ds.select_columns(["src", "dst"]).map_batches(
            _Cand(ref), batch_format="pyarrow"
        )
    else:
        dist_ds = rd.from_arrow(
            pa.table(
                {
                    "vid": pa.array(vs, pa.int64()),
                    "d": pa.array(dv, pa.float64()),
                }
            )
        )
        with_s = _attach(
            edges_ds.select_columns(["src", "dst"]),
            "src",
            dist_ds.rename_columns(["vid", "d_src"]),
            "vid",
            ["d_src"],
            num_partitions,
        )
        with_d = _attach(
            with_s, "dst", dist_ds.rename_columns(["vid", "d_dst"]), "vid",
            ["d_dst"], num_partitions,
        )

        def kernel(tbl: pa.Table) -> pa.Table:
            return emit(
                _np(tbl, "src"), _np(tbl, "dst"),
                tbl.column("d_src").to_numpy(zero_copy_only=False),
                tbl.column("d_dst").to_numpy(zero_copy_only=False),
            )

        cand = with_d.map_batches(kernel, batch_format="pyarrow")

    def final(tbl: pa.Table) -> pa.Table:
        v, p = segment_min(_np(tbl, "vid"), _np(tbl, "parent"))
        return pa.table(
            {
                "vid": pa.array(v, pa.int64()),
                "parent": pa.array(p.astype(np.int64), pa.int64()),
            }
        )

    return cand.groupby("gpart").map_groups(final, batch_format="pyarrow")
