"""Strongly connected components — forward-backward coloring
(Fleischer/Hendrickson/Pinar 2000; Orzan 2004 — public literature): the
classic web-graph bowtie analysis the reference's vertex-centric model
is built for, realized as a driver loop over two of THIS engine's
min-label propagations per round:

1. **Color** (forward): propagate the maximum vid along edges to
   convergence — ``color(v)`` = max vid among v's ancestors ∪ v.
   Implemented as ConnectedComponents' min fold over NEGATED ids on the
   directed graph (same combiner, same dense path).
2. **Mark** (backward, color-restricted): a pivot is a vertex that is
   its own color; ``SCC(pivot)`` = vertices that can reach their pivot
   through SAME-COLOR edges. Implemented as a 0/1 min fold seeded at
   the pivots over the REVERSED color-filtered subgraph.
3. Remove every marked vertex (each belongs to exactly one finished
   SCC, labeled by its color), keep edges between unmarked vertices,
   repeat. Vertices that drop out of the surviving edge set are
   singleton SCCs by construction.

Web graphs finish in a handful of outer rounds (the giant SCC falls in
round one). Colors are looked up via a byte-capped broadcast of the
(vid, color) arrays — at 100 TB replace with the co-partitioned
annotate used by ``graph.py``'s dst_gidx fallback; the per-round engine
runs themselves already scale.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithms.components import ConnectedComponents
from signal_collect_ray.config import EngineConfig
from signal_collect_ray.engine_resident import ResidentEngine
from signal_collect_ray.graph import Graph
from signal_collect_ray.util import isin_sorted


class _MaxColor(ConnectedComponents):
    """Max-ancestor-vid propagation = CC's min fold over negated ids."""

    name = "scc_color"

    def init(self, vid, out_degree, sum_out_weight):
        n = len(vid)
        s = -vid.astype(np.int64)
        return {
            "state": s.copy(),
            "last": s.copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }


class _BackMark(ConnectedComponents):
    """0/1 reachability-to-pivot fold (0 = marked, min-combine)."""

    name = "scc_mark"

    def __init__(self, pivots_sorted: np.ndarray):
        self.pivots = pivots_sorted

    def init(self, vid, out_degree, sum_out_weight):
        n = len(vid)
        hit, _ = isin_sorted(self.pivots, vid.astype(np.int64))
        s = np.where(hit, 0, 1).astype(np.int64)
        return {
            "state": s.copy(),
            "last": s.copy(),
            "active": np.ones(n, dtype=bool),
            "residual": np.ones(n),
        }


def _run(graph, algo, run_dir, num_partitions):
    eng = ResidentEngine(
        EngineConfig(
            num_partitions=num_partitions, eps=0.0, max_supersteps=500
        ),
        num_workers=2,
    )
    info = eng.run(graph, algo, run_dir=run_dir, resume=False,
                   checkpoint_interval=100)
    t = info.state_table()
    return (
        t.column("vid").to_numpy(zero_copy_only=False).astype(np.int64),
        t.column("state").to_numpy(zero_copy_only=False).astype(np.int64),
    )


def scc_labels(edges_ds, workdir: str, num_partitions: int = 4,
               max_outer: int = 50) -> pa.Table:
    """SCC label (minimum member vid) per vertex of the directed graph.
    Returns a pyarrow Table (vid, scc) sorted by vid."""
    import ray

    # materialize the directed edge array once (driver loop filters it
    # with sorted-array numpy kernels — no per-edge Python; per-round
    # subgraphs rebuild through Graph.build's own shuffles)
    et = pa.concat_tables(
        list(
            edges_ds.select_columns(["src", "dst"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
    )
    src = et.column("src").to_numpy(zero_copy_only=False).astype(np.int64)
    dst = et.column("dst").to_numpy(zero_copy_only=False).astype(np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    remaining = np.unique(np.concatenate([src, dst]))  # sorted
    lab_vids: list = []  # finished vertices, per round
    lab_sccs: list = []  # their canonical labels (min member vid)

    for rnd in range(max_outer):
        if not len(remaining):
            break
        hs, _ = isin_sorted(remaining, src)
        hd, _ = isin_sorted(remaining, dst)
        mask = hs & hd
        es, ed = src[mask], dst[mask]
        in_edges = np.unique(np.concatenate([es, ed]))  # sorted
        # vertices with no surviving edges are singleton SCCs
        has_e, _ = isin_sorted(in_edges, remaining)
        singles = remaining[~has_e]
        lab_vids.append(singles)
        lab_sccs.append(singles)
        remaining = remaining[has_e]
        if not len(remaining):
            break
        g = Graph.from_edge_arrays(
            es, ed, os.path.join(workdir, f"g_fwd_{rnd}"),
            num_partitions=num_partitions,
        )
        vid_c, neg = _run(
            g, _MaxColor(), os.path.join(workdir, f"run_fwd_{rnd}"),
            num_partitions,
        )
        order = np.argsort(vid_c, kind="stable")
        vid_c, col = vid_c[order], -neg[order]  # sorted by vid
        pivots = vid_c[vid_c == col]  # sorted
        # reversed, color-filtered subgraph (colors via searchsorted —
        # every surviving endpoint appears in vid_c by construction)
        cs = col[np.searchsorted(vid_c, es)]
        cd = col[np.searchsorted(vid_c, ed)]
        cmask = cs == cd
        rs, rd = ed[cmask], es[cmask]
        if len(rs):
            g2 = Graph.from_edge_arrays(
                rs, rd, os.path.join(workdir, f"g_bwd_{rnd}"),
                num_partitions=num_partitions,
            )
            vid_m, st = _run(
                g2, _BackMark(pivots),
                os.path.join(workdir, f"run_bwd_{rnd}"), num_partitions,
            )
            marked = np.unique(np.concatenate([pivots, vid_m[st == 0]]))
        else:
            marked = pivots
        hit, _ = isin_sorted(marked, remaining)
        done = remaining[hit]  # sorted vids finishing this round
        if not len(done):
            raise RuntimeError("scc made no progress (pivot not marked)")
        # their SCC label: min member vid per color (colors are max-ids,
        # unique per SCC within a round and never reused across rounds)
        dcol = col[np.searchsorted(vid_c, done)]
        corder = np.argsort(dcol, kind="stable")
        dv, dc = done[corder], dcol[corder]
        starts = np.flatnonzero(np.r_[True, dc[1:] != dc[:-1]])
        mins = np.minimum.reduceat(dv, starts)
        grp = np.cumsum(np.r_[False, dc[1:] != dc[:-1]])
        lab_vids.append(dv)
        lab_sccs.append(mins[grp])
        remaining = remaining[~hit]
    if len(remaining):
        raise RuntimeError(f"scc did not converge in {max_outer} rounds")

    vids = np.concatenate(lab_vids) if lab_vids else np.empty(0, np.int64)
    sccs = np.concatenate(lab_sccs) if lab_sccs else np.empty(0, np.int64)
    order = np.argsort(vids, kind="stable")
    return pa.table(
        {
            "vid": pa.array(vids[order].astype(np.int64), pa.int64()),
            "scc": pa.array(sccs[order].astype(np.int64), pa.int64()),
        }
    )
