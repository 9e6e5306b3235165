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

    # materialize the directed edge array once (driver loop filters it;
    # per-round subgraphs rebuild through Graph.build's own shuffles)
    rows = edges_ds.select_columns(["src", "dst"]).take_all()
    src = np.array([r["src"] for r in rows], dtype=np.int64)
    dst = np.array([r["dst"] for r in rows], dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    all_vids = np.unique(np.concatenate([src, dst]))
    label = {}
    remaining = set(all_vids.tolist())

    for rnd in range(max_outer):
        if not remaining:
            break
        mask = np.array(
            [s in remaining and d in remaining for s, d in zip(src, dst)]
        )
        es, ed = src[mask], dst[mask]
        in_edges = set(np.concatenate([es, ed]).tolist())
        # vertices with no surviving edges are singleton SCCs
        for v in remaining - in_edges:
            label[v] = v
        remaining &= in_edges
        if not remaining:
            break
        g = Graph.from_edge_arrays(
            es, ed, os.path.join(workdir, f"g_fwd_{rnd}"),
            num_partitions=num_partitions,
        )
        vid_c, neg = _run(
            g, _MaxColor(), os.path.join(workdir, f"run_fwd_{rnd}"),
            num_partitions,
        )
        color = dict(zip(vid_c.tolist(), (-neg).tolist()))
        pivots = np.array(
            sorted(v for v, c in color.items() if v == c), dtype=np.int64
        )
        # reversed, color-filtered subgraph
        cmask = np.array([color[s] == color[d] for s, d in zip(es, ed)])
        rs, rd = ed[cmask], es[cmask]
        marked = set(pivots.tolist())
        if len(rs):
            g2 = Graph.from_edge_arrays(
                rs, rd, os.path.join(workdir, f"g_bwd_{rnd}"),
                num_partitions=num_partitions,
            )
            vid_m, st = _run(
                g2, _BackMark(pivots),
                os.path.join(workdir, f"run_bwd_{rnd}"), num_partitions,
            )
            marked |= {int(v) for v, s in zip(vid_m, st) if s == 0}
        marked &= remaining
        for v in marked:
            label[v] = color[v]
        remaining -= marked
    if remaining:
        raise RuntimeError(f"scc did not converge in {max_outer} rounds")

    # canonical label = MIN member vid per SCC (colors are max-ids)
    groups: dict = {}
    for v, c in label.items():
        groups.setdefault(c, []).append(v)
    out = {}
    for c, members in groups.items():
        # members sharing a color label in the SAME round are one SCC
        m = min(members)
        for v in members:
            out[v] = m
    vids = np.array(sorted(out), dtype=np.int64)
    return pa.table(
        {
            "vid": pa.array(vids, pa.int64()),
            "scc": pa.array(
                np.array([out[int(v)] for v in vids], np.int64), pa.int64()
            ),
        }
    )
