"""4-cycle (rectangle / butterfly) counting over the undirected simple
graph — the next motif up from triangles (reference's vertex-centric
triangle counting: ``IntegrationSpec``-style graph analytics; 4-cycles
are the standard spam-farm / near-bipartite-core signal in link-graph
analysis, Wang et al. 2014 "butterfly counting", public literature).

Exact identity: every 4-cycle u–v–w–x has exactly two diagonal pairs
({u,w} and {v,x}), and a pair {u,w} with ``c`` common neighbours is the
diagonal of C(c,2) distinct 4-cycles, so

    #C4 = 1/2 · Σ_{u<w} C(codeg(u, w), 2).

Pipeline (two exchanges, same shape as cocitation):
1. symmetrize the unique undirected edge set and co-partition by the
   wedge CENTER (``spart`` groupby) — each center's full neighbourhood
   is local, so the neighbour-pair emission kernel
   (``cocitation._pairs_from_partition``) is exact and vectorized
   (one ``np.triu_indices`` gather per distinct segment length);
2. route each unordered pair to one partition by its pair hash and
   reduce: per-partition ``np.unique`` counts give codeg, Σ C(c,2)
   folds to ONE int64 per partition — the driver sums W partials.

Cost is the unavoidable Σ_v C(deg v, 2) wedge emission (the butterfly
bound); ``max_degree`` caps hub centers for an approximate count at
100-TB hub skew (None = exact, the oracle-checked default).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithms.cocitation import _pairs_from_partition
from signal_collect_ray.algorithms.triangles import _np, _unique_undirected
from signal_collect_ray.util import part_of


def rectangle_count(
    edges_ds, num_partitions: int = 64, max_degree=None
) -> int:
    """Exact number of 4-cycles in the undirected simple graph of
    ``edges_ds`` (src, dst; direction and duplicates ignored,
    self-loops dropped)."""
    und = _unique_undirected(edges_ds)

    def sym(tbl: pa.Table) -> pa.Table:
        a, b = _np(tbl, "a"), _np(tbl, "b")
        v = np.concatenate([a, b])
        n = np.concatenate([b, a])
        return pa.table(
            {
                "spart": pa.array(part_of(v, num_partitions), pa.int32()),
                "src": pa.array(v, pa.int64()),
                "dst": pa.array(n, pa.int64()),
            }
        )

    pairs = (
        und.map_batches(sym, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(
            _pairs_from_partition(max_degree, num_partitions),
            batch_format="pyarrow",
        )
    )

    def partial(tbl: pa.Table) -> pa.Table:
        a, b = _np(tbl, "id_a"), _np(tbl, "id_b")
        key = np.stack([a, b], axis=1)
        _, cnt = np.unique(key, axis=0, return_counts=True)
        c = cnt.astype(np.int64)
        tot = int((c * (c - 1) // 2).sum())
        return pa.table({"part": pa.array([tot], pa.int64())})

    parts = (
        pairs.groupby("gpart")
        .map_groups(partial, batch_format="pyarrow")
        .take_all()
    )
    return sum(int(r["part"]) for r in parts) // 2
