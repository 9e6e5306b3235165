"""Co-citation analysis — "related pages" over a directed link graph.

Two pages are co-cited when a common source links to both; the
co-citation count (number of shared in-link sources) is the classic
related-page / similar-host signal on web graphs (Small 1973; Dean &
Henzinger 1999 — public literature). The reference has no such
operator; it belongs to the link-graph analytics surface the north rule
targets alongside triangles (whose pair-enumeration shape it shares —
``ClusteringCoefficient.scala:24-47`` is the nearest reference anchor).

Shape: one ``groupby(src)`` co-locates each source's out-neighborhood;
pairs are emitted vectorized (``np.triu_indices`` over the sorted
unique dst list); a per-block partial count combines duplicates before
the hash-partitioned exact sum (``triangles._sum_by_key``); a per-block
partial top-k bounds the final sort to k rows per block.

Skew: a source with out-degree d emits O(d²) pairs — the same hub
blow-up triangles handles by degree orientation. ``max_out_degree``
caps it: over-cap sources keep their lexically-smallest ``cap`` dsts
(deterministic, documented truncation — set None for exact small-scale
runs and SQL parity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithms.triangles import _np, _sum_by_key

_ID_BITS = 32


def _pairs_from_groups(max_out_degree):
    def emit(tbl: pa.Table) -> pa.Table:
        dsts = np.unique(_np(tbl, "dst"))
        if max_out_degree is not None and len(dsts) > max_out_degree:
            dsts = dsts[:max_out_degree]
        if len(dsts) < 2 or dsts[-1] >= (1 << (_ID_BITS - 1)):
            if len(dsts) >= 2:
                raise ValueError("cocitation requires ids < 2^31")
            return pa.table({"key": pa.array([], pa.int64())})
        a, b = np.triu_indices(len(dsts), k=1)
        key = (dsts[a].astype(np.int64) << _ID_BITS) | dsts[b].astype(np.int64)
        return pa.table({"key": pa.array(key, pa.int64())})

    return emit


def cocitation_top_pairs(
    edges_ds,
    k: int = 20,
    max_out_degree=None,
    num_partitions: int = 64,
):
    """Top-k page pairs by co-citation count. Returns a pyarrow Table
    (id_a, id_b, n) ordered by (n desc, id_a asc, id_b asc) — the
    deterministic total order a SQL ROW_NUMBER mirror reproduces."""

    def ones(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "cnt", pa.array(np.ones(tbl.num_rows, np.int64), pa.int64())
        )

    pairs = (
        edges_ds.groupby("src")
        .map_groups(_pairs_from_groups(max_out_degree), batch_format="pyarrow")
        .map_batches(ones, batch_format="pyarrow")
    )
    counts = _sum_by_key(pairs, "key", "cnt", num_partitions=num_partitions)

    def prune(tbl: pa.Table) -> pa.Table:
        if tbl.num_rows <= k:
            return tbl
        key = _np(tbl, "key")
        n = _np(tbl, "cnt")
        order = np.lexsort((key, -n))[:k]
        return tbl.take(pa.array(np.sort(order), pa.int64()))

    top = counts.map_batches(prune, batch_format="pyarrow").take_all()
    top.sort(key=lambda r: (-r["cnt"], r["key"]))
    top = top[:k]
    keys = np.array([r["key"] for r in top], dtype=np.int64)
    cnts = np.array([r["cnt"] for r in top], dtype=np.int64)
    return pa.table(
        {
            "id_a": pa.array(keys >> _ID_BITS, pa.int64()),
            "id_b": pa.array(keys & ((1 << _ID_BITS) - 1), pa.int64()),
            "n": pa.array(cnts, pa.int64()),
        }
    )
