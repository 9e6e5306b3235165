"""Co-citation analysis — "related pages" over a directed link graph.

Two pages are co-cited when a common source links to both; the
co-citation count (number of shared in-link sources) is the classic
related-page / similar-host signal on web graphs (Small 1973; Dean &
Henzinger 1999 — public literature). The reference has no such
operator; it belongs to the link-graph analytics surface the north rule
targets alongside triangles (whose pair-enumeration shape it shares —
``ClusteringCoefficient.scala:24-47`` is the nearest reference anchor).

Shape: one hash-partitioned ``groupby(spart)`` co-locates each source's
out-neighborhood (ONE kernel call per partition, not per source);
pairs are emitted vectorized (``np.triu_indices`` per distinct segment
length over the sorted dst segments) and routed by a 64-bit PAIR HASH
— the hash only
partitions, counting inside each partition is exact over the (id_a,
id_b) columns, so arbitrary int64 ids (hashed url vids) are supported
with no collision risk. A per-partition top-k prune bounds what reaches
the driver to k rows per partition.

Skew: a source with out-degree d emits O(d²) pairs — the same hub
blow-up triangles handles by degree orientation. ``max_out_degree``
caps it: over-cap sources keep their lexically-smallest ``cap`` dsts
(deterministic, documented truncation — set None for exact small-scale
runs and SQL parity).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.algorithms.triangles import _np
from signal_collect_ray.util import pair_hash, part_of


def _pairs_from_partition(max_out_degree, num_partitions):
    """One spart group (MANY sources) → co-citation pair rows. No
    per-source Python: sources are ragged segments of the (src, dst)
    sort; segments sharing a length L emit through ONE
    ``np.triu_indices(L)`` broadcast (distinct segment lengths are few
    hundred at most, each handled with whole-array gathers)."""

    def emit(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gpart": pa.array([], pa.int32()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
            }
        )
        s, d = _np(tbl, "src"), _np(tbl, "dst")
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        # drop duplicate (src, dst) rows (sorted ⇒ adjacent)
        first = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        s, d = s[first], d[first]
        if len(s) < 2:
            return empty
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        lens = np.diff(np.r_[starts, len(s)])
        if max_out_degree is not None:
            rank = np.arange(len(s)) - np.repeat(starts, lens)
            keep = rank < max_out_degree
            s, d = s[keep], d[keep]
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            lens = np.diff(np.r_[starts, len(s)])
        ia_all, ib_all = [], []
        for L in np.unique(lens):
            if L < 2:
                continue
            segs = starts[lens == L]
            mat = d[segs[:, None] + np.arange(L)]
            ai, bi = np.triu_indices(int(L), k=1)
            ia_all.append(mat[:, ai].ravel())
            ib_all.append(mat[:, bi].ravel())
        if not ia_all:
            return empty
        ia = np.concatenate(ia_all).astype(np.int64)
        ib = np.concatenate(ib_all).astype(np.int64)
        gp = part_of(pair_hash(ia, ib).view(np.int64), num_partitions)
        return pa.table(
            {
                "gpart": pa.array(gp, pa.int32()),
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
            }
        )

    return emit


def _weighted_pairs_from_partition(max_out_degree, num_partitions):
    """Adamic–Adar variant of ``_pairs_from_partition``: every pair a
    source emits carries weight 1/ln(outdeg(source)) — rare co-citing
    sources count more than hub directories (Adamic & Adar 2003,
    'Friends and neighbors on the Web' — public literature). The
    weight uses the TRUE deduplicated out-degree even when
    ``max_out_degree`` truncates emission (documented approximation,
    None = exact)."""

    def emit(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gpart": pa.array([], pa.int32()),
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "w": pa.array([], pa.float64()),
            }
        )
        s, d = _np(tbl, "src"), _np(tbl, "dst")
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        first = np.r_[True, (s[1:] != s[:-1]) | (d[1:] != d[:-1])]
        s, d = s[first], d[first]
        if len(s) < 2:
            return empty
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        lens = np.diff(np.r_[starts, len(s)])
        true_lens = lens
        if max_out_degree is not None:
            rank = np.arange(len(s)) - np.repeat(starts, lens)
            keep = rank < max_out_degree
            s, d = s[keep], d[keep]
            starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
            true_lens = true_lens[true_lens > 0]
            lens = np.diff(np.r_[starts, len(s)])
        ia_all, ib_all, w_all = [], [], []
        for L in np.unique(lens):
            if L < 2:
                continue
            seg_mask = lens == L
            segs = starts[seg_mask]
            mat = d[segs[:, None] + np.arange(L)]
            ai, bi = np.triu_indices(int(L), k=1)
            ia_all.append(mat[:, ai].ravel())
            ib_all.append(mat[:, bi].ravel())
            w_all.append(
                np.repeat(1.0 / np.log(true_lens[seg_mask]), len(ai))
            )
        if not ia_all:
            return empty
        ia = np.concatenate(ia_all).astype(np.int64)
        ib = np.concatenate(ib_all).astype(np.int64)
        w = np.concatenate(w_all)
        gp = part_of(pair_hash(ia, ib).view(np.int64), num_partitions)
        return pa.table(
            {
                "gpart": pa.array(gp, pa.int32()),
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
                "w": pa.array(w, pa.float64()),
            }
        )

    return emit


def adamic_adar_top_pairs(
    edges_ds,
    k: int = 20,
    max_out_degree=None,
    num_partitions: int = 64,
):
    """Top-k page pairs by Adamic–Adar score over shared in-link
    sources: AA(a,b) = Σ_{s links both} 1/ln(outdeg(s)) — the classic
    link-prediction / related-page ranking that discounts directory
    hubs. Same two-exchange shape as ``cocitation_top_pairs`` (the
    source's full out-neighborhood is co-located by the ``spart``
    groupby, so the true out-degree — and hence the weight — is exact
    inside the kernel with no degree join); the pair hash routes every
    instance of a pair to one partition, so the per-partition sum and
    top-k prune are exact. Scores round to 6 digits BEFORE the prune so
    the SQL mirror decides every boundary row identically; ties break
    (id_a, id_b) ascending. Returns a pyarrow Table (id_a, id_b, aa)."""

    def sum_and_prune(tbl: pa.Table) -> pa.Table:
        a = _np(tbl, "id_a")
        b = _np(tbl, "id_b")
        w = tbl.column("w").to_numpy(zero_copy_only=False)
        pairs = np.stack([a, b], axis=1)
        u, inv = np.unique(pairs, axis=0, return_inverse=True)
        s = np.zeros(len(u))
        np.add.at(s, inv, w)
        s = np.round(s, 6)
        if len(u) > k:
            order = np.lexsort((u[:, 1], u[:, 0], -s))[:k]
            u, s = u[order], s[order]
        return pa.table(
            {
                "id_a": pa.array(u[:, 0], pa.int64()),
                "id_b": pa.array(u[:, 1], pa.int64()),
                "aa": pa.array(s, pa.float64()),
            }
        )

    def add_spart(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "spart",
            pa.array(part_of(_np(tbl, "src"), num_partitions), pa.int32()),
        )

    pairs = (
        edges_ds.map_batches(add_spart, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(
            _weighted_pairs_from_partition(max_out_degree, num_partitions),
            batch_format="pyarrow",
        )
    )
    top = (
        pairs.groupby("gpart")
        .map_groups(sum_and_prune, batch_format="pyarrow")
        .take_all()
    )
    top.sort(key=lambda r: (-r["aa"], r["id_a"], r["id_b"]))
    top = top[:k]
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in top], pa.int64()),
            "id_b": pa.array([r["id_b"] for r in top], pa.int64()),
            "aa": pa.array([r["aa"] for r in top], pa.float64()),
        }
    )


def cocitation_top_pairs(
    edges_ds,
    k: int = 20,
    max_out_degree=None,
    num_partitions: int = 64,
):
    """Top-k page pairs by co-citation count. Returns a pyarrow Table
    (id_a, id_b, n) ordered by (n desc, id_a asc, id_b asc) — the
    deterministic total order a SQL ROW_NUMBER mirror reproduces."""

    def count_and_prune(tbl: pa.Table) -> pa.Table:
        a = _np(tbl, "id_a")
        b = _np(tbl, "id_b")
        pairs = np.stack([a, b], axis=1)
        u, c = np.unique(pairs, axis=0, return_counts=True)
        if len(u) > k:
            order = np.lexsort((u[:, 1], u[:, 0], -c))[:k]
            u, c = u[order], c[order]
        return pa.table(
            {
                "id_a": pa.array(u[:, 0], pa.int64()),
                "id_b": pa.array(u[:, 1], pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    def add_spart(tbl: pa.Table) -> pa.Table:
        return tbl.append_column(
            "spart",
            pa.array(part_of(_np(tbl, "src"), num_partitions), pa.int32()),
        )

    pairs = (
        edges_ds.map_batches(add_spart, batch_format="pyarrow")
        .groupby("spart")
        .map_groups(
            _pairs_from_partition(max_out_degree, num_partitions),
            batch_format="pyarrow",
        )
    )
    top = (
        pairs.groupby("gpart")
        .map_groups(count_and_prune, batch_format="pyarrow")
        .take_all()
    )
    top.sort(key=lambda r: (-r["n"], r["id_a"], r["id_b"]))
    top = top[:k]
    return pa.table(
        {
            "id_a": pa.array([r["id_a"] for r in top], pa.int64()),
            "id_b": pa.array([r["id_b"] for r in top], pa.int64()),
            "n": pa.array([r["n"] for r in top], pa.int64()),
        }
    )
