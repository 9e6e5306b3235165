"""Partition modularity of a directed graph.

Newman modularity (Leicht & Newman 2008, directed form — public
literature) of a vertex partition ``c(v)``:

    Q = sum_c within_c / m  -  sum_c (ko_c * ki_c) / m^2

where ``m`` is the edge count, ``within_c`` the number of edges with
both endpoints in community ``c``, and ``ko_c`` / ``ki_c`` the total
out- / in-degree mass of ``c``. The reference frames community quality
through its label-propagation examples (``ChineseWhispers.scala``);
modularity is the standard score a user of those pipelines computes
next, so it belongs in the library surface.

Scale shape: one ``map_batches`` pass emits per-block per-community
partial rows (``|C|`` rows per block, pre-aggregated in numpy), a
``groupby(c)`` carries only ``blocks x |C|`` tiny rows, and the final
formula folds ``|C|`` rows on the driver. No edge ever crosses the
wire twice; skewed communities cost nothing beyond their edge scan.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pyarrow as pa


class _CommunityPartials:
    """Edge block → per-community (ko, ki, within) partial counts."""

    __name__ = "_CommunityPartials"

    def __init__(self, comm_fn: Callable[[np.ndarray], np.ndarray]):
        self.comm_fn = comm_fn

    def __call__(self, tbl: pa.Table) -> pa.Table:
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        cs = np.asarray(self.comm_fn(s), dtype=np.int64)
        cd = np.asarray(self.comm_fn(d), dtype=np.int64)
        comms, inv_s = np.unique(np.concatenate([cs, cd]), return_inverse=True)
        n = len(comms)
        ko = np.bincount(inv_s[: len(cs)], minlength=n)
        ki = np.bincount(inv_s[len(cs):], minlength=n)
        within = np.bincount(
            inv_s[: len(cs)], weights=(cs == cd).astype(np.float64), minlength=n
        ).astype(np.int64)
        return pa.table(
            {
                "c": pa.array(comms, pa.int64()),
                "ko": pa.array(ko, pa.int64()),
                "ki": pa.array(ki, pa.int64()),
                "within": pa.array(within, pa.int64()),
            }
        )


def partition_modularity(edges_ds, comm_fn: Callable[[np.ndarray], np.ndarray]):
    """Directed-graph modularity of the partition induced by
    ``comm_fn`` (a vectorized vid→community map, e.g. a host prefix).
    Returns a one-row pyarrow Table ``{"modularity": float64}``
    (rounded to 6 digits, matching the repo's oracle convention)."""
    from ray.data.aggregate import Sum

    parts = edges_ds.select_columns(["src", "dst"]).map_batches(
        _CommunityPartials(comm_fn), batch_format="pyarrow"
    )
    rows = (
        parts.groupby("c")
        .aggregate(
            Sum("ko", alias_name="ko"),
            Sum("ki", alias_name="ki"),
            Sum("within", alias_name="within"),
        )
        .take_all()
    )
    ko = np.array([r["ko"] for r in rows], dtype=np.float64)
    ki = np.array([r["ki"] for r in rows], dtype=np.float64)
    within = np.array([r["within"] for r in rows], dtype=np.float64)
    m = ko.sum()
    q = 0.0 if m == 0 else within.sum() / m - float(ko @ ki) / (m * m)
    return pa.table({"modularity": pa.array([round(q, 6)], pa.float64())})


class _ArgmaxMove:
    """One src-hash partition of move candidates → (vid, label) after
    the greedy local move. Vectorized: one np.lexsort over the
    partition picks every vertex's best candidate at once."""

    __name__ = "_ArgmaxMove"

    def __init__(self, m2: float, active_mod: int, active_cls: int):
        self.m2 = m2          # total DIRECTED edge count = 2m
        self.active_mod = active_mod
        self.active_cls = active_cls

    def __call__(self, tbl: pa.Table) -> pa.Table:
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        cand = tbl.column("dst_label").to_numpy(zero_copy_only=False)
        k = tbl.column("k").to_numpy(zero_copy_only=False).astype(np.float64)
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        deg = tbl.column("deg").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        volc = tbl.column("vol_c").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        m = self.m2 / 2.0
        # ΔQ of i being in community c (vs isolated), volumes excluding i:
        #   k_ic/m − deg_i·(vol_c − [c==cur]·deg_i)/(2m²)
        vol_ex = volc - (cand == cur) * deg
        score = k / m - deg * vol_ex / (2.0 * m * m)
        # staying in cur is always a candidate: a (cur, k_icur) row exists
        # whenever any neighbor shares cur; when none does its stay score
        # is 0 − deg²·0 … = deg_i·(vol_cur−deg_i) term with k=0 — append
        # explicit stay rows upstream guarantees it (see louvain_one_level)
        order = np.lexsort((cand, -score, src))
        first = np.ones(len(order), dtype=bool)
        first[1:] = src[order][1:] != src[order][:-1]
        pick = order[first]
        # only the active hash class moves this round (the MIS/coloring
        # trick: simultaneous conflicting moves cannot oscillate)
        active = (src[pick] % self.active_mod) == self.active_cls
        new_label = np.where(active, cand[pick], cur[pick])
        return pa.table(
            {
                "vid": pa.array(src[pick], pa.int64()),
                "label": pa.array(new_label, pa.int64()),
            }
        )


def louvain_one_level(
    edges_sym_ds,
    rounds: int = 6,
    num_partitions: int = 32,
    mode: str = "auto",
    max_broadcast_bytes: int = 256 << 20,
    weight_col: str = None,
):
    """One level of Louvain community detection (Blondel et al. 2008,
    public literature): greedy modularity-maximizing label moves on the
    symmetric graph, starting from singleton communities. Synchronous
    batch variant: each round only one vid-hash class moves (the same
    conflict-avoidance trick as the MIS/coloring algorithms here), so
    simultaneous moves cannot chase each other; ties break to the
    smaller community id, making the result deterministic.

    Input must be the SYMMETRIC directed pair list (every undirected
    edge present both ways, no self loops) — the same convention as
    connected components.

    Two interchangeable executions (equality pinned in tests), chosen
    by ``mode`` ("auto" picks by the vertex-table byte estimate vs
    ``max_broadcast_bytes`` — the repo's usual byte-capped-broadcast
    idiom):

    - **broadcast** (fast path): the (vid, label, deg, community
      volume) arrays ride ``ray.put`` once per round; each round is ONE
      hash-partitioned exchange of per-block pre-aggregated (src,
      candidate) counts plus a vectorized per-partition argmax. Right
      for graphs whose VERTEX table fits a worker heap (edges never
      materialize anywhere).
    - **join** (scale path): labels→edges co-partitioned joins, the
      k_{i,c} groupby, and community volumes joined back by community
      id — nothing anywhere scales with |V|, at ~6 exchanges per
      round.

    ``weight_col`` names an optional edge-weight column (e.g. the
    summed multi-edge weights of a contracted host graph); unweighted
    edges count 1 — an integer-weighted graph moves identically to the
    equivalent duplicated-edge multigraph (pinned in tests).

    Returns a Dataset (vid, label)."""
    import ray.data as rd

    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    edges = edges_sym_ds.select_columns(cols).materialize()
    if weight_col and weight_col != "w":
        edges = edges.rename_columns({weight_col: "w"})
    has_w = bool(weight_col)
    if mode == "auto":
        n_upper = edges.count()  # vertex count ≤ 2·edges; cheap estimate
        mode = "broadcast" if n_upper * 24 <= max_broadcast_bytes else "join"
    if mode == "broadcast":
        return _louvain_broadcast(edges, rounds, num_partitions, has_w)
    return _louvain_join(edges, rounds, num_partitions, has_w)


def _louvain_broadcast(edges, rounds: int, num_partitions: int,
                       has_w: bool = False):
    """One exchange per round; vertex arrays broadcast via ray.put."""
    import ray
    import ray.data as rd

    from signal_collect_ray.util import part_of

    # vertex set + weighted degrees from per-block partials (tiny rows)
    def deg_partial(tbl: pa.Table) -> pa.Table:
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        w = (tbl.column("w").to_numpy(zero_copy_only=False).astype(np.float64)
             if has_w else np.ones(len(src)))
        u, inv = np.unique(src, return_inverse=True)
        c = np.bincount(inv, weights=w)
        return pa.table({"v": pa.array(u, pa.int64()),
                         "c": pa.array(c, pa.float64())})

    pv, pc = [], []
    for b in edges.map_batches(deg_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        pv.append(b.column("v").to_numpy(zero_copy_only=False))
        pc.append(b.column("c").to_numpy(zero_copy_only=False))
    allv = np.concatenate(pv) if pv else np.empty(0, np.int64)
    allc = np.concatenate(pc) if pc else np.empty(0, np.float64)
    vids, inv = np.unique(allv, return_inverse=True)
    deg = np.bincount(inv, weights=allc, minlength=len(vids))
    labels = vids.copy()
    m2 = float(deg.sum())
    n = len(vids)

    for r in range(rounds):
        lab_idx = np.searchsorted(vids, labels)
        vol = np.bincount(lab_idx, weights=deg, minlength=n)
        ref = ray.put((vids, labels.copy(), deg, vol))

        def partial(tbl: pa.Table) -> pa.Table:
            v_, lab_, _d, _vol = ray.get(ref)
            s = tbl.column("src").to_numpy(zero_copy_only=False)
            d = tbl.column("dst").to_numpy(zero_copy_only=False)
            w = (tbl.column("w").to_numpy(zero_copy_only=False).astype(
                np.float64) if has_w else np.ones(len(s)))
            si = np.searchsorted(v_, s)
            dl = lab_[np.searchsorted(v_, d)]
            key = si * (len(v_) + 1) + np.searchsorted(v_, dl)
            uk, inv = np.unique(key, return_inverse=True)
            c = np.bincount(inv, weights=w)
            usi = uk // (len(v_) + 1)
            udl = v_[uk % (len(v_) + 1)]
            return pa.table(
                {
                    "si": pa.array(usi, pa.int64()),
                    "dl": pa.array(udl, pa.int64()),
                    "k": pa.array(c, pa.float64()),
                    "part": pa.array(
                        part_of(usi, num_partitions), pa.int32()
                    ),
                }
            )

        kernel = _BroadcastArgmax(ref, m2, 2, r % 2)
        moved = (
            edges.map_batches(partial, batch_format="pyarrow")
            .groupby("part")
            .map_groups(kernel, batch_format="pyarrow")
        )
        new_labels = labels.copy()
        for b in moved.iter_batches(batch_format="pyarrow", batch_size=None):
            ov = b.column("vid").to_numpy(zero_copy_only=False)
            ol = b.column("label").to_numpy(zero_copy_only=False)
            new_labels[np.searchsorted(vids, ov)] = ol
        labels = new_labels

    return rd.from_arrow(
        pa.table({"vid": pa.array(vids, pa.int64()),
                  "label": pa.array(labels, pa.int64())})
    )


class _BroadcastArgmax:
    """One src-hash partition of (si, dl, k) partials → (vid, label)
    after the greedy move, using the broadcast vertex arrays."""

    __name__ = "_BroadcastArgmax"

    def __init__(self, ref, m2: float, active_mod: int, active_cls: int):
        self.ref = ref
        self.m2 = m2
        self.active_mod = active_mod
        self.active_cls = active_cls
        self._arrays = None

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        if self._arrays is None:
            self._arrays = ray.get(self.ref)
        vids, labels, deg, vol = self._arrays
        tbl = tbl.drop_columns(["part"]).combine_chunks()
        si = tbl.column("si").to_numpy(zero_copy_only=False)
        dl = tbl.column("dl").to_numpy(zero_copy_only=False)
        k = tbl.column("k").to_numpy(zero_copy_only=False)
        # merge per-block partials + append stay rows (k=0)
        u_src = np.unique(si)
        si = np.concatenate([si, u_src])
        dl = np.concatenate([dl, labels[u_src]])
        k = np.concatenate([k, np.zeros(len(u_src), np.int64)])
        key = si * np.int64(len(vids) + 1) + np.searchsorted(vids, dl)
        uk, inv = np.unique(key, return_inverse=True)
        kk = np.bincount(inv, weights=k.astype(np.float64))
        usi = (uk // (len(vids) + 1)).astype(np.int64)
        udl = vids[(uk % (len(vids) + 1)).astype(np.int64)]
        m = self.m2 / 2.0
        cur = labels[usi]
        dvi = deg[usi]
        vol_ex = vol[np.searchsorted(vids, udl)] - (udl == cur) * dvi
        score = kk / m - dvi * vol_ex / (2.0 * m * m)
        order = np.lexsort((udl, -score, usi))
        first = np.ones(len(order), dtype=bool)
        first[1:] = usi[order][1:] != usi[order][:-1]
        pick = order[first]
        vid_out = vids[usi[pick]]
        active = (vid_out % self.active_mod) == self.active_cls
        new_label = np.where(active, udl[pick], cur[pick])
        return pa.table(
            {
                "vid": pa.array(vid_out, pa.int64()),
                "label": pa.array(new_label, pa.int64()),
            }
        )


def _louvain_join(edges, rounds: int, num_partitions: int,
                  has_w: bool = False):
    """~6 hash-partitioned exchanges per round; nothing driver-side
    scales with |V|. Same moves as the broadcast path (pinned)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from signal_collect_ray.functions.joins import hash_join

    if not has_w:
        def ones(tbl: pa.Table) -> pa.Table:
            return tbl.append_column(
                "w", pa.array(np.ones(len(tbl)), pa.float64())
            )

        edges = edges.map_batches(ones, batch_format="pyarrow").materialize()
    m2 = float(edges.sum("w"))
    deg = (
        edges.groupby("src")
        .aggregate(Sum("w", alias_name="deg"))
        .rename_columns({"src": "vid"})
        .materialize()
    )

    def init_labels(tbl: pa.Table) -> pa.Table:
        return pa.table({"vid": tbl.column("vid"),
                         "label": tbl.column("vid")})

    labels = deg.map_batches(init_labels, batch_format="pyarrow").materialize()

    for r in range(rounds):
        lab_dst = labels.rename_columns({"vid": "dst", "label": "dst_label"})
        j = hash_join(edges, lab_dst, on="dst",
                      num_partitions=num_partitions)
        kic = (
            j.select_columns(["src", "dst_label", "w"])
            .groupby(["src", "dst_label"])
            .aggregate(Sum("w", alias_name="k"))
        )
        # explicit stay candidates (k=0) so a vertex with no neighbor in
        # its own community still scores staying correctly
        def stay_rows(tbl: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "src": tbl.column("vid"),
                    "dst_label": tbl.column("label"),
                    "k": pa.array(np.zeros(len(tbl)), pa.float64()),
                }
            )

        cand = (
            kic.union(labels.map_batches(stay_rows, batch_format="pyarrow"))
            .groupby(["src", "dst_label"])
            .aggregate(Sum("k", alias_name="k"))
        )
        vol = (
            hash_join(labels, deg, on="vid", num_partitions=num_partitions)
            .groupby("label")
            .aggregate(Sum("deg", alias_name="vol_c"))
            .rename_columns({"label": "dst_label"})
        )
        cand = hash_join(cand, vol, on="dst_label",
                         num_partitions=num_partitions)
        cand = hash_join(
            cand,
            labels.rename_columns({"vid": "src", "label": "cur"}),
            on="src", num_partitions=num_partitions,
        )
        cand = hash_join(
            cand, deg.rename_columns({"vid": "src"}), on="src",
            num_partitions=num_partitions,
        )

        def route(tbl: pa.Table) -> pa.Table:
            from signal_collect_ray.util import part_of

            s = tbl.column("src").to_numpy(zero_copy_only=False)
            return tbl.append_column(
                "part", pa.array(part_of(s, num_partitions), pa.int32())
            )

        labels = (
            cand.map_batches(route, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                _ArgmaxMove(m2, 2, r % 2), batch_format="pyarrow"
            )
            .materialize()
        )
    return labels
