"""Boruvka minimum spanning forest — distributed MST over the edge
table.

The reference has no MST example, but a link-graph toolbox needs one
(host-graph backbone extraction, visualizing dedup clusters, network
cost planning). Boruvka is the naturally parallel MST algorithm; each
round is pure Ray Data:

1. **Component argmin** — every component picks its minimum outgoing
   edge under the total order ``(weight, u, v)``: a per-block
   vectorized lexsort argmin keeps one candidate per component per
   block, then ONE hash exchange merges candidates with the same
   kernel per partition (the ``first_event_per_key`` shape — never a
   per-component ``map_groups``).
2. **Contraction** — every component's chosen edge defines a parent
   pointer (a pseudo-forest with exactly one mutual pair per tree);
   the mutual pair breaks to the smaller id and pointer doubling
   (Shiloach–Vishkin star contraction, public literature) converges
   each component to its root label in O(log V) rounds. A plain
   min-label CC here would need O(diameter) supersteps — the merge
   graph of a sorted-weight path IS an O(V) chain, and a capped run
   under-contracts and re-picks already-selected tree edges.
3. **Relabel** — edge endpoints map old→new component through a
   byte-capped ``broadcast_join`` (``hash_join`` co-partition fallback
   above the cap); self edges drop, so the working edge set shrinks
   monotonically.

Component count at least halves per round, so the loop runs ≤ log2(V)
rounds. The ``(weight, u, v)`` total order makes the forest UNIQUE
(ties cannot build cycles and the result equals Kruskal's under the
same order) — pinned against a union-find Kruskal oracle in
tests/test_mst.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import part_of

_FOREST_SCHEMA = pa.schema(
    [("u", pa.int64()), ("v", pa.int64()), ("weight", pa.float64())]
)


def _argmin_rows(tbl: pa.Table) -> pa.Table:
    """Keep the (weight, u, v)-minimal row per ``comp`` — vectorized."""
    comp = tbl.column("comp").to_numpy(zero_copy_only=False)
    w = tbl.column("weight").to_numpy(zero_copy_only=False)
    u = tbl.column("u").to_numpy(zero_copy_only=False)
    v = tbl.column("v").to_numpy(zero_copy_only=False)
    order = np.lexsort((v, u, w, comp))
    c_sorted = comp[order]
    first = np.ones(len(c_sorted), dtype=bool)
    first[1:] = c_sorted[1:] != c_sorted[:-1]
    return tbl.take(pa.array(order[first], pa.int64()))


# (comp, parent) tables below this do the pointer doubling as one
# driver-side numpy loop; above it every doubling round is one
# co-partitioned hash self-join (tests force the join path via cap=0)
_LABEL_BROADCAST_LIMIT = 64 << 20  # bytes (≈4M components)


def _component_labels(selected, num_partitions: int):
    """Borůvka star contraction via pointer doubling (Shiloach–Vishkin,
    public literature). ``selected`` holds exactly one chosen edge per
    component (comp, cu, cv, …); parent(comp) = the other endpoint.
    The parent graph is a pseudo-forest whose only cycles are the
    mutual min-pairs — each breaks to the smaller id, then
    ``parent := parent[parent]`` converges every component to its tree
    root in ≤ log2(V) rounds. Returns a (comp, new_label) Dataset.

    Chosen over an engine CC run because the merge graph's diameter is
    O(V) in the worst case (a path with monotone weights chains every
    merge), where min-label propagation needs O(V) supersteps — pointer
    doubling is O(log V) regardless of chain length."""
    import ray.data as rd

    def to_parent(tbl: pa.Table) -> pa.Table:
        comp = tbl.column("comp").to_numpy(zero_copy_only=False)
        cu = tbl.column("cu").to_numpy(zero_copy_only=False)
        cv = tbl.column("cv").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "comp": pa.array(comp, pa.int64()),
                "parent": pa.array(
                    np.where(comp == cu, cv, cu).astype(np.int64), pa.int64()
                ),
            }
        )

    parents = selected.map_batches(
        to_parent, batch_format="pyarrow"
    ).materialize()
    size = parents.size_bytes() or 0

    if size <= _LABEL_BROADCAST_LIMIT:
        tbl = pa.concat_tables(
            parents.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        comp = tbl.column("comp").to_numpy(zero_copy_only=False)
        par = tbl.column("parent").to_numpy(zero_copy_only=False)
        order = np.argsort(comp, kind="stable")
        comp, par = comp[order], par[order]
        # every parent is itself a chooser (it has ≥1 incident edge),
        # so searchsorted always hits
        pidx = np.searchsorted(comp, par)
        n = len(comp)
        mutual = pidx[pidx] == np.arange(n)
        root = np.searchsorted(comp, np.minimum(comp, par))
        pidx = np.where(mutual, root, pidx)
        while True:
            nxt = pidx[pidx]
            if np.array_equal(nxt, pidx):
                break
            pidx = nxt
        return rd.from_arrow(
            pa.table(
                {
                    "comp": pa.array(comp, pa.int64()),
                    "new_label": pa.array(comp[pidx], pa.int64()),
                }
            )
        )

    # join path: grandparent via one co-partitioned hash self-join per
    # doubling round — the (comp, parent) table at least halves every
    # Borůvka round, so this stays ≤ log2(V) small exchanges
    from signal_collect_ray.functions.joins import hash_join

    def _with_grand(par_ds):
        right = par_ds.map_batches(
            lambda t: pa.table(
                {"parent": t.column("comp"), "_grand": t.column("parent")}
            ),
            batch_format="pyarrow",
        )
        return hash_join(
            par_ds, right, on="parent", how="inner",
            num_partitions=num_partitions,
        )

    def _break_cycles(tbl: pa.Table) -> pa.Table:
        comp = tbl.column("comp").to_numpy(zero_copy_only=False)
        par = tbl.column("parent").to_numpy(zero_copy_only=False)
        grand = tbl.column("_grand").to_numpy(zero_copy_only=False)
        mutual = grand == comp
        newp = np.where(mutual, np.minimum(comp, par), par)
        return pa.table(
            {
                "comp": pa.array(comp, pa.int64()),
                "parent": pa.array(newp.astype(np.int64), pa.int64()),
            }
        )

    parents = (
        _with_grand(parents)
        .map_batches(_break_cycles, batch_format="pyarrow")
        .materialize()
    )
    for _ in range(64):
        # one pass per doubling round: parent := grandparent plus a
        # per-row changed flag; the convergence probe is then a tiny
        # sum over the already-materialized blocks, not a second scan
        def advance(tbl: pa.Table) -> pa.Table:
            p = tbl.column("parent").to_numpy(zero_copy_only=False)
            g = tbl.column("_grand").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "comp": tbl.column("comp"),
                    "parent": tbl.column("_grand"),
                    "_chg": pa.array((p != g).astype(np.int64), pa.int64()),
                }
            )

        upd = (
            _with_grand(parents.select_columns(["comp", "parent"]))
            .map_batches(advance, batch_format="pyarrow")
            .materialize()
        )
        parents = upd
        if (upd.sum("_chg") or 0) == 0:
            break

    return parents.map_batches(
        lambda t: pa.table(
            {"comp": t.column("comp"), "new_label": t.column("parent")}
        ),
        batch_format="pyarrow",
    )


# mapping sizes below this broadcast; above, the tagged-union
# co-partition hash_join path relabels without any driver residency
_RELABEL_BROADCAST_LIMIT = 64 << 20  # bytes (≈4M mapping rows)


def _relabel(edges, mapping, col: str, num_partitions: int):
    """edges[col] := mapping[new_label] where present (identity
    otherwise). Broadcast fast path under the byte cap, hash_join
    (left) fallback above it."""
    from signal_collect_ray.functions.joins import broadcast_join, hash_join

    m = mapping.map_batches(
        lambda t: pa.table(
            {col: t.column("comp"), "_new": t.column("new_label")}
        ),
        batch_format="pyarrow",
    )
    n_map = m.count()
    if n_map * 16 <= _RELABEL_BROADCAST_LIMIT:
        joined = broadcast_join(edges, m, on=col, how="left")
    else:
        joined = hash_join(
            edges, m, on=col, how="left", num_partitions=num_partitions
        )

    def finish(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        old = tbl.column(col).to_numpy(zero_copy_only=False)
        newc = tbl.column("_new")
        # null-mask via Arrow, NOT a float-NaN round trip: casting int64
        # ids through float64 silently corrupts ids ≥ 2^53
        miss = pc.is_null(newc).to_numpy(zero_copy_only=False)
        new = pc.fill_null(newc, 0).to_numpy(zero_copy_only=False)
        out = np.where(miss, old, new.astype(np.int64))
        cols = {
            n: tbl.column(n)
            for n in tbl.schema.names
            if n not in (col, "_new")
        }
        cols[col] = pa.array(out.astype(np.int64), pa.int64())
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow")


def minimum_spanning_forest(
    edges_ds,
    workdir: str,
    num_partitions: int = 8,
    max_rounds: int = 40,
):
    """Boruvka MSF over an undirected weighted edge table (src, dst,
    weight). Parallel edges keep the minimum weight; self loops drop.
    Returns the forest as a Dataset (u, v, weight) — exactly
    ``n_vertices − n_components`` edges, equal to Kruskal's forest
    under the (weight, u, v) edge order. ``workdir`` is kept for
    call-site compatibility (the pointer-doubling contraction needs no
    scratch storage)."""
    import ray.data as rd
    from ray.data.aggregate import Min

    from signal_collect_ray.util import pin_schema

    def canon(tbl: pa.Table) -> pa.Table:
        s = tbl.column("src").to_numpy(zero_copy_only=False)
        d = tbl.column("dst").to_numpy(zero_copy_only=False)
        w = (
            tbl.column("weight")
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        keep = s != d
        u = np.minimum(s[keep], d[keep])
        v = np.maximum(s[keep], d[keep])
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "weight": pa.array(w[keep], pa.float64()),
            }
        )

    cur = (
        edges_ds.map_batches(canon, batch_format="pyarrow")
        .groupby(["u", "v"])
        .aggregate(Min("weight", alias_name="weight"))
    )

    def init_labels(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "u": tbl.column("u"),
                "v": tbl.column("v"),
                "weight": tbl.column("weight"),
                "cu": tbl.column("u"),
                "cv": tbl.column("v"),
            }
        )

    cur = cur.map_batches(init_labels, batch_format="pyarrow").materialize()
    forest_parts = []

    for _ in range(max_rounds):
        if cur.count() == 0:
            break

        def explode(tbl: pa.Table) -> pa.Table:
            both = pa.concat_tables(
                [
                    pa.table(
                        {
                            "comp": tbl.column("cu"),
                            "u": tbl.column("u"),
                            "v": tbl.column("v"),
                            "weight": tbl.column("weight"),
                            "cu": tbl.column("cu"),
                            "cv": tbl.column("cv"),
                        }
                    ),
                    pa.table(
                        {
                            "comp": tbl.column("cv"),
                            "u": tbl.column("u"),
                            "v": tbl.column("v"),
                            "weight": tbl.column("weight"),
                            "cu": tbl.column("cu"),
                            "cv": tbl.column("cv"),
                        }
                    ),
                ]
            )
            win = _argmin_rows(both)
            cv = win.column("comp").to_numpy(zero_copy_only=False)
            return win.append_column(
                "part", pa.array(part_of(cv, num_partitions), pa.int32())
            )

        selected = (
            cur.map_batches(explode, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                lambda t: _argmin_rows(t).drop_columns(["part"]),
                batch_format="pyarrow",
            )
            .materialize()
        )
        if selected.count() == 0:
            break

        # an edge may be picked by both endpoint components — dedup
        picked = (
            selected.map_batches(
                lambda t: pa.table(
                    {
                        "u": t.column("u"),
                        "v": t.column("v"),
                        "weight": t.column("weight"),
                    }
                ),
                batch_format="pyarrow",
            )
            .groupby(["u", "v"])
            .aggregate(Min("weight", alias_name="weight"))
            .materialize()
        )
        forest_parts.append(picked)

        mapping = _component_labels(selected, num_partitions)

        relabeled = _relabel(cur, mapping, "cu", num_partitions)
        relabeled = _relabel(relabeled, mapping, "cv", num_partitions)

        def drop_internal(tbl: pa.Table) -> pa.Table:
            cu = tbl.column("cu").to_numpy(zero_copy_only=False)
            cvv = tbl.column("cv").to_numpy(zero_copy_only=False)
            return tbl.filter(pa.array(cu != cvv))

        cur = relabeled.map_batches(
            drop_internal, batch_format="pyarrow"
        ).materialize()

    if not forest_parts:
        return pin_schema(
            rd.from_arrow(_FOREST_SCHEMA.empty_table()), _FOREST_SCHEMA
        )
    out = forest_parts[0]
    for p in forest_parts[1:]:
        out = out.union(p)
    return pin_schema(out, _FOREST_SCHEMA)
