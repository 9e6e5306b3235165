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
2. **Contraction** — the selected edges form a graph on components;
   merged labels come from the engine's OWN min-label connected
   components over that (small, at-least-halving) pair graph, with
   parallelism derived from the pair count.
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


def _cc_mapping(pairs_mat, workdir: str):
    """(a, b) component-merge pairs → full (comp, new_label) mapping via
    the engine's ConnectedComponents (min-label propagation), CC
    parallelism derived from the pair count exactly like
    ``dedup.duplicate_ids_from_pairs``."""
    from signal_collect_ray import EngineConfig, Graph
    from signal_collect_ray.algorithms import ConnectedComponents
    from signal_collect_ray.engine_resident import ResidentEngine
    from signal_collect_ray.functions.dedup import _pair_graph_parallelism

    n_pairs = pairs_mat.count()
    P, W = _pair_graph_parallelism(n_pairs)

    def to_sym(tbl: pa.Table) -> pa.Table:
        a = tbl.column("a").to_numpy(zero_copy_only=False)
        b = tbl.column("b").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    g = Graph.build(
        pairs_mat.map_batches(to_sym, batch_format="pyarrow"),
        f"{workdir}/merge_graph",
        num_partitions=P,
        dedup=True,
    )
    eng = ResidentEngine(
        EngineConfig(num_partitions=P, eps=1e-9, max_supersteps=64),
        num_workers=W,
    )
    info = eng.run(
        g,
        ConnectedComponents(),
        run_dir=f"{workdir}/merge_cc",
        resume=False,
        checkpoint_interval=100,
    )

    def shape(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "comp": tbl.column("vid"),
                "new_label": tbl.column("state").cast(pa.int64()),
            }
        )

    return info.final_state_ds().map_batches(shape, batch_format="pyarrow")


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
        old = tbl.column(col).to_numpy(zero_copy_only=False)
        new = tbl.column("_new").to_numpy(zero_copy_only=False)
        out = np.where(np.isnan(new.astype(np.float64)), old, new)
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
    under the (weight, u, v) edge order."""
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

        pairs = selected.map_batches(
            lambda t: pa.table(
                {"a": t.column("cu"), "b": t.column("cv")}
            ),
            batch_format="pyarrow",
        ).materialize()
        mapping = _cc_mapping(pairs, f"{workdir}/round{len(forest_parts)}")

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
