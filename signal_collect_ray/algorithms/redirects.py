"""Redirect-chain resolution — functional-graph transitive closure.

The web-crawl primitive: each url has at most one redirect target
(a FUNCTIONAL graph; sinks self-point), and every url must resolve to
its final destination before link-graph construction. Chains can be
long, so per-hop propagation is O(chain); pointer doubling
(Shiloach–Vishkin, public literature — the same contraction idiom as
``mst._component_labels``) squares the hop distance every round:
``next := next[next]`` via ONE co-partitioned hash self-join per
round, reaching every sink in ceil(log2(max chain)) exchanges with no
driver-side state.

Reference framing: vertex-centric path shortcutting per
``examples/PathQuery`` / Signal-Collect's id-forwarding vertices; the
rebuild keeps the dataset-level join form because the doubling step is
a pure equi-join, not a neighborhood aggregate.
"""

from __future__ import annotations

import pyarrow as pa


def resolve_redirects(
    redirect_ds,
    rounds: int,
    num_partitions: int = 64,
    max_broadcast_bytes: int = 64 << 20,
):
    """``redirect_ds``: (vid:int64, next:int64) with sinks
    self-pointing (next == vid). After ``rounds`` doubling rounds each
    vid points 2^rounds hops ahead — pass
    ``rounds >= ceil(log2(max chain length))`` to fully resolve.
    Returns a (vid, final) Dataset. Each round resolves grandparents
    through the capped-broadcast idiom: the pointer table broadcasts
    while it fits ``max_broadcast_bytes`` (zero exchanges — a vid→next
    map is 16 B/url, so 64 MiB covers ~4M urls), and above the cap each
    round is ONE co-partitioned ``hash_join`` exchange, never
    driver-held (tests pin both paths bit-identical via cap=0)."""
    from signal_collect_ray.functions.joins import capped_broadcast_join

    cur = redirect_ds

    def flip(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {"next": tbl.column("vid"), "_hop": tbl.column("next")}
        )

    def shortcut(tbl: pa.Table) -> pa.Table:
        return pa.table({"vid": tbl.column("vid"), "next": tbl.column("_hop")})

    for _ in range(rounds):
        # materialize each round: the doubling output feeds BOTH join
        # sides, and the join's schema/size probes would otherwise
        # replay the growing lazy chain every round
        cur = cur.materialize()
        right = cur.map_batches(flip, batch_format="pyarrow")
        j = capped_broadcast_join(
            cur, right, on="next",
            max_broadcast_bytes=max_broadcast_bytes,
            num_partitions=num_partitions,
        )
        cur = j.map_batches(shortcut, batch_format="pyarrow")

    def final(tbl: pa.Table) -> pa.Table:
        return pa.table({"vid": tbl.column("vid"), "final": tbl.column("next")})

    return cur.map_batches(final, batch_format="pyarrow")
