"""Bounded path-pattern matching — the PathQuery example rebuilt
Ray-Data-first (reference ``examples/PathQuery.scala:28-160``).

The reference ships query objects through vertex state: a ``PathQuery``
(chain of query nodes — wildcard / fixed-id / bounded star) flows along
edges, each receiving vertex matches the chain head against itself and
forwards the remainder (``PathQuery.scala:66-97``, ``QueryVertex``
``PathQuery.scala:128-158``). Per-vertex query lists are unbounded, so
instead of a columnar vertex state this engine runs the query as an
iterative FRONTIER expansion over the same CSR shards the superstep
engines use: each hop hash-partitions the partial-path frontier by its
current vertex (the engine's own vertex→partition mapping), expands
through that partition's CSR block, and filters by the next query node —
one co-partitioned exchange per hop, no all-pairs work, streaming
blocks throughout.

Star semantics follow the reference code (``PathQuery.scala:44-53``,
``StarQueryNode.expand``): on a match the query both advances past the
star AND forks a copy with the expansion budget decremented, so
``star(m)`` consumes 1..m+1 consecutive matching vertices. A star is
compiled away up front into its bounded set of fixed-length wildcard
runs — queries are short, so the chain fan-out is small and static.

Matched paths start at the out-neighbors of the start vertex (the query
is injected as the start vertex's state and matching begins where it
first arrives — ``PathQuery.scala:166-176``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from signal_collect_ray.util import expand_ranges, part_of

# query nodes: ("wild",) | ("fixed", vid) | ("star", max_expansion)
QueryNode = Tuple


def compile_chains(nodes: Sequence[QueryNode]) -> List[List[QueryNode]]:
    """Expand every ``star`` into its alternative wildcard runs,
    yielding the bounded set of fixed-length predicate chains the query
    matches (cartesian over star alternatives)."""
    chains: List[List[QueryNode]] = [[]]
    for node in nodes:
        kind = node[0]
        if kind == "star":
            m = int(node[1])
            if m < 0:
                raise ValueError("star expansion budget must be >= 0")
            alts = [[("wild",)] * k for k in range(1, m + 2)]
        elif kind in ("wild", "fixed"):
            alts = [[tuple(node)]]
        else:
            raise ValueError(f"unknown query node kind {kind!r}")
        chains = [c + a for c in chains for a in alts]
    # distinct chains only (two stars can expand to the same run)
    seen, out = set(), []
    for c in chains:
        key = tuple(c)
        if key not in seen:
            seen.add(key)
            out.append(c)
    if any(len(c) == 0 for c in out):
        raise ValueError("query must contain at least one matching node")
    return out


class _Hop:
    """One frontier hop over one graph partition's CSR block: expand
    every partial path through its current vertex's out-edges, keep the
    targets each row's chain accepts at this position, and flag the rows
    whose chain is complete."""

    __name__ = "_Hop"

    def __init__(self, csr_refs, hop: int, chains: List[List[QueryNode]]):
        self._refs = csr_refs  # dict part -> ObjectRef, resolved lazily
        self.hop = hop
        self.chains = chains

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        empty = pa.table(
            {
                "cur": pa.array([], pa.int64()),
                "path": pa.array([], pa.string()),
                "chain": pa.array([], pa.int32()),
                "done": pa.array([], pa.bool_()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        p = int(tbl.column("part")[0].as_py())
        ref = self._refs.get(p)
        if ref is None:
            return empty
        csr = ray.get(ref)
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        chain_id = tbl.column("chain").to_numpy(zero_copy_only=False)
        paths = tbl.column("path")

        pos = np.searchsorted(csr["src_ids"], cur)
        pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
        found = (pos < len(csr["src_ids"])) & (csr["src_ids"][pos_c] == cur)
        if not found.any():
            return empty
        starts = csr["indptr"][pos_c[found]]
        counts = csr["indptr"][pos_c[found] + 1] - starts
        eidx = expand_ranges(starts, counts)
        dst = csr["dst"][eidx]
        row_idx = np.repeat(np.flatnonzero(found), counts)
        cid = chain_id[row_idx]

        # per-chain predicate at this hop position (few chains, each a
        # vectorized mask over the expanded edge set)
        keep = np.zeros(len(dst), dtype=bool)
        done = np.zeros(len(dst), dtype=bool)
        for ci, chain in enumerate(self.chains):
            if self.hop >= len(chain):
                continue
            node = chain[self.hop]
            sel = cid == ci
            if node[0] == "fixed":
                sel &= dst == np.int64(node[1])
            keep |= sel
            if self.hop == len(chain) - 1:
                done |= sel
        if not keep.any():
            return empty
        dst_k = dst[keep]
        dst_str = pc.cast(pa.array(dst_k), pa.string())
        prev = paths.take(pa.array(row_idx[keep]))
        grown = pc.if_else(
            pc.equal(prev, ""),
            dst_str,
            pc.binary_join_element_wise(prev, dst_str, ","),
        )
        return pa.table(
            {
                "cur": pa.array(dst_k, pa.int64()),
                "path": grown,
                "chain": pa.array(cid[keep], pa.int32()),
                "done": pa.array(done[keep]),
            }
        )


def path_query(graph, start_vid: int, nodes: Sequence[QueryNode]):
    """Run a path query from ``start_vid``; returns a Ray Dataset of
    distinct matched paths ``(path: "v1,v2,...", len)`` — the
    ``ResultHandler`` output of the reference demo
    (``PathQuery.scala:115-120``), as a streaming dataset instead of a
    driver-side list.

    Each hop is one co-partitioned frontier exchange; result size is the
    number of matching paths (bounded by the query's fixed maximum
    length), never all paths in the graph.
    """
    import ray.data as rd

    chains = compile_chains(nodes)
    max_len = max(len(c) for c in chains)
    P = graph.num_partitions
    csr_refs = graph.csr_refs()

    frontier = rd.from_arrow(
        pa.table(
            {
                "cur": pa.array([int(start_vid)] * len(chains), pa.int64()),
                "path": pa.array([""] * len(chains), pa.string()),
                "chain": pa.array(np.arange(len(chains), dtype=np.int32)),
                "done": pa.array([False] * len(chains)),
            }
        )
    )

    def assign_part(tbl: pa.Table) -> pa.Table:
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "part", pa.array(part_of(cur, P).astype(np.int64))
        )

    results = []
    for hop in range(max_len):
        expanded = (
            frontier.map_batches(assign_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(
                _Hop(csr_refs, hop, chains), batch_format="pyarrow"
            )
            # both the done-split branches re-read this hop's output, and
            # the frontier is small relative to the graph — materialize
            # once to stop lazy-branch recompute
            .materialize()
        )
        done = expanded.filter(expr="done == True")
        if done.count() > 0:
            results.append(done)
        if hop < max_len - 1:
            frontier = expanded.filter(expr="done == False")
            if frontier.count() == 0:
                break

    def finish(tbl: pa.Table) -> pa.Table:
        n_hops = pc.add(
            pc.count_substring(tbl.column("path"), ","), 1
        )
        return pa.table(
            {
                "path": tbl.column("path"),
                "len": pc.cast(n_hops, pa.int64()),
            }
        )

    if not results:
        return rd.from_arrow(
            pa.table({"path": pa.array([], pa.string()), "len": pa.array([], pa.int64())})
        )
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    # distinct matched paths (two star expansions can reach the same
    # path through different chains)
    return (
        out.map_batches(finish, batch_format="pyarrow")
        .groupby("path")
        .map_groups(
            lambda t: t.slice(0, 1), batch_format="pyarrow"
        )
    )
