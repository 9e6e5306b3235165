"""Deterministic random-walk sampling over the CSR graph shards.

Random walks are the sampling primitive behind DeepWalk / node2vec
embedding corpora and PPR-Nibble-style local clustering (Perozzi 2014,
Grover 2016 — public literature). The reference engine has no walk
operator; this one reuses the PathQuery frontier machinery
(``pathquery.py``, reference anchor ``examples/PathQuery.scala:28-160``):
each step hash-partitions the walk frontier by its current vertex and
advances it through that partition's CSR block — ONE co-partitioned
exchange per step, never materializing the graph on the driver.

Determinism: the "random" choice at step t of walk w is

    idx = u32(md5(f"{seed}:{w}:{t}")[:4]) mod outdeg(cur)

and the walk moves to the idx-th smallest out-neighbor (CSR segments
are (src, dst)-sorted and globally deduplicated, so the idx-th element
of the segment IS the idx-th smallest). One md5 per live walk per step
— the same reproducible-hash convention as ``functions.sampling``:
stable across runs, machines, partitioning, and engines, and exactly
mirrorable in SQL via ``row_number() OVER (PARTITION BY src ORDER BY
dst)`` + the md5-prefix arithmetic. Walks that reach a sink (no
out-edges in any shard) simply end early, exactly like an inner-join
SQL unroll.

Scale shape: ``walk_len`` sequential exchanges, each linear in the
number of LIVE walks (not edges); per-step state is (walk_id, cur) —
two int64 columns. The trace (walk_id, step, vid) streams out
per-step, so memory never holds more than one frontier.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from signal_collect_ray.util import part_of

_TRACE_SCHEMA = pa.schema(
    [
        ("walk_id", pa.int64()),
        ("step", pa.int64()),
        ("vid", pa.int64()),
    ]
)


def _empty_frontier() -> pa.Table:
    return pa.table(
        {
            "walk_id": pa.array([], pa.int64()),
            "cur": pa.array([], pa.int64()),
        }
    )


class _WalkStep:
    """Advance every live walk in one graph partition by one step."""

    __name__ = "_WalkStep"

    def __init__(self, csr_refs, step: int, seed: int):
        self._refs = csr_refs
        self.step = step
        self.seed = seed

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        if tbl.num_rows == 0:
            return _empty_frontier()
        p = int(tbl.column("part")[0].as_py())
        ref = self._refs.get(p)
        if ref is None:
            return _empty_frontier()
        csr = ray.get(ref)
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        wid = tbl.column("walk_id").to_numpy(zero_copy_only=False)

        pos = np.searchsorted(csr["src_ids"], cur)
        pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
        found = (pos < len(csr["src_ids"])) & (csr["src_ids"][pos_c] == cur)
        if not found.any():
            return _empty_frontier()
        starts = csr["indptr"][pos_c[found]]
        deg = (csr["indptr"][pos_c[found] + 1] - starts).astype(np.uint64)
        wid_f = wid[found]
        pre = f"{self.seed}:".encode()
        suf = f":{self.step}".encode()
        h = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(pre + str(w).encode() + suf).digest()[:4],
                    "big",
                )
                for w in wid_f
            ),
            dtype=np.uint64,
            count=len(wid_f),
        )
        nxt = csr["dst"][starts + (h % deg).astype(np.int64)]
        return pa.table(
            {
                "walk_id": pa.array(wid_f, pa.int64()),
                "cur": pa.array(nxt, pa.int64()),
            }
        )


def random_walks(graph, walk_len: int = 8, seed: int = 42, start_mod: int = 1):
    """Run one deterministic walk of ``walk_len`` steps from every
    graph source vertex with ``vid % start_mod == 0`` (walk_id = the
    start vertex). Returns a Ray Dataset of trace rows
    ``(walk_id, step, vid)`` — step 0 is the start itself; a walk that
    hits a sink stops emitting."""
    import ray.data as rd

    P = graph.num_partitions
    csr_refs = graph.csr_refs()
    refs = csr_refs  # closure capture (dict part → ObjectRef, tiny)

    def seed_frontier(tbl: pa.Table) -> pa.Table:
        import ray

        parts = tbl.column("p").to_numpy(zero_copy_only=False)
        out = []
        for p in parts:
            ref = refs.get(int(p))
            if ref is None:
                continue
            src_ids = ray.get(ref)["src_ids"]
            sel = src_ids[src_ids % start_mod == 0]
            out.append(sel)
        ids = np.concatenate(out) if out else np.empty(0, np.int64)
        return pa.table(
            {
                "walk_id": pa.array(ids, pa.int64()),
                "cur": pa.array(ids, pa.int64()),
            }
        )

    frontier = rd.from_arrow(
        pa.table({"p": pa.array(np.arange(P, dtype=np.int64))})
    ).map_batches(seed_frontier, batch_format="pyarrow", batch_size=1)

    def assign_part(tbl: pa.Table) -> pa.Table:
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "part", pa.array(part_of(cur, P).astype(np.int64))
        )

    def trace(step):
        def f(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            return pa.table(
                {
                    "walk_id": tbl.column("walk_id"),
                    "step": pa.array(np.full(n, step, np.int64), pa.int64()),
                    "vid": tbl.column("cur"),
                }
            )

        return f

    frontier = frontier.materialize()
    traces = [frontier.map_batches(trace(0), batch_format="pyarrow")]
    for step in range(1, walk_len + 1):
        frontier = (
            frontier.map_batches(assign_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(_WalkStep(csr_refs, step, seed), batch_format="pyarrow")
            # next step and this step's trace both re-read it
            .materialize()
        )
        if frontier.count() == 0:
            break
        traces.append(frontier.map_batches(trace(step), batch_format="pyarrow"))

    out = traces[0]
    for t in traces[1:]:
        out = out.union(t)
    return out


class _ProposeChunk:
    """Phase A of one node2vec rejection round: every live walk,
    co-partitioned with ``cur``'s CSR segment, proposes the
    h(seed:w:t:a)-th out-neighbor of ``cur`` uniformly for EACH attempt
    ``a`` in the chunk — batching attempts slashes the number of Ray
    rounds by the chunk width while keeping the sequential attempt
    semantics exactly (the first accepted attempt index wins). Walks
    whose ``cur`` is a sink die here (exactly like random_walks)."""

    __name__ = "_ProposeChunk"

    def __init__(self, csr_refs, step: int, attempts, seed: int):
        self._refs = csr_refs
        self.step = step
        self.attempts = list(attempts)
        self.seed = seed

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        empty = pa.table(
            {
                "walk_id": pa.array([], pa.int64()),
                "cur": pa.array([], pa.int64()),
                "prev": pa.array([], pa.int64()),
                "prop": pa.array([], pa.int64()),
                "att": pa.array([], pa.int64()),
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
        wid = tbl.column("walk_id").to_numpy(zero_copy_only=False)
        prev = tbl.column("prev").to_numpy(zero_copy_only=False)

        pos = np.searchsorted(csr["src_ids"], cur)
        pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
        found = (pos < len(csr["src_ids"])) & (csr["src_ids"][pos_c] == cur)
        if not found.any():
            return empty
        starts = csr["indptr"][pos_c[found]]
        deg = (csr["indptr"][pos_c[found] + 1] - starts).astype(np.uint64)
        wid_f = wid[found]
        out = []
        pre = f"{self.seed}:".encode()
        for a in self.attempts:
            suf = f":{self.step}:{a}".encode()
            h = np.fromiter(
                (
                    int.from_bytes(
                        hashlib.md5(pre + str(w).encode() + suf).digest()[:4],
                        "big",
                    )
                    for w in wid_f
                ),
                dtype=np.uint64,
                count=len(wid_f),
            )
            prop = csr["dst"][starts + (h % deg).astype(np.int64)]
            out.append(
                pa.table(
                    {
                        "walk_id": pa.array(wid_f, pa.int64()),
                        "cur": pa.array(cur[found], pa.int64()),
                        "prev": pa.array(prev[found], pa.int64()),
                        "prop": pa.array(prop, pa.int64()),
                        "att": pa.array(
                            np.full(len(wid_f), a, np.int64), pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(out)


class _JudgeChunk:
    """Phase B: co-partitioned with ``prev``'s CSR segment (every
    attempt row of a walk shares its prev, so a walk's whole chunk is
    co-resident). Classify each proposal x with Grover-Leskovec
    second-order weights — 1/p if x == prev (return), 1 if prev→x
    exists (distance 1), 1/q otherwise — accept with probability
    weight/Q, Q = max(1/p, 1, 1/q), on an independent md5 draw
    (KnightKing-style rejection sampling: ONE adjacency probe per
    proposal, never the candidate list), then RESOLVE per walk: the
    accepted row with the smallest attempt index wins, identical to
    sequential attempts. Emits one row per walk: (walk_id, cur, prev,
    prop, acc) — acc False means every attempt in the chunk rejected."""

    __name__ = "_JudgeChunk"

    def __init__(self, csr_refs, step, seed, p, q, force_attempt):
        self._refs = csr_refs
        self.step = step
        self.seed = seed
        self.p = p
        self.q = q
        self.force_attempt = force_attempt  # attempt id force-accepted

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import ray

        empty = pa.table(
            {
                "walk_id": pa.array([], pa.int64()),
                "cur": pa.array([], pa.int64()),
                "prev": pa.array([], pa.int64()),
                "prop": pa.array([], pa.int64()),
                "acc": pa.array([], pa.bool_()),
            }
        )
        if tbl.num_rows == 0:
            return empty
        part = int(tbl.column("part")[0].as_py())
        csr = ray.get(self._refs[part])
        wid = tbl.column("walk_id").to_numpy(zero_copy_only=False)
        cur = tbl.column("cur").to_numpy(zero_copy_only=False)
        prev = tbl.column("prev").to_numpy(zero_copy_only=False)
        prop = tbl.column("prop").to_numpy(zero_copy_only=False)
        att = tbl.column("att").to_numpy(zero_copy_only=False)

        pos = np.searchsorted(csr["src_ids"], prev)
        pos_c = np.minimum(pos, len(csr["src_ids"]) - 1)
        has_seg = (pos < len(csr["src_ids"])) & (
            csr["src_ids"][pos_c] == prev
        )
        is_nbr = np.zeros(len(prev), dtype=bool)
        idx = np.flatnonzero(has_seg)
        if len(idx):
            s = csr["indptr"][pos_c[idx]]
            e = csr["indptr"][pos_c[idx] + 1]
            for j, k in enumerate(idx):
                seg = csr["dst"][s[j]:e[j]]
                f = np.searchsorted(seg, prop[k])
                is_nbr[k] = f < len(seg) and seg[f] == prop[k]
        w = np.where(
            prop == prev,
            1.0 / self.p,
            np.where(is_nbr, 1.0, 1.0 / self.q),
        )
        big_q = max(1.0 / self.p, 1.0, 1.0 / self.q)
        u = np.fromiter(
            (
                _u01(self.seed, int(wid[i]), self.step, int(att[i]), "acc")
                for i in range(len(wid))
            ),
            dtype=np.float64,
            count=len(wid),
        )
        acc_row = (u < w / big_q) | (att == self.force_attempt)

        # per-walk resolution: smallest accepted attempt wins
        order = np.lexsort((att, wid))
        wid_s = wid[order]
        first = np.ones(len(wid_s), dtype=bool)
        first[1:] = wid_s[1:] != wid_s[:-1]
        group = np.cumsum(first) - 1
        acc_s = acc_row[order]
        # index (into sorted order) of each walk's first accepted row
        big = len(wid_s) + 1
        cand = np.where(acc_s, np.arange(len(wid_s)), big)
        n_groups = group[-1] + 1
        winner = np.full(n_groups, big, np.int64)
        np.minimum.at(winner, group, cand)
        starts = np.flatnonzero(first)
        resolved = np.where(winner == big, starts, winner)
        rows = order[resolved]
        return pa.table(
            {
                "walk_id": pa.array(wid[rows], pa.int64()),
                "cur": pa.array(cur[rows], pa.int64()),
                "prev": pa.array(prev[rows], pa.int64()),
                "prop": pa.array(prop[rows], pa.int64()),
                "acc": pa.array(winner != big, pa.bool_()),
            }
        )


def _u01(seed: int, w: int, t: int, a: int, tag: str) -> float:
    """Deterministic uniform draw in [0,1) — md5 prefix / 2^32."""
    h = hashlib.md5(f"{seed}:{w}:{t}:{a}:{tag}".encode()).digest()[:4]
    return int.from_bytes(h, "big") / 4294967296.0


def node2vec_walks(
    graph,
    walk_len: int = 8,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    start_mod: int = 1,
    max_attempts: int = 64,
    attempt_chunk: int = 16,
):
    """Second-order (node2vec) biased walks over the CSR shards —
    Grover & Leskovec 2016 semantics via KnightKing-style (SOSP'19,
    public literature) REJECTION SAMPLING, which is what makes the bias
    distributable: instead of shipping ``cur``'s whole candidate list
    to ``prev``'s partition (hub candidate lists are unbounded), each
    round proposes uniform out-neighbors of ``cur`` (co-partitioned
    with cur's shard) and accepts with probability weight/Q on
    ``prev``'s partition — ONE binary-search adjacency probe per
    proposal. ``attempt_chunk`` proposals ride each round, so the
    expected number of Ray rounds per step is Q/(E[w]·chunk) ≈ 1-2
    even at q = 4; the sequential-attempt semantics are preserved
    exactly (the smallest accepted attempt index wins, resolved inside
    the judge kernel — a walk's whole chunk shares ``prev`` and is
    co-resident). After ``max_attempts`` total attempts the pending
    proposal is force-accepted (deterministic tail guard, probability
    ≈ (1-min_w/Q)^64 of ever firing).

    Fully deterministic (md5 draws keyed by walk/step/attempt) —
    bit-equal to the sequential simulator in tests/test_walks_n2v.py.
    Step 1 has no ``prev`` and is the uniform first-order step. Returns
    trace rows (walk_id, step, vid); sinks end walks early."""
    import ray.data as rd

    P = graph.num_partitions
    csr_refs = graph.csr_refs()
    refs = csr_refs

    def seed_frontier(tbl: pa.Table) -> pa.Table:
        import ray

        parts = tbl.column("p").to_numpy(zero_copy_only=False)
        out = []
        for pp in parts:
            ref = refs.get(int(pp))
            if ref is None:
                continue
            src_ids = ray.get(ref)["src_ids"]
            out.append(src_ids[src_ids % start_mod == 0])
        ids = np.concatenate(out) if out else np.empty(0, np.int64)
        return pa.table(
            {
                "walk_id": pa.array(ids, pa.int64()),
                "cur": pa.array(ids, pa.int64()),
            }
        )

    frontier0 = rd.from_arrow(
        pa.table({"p": pa.array(np.arange(P, dtype=np.int64))})
    ).map_batches(
        seed_frontier, batch_format="pyarrow", batch_size=1
    ).materialize()

    def by(col):
        def f(tbl: pa.Table) -> pa.Table:
            v = tbl.column(col).to_numpy(zero_copy_only=False)
            return tbl.append_column(
                "part", pa.array(part_of(v, P).astype(np.int64))
            )

        return f

    def trace(step):
        def f(tbl: pa.Table) -> pa.Table:
            n = tbl.num_rows
            return pa.table(
                {
                    "walk_id": tbl.column("walk_id"),
                    "step": pa.array(np.full(n, step, np.int64), pa.int64()),
                    "vid": tbl.column("cur"),
                }
            )

        return f

    traces = [frontier0.map_batches(trace(0), batch_format="pyarrow")]

    # step 1: uniform first-order move (reuses the random_walks kernel)
    frontier = (
        frontier0.map_batches(by("cur"), batch_format="pyarrow")
        .groupby("part")
        .map_groups(_WalkStep(csr_refs, 1, seed), batch_format="pyarrow")
        .materialize()
    )
    if frontier.count() == 0:
        return traces[0]
    traces.append(frontier.map_batches(trace(1), batch_format="pyarrow"))

    # (walk_id, cur, prev) state: prev = the step-0 start vertex
    def init_prev(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "walk_id": tbl.column("walk_id"),
                "cur": tbl.column("cur"),
                "prev": tbl.column("walk_id"),
            }
        )

    state = frontier.map_batches(init_prev, batch_format="pyarrow")

    def take_acc(tbl: pa.Table) -> pa.Table:
        t = tbl.filter(tbl.column("acc"))
        return pa.table(
            {
                "walk_id": t.column("walk_id"),
                "cur": t.column("prop"),
                "prev": t.column("cur"),
            }
        )

    def take_rej(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = tbl.filter(pc.invert(tbl.column("acc")))
        return pa.table(
            {
                "walk_id": t.column("walk_id"),
                "cur": t.column("cur"),
                "prev": t.column("prev"),
            }
        )

    for step in range(2, walk_len + 1):
        pending = state.materialize()
        accepted = None
        a0 = 0
        while a0 <= max_attempts:
            if pending.count() == 0:
                break
            attempts = list(range(a0, min(a0 + attempt_chunk,
                                          max_attempts + 1)))
            props = (
                pending.map_batches(by("cur"), batch_format="pyarrow")
                .groupby("part")
                .map_groups(
                    _ProposeChunk(csr_refs, step, attempts, seed),
                    batch_format="pyarrow",
                )
            )
            judged = (
                props.map_batches(by("prev"), batch_format="pyarrow")
                .groupby("part")
                .map_groups(
                    _JudgeChunk(
                        csr_refs, step, seed, p, q,
                        force_attempt=max_attempts,
                    ),
                    batch_format="pyarrow",
                )
                .materialize()
            )
            acc_ds = judged.map_batches(take_acc, batch_format="pyarrow")
            # materialize the running union per round to keep the plan
            # flat (a deep lazy union chain overflows plan recursion)
            accepted = (
                acc_ds if accepted is None else accepted.union(acc_ds)
            ).materialize()
            pending = judged.map_batches(
                take_rej, batch_format="pyarrow"
            ).materialize()
            a0 += attempt_chunk

        if accepted is None:
            break
        state = accepted
        if state.count() == 0:
            break
        traces.append(state.map_batches(trace(step), batch_format="pyarrow"))

    out = traces[0]
    for t in traces[1:]:
        out = out.union(t)
    return out
