"""HyperBall — approximate neighborhood function and effective
diameter (Boldi, Rosa & Vigna 2011; Palmer's ANF 2002 — public
literature). THE web-graph distance analysis: N(t) = number of ordered
pairs (v, u) with d(v, u) ≤ t, estimated by giving every vertex a
HyperLogLog counter of its ball and propagating

    ball_t(v) = ball_{t-1}(v) ∪ ⋃_{v→u} ball_{t-1}(u)

until no register changes. |ball_t(v)| summed over v estimates N(t);
the effective diameter is the smallest t with N(t) ≥ α·N(∞).

Ray shape: per-vertex register matrices (uint8[V_p × 2^p]) live in the
object store, one block per graph partition — the same
vertex→partition mapping as the engine CSRs. Each round is a typed
two-phase exchange mirroring the resident engine's outbox pattern:

  phase 1 (serve): partition r slices out the register rows OTHER
  partitions' edges point at — the (p, r) request lists are computed
  ONCE from the static CSR dst sets, so per round each pair ships
  exactly the needed rows, never the whole state;
  phase 2 (update): partition p gathers its edge-aligned neighbor
  rows and folds them with ONE ``np.maximum.reduceat`` over its CSR
  segments — the HLL union is element-wise max, the same
  commutative-associative combiner property every engine aggregation
  exploits (``AggregationOperation.scala:27-59``).

Memory per partition is V_p · 2^p bytes (p=8 → 256 B/vertex); rounds
are O(effective diameter), which is small on web graphs. All hashing
is ``util.mix64`` — deterministic across runs and partitioning (pinned
in tests against an exact BFS neighborhood function). Dangling
destinations (dropped-vertex handling) contribute empty balls, the
``on_undeliverable="drop"`` convention.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np

from signal_collect_ray.util import mix64, part_of


def _rho_of(h: np.ndarray, p: int):
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    nz = w > 0
    rho = np.full(len(h), 64 - p + 1, dtype=np.uint8)
    rho[nz] = (64 - p) - np.floor(
        np.log2(w[nz].astype(np.float64))
    ).astype(np.int64)
    return idx, rho


def _init_regs(vids: np.ndarray, p: int) -> np.ndarray:
    """Each vertex's ball starts as {itself}."""
    regs = np.zeros((len(vids), 1 << p), dtype=np.uint8)
    idx, rho = _rho_of(mix64(vids.astype(np.uint64)), p)
    regs[np.arange(len(vids)), idx] = rho
    return regs


def _estimates(regs: np.ndarray, p: int) -> np.ndarray:
    """Row-wise HLL estimate with linear-counting small-range fix."""
    m = float(1 << p)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    s = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    e = alpha * m * m / s
    zeros = (regs == 0).sum(axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1))
    e[small] = lc[small]
    return e


def _pnum(path: str) -> int:
    return int(os.path.basename(path).split("-")[1].split(".")[0])


def neighborhood_function(
    graph, p: int = 8, max_rounds: int = 64, alpha: float = 0.9
):
    """Run HyperBall over ``graph``. Returns a dict with

    - ``nf``: list of N(t) estimates, t = 0..T (monotone, converged)
    - ``effective_diameter``: smallest t with N(t) ≥ alpha · N(T)
    - ``rounds``: T
    """
    import pyarrow.parquet as pq
    import ray

    csr_refs = graph.csr_refs()
    parts = sorted(csr_refs)
    P = graph.num_partitions

    # all partition vertices (vid-sorted shards), not just sources —
    # sinks keep their singleton ball and must count in N(t)
    vids_by_part: Dict[int, np.ndarray] = {}
    for f in graph.vertex_files():
        q = _pnum(f)
        v = pq.read_table(f, columns=["vid"]).column("vid").to_numpy(
            zero_copy_only=False
        )
        vids_by_part[q] = np.asarray(v, dtype=np.int64)
    for q in parts:
        vids_by_part.setdefault(q, np.empty(0, np.int64))

    # ---- static routing plan (once): per CSR shard, the unique dsts,
    # their owners, and each source's row in the partition vid order
    plans: Dict[int, dict] = {}
    for q in parts:
        csr = ray.get(csr_refs[q])
        dst_u, dst_inv = np.unique(csr["dst"], return_inverse=True)
        src_rows = np.searchsorted(vids_by_part[q], csr["src_ids"])
        plans[q] = {
            "dst_unique": dst_u,
            "dst_inv": dst_inv.astype(np.int64),
            "owner": part_of(dst_u, P),
            "src_rows": src_rows.astype(np.int64),
            "indptr": csr["indptr"],
        }
    # request[r][q] = vids partition q needs from owner r (sorted)
    request: Dict[int, Dict[int, np.ndarray]] = {r: {} for r in parts}
    for q in parts:
        owner = plans[q]["owner"]
        for r in parts:
            sel = np.flatnonzero(owner == r)
            if len(sel):
                request[r][q] = plans[q]["dst_unique"][sel]

    @ray.remote
    def serve(state, vids, wanted):
        """register rows for the sorted `wanted` vids; vids absent from
        this partition (dangling dsts) yield zero rows (empty balls)."""
        out = np.zeros((len(wanted), state.shape[1]), dtype=np.uint8)
        if len(vids):
            pos = np.searchsorted(vids, wanted)
            pos_c = np.minimum(pos, len(vids) - 1)
            found = (pos < len(vids)) & (vids[pos_c] == wanted)
            if found.any():
                out[found] = state[pos_c[found]]
        return out

    @ray.remote
    def update(state, plan_d, hll_p, *served):
        """fold edge-aligned neighbor rows into each source's registers;
        returns (new_state, changed, sum_of_estimates)."""
        m = state.shape[1]
        nbr = np.zeros((len(plan_d["dst_unique"]), m), dtype=np.uint8)
        i = 0
        owner = plan_d["owner"]
        for r in sorted(set(owner.tolist())):  # same order as `served`
            sel = np.flatnonzero(owner == r)
            nbr[sel] = served[i]
            i += 1
        if len(plan_d["src_rows"]):
            edge_rows = nbr[plan_d["dst_inv"]]
            seg_max = np.maximum.reduceat(
                edge_rows, plan_d["indptr"][:-1], axis=0
            )
            new_state = state.copy()
            rows = plan_d["src_rows"]
            new_state[rows] = np.maximum(state[rows], seg_max)
        else:
            new_state = state
        changed = bool((new_state != state).any())
        est = float(_estimates(new_state, hll_p).sum())
        return new_state, changed, est

    # ---- init
    state_refs, vids_refs, plan_refs = {}, {}, {}
    nf0 = 0.0
    for q in parts:
        regs = _init_regs(vids_by_part[q], p)
        nf0 += float(_estimates(regs, p).sum())
        state_refs[q] = ray.put(regs)
        vids_refs[q] = ray.put(vids_by_part[q])
        plan_refs[q] = ray.put(plans[q])

    nf: List[float] = [nf0]
    for _t in range(1, max_rounds + 1):
        served = {
            q: [
                serve.remote(state_refs[r], vids_refs[r], request[r][q])
                for r in parts
                if q in request.get(r, {})
            ]
            for q in parts
        }
        results = {
            q: update.remote(state_refs[q], plan_refs[q], p, *served[q])
            for q in parts
        }
        any_changed = False
        total = 0.0
        for q in parts:
            new_state, changed, est = ray.get(results[q])
            any_changed |= changed
            total += est
            if changed:
                state_refs[q] = ray.put(new_state)
        if not any_changed:
            break
        nf.append(total)

    n_inf = nf[-1]
    eff = next(t for t, x in enumerate(nf) if x >= alpha * n_inf)
    return {
        "nf": nf,
        "effective_diameter": int(eff),
        "rounds": len(nf) - 1,
    }
